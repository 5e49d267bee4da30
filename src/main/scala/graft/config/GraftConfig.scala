package graft.config

/** Engine constants, mirroring the reference's configs/config.h and
  * ranker/ranker.h weight tables (cited per field). The reference is the
  * C++ search engine surveyed in SURVEY.md; values are pinned here so the
  * whole engine (Spark build pipeline, scorer kernels, and the
  * single-threaded oracle) agrees on one source of truth.
  */
object GraftConfig {
  /** configs/config.h:12 NUM_DOCS_IN_DICT — docs per index chunk. Also the
    * *constant* divisor of the avgdl used by the ranker's length
    * normalization (ranker/ranker.h:802-804 divides by NUM_DOCS_IN_DICT,
    * not by the actual doc count of the chunk).
    */
  val ChunkDocs = 30000L

  /** configs/config.h:14 TOKEN_MAX_SIZE — tokens with length >= 20 are
    * dropped (index/index.h:127,155). For title terms the length includes
    * the '#' decoration.
    */
  val TokenMaxSize = 20

  /** configs/config.h:15-16 */
  val MaxTitleSize = 50
  val MaxAbstractSize = 100

  /** configs/config.h:19 NUM_TOP_DOCUMENTS_RETURNED */
  val TopK = 30

  /** Qualifying-chunk count above which SearchEngine's cross-chunk
    * RefScore merge goes STAGED (census + executor-side prune, driver
    * collect O(partitions·topK) — SearchEngine.searchChunksPruned).
    * Below it, the plain per-chunk collect is both exact and cheaper
    * than the extra census jobs — bench/parity corpora stay on it.
    * Calibration (tools/StagedMergeProbe, interleaved clean trials):
    * the staged path costs a FIXED ~0.37 s of census/prune jobs at 25
    * and at 500 chunks alike, while the plain collect grows with the
    * chunk count (~30 rows × ~150 B each). 2048 chunks ≈ 60k rows ≈
    * 10+ MB through the driver — the scale where fan-in and driver
    * memory start to matter and the fixed census cost amortizes; below
    * it plain wins outright.
    */
  val StagedMergeChunks = 2048

  /** configs/config.h:20 MAX_DOCUMENT_PER_INDEX_PER_QUERY. The reference
    * loop (ranker/ranker.h:756-765) post-increments numDocsFound in the
    * while condition and then breaks *before scoring* once
    * numDocsFound >= 1000, so exactly the first 999 candidate documents of
    * a chunk are scored. We keep that observable behavior.
    */
  val MaxCandidatesPerChunk = 1000L
  val EffectiveScoredPerChunk = 999L

  // ---- ranker/ranker.h constraint constants ----
  val ShortTitleLimit = 6L        // ranker.h:25
  val ShortUrlLimit = 40L         // ranker.h:26
  val ShortSpanMultiplier = 3L    // ranker.h:29
  val MaxSkippedLocation = 3L     // ranker.h:31
  val TimesExpectedToBeFrequent = 2L // ranker.h:34
  val NearTopBoundary = 100L      // ranker.h:37
  val RareMultiplier = 100000L    // ranker.h:40

  // ---- ranker/ranker.h weights ----
  val StaticWeight = 10L                       // ranker.h:48
  val DynamicWeight = 10L                      // ranker.h:49
  val DynamicWeightSomeRare = 12L              // ranker.h:50
  val DynamicWeightMostRare = 15L              // ranker.h:51
  val ShortTitleWeight = 30L                   // ranker.h:56
  val ShortUrlWeight = 30L                     // ranker.h:57
  val EduWeight = 20L                          // ranker.h:58
  val GovWeight = 20L                          // ranker.h:59
  val ComWeight = 10L                          // ranker.h:60
  val ShortSpanWeight = 2L                     // ranker.h:63
  val OrderSpanWeight = 2L                     // ranker.h:64
  val ExactPhraseWeight = 7L                   // ranker.h:65
  val NearTopWeight = 3L                       // ranker.h:66
  val NearDoubleWeight = 2L                    // ranker.h:67
  val NearTripleWeight = 5L                    // ranker.h:68
  val AllWordsFrequentWeight = 15L             // ranker.h:69
  val MostWordsFrequentWeight = 10L            // ranker.h:70
  val SomeWordsFrequentWeight = 5L             // ranker.h:71
  val MinPercentToBeMost = 0.6                 // ranker.h:73
  val MinPercentToBeSome = 0.3                 // ranker.h:74
  val SpanHitCap = 20L                         // ranker.h:511-513

  // Title weights, ranker.h:78-87
  val TitleFewWeight = 10L
  val TitleSomeWeight = 35L
  val TitleManyWeight = 70L
  val TitleMostWeight = 90L
  val TitleAllWeight = 250L
  val MinPercentTitleFew = 0.05
  val MinPercentTitleSome = 0.24
  val MinPercentTitleMany = 0.49
  val MinPercentTitleMost = 0.74
  val MinPercentTitleAll = 1.0

  // URL weights, ranker.h:90-91
  val UrlContainQueryWordWeight = 70L
  val UrlContainQueryWordHomePageWeight = 250L

  /** constraintSolver/isr.h:15 `static size_t MAX = 0xFFFFFFFF` — the
    * exhausted-ISR sentinel location. Locations are assumed < 2^32 per
    * chunk (30k docs x <143k tokens/doc).
    */
  val LocationMax = 0xFFFFFFFFL

  /** Posting-block granularity for the skip metadata (docs per block) —
    * our generalization of the reference's 128-entry syncTable
    * (index/PostingList.h:19-23). Used by block-max WAND.
    */
  val BlockDocs = 128

  /** Sync-table stripe shift: index/index.h:37 `highBit(loc) = loc >> 20`. */
  val StripeShift = 20
}
