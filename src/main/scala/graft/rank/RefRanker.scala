package graft.rank

import graft.config.GraftConfig._
import graft.isr._
import graft.query._

/** One scored result slot (DocumentScore, ranker/ranker.h:94-100, plus
  * docId for deterministic cross-checks; the reference identifies results
  * by URL only).
  */
case class DocScore(title: String, summary: String, url: String,
                    score: Long, docId: Long)

object DocScore {
  val empty: DocScore = DocScore("", "", "", 0L, -1L)
}

/** Per-document metadata the ranker needs (DocumentData analog). */
case class RankDoc(docId: Long, url: String, title: String, summary: String,
                   numTitleWords: Long, docLength: Long)

/** Per-candidate component breakdown — the reference's DebugScore
  * instrument (ranker/ranker.h:162-215, printed by
  * tests/testQuery.cpp:47-61): static / url / title / body parts, the
  * body score before and after length normalization, the chunk's chosen
  * dynamic weight, and the final total. This is the field diagnostic for
  * a rank divergence: every number that enters
  * `StaticWeight*static + dynamicWeight*(body + title + url)` is visible.
  */
case class DebugScore(docId: Long, sStatic: Long, sUrl: Long, sTitle: Long,
                      sBodyRaw: Long, sBody: Long, dynamicWeight: Long,
                      total: Long)

/** Everything the ranker needs about one chunk, in memory: the decoded
  * flat-location posting lists of the query (body + '#'title) terms, the
  * EndDoc walk data, per-doc metadata, and the chunk's NumberOfPosts.
  * `docBase(i)` = sum of (docLength_j + 1) for j < i; token t of local doc
  * i sits at docBase(i) + t, EndDoc_i at docBase(i) + docLength_i + 1 —
  * identical to the reference's single location counter
  * (index/index.h:231-236 starts at 1; ##EndDoc consumes a location).
  */
final class ChunkContext(
    val chunk: Long,
    val termLocs: Map[String, Array[Long]],      // flat locations per term
    val termTf: Map[String, Long],               // numberOfPosts per term
    val termDf: Map[String, Long],               // numberOfDocuments per term
    val endLocs: Array[Long],                    // EndDoc flat locations
    val docs: Array[RankDoc],                    // sorted by docId (urlIndex order)
    val totalPosts: Long,                        // chunk NumberOfPosts (incl EndDoc)
    val chunkCapacity: Long)                     // NUM_DOCS_IN_DICT

/** Faithful port of ranker/ranker.h — the exact integer scoring the
  * golden tests assert rank-identity against (SURVEY.md §2.9).
  */
object RefRanker {

  // ---- URL helpers (ranker.h:285-356) ----

  /** ranker.h:285-294 — blind 8-char strip (assumes "https://"), then
    * leading "www.".
    */
  def simplifyUrl(longUrl: String): String = {
    val r = if (longUrl.length >= 8) longUrl.substring(8) else ""
    if (r.startsWith("www.")) r.substring(4) else r
  }

  /** ranker.h:317-338 — substring between the first and second dots, or
    * before the first dot if there is no second. A dotless url (would
    * throw std::out_of_range in the C++) returns the whole string.
    */
  def getDomainName(url: String): String = {
    val firstDot = url.indexOf('.')
    if (firstDot < 0) return url
    val secondDot = url.indexOf('.', firstDot + 1)
    if (secondDot >= 0) url.substring(firstDot + 1, secondDot)
    else url.substring(0, firstDot)
  }

  /** ranker.h:297-311 (defined by the reference but unused by StaticRank;
    * kept for parity/testing).
    */
  def getDomainSuffix(url: String): String = {
    val slash = url.indexOf('/')
    if (slash >= 0) { if (slash >= 4) url.substring(slash - 4, slash) else "" }
    else if (url.length >= 4) url.substring(url.length - 4)
    else ""
  }

  /** ranker.h:344-356 */
  def isHomePage(url: String): Boolean = {
    var dots = 0
    var i = 0
    while (i < url.length && url.charAt(i) != '/') {
      if (url.charAt(i) == '.') dots += 1
      i += 1
    }
    dots <= 1 && i == url.length
  }

  // ---- static rank (ranker.h:396-430) ----
  // Note: compares getDomainName(full URL) against ".edu"/".gov"/".com" —
  // getDomainName can never return a dot-prefixed string, so the domain
  // bonus is dead code in the reference; ported literally.
  def staticRank(doc: RankDoc): Long = {
    var score = 0L
    val domainName = getDomainName(doc.url)
    if (domainName == ".edu") score += EduWeight
    else if (domainName == ".gov") score += GovWeight
    else if (domainName == ".com") score += ComWeight
    if (doc.url.length < ShortUrlLimit) score += ShortUrlWeight
    if (doc.numTitleWords < ShortTitleLimit) score += ShortTitleWeight
    score
  }

  // ---- dynamic URL rank (ranker.h:685-703) ----
  def dynamicUrlRank(url: String, searchWords: IndexedSeq[String], rarestIdx: Int): Long = {
    var i = 0
    while (i < searchWords.length) {
      if (getDomainName(url) == searchWords(i)) {
        var score =
          if (isHomePage(url)) UrlContainQueryWordHomePageWeight
          else UrlContainQueryWordWeight
        if (i == rarestIdx) score *= 2
        return score // first match only (early return, ranker.h:699)
      }
      i += 1
    }
    0L
  }

  // ---- span heuristics (ranker.h:555-649) ----
  private def countSpanHit(span: Array[Long], docStart: Long,
                           counts: Array[Long]): Unit = {
    val n = span.length
    var minLoc = span(0); var maxLoc = span(0)
    var i = 0
    while (i < n) {
      if (span(i) < minLoc) minLoc = span(i)
      if (span(i) > maxLoc) maxLoc = span(i)
      i += 1
    }
    if (maxLoc - minLoc < n * ShortSpanMultiplier) counts(0) += 1 // shortSpan
    if (maxLoc < docStart + NearTopBoundary) counts(2) += 1       // nearTop
    if (n > 1) {
      var isOrder = true
      i = 0
      while (i < n - 1) { if (span(i + 1) < span(i)) isOrder = false; i += 1 }
      if (isOrder) counts(1) += 1                                  // orderSpan

      var isPhrase = true
      i = 0
      while (i < n - 1) { if (span(i + 1) != span(i) + 1) isPhrase = false; i += 1 }
      if (isPhrase) counts(3) += 1                                 // exactPhrase

      // near(i, j): |span(i) - span(j)| <= 3 with the C++ size_t-underflow
      // semantics: when span(i) < 3, `span(j) >= span(i) - 3` wraps to a
      // huge unsigned value and is never true (ranker.h:611-612, 635-636)
      def nearC(i: Int, j: Int): Boolean = {
        val upper = span(j) <= span(i) + MaxSkippedLocation
        val lower =
          if (span(i) >= MaxSkippedLocation) span(j) >= span(i) - MaxSkippedLocation
          else false // size_t wrap -> condition effectively false
        upper && lower
      }

      var isNearTriple = false
      if (!isPhrase) {
        i = 0
        while (i < n && !isNearTriple) {
          var cnt = 0
          var j = 0
          while (j < n) {
            if (i != j && nearC(i, j)) cnt += 1
            j += 1
          }
          if (cnt >= 2) isNearTriple = true
          i += 1
        }
        if (isNearTriple) counts(4) += 1                           // nearTriple
      }
      if (!isNearTriple) {
        var isNearDouble = false
        i = 0
        while (i < n && !isNearDouble) {
          var j = i + 1
          while (j < n && !isNearDouble) {
            if (nearC(i, j)) isNearDouble = true
            j += 1
          }
          i += 1
        }
        if (isNearDouble) counts(5) += 1                           // nearDouble
      }
    }
  }

  // ---- dynamic body rank (ranker.h:434-551) ----
  private def dynamicBodyRank(terms: Array[IsrWord], expectedFreq: Array[Long],
                              rarestIdx: Int, docStart: Long, docEnd: Long,
                              currentSpan: Array[Long]): Long = {
    val n = terms.length
    val counts = new Array[Long](6) // shortSpan, orderSpan, nearTop, phrase, nearTriple, nearDouble
    val numOcc = new Array[Long](n)
    var i = 0
    while (i < n) { terms(i).seek(docStart); i += 1 }
    i = 0
    while (i < n) { currentSpan(i) = terms(i).startLocation; i += 1 }
    var rarestLocation = terms(rarestIdx).startLocation

    while (rarestLocation < docEnd) {
      i = 0
      while (i < n) {
        if (i != rarestIdx) {
          var currentLoc = terms(i).startLocation
          if (!(currentLoc > docEnd || !terms(i).hasPost)) {
            numOcc(i) += 1
            terms(i).next()
            var nextLoc = terms(i).startLocation
            if (!(nextLoc > docEnd || !terms(i).hasPost)) {
              numOcc(i) += 1
              var isReachingEnd = false
              while (nextLoc < rarestLocation && !isReachingEnd) {
                terms(i).next()
                currentLoc = nextLoc
                nextLoc = terms(i).startLocation
                if (nextLoc > docEnd || !terms(i).hasPost) isReachingEnd = true
                else numOcc(i) += 1
              }
              if (!isReachingEnd) {
                currentSpan(i) =
                  if (rarestLocation - currentLoc < nextLoc - rarestLocation) currentLoc
                  else nextLoc
              }
            }
          }
        }
        i += 1
      }
      countSpanHit(currentSpan, docStart, counts)
      terms(rarestIdx).next()
      rarestLocation = terms(rarestIdx).startLocation
      currentSpan(rarestIdx) = rarestLocation
    }

    val shortSpan = math.min(counts(0), SpanHitCap)
    val orderSpan = math.min(counts(1), SpanHitCap)
    val nearDouble = math.min(counts(5), SpanHitCap)

    var score = 0L
    var numFrequent = 0
    i = 0
    while (i < n) {
      if (numOcc(i) > expectedFreq(i) * TimesExpectedToBeFrequent) numFrequent += 1
      i += 1
    }
    val freqPct = numFrequent.toDouble / n.toDouble
    if (numFrequent == n) score += AllWordsFrequentWeight
    else if (freqPct > MinPercentToBeMost) score += MostWordsFrequentWeight
    else if (freqPct > MinPercentToBeSome) score += SomeWordsFrequentWeight

    score += shortSpan * ShortSpanWeight + orderSpan * OrderSpanWeight +
      counts(2) * NearTopWeight + counts(3) * ExactPhraseWeight +
      counts(4) * NearTripleWeight + nearDouble * NearDoubleWeight

    if (n == 1) score /= 3 // ranker.h:540
    score
  }

  // ---- dynamic title rank (ranker.h:653-681) ----
  private def dynamicTitleRank(titleTerms: Array[IsrWord], docStart: Long,
                               docEnd: Long, numTitleWords: Long): Long = {
    var count = 0.0
    var i = 0
    while (i < titleTerms.length) {
      if (titleTerms(i).hasPost) {
        titleTerms(i).seek(docStart)
        if (titleTerms(i).startLocation < docEnd) count += 1
      }
      i += 1
    }
    val frequency = count / numTitleWords.toDouble // 0/0 -> NaN -> score 0
    if (frequency >= MinPercentTitleAll) TitleAllWeight
    else if (frequency >= MinPercentTitleMost) TitleMostWeight
    else if (frequency >= MinPercentTitleMany) TitleManyWeight
    else if (frequency >= MinPercentTitleSome) TitleSomeWeight
    else if (frequency >= MinPercentTitleFew) TitleFewWeight
    else 0L
  }

  // ---- AST -> ISR compile (expression.cpp:85-143) ----
  private def compile(node: QNode, ctx: ChunkContext): IsrNode = node match {
    case QWord(w) => new IsrWord(ctx.termLocs.getOrElse(w, null))
    case QPhrase(ws) =>
      new IsrPhrase(ws.map(w => compile(QWord(w), ctx)).toArray, newEndDoc(ctx))
    case QAnd(cs) => new IsrAnd(cs.map(compile(_, ctx)).toArray, newEndDoc(ctx))
    case QOr(cs) => new IsrOr(cs.map(compile(_, ctx)).toArray, newEndDoc(ctx))
  }

  private def newEndDoc(ctx: ChunkContext): IsrEndDoc =
    new IsrEndDoc(ctx.endLocs, Array.range(0, ctx.endLocs.length))

  /** InsertionSort (ranker.h:103-158) including the dup-URL and
    * (title, score) "similar website" drops and zero-slot overwrite
    * quirks. Mutates topN in place.
    */
  def insertionSort(data: DocScore, topN: Array[DocScore]): Unit = {
    insertionSortEntered(data, topN); ()
  }

  /** [[insertionSort]] that reports whether the item ENTERED the array
    * (mutated it). Used by the staged-merge prune: an item that does not
    * enter a fold from empty state is below that fold's floor at its
    * arrival — see [[pruneStream]] for why that makes it droppable.
    */
  def insertionSortEntered(data: DocScore, topN: Array[DocScore]): Boolean = {
    if (topN(topN.length - 1).score > data.score) return false
    var i = 0
    while (i < topN.length) {
      if (topN(i).url == data.url) return false
      if (topN(i).title == data.title && topN(i).score == data.score) return false
      i += 1
    }
    i = 0
    while (i < topN.length) {
      if (topN(i).score == 0) { topN(i) = data; return true }
      if (data.score > topN(i).score) {
        var j = topN.length - 1
        while (j > i) {
          if (topN(j - 1).score != 0) topN(j) = topN(j - 1)
          j -= 1
        }
        topN(i) = data
        return true
      }
      i += 1
    }
    false
  }

  /** EXACT partition-local prune for the staged cross-chunk merge.
    *
    * The cross-chunk fold ([[mergeChunkResults]], indexServer.cpp:94-112)
    * is order-dependent through its dup-URL / dup-(title,score) drops, so
    * a naive "fold ranges locally, fold range winners globally" staging
    * is NOT rank-identical (StagedMergeSpec carries counterexamples).
    * This prune is the sound alternative: given the GLOBAL census of
    * duplicated values — `dupUrls` = urls occurring on more than one
    * candidate anywhere in the query's hit set, `dupPairs` likewise for
    * (title, score) — a partition may drop exactly those items that are
    * (a) outside every dup family, and (b) never enter an insertion fold
    * of the partition's own clean items (in (chunk, slot) arrival order,
    * from empty state).
    *
    * Why that is exact (all candidate scores must be > 0 AND all
    * candidate urls non-empty — caller-checked; the zero-score
    * store/no-shift quirks void the argument otherwise, and an empty
    * url dup-matches the array's empty padding slots while they last —
    * a state-dependent decision this prune may not make):
    * with positive scores and the reference's strict-floor + equal-score
    * fall-through rules, the fold array is at every instant exactly the
    * top-K of the items inserted so far minus the dup-dropped ones, under
    * the total order (score desc, arrival asc). A CLEAN item (globally
    * unique url and (title, score)) can never be dup-dropped and can
    * never block anything, so its only interaction is that floor. The
    * partition's clean prefix is a subset of the true fold's pool at the
    * item's arrival, and the top-K floor is monotone in pool inclusion —
    * so an item below the partition-local clean floor is below the true
    * floor, and the true fold drops it with NO state change. Removing it
    * from the replay stream therefore cannot change any later decision.
    * Dup-family items are kept verbatim (their drop/enter decisions
    * depend on cross-partition state and must be replayed), as are clean
    * items that enter locally and are later evicted (their transient
    * occupancy raises the floor other items see — StagedMergeSpec's
    * evicted-enterer fixture shows dropping them diverges).
    *
    * Empty slots (score 0, empty url) are filtered outright: against any
    * reachable array they hit either the strict-floor return or the
    * dup-url return on another empty slot, so they are always no-ops.
    *
    * Rows are (chunk, slot, candidate); output preserves (chunk, slot)
    * order and is a subsequence of the input's sort.
    */
  def pruneStream(rows: Seq[(Long, Int, DocScore)],
                  dupUrls: Set[String],
                  dupPairs: Set[(String, Long)],
                  topK: Int): Seq[(Long, Int, DocScore)] = {
    val sorted = rows
      .filterNot { case (_, _, d) => d.score == 0L && d.url.isEmpty }
      .sortBy { case (c, s, _) => (c, s) }
    val local = Array.fill(topK)(DocScore.empty)
    sorted.filter { case (_, _, d) =>
      dupUrls.contains(d.url) || dupPairs.contains((d.title, d.score)) ||
        insertionSortEntered(d, local)
    }
  }

  /** RankDocuments (ranker.h:716-834) over one chunk. Returns the raw
    * top-K slot array (possibly containing empty slots), in the
    * reference's slot order — the cross-chunk merge re-inserts them
    * (indexServer.cpp:94-112). The 3-second wall-clock cap (T4) is
    * intentionally dropped; the candidate cap is applied in docId order
    * exactly as the loop does (999 scored docs, SURVEY.md §2.5).
    */
  def rankChunk(ast: QOr, searchWords: IndexedSeq[String],
                ctx: ChunkContext, topK: Int = TopK): Array[DocScore] = {
    val topN = Array.fill(topK)(DocScore.empty)
    scanChunk(ast, searchWords, ctx) { (docData, d) =>
      insertionSort(
        DocScore(docData.title, docData.summary, docData.url, d.total, docData.docId),
        topN)
    }
    topN
  }

  /** All scored candidates of the chunk with their DebugScore breakdown,
    * in candidate (docId) order — same walk, caps, and filters as
    * rankChunk, BEFORE the top-K insertion sort.
    */
  def debugScores(ast: QOr, searchWords: IndexedSeq[String],
                  ctx: ChunkContext): Array[DebugScore] = {
    val out = Array.newBuilder[DebugScore]
    scanChunk(ast, searchWords, ctx)((_, d) => out += d)
    out.result()
  }

  /** The candidate walk + scoring shared by rankChunk and debugScores
    * (so the debug surface can never diverge from the scoring path).
    * Emits (doc metadata, component breakdown) for every scored
    * candidate; returns early on the term-absent abort and the
    * 999-candidate cap exactly as the reference loop does.
    */
  private def scanChunk(ast: QOr, searchWords: IndexedSeq[String],
                        ctx: ChunkContext)
                       (emit: (RankDoc, DebugScore) => Unit): Unit = {
    // SetDynamicRankWeight (ranker.h:362-392): abort chunk if any
    // flattened word is absent; rare-word share picks the weight.
    var numRare = 0.0
    var i = 0
    while (i < searchWords.length) {
      val w = searchWords(i)
      ctx.termTf.get(w) match {
        case None => return
        case Some(tf) => if (ctx.totalPosts / tf > RareMultiplier) numRare += 1
      }
      i += 1
    }
    val rarePct = numRare / searchWords.length.toDouble
    val dynamicWeight =
      if (rarePct > MinPercentToBeMost) DynamicWeightMostRare
      else if (rarePct > MinPercentToBeSome) DynamicWeightSomeRare
      else DynamicWeight

    val n = searchWords.length
    val terms = new Array[IsrWord](n)
    val titleTerms = new Array[IsrWord](n)
    val expectedFreq = new Array[Long](n)
    var rarestIdx = 0
    var rarestOcc = Isr.Max // 0xFFFFFFFF (isr.h:15, ranker.h:726)
    i = 0
    while (i < n) {
      val w = searchWords(i)
      terms(i) = new IsrWord(ctx.termLocs(w))
      expectedFreq(i) = ctx.termTf(w) / ctx.termDf(w)
      if (ctx.termTf(w) < rarestOcc) { rarestOcc = ctx.termTf(w); rarestIdx = i }
      titleTerms(i) = new IsrWord(ctx.termLocs.getOrElse("#" + w, null))
      i += 1
    }

    val parsedQuery = compile(ast, ctx).asInstanceOf[IsrOr]
    val currentSpan = new Array[Long](n)
    var numDocsFound = 0L
    while (parsedQuery.nextDocument() &&
           { numDocsFound += 1; numDocsFound - 1 <= MaxCandidatesPerChunk }) {
      if (numDocsFound >= MaxCandidatesPerChunk) return // ranker.h:760-765
      val docEnd = parsedQuery.docEnd.startLocation
      val docStart = docEnd - parsedQuery.docEnd.docLength
      val docData = ctx.docs(parsedQuery.docEnd.urlIndex)
      if (docData.url.length >= 10) { // malformed-URL filter (ranker.h:781-785)
        val url = simplifyUrl(docData.url)
        val sStatic = staticRank(docData)
        val sUrl = dynamicUrlRank(url, searchWords, rarestIdx)
        val sTitle = dynamicTitleRank(titleTerms, docStart, docEnd, docData.numTitleWords)
        val sBodyRaw = dynamicBodyRank(terms, expectedFreq, rarestIdx, docStart, docEnd, currentSpan)
        var sBody = sBodyRaw
        // length normalization (ranker.h:799-812): avgdl over the
        // CONFIGURED chunk capacity; truncating double division
        val averageDocLength = ctx.totalPosts.toDouble / ctx.chunkCapacity.toDouble
        val normFactor = parsedQuery.docEnd.docLength / averageDocLength / 10.0
        if (normFactor > 1) sBody = (sBody.toDouble / normFactor).toLong
        val total = StaticWeight * sStatic + dynamicWeight * (sBody + sTitle + sUrl)
        emit(docData, DebugScore(docData.docId, sStatic, sUrl, sTitle,
          sBodyRaw, sBody, dynamicWeight, total))
      }
    }
  }

  /** Cross-chunk merge (indexServer.cpp:94-112 + the front end's fan-in):
    * insert every chunk's slots, in chunk order, into one combined top-K.
    */
  def mergeChunkResults(chunkResults: Seq[(Long, Array[DocScore])],
                        topK: Int = TopK): Array[DocScore] = {
    val combined = Array.fill(topK)(DocScore.empty)
    chunkResults.sortBy(_._1).foreach { case (_, slots) =>
      slots.foreach(insertionSort(_, combined))
    }
    combined
  }
}
