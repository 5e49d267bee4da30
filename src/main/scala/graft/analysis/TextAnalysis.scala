package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines over a
  * `documents(doc_id, text, ...)` table. Every operator is a declarative
  * DataFrame transform (whole-stage codegen; no UDFs) whose semantics are
  * reproducible in ANSI SQL — each has a DuckDB oracle in
  * graft.SparkEntry.
  */
object TextAnalysis {

  /** The frozen kept-token rule over a raw text column as ONE shared
    * expression: split on whitespace, keep all-alpha tokens shorter
    * than 20 chars (graft.tokenizer.Tokenizer body rules, original
    * case). Every operator that counts, shingles, or packs by kept
    * tokens builds on this single definition — re-typing it would let
    * cross-operator identities (shingle dedup vs packing budgets vs
    * quality counts) silently drift apart.
    */
  private[graft] def keptTokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t.rlike("^[A-Za-z]+$") && length(t) < 20)

  /** The frozen body-token rules as Column expressions: split on
    * whitespace, keep all-alpha tokens shorter than 20 chars, lowercase;
    * pos is 1-based over kept tokens (graft.tokenizer.Tokenizer rules).
    */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(keptTokens(col("text"))))
      .select(col("doc_id"), lower(col("col")).as("term"),
        (col("pos") + 1).cast("long").as("pos"))

  /** PMI-ranked related-term pairs — the "related searches" /
    * query-expansion table: doc-level co-occurrence over the
    * top-`vocabSize` document-frequency vocabulary, ranked by
    * `score_micro = (c_xy · n_docs · 10^6) div (c_x · c_y)` — an
    * integer-exact MONOTONE transform of PMI = ln(n·c_xy/(c_x·c_y))
    * (ln is increasing), so both engines rank identically with zero
    * transcendental exposure. Integer bound: c_xy·n·10^6 < 2^63 holds
    * to n ≈ 3·10^6 docs per counted shard; a 10^12-doc run would rank
    * on the double log form (ranking tolerates ulp noise there because
    * nothing downstream re-sums it) or rescale the constant — the
    * oracle pins the integer form.
    *
    * Plan shape: vocabulary selection is one corpus exchange collapsing
    * to df rows, top-V collected driver-side (V rows — the k-means
    * centroid pattern) and shipped back as literals; pair generation is
    * then a PURE PROJECTION per doc (sorted vocab-filtered terms →
    * ordered pairs, fan-out ≤ V(V-1)/2 with V a config constant), and
    * one (a, b) groupBy — never a corpus-sized self-join on doc_id.
    */
  def relatedTerms(docs: DataFrame, vocabSize: Int = 64,
                   minPairDocs: Long = 2, k: Int = 20): DataFrame = {
    require(vocabSize > 1 && k > 0, "vocabSize must be > 1, k > 0")
    val docTerms = docs.select(col("doc_id"),
      array_distinct(transform(keptTokens(col("text")), t => lower(t))).as("ts"))
    val vocab = docTerms.select(explode(col("ts")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), asc("term")).limit(vocabSize)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val nDocs = docs.count()
    val vlit = array(vocab.map(v => lit(v._1)).toIndexedSeq: _*)
    val dfLit = map(vocab.toIndexedSeq.flatMap(v => Seq(lit(v._1), lit(v._2))): _*)
    val vt = array_sort(array_intersect(col("ts"), vlit))
    // ordered pairs (a < b) from the sorted per-row vocab terms
    val pairsCol = flatten(transform(vt, (x, i) =>
      transform(slice(vt, i + lit(2), greatest(size(vt) - i - lit(1), lit(0))),
        y => struct(x.as("a"), y.as("b")))))
    docTerms.select(explode(pairsCol).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minPairDocs)
      .withColumn("__dfa", element_at(dfLit, col("a")))
      .withColumn("__dfb", element_at(dfLit, col("b")))
      .select(col("a"), col("b"), col("c_xy"),
        expr(s"(c_xy * ${nDocs}L * 1000000L) div (__dfa * __dfb)")
          .as("score_micro"))
      .orderBy(desc("score_micro"), asc("a"), asc("b"))
      .limit(k)
  }

  /** Per-term df/tf (A1/A3 analog on the raw corpus). */
  def termStats(docs: DataFrame): DataFrame =
    tokens(docs).groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))

  /** Corpus-level stats: N, total tokens, distinct terms, avgdl. */
  def corpusStats(docs: DataFrame): DataFrame =
    tokens(docs).agg(
      countDistinct(col("doc_id")).as("n_docs"),
      count(lit(1)).as("total_tokens"),
      countDistinct(col("term")).as("distinct_terms"),
      round(count(lit(1)) / countDistinct(col("doc_id")), 6).as("avgdl"))

  /** Stopword lists for the n-gram/stopword language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "un", "une", "est", "dans"),
    "es" -> Seq("el", "los", "las", "de", "y", "un", "una", "es", "en", "por"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist", "von", "mit", "zu"))

  private val langOrder = Seq("en", "fr", "es", "de") // deterministic tie-break

  /** Language ID: per-doc stopword-hit counts per language; the language
    * with the most hits wins (ties broken in langOrder; zero hits ->
    * "und"). A real pipeline would use character n-gram profiles; the
    * heuristic is deliberately simple, deterministic, and SQL-mirrorable.
    */
  def languageId(docs: DataFrame): DataFrame = {
    val toks = tokens(docs)
    val hitCols = langOrder.map { l =>
      sum(when(col("term").isInCollection(stopwords(l)), 1L).otherwise(0L))
        .as(s"hits_$l")
    }
    val hits = toks.groupBy(col("doc_id")).agg(hitCols.head, hitCols.tail: _*)
    val best = langOrder.foldLeft((lit(0L), lit("und")): (Column, Column)) {
      case ((bestHits, bestLang), l) =>
        val h = col(s"hits_$l")
        (when(h > bestHits, h).otherwise(bestHits),
         when(h > bestHits, lit(l)).otherwise(bestLang))
    }
    // right-join back so token-less docs get "und"
    docs.select(col("doc_id"))
      .join(hits.select(col("doc_id"), best._2.as("lang_id")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lang_id"), lit("und")).as("lang_id"))
  }

  /** Quality metrics per doc: raw whitespace token count, kept-token
    * count/ratio, stopword ratio, mean kept-token length — the standard
    * cheap quality signals for corpus filtering.
    */
  /** kept-token ratio, 6-dp rounded, with a guarded divisor: a
    * whitespace-only doc has zero raw tokens, and under Spark 4's ANSI
    * default an unguarded division THROWS (DIVIDE_BY_ZERO) — while the
    * SQL twin would return NULL; greatest(raw, 1) makes both engines
    * yield 0.0. ONE definition shared by [[quality]] and
    * [[qualityGate]] (the gate ranks over exactly this value).
    */
  private[graft] def keptRatioCol: Column =
    round(size(keptTokens(col("text"))).cast("double") /
      greatest(size(filter(split(col("text"), "\\s+"), t => length(t) > 0)), lit(1)),
      6)

  def quality(docs: DataFrame): DataFrame = {
    val allStops = stopwords.values.flatten.toSeq.distinct
    val raw = filter(split(col("text"), "\\s+"), t => length(t) > 0)
    val kept = keptTokens(col("text"))
    val keptLower = transform(kept, lower(_))
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(raw).cast("long").as("n_raw_tokens"),
      size(kept).cast("long").as("n_kept_tokens"),
      keptRatioCol.as("kept_ratio"),
      round(
        size(filter(keptLower, t => t.isInCollection(allStops))).cast("double") /
          greatest(size(kept), lit(1)), 6).as("stopword_ratio"),
      round(
        aggregate(kept, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          greatest(size(kept), lit(1)), 6).as("mean_token_len"))
  }

  /** Token counting: whitespace tokens and BPE-ish subword-boundary
    * tokens (`[A-Za-z]+|[0-9]+|single other non-space`), the cheap
    * token-budget estimators.
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(filter(split(col("text"), "\\s+"), t => length(t) > 0))
        .cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
        .cast("long").as("bpe_tokens"))

  /** n-token shingles (doc_id, pos, shingle), pos = 1-based kept-token
    * position of the shingle's first token. Derived PER ROW from the
    * kept-token array (slice of a projection) — no explode-then-window:
    * the round-2 lead-window formulation paid a corpus-wide exchange on
    * doc_id that minhash/fingerprint/repetition all inherited, for a
    * value computable inside the scan. Docs with < n kept tokens emit no
    * shingle (explode of the empty sequence), exactly as before.
    */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val kept = transform(keptTokens(col("text")), lower(_))
    docs.select(col("doc_id"), kept.as("kt"))
      .select(col("doc_id"), col("kt"),
        explode(when(size(col("kt")) >= n,
            sequence(lit(1), size(col("kt")) - lit(n - 1)))
          .otherwise(array().cast("array<int>"))).as("p"))
      .select(col("doc_id"), col("p").cast("long").as("pos"),
        concat_ws(" ", slice(col("kt"), col("p"), lit(n))).as("shingle"))
  }

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    * SIGMOD'03 — the MOSS algorithm): hash every k-token shingle to a
    * 60-bit md5 prefix (the h60 convention, SQL-portable), slide a
    * w-window over each document's hash sequence, select every window's
    * MINIMUM hash (rightmost position on ties), and dedup selections.
    * The winnowing GUARANTEE: any shared token run of length
    * >= w + k - 1 between two documents shares at least one selected
    * fingerprint — position-robust local clone detection where a fixed
    * stride can straddle the overlap ([[fingerprint]] is the whole-doc
    * variant, CodeQuality's dup blocks the exact-line one). Output
    * (doc_id, pos, fp); density ~ 2/(w+1) of the grams.
    *
    * Plan shape: grams are the per-row [[shingles]] projection; the
    * whole selection is ONE doc-keyed window pass (rowsBetween 0..w-1):
    * `min_by` over the frame ordered by (h, -pos) picks the rightmost
    * minimum in one aggregate — no self-join, no second exchange; docs
    * partition the corpus so no global order materializes.
    */
  def winnowing(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    require(k > 0 && w > 0, s"k and w must be positive (got k=$k, w=$w)")
    import org.apache.spark.sql.expressions.Window
    val gr = shingles(docs, k)
      .select(col("doc_id"), col("pos"),
        expr("cast(conv(substring(md5(shingle), 1, 15), 16, 10) as bigint)")
          .as("h"))
    val frame = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    gr.select(col("doc_id"),
        min_by(struct(col("pos"), col("h")),
          struct(col("h"), (lit(0L) - col("pos")))).over(frame).as("sel"),
        count(lit(1)).over(frame).as("cnt"))
      .filter(col("cnt") === w)
      .select(col("doc_id"), col("sel").getField("pos").as("pos"),
        col("sel").getField("h").as("fp"))
      .distinct()
  }

  /** Winnowed clone-pair candidates — the cross-document MOSS report:
    * doc pairs sharing at least `minShared` selected fingerprints, with
    * the shared count (ranking signal: more shared windows = longer /
    * more repeated overlap). Plan: [[winnowing]]'s one window pass, a
    * per-doc fp dedup, then an fp-bucket equi-self-join (the LSH
    * band-join shape — pair volume follows fingerprint popularity,
    * never corpus²) and one pair-keyed count; a < b dedup.
    */
  def clonePairs(docs: DataFrame, k: Int = 3, w: Int = 4,
                 minShared: Long = 2): DataFrame = {
    require(minShared > 0, s"minShared must be positive, got $minShared")
    val fp = winnowing(docs, k, w).select(col("doc_id"), col("fp")).distinct()
    fp.as("x").join(fp.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  /** Document fingerprint: the minimum md5 over the doc's 3-shingles —
    * a deterministic rolling-hash-style content fingerprint (minhash with
    * k = 1); docs with no shingle fall back to md5 of the empty string.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"))
      .join(shingles(docs).groupBy(col("doc_id"))
          .agg(min(md5(col("shingle"))).as("fp")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("fp"), md5(lit(""))).as("fingerprint"))

  /** Per-language quality gate — the curation step AFTER scoring: drop
    * the bottom `dropFraction` of each language's documents by
    * kept-token ratio. Deliberately an ORDER-STATISTIC formulation
    * (rank over the 6-dp-rounded metric with doc_id tiebreak; keep
    * rank > floor(f·n)) rather than a quantile threshold: interpolated
    * quantiles compare unrounded doubles, where a cross-engine ulp can
    * flip boundary docs — ranking over the rounded metric keeps the
    * kept SET identical across engines. One shuffle on the language
    * key; the metric itself is a per-row projection. The floor takes
    * f·n + 1e-9 (the prefixBound lesson: binary products of exact
    * fractions can sit an ulp off the true integer).
    */
  def qualityGate(docs: DataFrame, dropFraction: Double = 0.25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dropFraction >= 0 && dropFraction < 1, "dropFraction must be in [0, 1)")
    // the metric is computed INLINE on the doc row (shared keptRatioCol
    // projection) — joining back to quality() would add a corpus-wide
    // self-join on doc_id for a per-row-derivable value; this way the
    // lang-keyed rank window is genuinely the plan's only exchange
    // (PlanAudit asserts it)
    val byLang = Window.partitionBy(col("lang"))
    docs.select(col("doc_id"), col("lang"), keptRatioCol.as("kept_ratio"))
      .withColumn("rnk",
        row_number().over(byLang.orderBy(col("kept_ratio"), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(byLang))
      .filter(col("rnk") > floor(lit(dropFraction) * col("n") + lit(1e-9)))
      .select(col("doc_id"), col("lang"), col("kept_ratio"))
  }

  /** PII redaction — the C4/Dolma-style scrub every public-web training
    * corpus runs: emails, IPv4 addresses, and long digit runs (account/
    * phone-shaped, >= 10 digits) are replaced with typed placeholder
    * tags, in that fixed order (an address or id inside an email dies
    * with the email; the later patterns never see it). Counts are per
    * STAGE — each pattern is counted on the text as the previous stage
    * left it — so the three columns sum exactly to the tags present in
    * clean_text. One codegen'd projection over the scan (zero shuffles).
    *
    * The patterns avoid constructs whose semantics differ between Java
    * regex and RE2 so the DuckDB oracle replays them verbatim — in
    * particular NO `\b`: Java's word boundary is Unicode-aware
    * (`é1234567890` has no boundary) while RE2's is ASCII-only (it
    * does), so the two engines would desync on the first non-ASCII
    * corpus. The scrub is therefore deliberately aggressive: a
    * qualifying run is redacted wherever it appears, including inside a
    * larger token (`id12345678901x` -> `id<NUM>x`) — the
    * privacy-conservative choice. Both engines use leftmost-first match
    * semantics, so the staged output is identical.
    */
  def redactPii(docs: DataFrame): DataFrame = {
    val t0 = col("text")
    val t1 = regexp_replace(t0, PiiEmail, "<EMAIL>")
    val t2 = regexp_replace(t1, PiiIpv4, "<IP>")
    val t3 = regexp_replace(t2, PiiLongNum, "<NUM>")
    docs.select(col("doc_id"),
      size(regexp_extract_all(t0, lit(PiiEmail), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t1, lit(PiiIpv4), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(t2, lit(PiiLongNum), lit(0))).cast("long").as("n_nums"),
      t3.as("clean_text"))
  }

  /** The shared Java/RE2 PII patterns (see [[redactPii]]); the oracle
    * SQL interpolates these SAME vals, so the verbatim-replay property
    * is structural, not duplicated text.
    */
  val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiIpv4 = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
  val PiiLongNum = "\\d{10,}"

  /** Deterministic hash-based stratified sampling — the data-mixing
    * primitive of a training pipeline (per-language/source sampling
    * weights). A doc is kept iff its hash bucket (0..999) falls below its
    * stratum's permille rate, so the sample is reproducible, join-free,
    * and one codegen'd filter over the scan; the doc_id is bounded before
    * the multiply so the arithmetic is overflow-safe (and therefore
    * engine-portable) at any id scale.
    */
  def sampleStratified(docs: DataFrame, permille: Map[String, Int],
                       defaultPermille: Int = 0): DataFrame = {
    val bucket = (col("doc_id") % 100003L) * 2654435761L % 1000L
    val rate = permille.foldLeft(lit(defaultPermille)) {
      case (acc, (lang, r)) => when(col("lang") === lang, lit(r)).otherwise(acc)
    }
    docs.filter(bucket < rate).select(col("doc_id"), col("lang"))
  }

  /** Top-k docs per group by a metric — the canonical curation pattern
    * (e.g. keep the k longest documents per language). Window row_number
    * with a deterministic tie-break; one shuffle on the group key.
    */
  def topKTokensPerLang(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = tokens(docs).groupBy(col("doc_id"))
      .agg(count(lit(1)).as("doc_tokens"))
    val ranked = docs.select(col("doc_id"), col("lang"))
      .join(counts, Seq("doc_id"), "left")
      .withColumn("doc_tokens", coalesce(col("doc_tokens"), lit(0L)))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang"))
          .orderBy(desc("doc_tokens"), asc("doc_id"))))
    ranked.filter(col("rk") <= k)
      .select(col("lang"), col("doc_id"), col("doc_tokens"),
        col("rk").cast("long").as("rk"))
  }

  /** Sliding-window context chunking with overlap — the pre-training
    * splitter (e.g. 256-token windows, stride 192). Window w of a doc
    * covers token positions [w*stride+1, w*stride+size]; every window
    * whose start lies inside the doc is emitted, including a partial
    * tail. Each token explodes into ONLY the windows containing it (a
    * size/stride-bounded fan-out, not a cross join), so the plan is
    * explode -> one groupBy(doc_id, win); the chunk digest hashes the
    * position-sorted token stream (deterministic under parallel agg).
    */
  def slidingChunks(docs: DataFrame, size: Int, stride: Int): DataFrame = {
    require(stride > 0 && size >= stride, "need 0 < stride <= size")
    val t = tokens(docs)
    val firstWin = greatest(
      ceil((col("pos") - size).cast("double") / stride).cast("long"), lit(0L))
    val lastWin = floor((col("pos") - 1).cast("double") / stride).cast("long")
    t.select(col("doc_id"), col("pos"), col("term"),
        explode(sequence(firstWin, lastWin)).as("win"))
      .groupBy(col("doc_id"), col("win"))
      .agg(count(lit(1)).as("n_tokens"),
        min(col("pos")).as("start_pos"), max(col("pos")).as("end_pos"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("term")))),
            x => x.getField("term")))).as("chunk_sha"))
  }

  /** Bigram language-model scoring — the CCNet-style perplexity filter
    * every web-scale training pipeline runs (score docs by how "normal"
    * their token transitions are under a corpus-trained LM; outliers are
    * boilerplate or noise). The LM is the corpus itself: add-one-smoothed
    * bigram probabilities p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V) over
    * the frozen kept-token stream, and the score is the per-doc mean
    * negative log-probability (cross-entropy, nats/token). Docs with
    * fewer than two kept tokens score (0, 0.0).
    *
    * Scale shape: bigrams are a per-row slice projection ([[shingles]]
    * with n = 2 — no window exchange); the two count tables are one
    * groupBy each; scoring joins the doc bigram stream to them on the
    * bigram/unigram keys — shuffle joins at the information floor (the
    * count tables are vocabulary-sized, too big to broadcast at corpus
    * scale, and the join keys are exactly the model's keys). The vocab
    * size V is a one-row aggregate, broadcast.
    */
  def lmCrossEntropy(docs: DataFrame): DataFrame = {
    val bg = shingles(docs, 2).select(col("doc_id"),
      substring_index(col("shingle"), " ", 1).as("w1"), col("shingle"))
    val c2 = bg.groupBy(col("shingle")).agg(count(lit(1)).as("c2"))
    val toks = tokens(docs)
    val c1 = toks.groupBy(col("term").as("w1")).agg(count(lit(1)).as("c1"))
    val vocab = toks.agg(countDistinct(col("term")).as("v"))
    val perDoc = bg
      .join(c2, Seq("shingle"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        (-log((col("c2") + lit(1.0)) / (col("c1") + col("v")))).as("nl"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("nl")), 4).as("xent"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("xent"), lit(0.0)).as("xent"))
  }

  /** Snippet extraction — the result-sink enrichment a search front-end
    * needs (the reference returns bare url/title; a snippet around the
    * first hit is the natural next column). For each doc containing
    * `term` (lowercased kept-token match), emits the first hit's 1-based
    * kept-token position and the `window`-token context on each side,
    * clamped at the doc start (the end clamps itself: slice stops at the
    * array bound). A pure per-row projection over the scan — zero
    * shuffles, zero joins; at query time the same expression runs over
    * the top-k rows only.
    */
  def snippets(docs: DataFrame, term: String, window: Int = 3): DataFrame = {
    require(window >= 0, "window must be >= 0")
    val kt = transform(keptTokens(col("text")), lower(_))
    docs.select(col("doc_id"), kt.as("kt"))
      .select(col("doc_id"), array_position(col("kt"), term).as("hit"), col("kt"))
      .filter(col("hit") > 0)
      .select(col("doc_id"), col("hit").as("first_pos"),
        concat_ws(" ", slice(col("kt"),
          greatest(col("hit") - window, lit(1L)).cast("int"),
          (col("hit") + window - greatest(col("hit") - window, lit(1L)) + 1)
            .cast("int"))).as("snippet"))
  }

  /** Deterministic training-shard assignment — the "global shuffle" a
    * training run needs, as a reproducible operator: every doc gets a
    * pseudo-random shard (0..numShards-1) and a dense 1-based position
    * within its shard, both pure functions of doc_id (integer modular
    * mixing, engine-portable and overflow-safe like [[sampleStratified]];
    * no RNG state, so any engine re-derives the same order). Plan: the
    * shard/sort keys are a projection; the only exchange is the
    * row_number window on the shard key. Size numShards well above the
    * executor count — each shard is one sort task, and shards ARE the
    * training-reader parallelism unit.
    */
  def shardForTraining(docs: DataFrame, numShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(numShards > 0, "numShards must be positive")
    val h1 = (col("doc_id") % 99991L) * 2654435761L % 104729L
    val h2 = (col("doc_id") % 65521L) * 40503L % 104729L
    docs.select(col("doc_id"), (h1 % numShards).cast("long").as("shard"),
        h2.as("h2"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("h2"), col("doc_id")))
        .cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** Per-doc top-k TF-IDF keywords — the curation/tagging primitive
    * (label each doc by its most characteristic terms). tfidf =
    * tf · ln(N / df), N = corpus doc count, rounded to 6 dp BEFORE the
    * rank order (both engines rank the same rounded value; term asc
    * breaks ties) so a cross-engine ulp can never flip the kept set.
    * Plan: per-(doc, term) tf and per-term df are partial-agg groupBys;
    * the df join keys on term (information floor — df is
    * vocabulary-sized); N is a broadcast one-row aggregate; the only
    * other exchange is the per-doc rank window.
    */
  def keywordsTfIdf(docs: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "k must be positive")
    val t = tokens(docs)
    val tf = t.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = t.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"),
        round(col("tf") * log(col("n").cast("double") / col("df")), 6).as("tfidf"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(desc("tfidf"), asc("term"))).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("tfidf"), col("rk"))
  }

  /** Per-language token-budget sampling — the data-MIXING step of a
    * pre-training pipeline (each language gets a token budget; the
    * corpus is consumed in a reproducible pseudo-random order until each
    * budget fills). Docs are ordered per language by the same integer
    * modular mixing as [[shardForTraining]] (a reproducible global
    * shuffle — no RNG state, so any engine re-derives the order); a doc
    * is KEPT iff its exclusive per-language prefix sum of kept-token
    * counts is still below the budget, i.e. the boundary doc is kept and
    * a filled budget always carries >= budget tokens (the
    * [[Packing]] "where the first token lands" rule).
    *
    * Scale shape: a naive per-language window is ONE sort task per
    * language — a single language can be half a 100 TB corpus. This is
    * [[Packing.packSequences]]'s declarative distributed prefix sum,
    * range-bucketed by the ORDER key h (buckets are contiguous h-ranges,
    * so bucket order extends the (h, doc_id) order): per-(lang, bucket)
    * totals are one tiny partial-agg job (langs x parts rows to the
    * driver), their per-language exclusive scan becomes a broadcast
    * offset, and the within-bucket window is partitioned by
    * (lang, bucket) — every window task holds ~1/parts of a language.
    */
  def tokenBudgetMix(docs: DataFrame, budgets: Map[String, Long],
                     defaultBudget: Long = 0L,
                     numPartitions: Int = 0): DataFrame = {
    require(budgets.values.forall(_ >= 0) && defaultBudget >= 0,
      "budgets must be non-negative")
    val base = docs.select(col("doc_id"), col("lang"),
      size(keptTokens(col("text"))).cast("long").as("w"),
      ((col("doc_id") % 99991L) * 2654435761L % 104729L).as("h"))
    bucketedBudgetKeep(base, budgets, defaultBudget, numPartitions)
      .select(col("doc_id"), col("lang"), col("w").as("n_tokens"),
        col("start_offset"))
  }

  /** The shared bucketed-prefix-sum machinery of [[tokenBudgetMix]] /
    * [[temperatureMix]]: keep each row of `base` (doc_id, lang, w, h)
    * while its EXCLUSIVE per-language prefix sum of `w` in (h, doc_id)
    * order stays below the language's budget. Scale shape as documented
    * on tokenBudgetMix: contiguous h-range buckets, per-(lang, bucket)
    * totals collected once, broadcast offsets, within-bucket windows.
    */
  private def bucketedBudgetKeep(base: DataFrame, budgets: Map[String, Long],
                                 defaultBudget: Long,
                                 numPartitions: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = base.sparkSession
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
                else spark.sessionState.conf.numShufflePartitions
    val width = math.max(1L, 104729L / parts + 1)
    val bucketed = base.withColumn("bucket",
      floor(col("h") / width).cast("long"))

    // per-(lang, bucket) totals -> per-language exclusive scan on the
    // driver (langs x parts longs)
    val sums = bucketed.groupBy(col("lang"), col("bucket"))
      .agg(sum(col("w")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val offsets = sums.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.zip(sorted.scanLeft(0L)(_ + _._3)).map {
        case ((l, b, _), off) => (l, b, off)
      }
    }
    val offsetDf = offsets.toDF("lang", "bucket", "bucket_offset")

    val w = Window.partitionBy(col("lang"), col("bucket"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (lang, b)) => when(col("lang") === lang, lit(b)).otherwise(acc)
    }
    bucketed
      .join(broadcast(offsetDf), Seq("lang", "bucket"))
      .withColumn("start_offset",
        coalesce(sum(col("w")).over(w), lit(0L)) + col("bucket_offset"))
      .filter(col("start_offset") < budget)
      .select(col("doc_id"), col("lang"), col("w"), col("start_offset"))
  }

  /** Temperature-scaled language mixing (the T5/mC4 alpha-sampling rule
    * at α = 1/2): language l's share of a `budget`-doc training mix is
    * n_l^α / Σ_m n_m^α — up-weighting tail languages relative to
    * proportional sampling. α = 1/2 makes the weights sqrt(n), and sqrt
    * is CORRECTLY-ROUNDED IEEE in every engine, so freezing
    * s_l = round(sqrt(n_l)·1e6) to integer micro-units makes
    * quota_l = budget·s_l div Σ s_m an exact all-integer computation —
    * no float summation and no libm pow (pow(x, 0.3) is not correctly
    * rounded and genuinely differs across engines). Each language then
    * keeps its first quota_l docs in the reproducible
    * [[shardForTraining]] hash order via the bucketed prefix machinery
    * (w = 1 per doc ⇒ exclusive prefix count < quota ⇔ rank <= quota).
    * Returns (doc_id, lang, rk). [[temperatureQuotas]] is the per-lang
    * summary twin.
    */
  def temperatureMix(docs: DataFrame, budget: Long,
                     numPartitions: Int = 0): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val quotas = temperatureQuotaMap(docs, budget)
    val base = docs.select(col("doc_id"), col("lang"), lit(1L).as("w"),
      ((col("doc_id") % 99991L) * 2654435761L % 104729L).as("h"))
    bucketedBudgetKeep(base, quotas, 0L, numPartitions)
      .select(col("doc_id"), col("lang"),
        (col("start_offset") + 1L).as("rk"))
  }

  private def temperatureQuotaMap(docs: DataFrame, budget: Long): Map[String, Long] = {
    val counts = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val s = counts.map { case (l, n) => l -> math.round(math.sqrt(n.toDouble) * 1e6) }
    val total = math.max(1L, s.values.sum)
    require(budget == 0L || s.values.max <= Long.MaxValue / math.max(budget, 1L),
      "budget * sqrt-micro-weight overflows Long")
    s.map { case (l, sl) => l -> budget * sl / total }
  }

  /** Per-language temperature-mix summary: (lang, n_docs, s_micro,
    * quota) — the exact integers [[temperatureMix]] selects with.
    */
  def temperatureQuotas(docs: DataFrame, budget: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val quotas = temperatureQuotaMap(docs, budget)
    counts.toSeq.map { case (l, n) =>
      (l, n, math.round(math.sqrt(n.toDouble) * 1e6), quotas(l))
    }.toDF("lang", "n_docs", "s_micro", "quota")
  }

  /** CCNet-style perplexity bucketing — after [[lmCrossEntropy]] scores
    * every doc, split each language into `nBuckets` equal-frequency
    * tiers by score (bucket 0 = most-normal "head", last = "tail");
    * training mixtures then sample the tiers at different rates. Rank is
    * over the 4-dp-ROUNDED score with doc_id tiebreak (the
    * [[qualityGate]] lesson: comparing raw doubles lets a cross-engine
    * ulp flip boundary docs) and the bucket index is the INTEGRAL
    * division nBuckets·(rank-1) div n — both engines compute the exact
    * same integer, so the bucket SETS are identical. One lang-keyed
    * window exchange on top of the LM scoring joins.
    */
  def perplexityBuckets(docs: DataFrame, nBuckets: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBuckets > 0, "nBuckets must be positive")
    val byLang = Window.partitionBy(col("lang"))
    lmCrossEntropy(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .withColumn("rnk",
        row_number().over(byLang.orderBy(col("xent"), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(byLang))
      .withColumn("ppl_bucket",
        expr(s"($nBuckets * (CAST(rnk AS BIGINT) - 1)) div n"))
      .select(col("doc_id"), col("lang"), col("xent"), col("ppl_bucket"),
        when(col("ppl_bucket") === 0, lit("head"))
          .when(col("ppl_bucket") === nBuckets - 1, lit("tail"))
          .otherwise(lit("middle")).as("tier"))
  }

  /** Within-document repetition signals (the Gopher / RefinedWeb-style
    * quality rules): duplicate 3-gram mass and the heaviest 3-gram's
    * share. High values flag boilerplate/spam for pre-training filters.
    * Shingles are a per-row projection, so the plan is two partial-agg
    * groupBys (per-(doc,shingle) counts, then per-doc stats) — both
    * map-side combined, unlike the round-2 window exchange that shuffled
    * every raw token row. Docs with no shingle report zeros.
    */
  def repetition(docs: DataFrame): DataFrame = {
    // two-level: per-(doc, shingle) counts, then per-doc stats — keeps the
    // heaviest-shingle share exact without a collect
    val perShingle = shingles(docs)
      .groupBy(col("doc_id"), col("shingle")).agg(count(lit(1)).as("cnt"))
    val perDoc = perShingle.groupBy(col("doc_id")).agg(
      sum(col("cnt")).as("n_shingles"),
      count(lit(1)).as("n_distinct"),
      max(col("cnt")).as("top_n"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        round(coalesce(lit(1.0) - col("n_distinct") / col("n_shingles"), lit(0.0)), 6)
          .as("dup_ratio"),
        round(coalesce(col("top_n") / col("n_shingles"), lit(0.0)), 6)
          .as("top_share"))
  }

  /** Mergeable whitespace-token length histogram per language:
    * `(lang, bin, n_docs)` with `bin = ws_tokens div binWidth`. ONE
    * corpus pass collapsing to a (langs × bins) grid — a bounded summary
    * that merges across shards by bin-wise SUM (the register-grid
    * property the HLL/CMS sketches have, here for length distributions).
    * Everything integer-exact, so the DuckDB twin replays it verbatim.
    */
  def lengthHistogram(docs: DataFrame, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    docs.select(col("lang"),
        size(filter(split(col("text"), "\\s+"), t => length(t) > 0))
          .cast("long").as("n"))
      .select(col("lang"), expr(s"n div $binWidth").as("bin"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Quantiles at bin resolution from the mergeable histogram: for each
    * requested q (permille), the smallest bin whose cumulative count
    * reaches q of the language's total — `cum·1000 >= q·total` in pure
    * integers, no float interpolation to diverge cross-engine.
    * `hi_tokens = (bin+1)·binWidth` is the exclusive upper edge ("q of
    * the corpus is shorter than hi_tokens").
    *
    * Scale shape: the only corpus-sized work is [[lengthHistogram]]'s
    * one pass; the Window cumsum runs over the (langs × bins) GRID —
    * bounded by construction, never by the corpus. Contrast an exact
    * percentile, which global-sorts every row; bin width is the explicit
    * accuracy-vs-summary-size dial, the same trade the count sketches
    * make.
    */
  def histogramQuantiles(docs: DataFrame, binWidth: Long,
                         qsPermille: Seq[Int] = Seq(500, 900, 990)): DataFrame = {
    require(qsPermille.nonEmpty && qsPermille.forall(q => q > 0 && q <= 1000),
      s"quantiles must be permille values in (0, 1000]: $qsPermille")
    import org.apache.spark.sql.expressions.Window
    val byLang = Window.partitionBy(col("lang"))
    lengthHistogram(docs, binWidth)
      .withColumn("cum", sum(col("n_docs")).over(byLang.orderBy(col("bin"))))
      .withColumn("total", sum(col("n_docs")).over(byLang))
      .select(col("lang"), col("bin"), col("cum"), col("total"),
        explode(array(qsPermille.map(q => lit(q)): _*)).as("q_permille"))
      .filter(col("cum") * 1000 >= col("q_permille").cast("long") * col("total"))
      .groupBy(col("lang"), col("q_permille"))
      .agg(min(col("bin")).as("bin"))
      .select(col("lang"), col("q_permille"), col("bin"),
        ((col("bin") + 1) * binWidth).as("hi_tokens"))
  }

  /** Curriculum ordering: a global training position 0..N-1 for every
    * document, ascending bigram-LM difficulty ([[lmCrossEntropy]] xent,
    * ties by doc_id; bigram-less docs score 0.0 and lead). Semantically
    * `row_number() OVER (ORDER BY xent, doc_id) - 1`, but that Window is
    * a SINGLE-partition bottleneck at corpus scale — this uses the
    * range-partition + per-partition-offset pattern
    * (Corpus.assignDocIds): parallel range sort, one tiny
    * per-partition-count collect, offsets applied via
    * rdd.mapPartitionsWithIndex (never TaskContext.getPartitionId — the
    * coalesce(1) hazard the Packing regression spec pins). Deterministic
    * because (xent, doc_id) is a total order and xent is the 4-dp-rounded
    * value the q_lm_score oracle already proves cross-engine-exact.
    */
  def curriculumOrder(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = lmCrossEntropy(docs)
      .select(col("doc_id").cast("long").as("doc_id"), col("xent"))
      .repartitionByRange(parts, col("xent"), col("doc_id"))
      .sortWithinPartitions(col("xent"), col("doc_id"))
    val rdd = sorted.rdd
    val counts = rdd.mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    import spark.implicits._
    spark.createDataset(rdd.mapPartitionsWithIndex { (pid, it) =>
      var next = bc.value(pid)
      it.map { r => val pos = next; next += 1
        (r.getLong(0), r.getDouble(1), pos) }
    }).toDF("doc_id", "xent", "pos")
  }

  /** Corpus vocabulary report card — the distribution diagnostics every
    * dataset release publishes (and every tokenizer-budget decision
    * needs): total kept tokens, vocabulary size, hapax count (terms
    * occurring once — the long tail's leading edge), type-token ratio,
    * top-term share, and the Zipf slope (OLS of ln freq on ln rank over
    * the top `zipfTopR` terms; natural text runs near -1, synthetic or
    * templated corpora flatten it). One row out.
    *
    * Scale shape: ONE term-frequency aggregate (vocab-sized output),
    * one scalar fold over it, and a rank window over only the top-R
    * rows (TakeOrdered, never a global sort of the vocab). Ratios round
    * at 6 dp, the slope at 4 (it folds 2·R logs — wider float exposure).
    */
  def vocabStats(docs: DataFrame, zipfTopR: Int = 100): DataFrame = {
    require(zipfTopR > 1, s"zipfTopR must be > 1, got $zipfTopR")
    val tf = tokens(docs).groupBy(col("term")).agg(count(lit(1)).as("c"))
    val scalars = tf.agg(
      sum(col("c")).as("n_tokens"),
      count(lit(1)).as("vocab"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"),
      max(col("c")).as("top_c"))
    val top = tf.orderBy(desc("c"), asc("term")).limit(zipfTopR)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(desc("c"), asc("term"))))
    val zipf = top.select(
        log(col("rnk").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
      .agg(count(lit(1)).as("r"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    scalars.crossJoin(zipf).select(
      col("n_tokens"), col("vocab"), col("hapax"),
      round(col("vocab").cast("double") / col("n_tokens"), 6).as("ttr"),
      round(col("top_c").cast("double") / col("n_tokens"), 6).as("top_share"),
      round((col("r") * col("sxy") - col("sx") * col("sy")) /
        (col("r") * col("sxx") - col("sx") * col("sx")), 4).as("zipf_slope"))
  }
}
