package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine. All are
  * shuffle-conscious declarative transforms:
  *  - exact dedup is one hash-groupBy;
  *  - MinHash/LSH turns the O(N^2) pair problem into a band-bucket
  *    equi-join (shuffle on band signature; only same-bucket pairs are
  *    materialized);
  *  - embedding near-dup restricts the cross join to LSH buckets at
  *    scale (see Similarity) — the exhaustive variant here is the
  *    small-scale oracle target.
  * md5 is used as the shared deterministic hash family: identical
  * results in Spark and the DuckDB oracles.
  */
object Dedup {

  /** Exact duplicate groups by sha256(text): one row per distinct
    * content, with the group size and the kept (minimum) doc_id.
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(sha2(col("text"), 256).as("content_sha"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"))

  /** MinHash signatures over 3-shingles: k independent hash functions
    * h_i(s) = md5(i || '|' || s), signature_i = min over shingles.
    */
  def minhashSignatures(docs: DataFrame, k: Int = 8): DataFrame = {
    val sh = TextAnalysis.shingles(docs)
    val aggs = (0 until k).map(i =>
      min(md5(concat(lit(i.toString), lit("|"), col("shingle")))).as(s"h$i"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: band b's signature = md5(h_{rb} .. h_{rb+r-1});
    * docs sharing any band signature become a candidate pair (a < b).
    */
  def lshCandidatePairs(docs: DataFrame, k: Int = 8, bands: Int = 4): DataFrame = {
    val r = k / bands
    val sig = minhashSignatures(docs, k)
    val bandRows = (0 until bands).map { b =>
      val cols = (0 until r).map(i => col(s"h${b * r + i}"))
      sig.select(col("doc_id"), lit(b).as("band"),
        md5(concat_ws("|", cols: _*)).as("band_sig"))
    }.reduce(_ unionByName _)
    val a = bandRows.as("a")
    val bb = bandRows.as("b")
    a.join(bb, col("a.band") === col("b.band") &&
        col("a.band_sig") === col("b.band_sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact 3-shingle Jaccard for given candidate pairs. */
  def jaccard(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val sets = TextAnalysis.shingles(docs)
      .select(col("doc_id"), col("shingle")).distinct()
    val sizes = sets.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(sets.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sets.as("sb"), col("doc_b") === col("sb.doc_id") &&
        col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    pairs
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(coalesce(col("inter"), lit(0L)).cast("double") /
          (col("sza") + col("szb") - coalesce(col("inter"), lit(0L))), 6).as("jaccard"))
  }

  /** MinHash-LSH near-duplicate pairs with exact Jaccard >= threshold. */
  def nearDuplicates(docs: DataFrame, threshold: Double = 0.7,
                     k: Int = 8, bands: Int = 4): DataFrame =
    jaccard(docs, lshCandidatePairs(docs, k, bands))
      .filter(col("jaccard") >= threshold)

  /** Prefix-filtered candidate pairs for an EXACT set-similarity join
    * (AllPairs/PPJoin prefix principle, Bayardo et al. WWW'07 / Xiao et
    * al. WWW'08): under any global total order on shingles, two sets
    * with Jaccard >= t MUST share an element within the first
    * |S| - ceil(t*|S|) + 1 elements of each — so only those prefixes
    * enter the equi-self-join, and no qualifying pair can be missed
    * (unlike LSH's probabilistic bands). The canonical order is
    * ascending document frequency (rarest first, the classic choice —
    * prefixes then hit the smallest join buckets) with lexicographic
    * tiebreak, both deterministic and SQL-mirrorable. Shuffle shape:
    * df aggregate + rank window (linear in distinct (doc, shingle)
    * rows) + the prefix equi-join, whose bucket sizes follow the
    * rarest-shingle frequencies rather than the corpus size.
    */
  /** Prefix length sz - ceil(t*sz) + 1 with an epsilon inside the ceil:
    * binary doubles can represent t*sz a hair ABOVE the true product
    * (0.07*100 = 7.000000000000001 -> ceil 8), which would shorten the
    * prefix below the AllPairs completeness bound and silently drop
    * qualifying pairs. ceil(x - 1e-9) restores the true ceiling for
    * exact-integer products while leaving every non-integer product's
    * ceiling unchanged (an over-long prefix would only add candidates;
    * a short one loses pairs — so the epsilon errs on the safe side).
    * The DuckDB oracle mirrors the same epsilon.
    */
  private[graft] def prefixBound(sz: Column, threshold: Double): Column =
    sz - ceil(lit(threshold) * sz - lit(1e-9)) + 1

  def prefixCandidatePairs(docs: DataFrame, threshold: Double = 0.7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sets = TextAnalysis.shingles(docs)
      .select(col("doc_id"), col("shingle")).distinct()
    val freq = sets.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val ranked = sets.join(freq, Seq("shingle"))
    val byDoc = Window.partitionBy(col("doc_id"))
    val prefix = ranked
      .withColumn("rnk", row_number().over(byDoc.orderBy(col("df"), col("shingle"))))
      .withColumn("sz", count(lit(1)).over(byDoc))
      .filter(col("rnk") <= prefixBound(col("sz"), threshold))
      .select(col("doc_id"), col("shingle"))
    prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** EXACT near-duplicate pairs: prefix-filtered candidates verified by
    * exact 3-shingle Jaccard — the deterministic sibling of
    * [[nearDuplicates]] for pipelines that cannot tolerate LSH's missed
    * pairs (DedupScaleSpec pins equality with the brute-force all-pairs
    * join at the same threshold).
    */
  def nearDuplicatesExact(docs: DataFrame, threshold: Double = 0.7): DataFrame =
    jaccard(docs, prefixCandidatePairs(docs, threshold))
      .filter(col("jaccard") >= threshold)

  /** Connected components over an undirected pair list — the step that
    * turns near-duplicate PAIRS into duplicate CLUSTERS (the production
    * dedup unit: one representative survives per component).
    * Alternating large-star / small-star contraction (Kiveris, Lattanzi,
    * Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
    * MapReduce and Beyond", SoCC'14): each round first points every
    * node's LARGER neighbors at its neighborhood minimum (large-star),
    * then folds each node and its smaller neighbors onto that minimum
    * (small-star). The edge set contracts toward stars centered on each
    * component's minimum id in O(log n) rounds — independent of
    * component DIAMETER, unlike min-label propagation whose round count
    * a long template-drift chain can push past any fixed cap. The
    * fixpoint (star edges node -> min reachable id) is the same label
    * function as before: a value independent of execution order,
    * partitioning, or engine, matching the SQL oracle's exact closure.
    *
    * Each half-round is ONE shuffle (a per-node min aggregate joined
    * back to the edge list); the round's edge set is persisted, the
    * previous round unpersisted, and the logical plan CUT at the
    * persisted rows (createDataFrame over the cached RDD) so neither
    * lineage depth nor optimizer time grows with iterations — the
    * standard iterative-DataFrame hygiene. Convergence = edge set
    * unchanged, detected two-tier: a (count, sum(src), sum(dst))
    * aggregate per round (the job that materializes the round anyway)
    * and the exact edge-sized `except` certificate only when the
    * aggregates match — at most the final round in practice; hitting
    * `maxIter` FAILS LOUDLY (IllegalStateException) rather than
    * returning silently-wrong components: an unconverged edge set is
    * not yet a star set, so dedupClusters would keep several
    * representatives of one true cluster.
    *
    * The returned DataFrame is persisted (its rows were materialized by
    * the convergence check); callers that are finished with it may
    * `unpersist()` it — recomputation stays correct, just uncached.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame =
    connectedComponentsWithRounds(pairs, maxIter)._1

  /** [[connectedComponents]] exposing the number of alternating rounds
    * used — DedupScaleSpec pins the O(log n) bound on a path graph
    * whose diameter would blow past `maxIter` under label propagation.
    */
  def connectedComponentsWithRounds(pairs: DataFrame,
                                    maxIter: Int = 50): (DataFrame, Int) =
    connectedComponentsWithDiag(pairs, maxIter) match {
      case (df, iters, _) => (df, iters)
    }

  /** [[connectedComponentsWithRounds]] also exposing how many rounds ran
    * the exact set-equality `except` job — the convergence check is
    * two-tier: a per-round aggregate (count, sum(src), sum(dst)) over
    * the freshly materialized edge set decides "changed" for free (the
    * count() job the loop already paid becomes one agg job), and the
    * exact `except` CERTIFICATE runs only when all three aggregates
    * match — i.e. at most on the true fixpoint round plus aggregate
    * collisions, not every round near convergence (DedupScaleSpec pins
    * exceptRounds == 1 on the 200-node path). The certificate stays:
    * aggregate equality alone is necessary, not sufficient, and the
    * contract is fail-loudly over silently-wrong components.
    */
  def connectedComponentsWithDiag(pairs: DataFrame,
                                  maxIter: Int = 50): (DataFrame, Int, Int) = {
    val spark = pairs.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("src",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("dst",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val raw = pairs.select(col("doc_a").cast("long").as("src"),
      col("doc_b").cast("long").as("dst"))
    // canonical directed form: src > dst (small-star's precondition;
    // large-star re-symmetrizes internally); self-pairs carry no
    // connectivity and are re-added as singletons at the end
    def agg3(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("src")), sum(col("dst"))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    var edges = raw.filter(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst")).distinct().persist()
    var edgeAgg = agg3(edges)
    var changed = edgeAgg._1 > 0
    var iter = 0
    var exceptRounds = 0
    while (changed && iter < maxIter) {
      // LARGE-STAR: for each node u over the symmetric neighborhood,
      // m = min(N(u) ∪ {u}); emit (v, m) for every neighbor v > u.
      // Output edges all satisfy src > dst (m <= u < v).
      val sym = edges.unionByName(
        edges.select(col("dst").as("src"), col("src").as("dst")))
      val lsMin = sym.groupBy(col("src"))
        .agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("mn"), col("src")).as("m"))
      val ls = sym.join(lsMin, Seq("src"))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .distinct()
      // SMALL-STAR: every neighbor here is < src; m = min of them;
      // emit (v, m) for v in N(u) ∪ {u}, v != m. Still src > dst.
      val ssMin = ls.groupBy(col("src")).agg(min(col("dst")).as("m"))
      val ssStep = ls.join(ssMin, Seq("src"))
        .filter(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .unionByName(ssMin.select(col("src"), col("m").as("dst")))
        .distinct()
      val next = spark.createDataFrame(ssStep.rdd, schema).persist()
      val nextAgg = agg3(next) // materializes `next`; one job per round
      changed =
        if (nextAgg != edgeAgg) true
        else { // aggregates agree — run the exact certificate
          exceptRounds += 1
          next.except(edges).count() > 0
        }
      edges.unpersist()
      edges = next
      edgeAgg = nextAgg
      iter += 1
    }
    if (changed)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter " +
          "alternating-star rounds — raise maxIter (rounds needed ~ " +
          "log2 of the largest component size)")
    // at the fixpoint `edges` is a star set (v -> component min); add
    // the roots' self-labels, and keep nodes that appeared ONLY in
    // self-pairs as their own singletons (the label-propagation
    // implementation covered them via its edge-derived seed)
    val starLabels = edges.select(col("src").as("id"), col("dst").as("component"))
      .unionByName(edges.select(col("dst").as("id"), col("dst").as("component"))
        .distinct())
      .distinct()
    val selfOnly = raw.filter(col("src") === col("dst"))
      .select(col("src").as("id")).distinct()
      .join(starLabels, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    val labels = starLabels.unionByName(selfOnly).persist()
    labels.count()
    edges.unpersist()
    (labels, iter, exceptRounds)
  }

  /** Near-duplicate clusters with a deterministic keep-list: LSH
    * near-dup pairs at `threshold` -> connected components -> the
    * representative (min doc_id) of each cluster is kept, the rest are
    * the dedup victims. Docs in no pair are implicitly their own
    * singleton cluster and are omitted (nothing to drop).
    */
  def dedupClusters(docs: DataFrame, threshold: Double = 0.7,
                    k: Int = 8, bands: Int = 4): DataFrame =
    connectedComponents(nearDuplicates(docs, threshold, k, bands)
        .select(col("doc_a"), col("doc_b")))
      .select(col("id").as("doc_id"), col("component"),
        (col("id") === col("component")).cast("long").as("keep"))

  /** Dedup with QUALITY-aware representative selection — what a pipeline
    * actually keeps from a near-dup cluster is its best member, not its
    * lowest id: score = kept-token count (the integer-portable "longest
    * clean rendition" rule), ties broken by LOWER doc_id. Every doc is
    * assigned (docs in no near-dup pair are their own singleton
    * component and always kept).
    *
    * Shuffle shape on top of [[dedupClusters]]: the score is a per-row
    * projection in the scan, the cluster join's right side is the
    * near-dup-sized edge table, and the winner is a row_number over the
    * component key — ONE corpus exchange with a streaming rank frame
    * (no per-component history buffer), the information floor for "every
    * doc needs its cluster's verdict".
    */
  def keepBestPerCluster(docs: DataFrame, threshold: Double = 0.7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = dedupClusters(docs, threshold)
      .select(col("doc_id"), col("component"))
    docs.select(col("doc_id"),
        size(TextAnalysis.keptTokens(col("text"))).cast("long").as("score"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"), col("score"))
      .withColumn("keep",
        (row_number().over(Window.partitionBy(col("component"))
          .orderBy(col("score").desc, col("doc_id"))) === 1).cast("long"))
  }

  /** Leakage-safe train/test split — the contamination-proof corpus
    * split every eval-honest training pipeline needs: near-duplicate
    * docs must land on the SAME side (a test doc whose near-twin is in
    * train leaks the answer), so the split key is the near-dup CLUSTER,
    * not the doc. Docs in no near-dup pair are their own singleton
    * cluster (component = doc_id). The assignment is the deterministic
    * integer-mix bucket of the component id (engine-portable, like
    * TextAnalysis.sampleStratified), so any engine re-derives the same
    * split. Cost on top of [[dedupClusters]]: one left join from the
    * corpus to the (edge-docs-only, near-dup-sized) cluster table plus
    * a projection.
    */
  def leakageSafeSplit(docs: DataFrame, threshold: Double = 0.7,
                       testPermille: Int = 200): DataFrame = {
    require(testPermille >= 0 && testPermille <= 1000,
      "testPermille must be in [0, 1000]")
    val clusters = dedupClusters(docs, threshold)
      .select(col("doc_id"), col("component"))
    val withComp = docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
    val bucket = (col("component") % 100003L) * 2654435761L % 1000L
    withComp.select(col("doc_id"), col("component"),
      when(bucket < testPermille, lit("test")).otherwise(lit("train"))
        .as("split"))
  }

  /** Sub-document dedup: C4/RefinedWeb-style duplicated-span REMOVAL.
    * Any n-token span (8 by default, C4's three-sentence analog) that
    * appears in >= minDocs distinct documents is scrubbed from every
    * document containing it: the kept-token positions covered by any
    * duplicated span are dropped and the document re-joined from the
    * survivors. Returns (doc_id, n_tokens, n_removed, clean_sha) — the
    * digest stands in for the rebuilt text so the result is
    * hash-comparable.
    *
    * Shuffle shape, corpus-linear: shingles are the per-row projection
    * (no window), the df aggregate is one partial-agg shuffle on the
    * shingle, the join back materializes only rows whose span IS
    * duplicated (rare by definition), and the covered-position set is
    * collected per doc — bounded by the doc's own length — then joined
    * to the doc row for a per-row array rebuild.
    */
  def removeDuplicatedSpans(docs: DataFrame, n: Int = 8,
                            minDocs: Long = 2): DataFrame = {
    val sh = TextAnalysis.shingles(docs, n)
    val dup = sh.groupBy(col("shingle"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
      .filter(col("ndocs") >= minDocs)
      .select(col("shingle"))
    val covered = sh.join(dup, Seq("shingle"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("p"))
      .groupBy(col("doc_id")).agg(collect_set(col("p")).as("cov"))
    val kt = transform(TextAnalysis.keptTokens(col("text")), lower(_))
    val base = docs.select(col("doc_id"), kt.as("kt"))
      .join(covered, Seq("doc_id"), "left")
      .withColumn("cov", coalesce(col("cov"), array().cast("array<long>")))
    val clean = filter(
      transform(col("kt"), (t, i) =>
        when(array_contains(col("cov"), (i + 1).cast("long")), lit(null))
          .otherwise(t)),
      _.isNotNull)
    base.select(col("doc_id"),
        size(col("kt")).cast("long").as("n_tokens"),
        clean.as("clean"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - size(col("clean"))).as("n_removed"),
        md5(concat_ws(" ", col("clean"))).as("clean_sha"))
  }

  /** Scale-guarded near-dup: collapse exact-duplicate content FIRST (one
    * hash groupBy), then LSH only the representatives. A mega-cluster of
    * M identical docs (the common web-corpus pathology) otherwise lands in
    * one band bucket and the candidate join materializes M^2/2 pairs; with
    * the exact pre-pass it contributes exactly one representative, so
    * bucket-join work is quadratic only in *distinct* near-dup content
    * (DedupScaleSpec pins this with a 1k-identical-docs corpus). Full
    * dup-group membership stays available from [[exactGroups]]; pairs here
    * relate representatives (the min doc_id of each exact group).
    */
  def nearDuplicatesScalable(docs: DataFrame, threshold: Double = 0.7,
                             k: Int = 8, bands: Int = 4): DataFrame = {
    val reps = docs.join(
      exactGroups(docs).select(col("keep_doc_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    nearDuplicates(reps, threshold, k, bands)
  }

  /** 16-bit SimHash over kept tokens. Bit b of token t = parity of the
    * (b+1)-th hex char of md5(t); the doc's bit b is 1 iff the sum of
    * (2*bit - 1) over its tokens is positive. Deterministic and
    * SQL-mirrorable (a full 64-bit variant would use the same plan shape
    * with a different per-token hash width).
    */
  def simhash16(docs: DataFrame): DataFrame = {
    // ONE shuffle: each token row carries its md5 once; the 16 per-bit
    // sign sums are 16 agg buffers of a single groupBy(doc_id) (the
    // crossJoin(16 bits) + double-groupBy formulation shuffled 16x the
    // token count for the same result)
    val toks = TextAnalysis.tokens(docs)
    val hashed = toks.select(col("doc_id"), md5(col("term")).as("h"))
    val sumCols = (0 until 16).map { b =>
      sum(when(expr(s"ascii(substring(h, ${b + 1}, 1)) % 2") === 1, lit(1L))
        .otherwise(lit(-1L))).as(s"s$b")
    }
    hashed.groupBy(col("doc_id")).agg(sumCols.head, sumCols.tail: _*)
      .select(col("doc_id"),
        (0 until 16).map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Embedding near-duplicate pairs: exhaustive pairwise cosine >=
    * threshold over `embeddings(vec_id, embedding)`. The scale path
    * bucket-joins on Similarity.lshBuckets first; this exhaustive form is
    * the oracle target at test scale.
    */
  def embeddingNearDups(emb: DataFrame, threshold: Double = 0.95): DataFrame = {
    val parts = Similarity.explodeDims(emb)
    val joined = parts.as("x").join(parts.as("y"),
        col("x.dim") === col("y.dim") && col("x.vec_id") < col("y.vec_id"))
      .groupBy(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .agg(sum(col("x.v") * col("y.v")).as("dot"),
        sqrt(sum(col("x.v") * col("x.v"))).as("na"),
        sqrt(sum(col("y.v") * col("y.v"))).as("nb"))
    joined.select(col("vec_a"), col("vec_b"),
        round(col("dot") / (col("na") * col("nb")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** The production composition of the two: sign-random-projection LSH
    * buckets (Similarity.lshBuckets) -> pairs WITHIN a bucket only ->
    * exact cosine on those candidates. The pair join is an equi-join on
    * bucket (2^nBits partitions of the corpus), so pair volume is
    * sum(bucket_size^2)/2 instead of N^2/2, and the cosine is computed
    * with a single zip_with/aggregate over the two carried vectors — no
    * per-dimension row explosion, no second shuffle. Recall follows the
    * SRP collision bound; raise nBits for bigger corpora and multi-probe
    * for recall (same trade-off as Similarity.lshTopK).
    */
  /** Qualifying cosine pairs within equal `key` over rows of
    * (vec_id, key, vd, nrm): shared by the LSH-bucket and k-means-cell
    * paths. The L2 norm arrives as a PER-ROW column computed before the
    * self-join — a group of M vectors yields M(M-1)/2 pairs, and
    * recomputing two d-element norm folds per pair (the previous
    * inlined form) wasted O(pairs x d) work that is O(N x d) this way.
    * The dot product is the shared [[Similarity.dotCol]] fold over the
    * two carried vectors (same left-to-right summation, so round(…, 6)
    * values are unchanged).
    */
  private def cosinePairsWithin(rows: DataFrame, key: String,
                                threshold: Double): DataFrame =
    rows.as("a").join(rows.as("b"),
        col(s"a.$key") === col(s"b.$key") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(Similarity.dotCol(col("a.vd"), col("b.vd")) /
          (col("a.nrm") * col("b.nrm")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)

  def embeddingNearDupsLsh(emb: DataFrame, threshold: Double = 0.95,
                           nBits: Int = 5): DataFrame = {
    // bucket is a per-row projection (Similarity.bucketExpr), so no
    // join-back-by-vec_id: the only shuffle left is the bucket equi-join
    val withBucket = Similarity.nonDegenerate(emb)
      .select(col("vec_id"),
        Similarity.bucketExpr(col("embedding"), nBits).as("bucket"),
        Similarity.vecD(col("embedding")).as("vd"))
      .withColumn("nrm", Similarity.normCol(col("vd")))
    cosinePairsWithin(withBucket, "bucket", threshold)
  }

  /** Semantic near-duplicate pairs pre-grouped by k-means cell — the
    * clustering-flavored sibling of [[embeddingNearDupsLsh]] (SemDeDup-
    * style: candidate pairs only within a semantic cluster). The cell id
    * is a per-row argmin projection over the k deterministic seed
    * centroids ([[Clustering.bestStruct]] — zero shuffles to derive), so
    * the only shuffle is the cluster equi-join; pair volume is
    * sum(cell_size^2)/2 instead of N^2/2, and the cosine is one
    * zip_with/aggregate over the two carried vectors. LSH buckets bound
    * the geometric radius per bucket; k-means cells follow the corpus
    * density instead — with iterated centroids this is exactly the
    * IVF-partitioned dedup a curation pipeline runs at scale.
    */
  def semanticNearDupsKmeans(emb: DataFrame, threshold: Double = 0.95,
                             k: Int = 8): DataFrame = {
    val cents = Clustering.seedCentroids(emb, k)
    val withCell = Similarity.nonDegenerate(emb).select(col("vec_id"),
        Clustering.bestStruct(col("embedding"), cents).getField("j").as("cluster"),
        Similarity.vecD(col("embedding")).as("vd"))
      .withColumn("nrm", Similarity.normCol(col("vd")))
    cosinePairsWithin(withCell, "cluster", threshold)
  }
}
