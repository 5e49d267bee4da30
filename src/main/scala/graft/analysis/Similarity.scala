package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings(vec_id, embedding: array<float>)`.
  *
  * Brute-force cosine top-k is the correctness baseline; the scale path
  * is sign-random-projection LSH: vectors land in 2^nBits buckets and the
  * search scans only the query's (multi-)probe buckets. Hyperplanes are
  * pseudo-random but deterministic — component i of plane j has sign =
  * parity of md5(j || '_' || i) — so Spark, the driver-side twin
  * ([[AnnStore.bucketOf]]), and the DuckDB oracles agree exactly.
  *
  * Every per-vector computation here is a single codegen'd projection
  * over the embedding array (`transform`/`zip_with`/`aggregate`): the
  * round-2 formulation exploded N·d·b rows through two exchanges to
  * compute values derivable from each row alone — at 10^9 vectors x 768
  * dims that was ~10^12 shuffle rows for zero information gain.
  */
object Similarity {

  /** (vec_id, dim, v): one row per vector component, double-typed.
    * dim is 1-based to match SQL generate_subscripts. Retained ONLY for
    * the exhaustive small-scale oracle twins (Dedup.embeddingNearDups);
    * the production paths below never explode dimensions.
    */
  def explodeDims(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") + 1).as("dim"),
        col("col").cast("double").as("v"))

  /** The embedding column as array<double> (parquet stores float). */
  private[analysis] def vecD(embedding: Column): Column =
    transform(embedding, _.cast("double"))

  /** Sum of elementwise products of two array<double> columns — the
    * codegen'd dot product (no per-dimension rows).
    */
  private[analysis] def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0d), _ + _)

  /** L2 norm of an array<double> column. */
  private[analysis] def normCol(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), _ + _))

  /** Rows with a usable embedding (non-null, non-empty; size(null) is
    * null so one predicate covers both). A degenerate vector has no
    * direction: every SRP projection over it is an empty (or null) sum,
    * so the naive bucket expression would park ALL of them in bucket 0
    * — while the dimension-exploding formulation this replaced, and the
    * generate_subscripts SQL oracles, emit NO row for them. Every
    * bucket/cosine entry point routes through this guard so degenerate
    * rows keep dropping out instead of polluting bucket 0.
    */
  private[analysis] def nonDegenerate(emb: DataFrame): DataFrame =
    emb.filter(size(col("embedding")) > 0)

  /** Cosine of every vector against the vector `queryId`: the single-row
    * query vector is broadcast and the cosine is one projection per row
    * (dot/norms via zip_with/aggregate). The plan is scan -> broadcast
    * nested-loop of ONE row -> project: zero wide shuffles. Summation
    * order differences vs the SQL oracles are absorbed by round(…, 6).
    */
  def cosineToQuery(emb: DataFrame, queryId: Long): DataFrame = {
    val q = emb.filter(col("vec_id") === queryId)
      .select(vecD(col("embedding")).as("qv"))
    nonDegenerate(emb).crossJoin(broadcast(q))
      .select(col("vec_id"),
        dotCol(vecD(col("embedding")), col("qv")).as("dot"),
        normCol(vecD(col("embedding"))).as("nv"),
        normCol(col("qv")).as("nq"))
      .select(col("vec_id"),
        round(col("dot") / (col("nv") * col("nq")), 6).as("cosine"))
  }

  /** Brute-force cosine top-k neighbors of `queryId` (excluding itself),
    * ordered (cosine desc, vec_id asc).
    */
  def bruteForceTopK(emb: DataFrame, queryId: Long, k: Int): DataFrame =
    cosineToQuery(emb, queryId)
      .filter(col("vec_id") =!= queryId)
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)

  /** Retrieval hard-negative mining — the training-data op behind every
    * dense-retriever fine-tune: for a query term, the positives are the
    * docs containing it (frozen kept-token rule; doc_id ≡ vec_id), and
    * the hard negatives are the top-k docs that do NOT contain the term
    * ranked by cosine to the positives' centroid. Plan shape: the
    * positive flag is a per-row projection; the centroid is one
    * partial-agg (dim, mean) aggregate collected to the driver (d
    * doubles — never data-sized) and re-broadcast as a literal; scoring
    * is the zero-shuffle cosine projection over the anti-joined
    * negatives + TakeOrdered. The centroid components are rounded to 6
    * dp BEFORE scoring so both engines rank against the identical
    * vector (the mean's summation-order noise never reaches the score).
    */
  def hardNegatives(docs: DataFrame, emb: DataFrame, term: String,
                    k: Int): DataFrame = {
    val kt = transform(TextAnalysis.keptTokens(col("text")), lower(_))
    val posIds = docs.filter(array_contains(kt, term)).select(col("doc_id"))
    val centroid = nonDegenerate(emb)
      .join(posIds, emb("vec_id") === posIds("doc_id"))
      .select(posexplode(vecD(col("embedding"))))
      .groupBy(col("pos")).agg(round(avg(col("col")), 6).as("c"))
      .orderBy(col("pos")).collect().map(_.getDouble(1))
    require(centroid.nonEmpty, s"hardNegatives: no positive docs for '$term'")
    val qlit = typedLit(centroid.toSeq)
    val nq = math.sqrt(centroid.map(x => x * x).sum)
    val vd = vecD(col("embedding"))
    nonDegenerate(emb)
      .join(posIds, emb("vec_id") === posIds("doc_id"), "left_anti")
      .select(col("vec_id"),
        round(dotCol(vd, qlit) / (normCol(vd) * lit(nq)), 6).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** The SRP bucket of an embedding column as ONE codegen'd expression:
    * bit j = 1 iff sum_i sign(j, i) * v_i > 0, with sign(j, i) = +1 when
    * ascii(first hex char of md5(j || '_' || i)) is odd else -1 (i
    * 1-based). Shared by [[lshBuckets]], [[AnnStore.build]], and
    * Dedup.embeddingNearDupsLsh; the driver-side scalar twin is
    * [[AnnStore.bucketOf]] (spec-asserted identical).
    */
  def bucketExpr(embedding: Column, nBits: Int): Column = {
    val vd = vecD(embedding)
    val dims = sequence(lit(1), size(embedding))
    (0 until nBits).map { j =>
      val proj = aggregate(
        zip_with(vd, dims, (v, d) =>
          v * when(ascii(substring(md5(concat(lit(s"${j}_"), d.cast("string"))), 1, 1)) % 2 === 1,
            lit(1.0)).otherwise(lit(-1.0))),
        lit(0.0d), _ + _)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Sign-random-projection bucket per vector: (vec_id, bucket) with
    * bucket in [0, 2^nBits). One projection over the scan — no shuffle.
    */
  def lshBuckets(emb: DataFrame, nBits: Int = 8): DataFrame =
    nonDegenerate(emb)
      .select(col("vec_id"), bucketExpr(col("embedding"), nBits).as("bucket"))

  private def bucketed(emb: DataFrame, nBits: Int): DataFrame =
    nonDegenerate(emb).select(col("vec_id"), col("embedding"),
      bucketExpr(col("embedding"), nBits).as("bucket"))

  /** Candidate-restricted cosine top-k: vectors whose bucket is in the
    * broadcast `probes` set, scored against queryId's vector.
    */
  private def probeTopK(emb: DataFrame, probes: DataFrame, queryId: Long,
                        k: Int, nBits: Int): DataFrame = {
    val cand = bucketed(emb, nBits).join(broadcast(probes), Seq("bucket"))
      .select(col("vec_id"), col("embedding"))
    cosineToQuery(cand, queryId)
      .filter(col("vec_id") =!= queryId)
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** LSH-restricted ANN: cosine top-k among vectors sharing the query's
    * bucket. Recall < 1 by construction (bucket boundaries); see
    * [[lshTopKMultiProbe]] for the recall knob. Plan: per-row bucket
    * projection -> broadcast join with the ONE-row query bucket ->
    * cosine projection -> TakeOrdered. Zero wide shuffles. For repeated
    * queries against a static corpus, persist the buckets once with
    * [[AnnStore]] and probe its partitions instead of recomputing.
    */
  def lshTopK(emb: DataFrame, queryId: Long, k: Int, nBits: Int = 8): DataFrame = {
    val qb = bucketed(emb, nBits).filter(col("vec_id") === queryId)
      .select(col("bucket"))
    probeTopK(emb, qb, queryId, k, nBits)
  }

  /** Multi-probe LSH ANN: candidates come from the query's bucket PLUS
    * every bucket at Hamming distance 1 (each of the nBits sign bits
    * flipped) — the standard recall/cost point for SRP-LSH (Lv et al.,
    * VLDB'07 multi-probe): a near neighbor that lands just across one
    * hyperplane is recovered for (nBits+1)/2^nBits of the corpus scanned
    * instead of a full-recall exhaustive pass. Still one broadcast of a
    * tiny probe-bucket list; wider radii expand the flip combinations,
    * same plan shape.
    */
  def lshTopKMultiProbe(emb: DataFrame, queryId: Long, k: Int,
                        nBits: Int = 8): DataFrame = {
    val qb = bucketed(emb, nBits).filter(col("vec_id") === queryId)
      .select(col("bucket"))
    val flips = emb.sparkSession.range(nBits)
      .select(expr("CAST(pow(2, id) AS BIGINT)").as("flip"))
    val probes = qb.crossJoin(flips)
      .select(col("bucket").bitwiseXOR(col("flip")).as("bucket"))
      .unionByName(qb).distinct()
    probeTopK(emb, probes, queryId, k, nBits)
  }

  /** Late-interaction retrieval (ColBERT-style MaxSim — Khattab &
    * Zaharia, SIGIR'20): the embedding column is treated as m contiguous
    * token vectors (the PQ subspace convention applied to retrieval),
    * and score(q, d) = sum_i max_j cos(q_i, d_j) — each query subvector
    * finds its best-matching doc subvector, so partial/reordered matches
    * score where a single pooled cosine washes them out. m = 1 provably
    * degenerates to plain cosine ([[bruteForceTopK]] — spec-pinned).
    *
    * Scale shape: the query's m subvectors (+ norms) are collected once
    * (m·d/m = d doubles) and shipped as literals; per doc the m×m slice
    * cosines, the m row-wise maxes, and their sum are ONE codegen'd
    * projection over the scan (slice/zip_with/aggregate/greatest) —
    * zero shuffles, then TakeOrdered k. Degenerate (zero-norm) doc
    * subvectors contribute cosine -1 rather than NULL so `greatest`
    * stays total; docs whose dimension differs from the query's are
    * filtered out (a multi-vector column must be homogeneous).
    */
  def maxSimTopK(emb: DataFrame, queryId: Long, k: Int, m: Int): DataFrame = {
    require(m > 0, s"m must be positive, got $m")
    val qRow = emb.filter(col("vec_id") === queryId)
      .select(col("embedding")).head()
    val q = qRow.getSeq[Float](0).map(_.toDouble).toArray
    require(q.nonEmpty, s"maxSimTopK: query vector $queryId is empty")
    require(q.length % m == 0,
      s"maxSimTopK: dimension ${q.length} not divisible by m=$m")
    val sub = q.length / m
    val qSlices = (0 until m).map(i => q.slice(i * sub, (i + 1) * sub))
    val qNorms = qSlices.map(s => math.sqrt(s.map(x => x * x).sum))
    require(qNorms.forall(_ > 0), "maxSimTopK: zero-norm query subvector")

    val vd = vecD(col("embedding"))
    def dSlice(j: Int) = slice(vd, lit(j * sub + 1), lit(sub))
    val score = (0 until m).map { i =>
      val qi = typedLit(qSlices(i).toSeq)
      val cosines = (0 until m).map { j =>
        val dj = dSlice(j)
        val nj = normCol(dj)
        when(nj > 0, dotCol(dj, qi) / (nj * lit(qNorms(i))))
          .otherwise(lit(-1.0))
      }
      if (cosines.size == 1) cosines.head else greatest(cosines: _*)
    }.reduce(_ + _)

    emb.filter(size(col("embedding")) === q.length)
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), round(score, 6).as("maxsim"))
      .orderBy(desc("maxsim"), asc("vec_id"))
      .limit(k)
  }

  /** ANN quality evaluation — recall@k of the single-bucket LSH search
    * against exact brute force, per query: |ann top-k ∩ true top-k| / k.
    * The eval harness every production ANN deployment runs before
    * trusting an index (FAISS's own benchmarks report exactly this).
    *
    * Scale shape: the query SAMPLE is small by definition (an eval set,
    * not the corpus) — a driver loop issues two distributed top-k jobs
    * per query and collects k ids from each (bounded collects, the
    * [[graft.engine.SearchEngine]] merge model). Rounded to 6 dp like
    * every scored oracle.
    */
  def recallAtK(emb: DataFrame, queryIds: Seq[Long], k: Int,
                nBits: Int = 5): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    queryIds.map { qid =>
      val brute = bruteForceTopK(emb, qid, k)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      val ann = lshTopK(emb, qid, k, nBits)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      val recall = BigDecimal((ann & brute).size.toDouble / k)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (qid, recall)
    }.toDF("query_id", "recall")
  }

  /** k-NN GRAPH within k-means cells — the all-vectors sibling of the
    * single-query top-k and the building block of graph-ANN indexes
    * (NN-descent seeds, HNSW base layers) and SemDeDup-style curation:
    * every vector's k nearest neighbors AMONG ITS CELL'S MEMBERS by
    * cosine (ties to the lower vec_id), emitted as
    * (vec_a, vec_b, cosine, rnk 1-based).
    *
    * Scale shape: the cell id is a per-row argmin projection over the
    * kCells deterministic seed centroids (zero shuffles to derive — the
    * [[Dedup.semanticNearDupsKmeans]] pattern); candidates come from ONE
    * cluster equi-self-join whose pair volume is sum(cell^2), never N^2;
    * the top-k cut is one rank window partitioned by
    * (cluster, SOURCE VECTOR) — vec_a determines its cluster, so the
    * semantics equal a vec_a-only window, but hash(cluster) from the
    * join already satisfies the clustering requirement (subset rule) and
    * the sum(cell^2)-sized pair set is NEVER re-shuffled (KnnGraphSpec
    * asserts the single Exchange).
    */
  def knnGraph(emb: DataFrame, k: Int, kCells: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = Clustering.seedCentroids(emb, kCells)
    val rows = nonDegenerate(emb)
      .select(col("vec_id"),
        Clustering.bestStruct(col("embedding"), cents).getField("j").as("cluster"),
        vecD(col("embedding")).as("vd"))
      .withColumn("nrm", normCol(col("vd")))
    val pairs = rows.as("a").join(rows.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.cluster").as("cluster"),
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(dotCol(col("a.vd"), col("b.vd")) /
          (col("a.nrm") * col("b.nrm")), 6).as("cosine"))
    pairs
      .withColumn("rnk", row_number()
        .over(Window.partitionBy(col("cluster"), col("vec_a"))
          .orderBy(desc("cosine"), asc("vec_b")))
        .cast("long"))
      .filter(col("rnk") <= k)
      .select(col("vec_a"), col("vec_b"), col("cosine"), col("rnk"))
  }
}
