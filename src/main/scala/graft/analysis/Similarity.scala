package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings(vec_id, embedding: array<float>)`.
  *
  * Brute-force cosine top-k is the correctness baseline; the scale path
  * is sign-random-projection LSH: vectors land in 2^nBits buckets and the
  * search cross-joins only the query's bucket (a broadcast of one bucket
  * instead of the full corpus). Hyperplanes are pseudo-random but
  * deterministic — component i of plane j has sign = parity of
  * md5(j || '_' || i) — so Spark and the DuckDB oracles agree exactly.
  */
object Similarity {

  /** (vec_id, dim, v): one row per vector component, double-typed.
    * dim is 1-based to match SQL generate_subscripts (the dim VALUE feeds
    * the md5 hyperplane hashes, so the base matters for LSH parity).
    */
  def explodeDims(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") + 1).as("dim"),
        col("col").cast("double").as("v"))

  /** Cosine of every vector against the vector `queryId`, via the
    * dimension-exploded equi-join (SQL-mirrorable; summation order
    * differences are absorbed by rounding in the oracles).
    */
  def cosineToQuery(emb: DataFrame, queryId: Long): DataFrame = {
    val parts = explodeDims(emb)
    val q = parts.filter(col("vec_id") === queryId)
      .select(col("dim"), col("v").as("qv"))
    parts.join(broadcast(q), Seq("dim"))
      .groupBy(col("vec_id"))
      .agg(sum(col("v") * col("qv")).as("dot"),
        sqrt(sum(col("v") * col("v"))).as("nv"))
      .crossJoin(broadcast(
        q.agg(sqrt(sum(col("qv") * col("qv"))).as("nq"))))
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

  /** Sign-random-projection bucket per vector: bit j = 1 iff
    * sum_i sign(j, i) * v_i > 0, with sign(j, i) = +1 when
    * ascii(first hex char of md5(j || '_' || i)) is odd else -1.
    * Returns (vec_id, bucket) with bucket in [0, 2^nBits).
    */
  def lshBuckets(emb: DataFrame, nBits: Int = 8): DataFrame = {
    val parts = explodeDims(emb)
    val planes = emb.sparkSession.range(nBits)
      .select(col("id").cast("int").as("plane"))
    val signed = parts.crossJoin(broadcast(planes))
      .select(col("vec_id"), col("plane"),
        (col("v") * when(
          expr("ascii(substring(md5(concat(plane, '_', dim)), 1, 1)) % 2") === 1,
          lit(1.0)).otherwise(lit(-1.0))).as("sv"))
      .groupBy(col("vec_id"), col("plane"))
      .agg(sum(col("sv")).as("proj"))
    signed.groupBy(col("vec_id"))
      .agg(sum(when(col("proj") > 0, pow(lit(2.0), col("plane")).cast("long"))
        .otherwise(0L)).as("bucket"))
  }

  /** LSH-restricted ANN: cosine top-k among vectors sharing the query's
    * bucket. Recall < 1 by construction (bucket boundaries); at scale
    * probe neighboring buckets by Hamming distance for higher recall.
    */
  def lshTopK(emb: DataFrame, queryId: Long, k: Int, nBits: Int = 8): DataFrame = {
    val buckets = lshBuckets(emb, nBits)
    val qb = buckets.filter(col("vec_id") === queryId).select(col("bucket"))
    val candidates = buckets.join(broadcast(qb), Seq("bucket"))
      .select(col("vec_id"))
    cosineToQuery(emb.join(candidates, Seq("vec_id")), queryId)
      .filter(col("vec_id") =!= queryId)
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** Multi-probe LSH ANN: candidates come from the query's bucket PLUS
    * every bucket at Hamming distance 1 (each of the nBits sign bits
    * flipped) — the standard recall/cost point for SRP-LSH (Lv et al.,
    * VLDB'07 multi-probe): a near neighbor that lands just across one
    * hyperplane is recovered for (nBits+1)/2^nBits of the corpus scanned
    * instead of a full-recall exhaustive pass. Still one broadcast of a
    * tiny probe-bucket list + one equi-join; wider radii expand the flip
    * combinations, same plan shape.
    */
  def lshTopKMultiProbe(emb: DataFrame, queryId: Long, k: Int,
                        nBits: Int = 8): DataFrame = {
    val buckets = lshBuckets(emb, nBits)
    val qb = buckets.filter(col("vec_id") === queryId).select(col("bucket"))
    val flips = emb.sparkSession.range(nBits)
      .select(expr("CAST(pow(2, id) AS BIGINT)").as("flip"))
    val probes = qb.crossJoin(flips)
      .select(col("bucket").bitwiseXOR(col("flip")).as("bucket"))
      .unionByName(qb).distinct()
    val candidates = buckets.join(broadcast(probes), Seq("bucket"))
      .select(col("vec_id"))
    cosineToQuery(emb.join(candidates, Seq("vec_id")), queryId)
      .filter(col("vec_id") =!= queryId)
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }
}
