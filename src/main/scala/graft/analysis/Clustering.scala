package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic k-means (Lloyd) building blocks over
  * `embeddings(vec_id, embedding: array<float>)` — the clustering
  * primitive of corpus curation (topic bucketing, diversity-aware
  * sampling, semantic-dedup pre-grouping).
  *
  * Scale shape:
  *  - seeding is deterministic (the embeddings of the k smallest
  *    vec_ids), so there is no RNG to reconcile across engines;
  *  - assignment is a per-row argmin over the k driver-collected
  *    centroids folded into ONE codegen'd projection (each centroid's
  *    dist2 is a zip_with/aggregate over the embedding array) — zero
  *    shuffles, nothing per-dimension ever crosses the wire;
  *  - the update step posexplodes dimensions INTO a partial aggregate,
  *    so its exchange carries numPartitions x k x d partial sums —
  *    independent of N. (Contrast with the round-2 ANN bucketing this
  *    repo removed, which exploded N x d rows through an exchange for a
  *    per-row-computable value; here the cross-row mean genuinely needs
  *    the aggregation, and partial agg keeps it flat.)
  *
  * Cross-engine float caveat: dist2 / centroid norms are summed in
  * different orders by Spark and the SQL oracles; round(…, 6) absorbs
  * the ulp drift (same convention as the cosine oracles).
  */
object Clustering {

  /** The k seed centroids: embeddings of the k smallest vec_ids, as
    * (cluster = rank in vec_id order, vector) — k x d doubles collected
    * to the driver (tiny by construction; k is user-chosen, not
    * data-sized).
    */
  def seedCentroids(emb: DataFrame, k: Int): Array[Array[Double]] = {
    val rows = emb.orderBy(col("vec_id")).limit(k)
      .select(Similarity.vecD(col("embedding")).as("v"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(rows.length == k, s"corpus has ${rows.length} < $k vectors")
    rows
  }

  /** Squared L2 distance to one literal centroid as a codegen'd
    * projection over the embedding array.
    */
  private def dist2Col(embedding: Column, c: Array[Double]): Column =
    aggregate(
      zip_with(Similarity.vecD(embedding), typedLit(c), (x, y) => (x - y) * (x - y)),
      lit(0.0d), _ + _)

  /** (argmin cluster, min dist2) over the k seed centroids, with
    * cluster id = seed rank — a thin wrapper over [[bestStructIds]] so
    * the tie-breaking argmin fold (strict `<` in ascending id order ->
    * ties go to the LOWEST id, mirrored by the oracle's
    * `ORDER BY dist2, cid` row_number) lives in exactly one place.
    */
  private[analysis] def bestStruct(embedding: Column, cents: Array[Array[Double]]): Column =
    bestStructIds(embedding,
      cents.zipWithIndex.map { case (c, j) => (j.toLong, c) }.toSeq)

  /** Assign every vector to its nearest seed centroid:
    * (vec_id, cluster, dist2 rounded to 6). Zero shuffles — one
    * projection over the scan.
    */
  def assign(emb: DataFrame, k: Int): DataFrame =
    assignWith(emb,
      seedCentroids(emb, k).zipWithIndex.map { case (c, j) => (j.toLong, c) }.toSeq)

  /** (argmin cluster, min dist2) over EXPLICIT (id, centroid) pairs —
    * the generalization of [[bestStruct]] used after update steps, where
    * clusters that lost every member disappear (both engines drop them:
    * the SQL oracle's mean CTE simply has no rows for them).
    */
  private[analysis] def bestStructIds(embedding: Column,
                                      cents: Seq[(Long, Array[Double])]): Column = {
    val candidates = array(cents.map { case (id, c) =>
      struct(dist2Col(embedding, c).as("d"), lit(id).as("j"))
    }: _*)
    aggregate(candidates,
      struct(lit(Double.MaxValue).as("d"), lit(-1L).as("j")),
      (acc, x) => when(x.getField("d") < acc.getField("d"), x).otherwise(acc))
  }

  /** `iters` full Lloyd update steps from the deterministic seeds: each
    * step assigns every vector to its nearest current centroid (per-row
    * argmin projection — zero shuffles) and re-centers each non-empty
    * cluster at its member mean (partial-agg (cluster, dim) means — a
    * k x d driver collect per step, independent of N). Clusters that
    * lose all members drop out, mirroring the SQL oracle's mean CTE.
    * Returns (cluster_id, centroid) sorted by id; ids are stable across
    * steps (a surviving cluster keeps its seed id).
    */
  def iteratedCentroids(emb: DataFrame, k: Int, iters: Int): Seq[(Long, Array[Double])] = {
    var cents: Seq[(Long, Array[Double])] =
      seedCentroids(emb, k).zipWithIndex.map { case (c, j) => (j.toLong, c) }.toSeq
    // the vector dimension comes free with the seeds (no extra Spark job)
    val dim = cents.head._2.length
    (1 to iters).foreach { _ =>
      val best = bestStructIds(col("embedding"), cents)
      val means = emb.select(best.getField("j").as("cluster"), col("embedding"))
        .select(col("cluster"), posexplode(col("embedding")))
        .select(col("cluster"), col("pos"), col("col").cast("double").as("v"))
        .groupBy(col("cluster"), col("pos")).agg(avg(col("v")).as("m"))
        .collect()
      cents = means.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map { case (cid, rows) =>
        val c = new Array[Double](dim)
        rows.foreach(r => c(r.getInt(1)) = r.getDouble(2))
        (cid, c)
      }
    }
    cents
  }

  /** Assignment against explicit centroids (e.g. from
    * [[iteratedCentroids]]): (vec_id, cluster, dist2 rounded to 6), the
    * same zero-shuffle projection shape as [[assign]].
    */
  def assignWith(emb: DataFrame, cents: Seq[(Long, Array[Double])]): DataFrame = {
    val best = bestStructIds(col("embedding"), cents)
    emb.select(col("vec_id"),
      best.getField("j").as("cluster"),
      round(best.getField("d"), 6).as("dist2"))
  }

  /** One Lloyd update step, digested per cluster: membership count and
    * the L2 norm of the new (mean) centroid — a scalar the SQL oracle
    * can compare without array equality. Exchange volume:
    * numPartitions x k x d partial (cluster, dim) sums, then k x d
    * means into the final k rows.
    */
  def updateStats(emb: DataFrame, k: Int): DataFrame = {
    val best = bestStruct(col("embedding"), seedCentroids(emb, k))
    // two selects: the argmin-struct getField must resolve BEFORE the
    // generator select (posexplode's resolution path drops the lambda
    // struct's field names when both sit in one projection list)
    emb.select(col("embedding"), best.getField("j").as("cluster"))
      .select(col("cluster"), posexplode(col("embedding")))
      .select(col("cluster"), (col("pos") + 1).as("dim"),
        col("col").cast("double").as("v"))
      .groupBy(col("cluster"), col("dim"))
      .agg(avg(col("v")).as("m"), count(lit(1)).as("n"))
      .groupBy(col("cluster"))
      .agg(max(col("n")).as("n_vecs"),
        round(sqrt(sum(col("m") * col("m"))), 6).as("centroid_norm"))
  }
}
