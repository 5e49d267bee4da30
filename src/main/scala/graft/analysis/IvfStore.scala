package graft.analysis

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF (inverted-file) ANN index — the centroid-partitioned
  * sibling of [[AnnStore]]'s SRP-bucket store, completing the two
  * classic ANN scale paths (LSH buckets and IVF cells). Same design
  * lineage as the reference's persisted inverted index (queries probe
  * index/HashBlob.h:341-399 instead of re-deriving it), with k-means
  * cells in place of term postings:
  *
  *  - [[build]] assigns every vector to its nearest seed centroid
  *    ([[Clustering]]'s deterministic seeds + per-row argmin projection
  *    — zero shuffles for the assignment itself), then writes the
  *    vectors PARTITIONED BY cluster (one repartition co-locates each
  *    cell). The k centroids (k x d doubles — driver-tiny) persist in a
  *    `<dir>_centroids` sidecar so query time never touches the
  *    original embeddings table.
  *  - [[topK]] ranks the k centroids against the query vector ON THE
  *    DRIVER (a pure k x d computation), then reads ONLY the `nprobe`
  *    nearest cells' partition directories (PartitionFilters —
  *    IvfStoreSpec asserts it) and scores candidates with the one
  *    codegen'd cosine projection. Query cost = the probed cells' size,
  *    never the corpus size; `nprobe` is the recall/cost knob
  *    (nprobe = k degenerates to exact brute force — the correctness
  *    anchor the spec pins against [[Similarity.bruteForceTopK]]).
  *
  * At 10^9 vectors x 1000 cells, a cell is ~10^6 vectors; an
  * nprobe=8 query scans ~0.8% of the corpus with zero shuffles and no
  * driver-side data movement beyond the k x d centroid table.
  */
object IvfStore {

  /** The centroid sidecar's path for a store dir. */
  def centroidsDir(storeDir: String): String =
    storeDir.stripSuffix("/") + "_centroids"

  /** Build the cluster-partitioned store + centroid sidecar. One shuffle
    * (repartition by cluster) co-locates each cell so the sink writes
    * one file set per cell directory instead of tasks x cells fragments.
    */
  def build(emb: DataFrame, outDir: String, k: Int): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = Clustering.seedCentroids(emb, k)
    val best = Clustering.bestStruct(col("embedding"), cents)
    emb.select(col("vec_id"), col("embedding"), best.getField("j").as("cluster"))
      .repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(outDir)
    cents.zipWithIndex.toSeq
      .map { case (c, j) => (j.toLong, c.toSeq) }
      .toDF("cluster", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(centroidsDir(outDir))
  }

  /** Incremental append: assign the delta against the PERSISTED centroid
    * sidecar (cells are frozen at build time — the classic IVF contract;
    * re-train when distribution drift degrades recall) and land it in the
    * cell partitions at delta cost (one delta-sized shuffle, SaveMode
    * Append, existing cell files untouched). Queries are oblivious, and
    * the nprobe = k setting stays EXACT brute force over the grown corpus
    * no matter how the delta was assigned (IvfStoreSpec pins both).
    * Caller contract: vec_ids disjoint from the store's.
    */
  def append(emb: DataFrame, outDir: String): Unit = {
    val spark = emb.sparkSession
    val best = Clustering.bestStructIds(col("embedding"),
      loadCentroids(spark, outDir).map { case (j, c) => (j, c) }.toSeq)
    emb.select(col("vec_id"), col("embedding"), best.getField("j").as("cluster"))
      .repartition(col("cluster"))
      .write.mode("append").partitionBy("cluster").parquet(outDir)
  }

  /** Replay-idempotent append — the streaming-maintenance entry point
    * (the IVF twin of [[AnnStore.appendIdempotent]]; fed by
    * graft.streaming.StreamingIngest.appendToIvfStore's at-least-once
    * foreachBatch micro-batches). The delta is routed by the FROZEN
    * persisted centroids exactly as [[append]] routes it — so a
    * replayed row lands in the same cell it first landed in, which is
    * what makes a per-cell probe a complete replay guard — then
    * anti-joined against the store rows in ONLY the cells the delta
    * touches (partition-pruned read, delta-proportional IO). Re-running
    * a committed batch appends nothing; an overlapping batch appends
    * just its genuinely-new rows. Unlike the AnnStore twin this CANNOT
    * create a missing store: cells are frozen at build time, so there
    * are no centroids to route by before [[build]] has run.
    *
    * @return rows actually appended
    */
  def appendIdempotent(emb: DataFrame, outDir: String): Long = {
    val spark = emb.sparkSession
    require(VectorMaintenance.pathExists(spark, outDir),
      s"IvfStore.appendIdempotent: no store at $outDir (build first — cells are frozen at build time)")
    val best = Clustering.bestStructIds(col("embedding"),
      loadCentroids(spark, outDir).map { case (j, c) => (j, c) }.toSeq)
    val routed = emb.select(col("vec_id"), col("embedding"),
      best.getField("j").as("cluster")).persist()
    try {
      val touched = routed.select(col("cluster")).distinct()
        .collect().map(_.getLong(0)).toSeq
      if (touched.isEmpty) return 0L
      val existing = load(spark, outDir)
        .filter(col("cluster").isin(touched: _*))
        .select(col("cluster"), col("vec_id"))
      val fresh = routed.join(existing, Seq("cluster", "vec_id"), "left_anti")
        .persist()
      try {
        val n = fresh.count() // materialized BEFORE the append commit
        if (n > 0L)
          fresh.repartition(col("cluster"))
            .write.mode("append").partitionBy("cluster").parquet(outDir)
        n
      } finally fresh.unpersist()
    } finally routed.unpersist()
  }

  /** Typed reader; `cluster` is a partition directory column, normalized
    * back to long (same convention as AnnStore.load / IndexStore).
    */
  def load(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).withColumn("cluster", col("cluster").cast("long"))

  /** O(delta) delete: tombstone rows re-derive their cell from the
    * deleted vectors' embeddings against the FROZEN persisted centroids
    * — exactly how [[append]] routed them in, so the tombstone lands in
    * the partition that holds the row without reading the store. (A
    * vector deleted before ever being appended is a harmless no-op
    * tombstone: compact's set difference ignores it.)
    *
    * @return number of distinct tombstones recorded
    */
  def markDeleted(emb: DataFrame, storeDir: String): Long = {
    val spark = emb.sparkSession
    val best = Clustering.bestStructIds(col("embedding"),
      loadCentroids(spark, storeDir).map { case (j, c) => (j, c) }.toSeq)
    VectorMaintenance.markDeleted(spark, storeDir, "cluster",
      emb.select(col("vec_id"), best.getField("j").as("cluster")))
  }

  /** Between-compactions live view: [[load]] minus pending tombstones
    * (left_anti on (cluster, vec_id); cell-key join keeps probe-time
    * PartitionFilters intact).
    */
  def loadLive(spark: SparkSession, dir: String): DataFrame =
    VectorMaintenance.live(spark, load(spark, dir), dir, "cluster")

  /** Purge tombstoned vectors by rewriting ONLY tombstone-bearing cell
    * partitions; the centroid sidecar is untouched (cells stay frozen —
    * the classic IVF contract, same as [[append]]).
    *
    * @return the cells compacted
    */
  def compact(spark: SparkSession, storeDir: String): Set[Long] =
    VectorMaintenance.compact(spark, storeDir, "cluster")

  /** The k persisted centroids, driver-side (k x d — tiny by
    * construction; k is user-chosen, not data-sized).
    */
  def loadCentroids(spark: SparkSession, dir: String): Array[(Long, Array[Double])] =
    spark.read.parquet(centroidsDir(dir))
      .select(col("cluster"), col("centroid"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  /** The `nprobe` cells nearest to `query`, by squared L2 distance to
    * each centroid — ties to the lowest cluster id, the same (dist2,
    * cluster) order the SQL oracle's `ORDER BY dist2, cid LIMIT n`
    * replays. Pure driver-side arithmetic; no Spark job.
    */
  def probeClusters(centroids: Array[(Long, Array[Double])], query: Array[Double],
                    nprobe: Int): Seq[Long] =
    centroids.map { case (j, c) =>
      var d = 0.0
      var i = 0
      while (i < query.length) {
        val diff = query(i) - c(i); d += diff * diff; i += 1
      }
      (j, d)
    }.sortBy { case (j, d) => (d, j) }.take(nprobe).map(_._1).toSeq

  /** Query-time ANN over the persisted store: rank cells on the driver,
    * read ONLY the nprobe probe-cell partitions, cosine as one codegen'd
    * projection, TakeOrdered top-k. No shuffle, no corpus-wide work, no
    * access to the original embeddings table.
    */
  def topK(store: DataFrame, centroids: Array[(Long, Array[Double])],
           query: Array[Double], k: Int, nprobe: Int,
           excludeVecId: Long = -1L): DataFrame = {
    val probes = probeClusters(centroids, query, nprobe)
    val qlit = typedLit(query.toSeq)
    val nq = math.sqrt(query.map(x => x * x).sum)
    val vd = Similarity.vecD(col("embedding"))
    store.filter(col("cluster").isin(probes: _*))
      .filter(col("vec_id") =!= excludeVecId)
      .select(col("vec_id"),
        round(Similarity.dotCol(vd, qlit) /
          (Similarity.normCol(vd) * lit(nq)), 6).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }
}
