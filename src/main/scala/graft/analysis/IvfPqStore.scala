package graft.analysis

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ ANN index — the composition of the repo's two ANN
  * scale pieces into the classic production vector index: [[IvfStore]]'s
  * centroid-partitioned cells prune WHICH vectors a query reads, and
  * [[Quantization]]'s product-quantization codes shrink WHAT is stored
  * and scored. Same design lineage as the reference's persisted inverted
  * index (queries probe index/HashBlob.h:341-399 rather than re-deriving
  * it), with two compounding economies the raw IVF store lacks:
  *
  *  - **Storage**: the store holds `(vec_id, codes)` only — m small
  *    codes replace the d floats (m=4, k=8 over d=64 floats: 256 bytes
  *    -> 4 codes). At 10^9 x 768-dim vectors that is ~3 TB of floats
  *    reduced to the codes table; the raw embeddings table is never
  *    touched after build.
  *  - **Compute**: probe-time scoring is the asymmetric-distance (ADC)
  *    trick — per-subspace lookup tables <q_sub, centroid> built once on
  *    the driver, so each candidate costs m array lookups instead of a
  *    d-dim dot product.
  *
  * Codes are GLOBAL product-quantization codes (codebooks trained on the
  * raw vectors, not per-cell residuals — FAISS's `by_residual = false`
  * configuration). The residual variant buys recall at the cost of a
  * per-(cell, subspace, code) cross-term table for norm assembly
  * (kCells x m x k entries — a broadcast, not a literal, at production
  * sizes); the non-residual form keeps the probe a pure projection and
  * the trained books identical to [[Quantization.pqCodebooks]], which is
  * what lets the nprobe = kCells setting degenerate EXACTLY to
  * [[Quantization.pqTopK]] — the correctness anchor IvfPqStoreSpec pins.
  *
  * Everything is frozen at build time (the classic IVF/PQ contract):
  * cells route by the persisted centroid sidecar, codes encode by the
  * persisted codebook sidecar, so [[append]]ed rows land exactly where a
  * from-scratch build would put them and queries are oblivious to
  * growth. Deletes ride [[VectorMaintenance]]'s tombstone story at
  * O(delta) like both sibling stores.
  */
object IvfPqStore {

  /** Cell-centroid sidecar — same path convention as [[IvfStore]]. */
  def centroidsDir(storeDir: String): String = IvfStore.centroidsDir(storeDir)

  /** PQ codebook sidecar: rows (sub, cid, centroid: array<double>). */
  def codebooksDir(storeDir: String): String =
    storeDir.stripSuffix("/") + "_codebooks"

  /** Train the model and persist BOTH sidecars (no vectors added yet) —
    * the FAISS `index.train(sample)` phase. Cell centroids are the
    * deterministic seeds ([[Clustering.seedCentroids]], in lockstep with
    * [[IvfStore.build]]); PQ codebooks come from
    * [[Quantization.pqCodebooks]]' Lloyd steps over `train`. At
    * production scale `train` is a corpus SAMPLE (training cost is the
    * only piece that scans raw floats; a 10^6-row sample trains books as
    * well as 10^9 rows do) — everything downstream touches codes only.
    */
  def train(train: DataFrame, outDir: String, kCells: Int, m: Int, kCents: Int,
            iters: Int = 1): Unit = {
    val spark = train.sparkSession
    import spark.implicits._
    val cents = Clustering.seedCentroids(train, kCells)
    val books = Quantization.pqCodebooks(train, m, kCents, iters)
    cents.zipWithIndex.toSeq
      .map { case (c, j) => (j.toLong, c.toSeq) }
      .toDF("cluster", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(centroidsDir(outDir))
    books.zipWithIndex
      .flatMap { case (b, s) => b.map { case (cid, c) => (s.toLong, cid, c.toSeq) } }
      .toDF("sub", "cid", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(codebooksDir(outDir))
  }

  /** Train on `emb` and add all of it — the one-shot convenience
    * ([[train]] + [[add]]).
    */
  def build(emb: DataFrame, outDir: String, kCells: Int, m: Int, kCents: Int,
            iters: Int = 1): Unit = {
    train(emb, outDir, kCells, m, kCents, iters)
    add(emb, outDir)
  }

  /** Typed reader; `cluster` is a partition directory column, normalized
    * back to long (same convention as the sibling stores).
    */
  def load(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).withColumn("cluster", col("cluster").cast("long"))

  /** The persisted cell centroids (kCells x d — driver-tiny). */
  def loadCentroids(spark: SparkSession, dir: String): Array[(Long, Array[Double])] =
    IvfStore.loadCentroids(spark, dir)

  /** The persisted PQ codebooks, in [[Quantization.pqCodebooks]]' shape
    * (per-subspace (cid, centroid) seqs sorted by cid; m x k x d/m —
    * driver-tiny).
    */
  def loadCodebooks(spark: SparkSession, dir: String): Seq[Seq[(Long, Array[Double])]] = {
    val rows = spark.read.parquet(codebooksDir(dir))
      .select(col("sub"), col("cid"), col("centroid"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val m = (rows.map(_._1).max + 1).toInt
    (0 until m).map { s =>
      rows.filter(_._1 == s).map { case (_, cid, c) => (cid, c) }.toSeq.sortBy(_._1)
    }
  }

  /** Add vectors at delta cost — the FAISS `index.add(batch)` phase:
    * each batch routes by the FROZEN persisted centroids and encodes by
    * the FROZEN persisted codebooks, so adding in any batch split yields
    * a row-identical store (IvfPqStoreSpec pins two-batch == one-batch ==
    * the structural assign/encode of the union; that frozen-model
    * identity is exactly why queries are oblivious to growth). One
    * delta-sized shuffle, SaveMode Append, existing cell files
    * untouched. Caller contract: vec_ids disjoint from the store's.
    */
  def add(emb: DataFrame, outDir: String): Unit = {
    val spark = emb.sparkSession
    val books = loadCodebooks(spark, outDir)
    val dsub = books.head.head._2.length
    val best = Clustering.bestStructIds(col("embedding"),
      loadCentroids(spark, outDir).toSeq)
    Similarity.nonDegenerate(emb)
      .select(col("vec_id"),
        Quantization.pqAssignArray(books.length, dsub, books).as("codes"),
        best.getField("j").as("cluster"))
      .repartition(col("cluster"))
      .write.mode("append").partitionBy("cluster").parquet(outDir)
  }

  /** O(delta) delete: tombstones re-derive each deleted vector's cell
    * from its embedding against the frozen centroids — without reading
    * the store (same shape as [[IvfStore.markDeleted]]).
    *
    * @return number of distinct tombstones recorded
    */
  def markDeleted(emb: DataFrame, storeDir: String): Long = {
    val spark = emb.sparkSession
    val best = Clustering.bestStructIds(col("embedding"),
      loadCentroids(spark, storeDir).toSeq)
    VectorMaintenance.markDeleted(spark, storeDir, "cluster",
      emb.select(col("vec_id"), best.getField("j").as("cluster")))
  }

  /** Between-compactions live view: [[load]] minus pending tombstones. */
  def loadLive(spark: SparkSession, dir: String): DataFrame =
    VectorMaintenance.live(spark, load(spark, dir), dir, "cluster")

  /** Purge tombstoned vectors by rewriting ONLY tombstone-bearing cell
    * partitions; both sidecars stay frozen.
    *
    * @return the cells compacted
    */
  def compact(spark: SparkSession, storeDir: String): Set[Long] =
    VectorMaintenance.compact(spark, storeDir, "cluster")

  /** Query-time ANN over the persisted store: rank cells on the driver
    * (kCells x d arithmetic), read ONLY the nprobe probe-cell partitions
    * (PartitionFilters — IvfPqStoreSpec asserts it), ADC-score each
    * candidate's codes against the query's m x k lookup tables in one
    * codegen'd projection, TakeOrdered top-k. No shuffle, no corpus-wide
    * work, no access to the raw embeddings.
    */
  def topK(store: DataFrame, centroids: Array[(Long, Array[Double])],
           books: Seq[Seq[(Long, Array[Double])]], query: Array[Double],
           k: Int, nprobe: Int, excludeVecId: Long = -1L): DataFrame = {
    val probes = IvfStore.probeClusters(centroids, query, nprobe)
    store.filter(col("cluster").isin(probes: _*))
      .filter(col("vec_id") =!= excludeVecId)
      .select(col("vec_id"),
        Quantization.adcCosine(col("codes"), books, query).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }
}
