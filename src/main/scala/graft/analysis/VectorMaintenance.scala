package graft.analysis

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Shared delete/compact maintenance for the two persisted vector stores
  * ([[AnnStore]] bucket partitions, [[IvfStore]] cluster cells) — the
  * vector twin of the index's tombstone story
  * (graft.index.IndexBuilder.markDeleted/compact, itself the maintenance
  * path the reference lacks: its only delete is a full rebuild of the
  * static index, index/index.h:84-120):
  *
  *  - [[markDeleted]] appends (partition, vec_id) rows to a tiny sidecar
  *    tombstone table — O(delta); no store partition is read or written,
  *    so a delete over a 10^9-vector store costs the same as over 10^3.
  *    The partition value is re-derived by the CALLER from the deleted
  *    rows' embeddings with the same pure functions the build/append
  *    used (SRP content hash / frozen persisted centroids), which is
  *    what keeps compaction partition-pruned.
  *  - [[live]] is the between-compactions view: left_anti against the
  *    pending tombstones on (partition, vec_id) — the tombstone side is
  *    delta-sized, and the partition key keeps the store side's
  *    PartitionFilters intact for probe queries.
  *  - [[compact]] purges: rewrites ONLY tombstone-bearing partitions
  *    (partition-pruned read → row filter → dynamic partition overwrite,
  *    set per-writer so the session's overwrite mode is untouched),
  *    removes fully-emptied partition dirs (detected BEFORE the write —
  *    dynamic overwrite cannot replace a partition with zero output
  *    rows), then clears the tombstones. Unlike the index there is no
  *    blob state to re-encode: vectors are row-granular, so the
  *    compacted store is trivially row-identical to a from-scratch
  *    build over the survivors (VectorMaintenanceSpec pins it, plus
  *    file identity for untouched partitions).
  *
  * Crash ordering mirrors the index: the tombstone clear is LAST, and
  * every step is idempotent under re-run (the purge filter is a set
  * difference; re-overwriting already-purged partitions is a no-op).
  */
object VectorMaintenance {

  /** The tombstone sidecar's path for a store dir (sibling directory,
    * like IvfStore's `_centroids` sidecar — never inside the store, so
    * store readers cannot mistake it for a partition).
    */
  def tombstonesDir(storeDir: String): String =
    storeDir.stripSuffix("/") + "_tombstones"

  /** FS probes through the path's OWN FileSystem (Hadoop conf) — the
    * same dispatch rule as IndexBuilder.pathExists: java.io probes would
    * misreport every non-local URI.
    */
  private[analysis] def pathExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def deleteTree(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Record tombstones. `tomb` carries (partCol, vec_id) with the
    * partition value already derived (see class doc). Append-only and
    * duplicate-tolerant (compaction treats tombstones as a set).
    *
    * @return number of distinct tombstones recorded by this call
    */
  private[analysis] def markDeleted(spark: SparkSession, storeDir: String,
                                    partCol: String, tomb: DataFrame): Long = {
    require(pathExists(spark, storeDir),
      s"markDeleted: no vector store at $storeDir")
    val batch = tomb.select(col(partCol).cast("long").as(partCol),
      col("vec_id").cast("long").as("vec_id")).distinct().persist()
    try {
      val n = batch.count()
      if (n > 0L)
        batch.write.mode(SaveMode.Append).parquet(tombstonesDir(storeDir))
      n
    } finally batch.unpersist()
  }

  /** Pending tombstones as (partCol, vec_id), empty when none. */
  private[analysis] def pending(spark: SparkSession, storeDir: String,
                                partCol: String): DataFrame =
    if (!pathExists(spark, tombstonesDir(storeDir)))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(partCol,
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("vec_id",
            org.apache.spark.sql.types.LongType))))
    else spark.read.parquet(tombstonesDir(storeDir))
      .select(col(partCol), col("vec_id"))

  /** The between-compactions live view over a loaded store frame. */
  private[analysis] def live(spark: SparkSession, store: DataFrame,
                             storeDir: String, partCol: String): DataFrame =
    store.join(pending(spark, storeDir, partCol),
      Seq(partCol, "vec_id"), "left_anti")

  /** Purge tombstoned vectors; see class doc for the cost model and
    * crash ordering.
    *
    * @return the partitions compacted (tombstone-bearing partitions)
    */
  private[analysis] def compact(spark: SparkSession, storeDir: String,
                                partCol: String): Set[Long] = {
    if (!pathExists(spark, tombstonesDir(storeDir))) return Set.empty
    val tombs = pending(spark, storeDir, partCol)
    val affectedSeq = tombs.select(col(partCol)).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    if (affectedSeq.isEmpty) {
      deleteTree(spark, tombstonesDir(storeDir)); return Set.empty
    }
    val affected = col(partCol).isin(affectedSeq: _*)
    val raw = spark.read.parquet(storeDir)
      .withColumn(partCol, col(partCol).cast("long"))
    val liveAffected = raw.filter(affected)
      .join(tombs, Seq(partCol, "vec_id"), "left_anti")

    // emptied partitions must be known BEFORE the write (pre-commit read)
    val survivorCounts = liveAffected.groupBy(col(partCol)).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val emptied = affectedSeq.filterNot(p => survivorCounts.getOrElse(p, 0L) > 0L)

    liveAffected.repartition(col(partCol))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol).parquet(storeDir)
    emptied.foreach(p => deleteTree(spark, s"$storeDir/$partCol=$p"))
    deleteTree(spark, tombstonesDir(storeDir))
    affectedSeq.toSet
  }
}
