package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Versioned, replay-idempotent corpus-statistics store: the persisted
  * per-language token-length histogram grid
  * (`TextAnalysis.lengthHistogram` shape — langs × bins, bounded),
  * maintained incrementally as document deltas land.
  *
  * Layout under `dir`:
  *   - `meta/`            — one row: (bin_width) frozen at init
  *   - `grid/v=<mark>/`   — the grid covering every docId <= mark
  *
  * The VERSION IS THE COMMIT: a batch merges the current grid with its
  * delta histogram and writes the result to a NEW `v=<newMark>` dir; the
  * high-water mark and the grid are one artifact, so there is no window
  * where one is visible without the other. Readers accept only versions
  * whose dir carries Spark's `_SUCCESS` marker, so a half-written
  * version is invisible and [[applyBatch]] recomputes it from stable
  * inputs (the previous grid + the re-delivered batch) — a full or
  * partial foreachBatch replay rewrites the SAME content into the SAME
  * dir (exactly-once EFFECT from at-least-once delivery, the
  * appendToIndex contract restated for an aggregate). Old versions stay
  * readable ([[gridAsOf]] — time travel for corpus stats) until
  * [[expire]] prunes them.
  *
  * Scale shape: the only corpus-proportional work per batch is the
  * delta's own histogram aggregation (one bounded partial-agg exchange);
  * the merge is a full-outer sum of two GRID-sized tables and the write
  * is coalesce(1) of a grid-sized result. Deltas must carry
  * monotonically increasing doc_ids (the same daily-delta landing
  * contract as IndexBuilder.appendBuild).
  */
object StatsStore {

  private def metaDir(dir: String) = s"$dir/meta"
  private def gridRoot(dir: String) = s"$dir/grid"
  private def versionDir(dir: String, mark: Long) = s"${gridRoot(dir)}/v=$mark"

  /** Versions with a _SUCCESS marker, ascending. */
  private def completeVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(gridRoot(dir))
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .filter(s => fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .sorted
  }

  /** The docId high-water mark of the newest COMPLETE grid version
    * (-1L before any init — doc_ids are non-negative).
    */
  def currentVersion(spark: SparkSession, dir: String): Long =
    completeVersions(spark, dir).lastOption.getOrElse(-1L)

  def binWidth(spark: SparkSession, dir: String): Long =
    spark.read.parquet(metaDir(dir)).select(col("bin_width"))
      .head().getLong(0)

  /** Initialize the store over a (possibly empty) base corpus. */
  def init(docs: DataFrame, dir: String, binWidth: Long): Unit = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val spark = docs.sparkSession
    import spark.implicits._
    Seq(binWidth).toDF("bin_width").coalesce(1)
      .write.mode(SaveMode.ErrorIfExists).parquet(metaDir(dir))
    val mark = docs.agg(coalesce(max(col("doc_id")), lit(-1L)))
      .head().getLong(0)
    graft.analysis.TextAnalysis.lengthHistogram(docs, binWidth)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(versionDir(dir, mark))
  }

  /** The newest complete grid (lang, bin, n_docs). */
  def grid(spark: SparkSession, dir: String): DataFrame =
    gridAsOf(spark, dir, Long.MaxValue)

  /** Time travel: the newest complete grid whose high-water mark is
    * <= `mark` — corpus stats exactly as they stood after the batch that
    * landed that mark (versions are batch-granular, like index lineage).
    */
  def gridAsOf(spark: SparkSession, dir: String, mark: Long): DataFrame = {
    val vs = completeVersions(spark, dir).filter(_ <= mark)
    require(vs.nonEmpty, s"no complete grid version <= $mark under $dir")
    spark.read.parquet(versionDir(dir, vs.last))
      .select(col("lang"), col("bin"), col("n_docs"))
  }

  /** Fold one delta batch in. Rows at or below the current mark are
    * trimmed (already counted); an effectively-empty batch no-ops. The
    * new version's content derives only from the previous COMPLETE grid
    * and the trimmed batch, so replaying a batch — after full OR partial
    * application — rewrites identical content (overwrite of the same
    * version dir) and the store never double-counts.
    */
  def applyBatch(spark: SparkSession, batch: DataFrame, dir: String): Unit = {
    val bw = binWidth(spark, dir)
    val v0 = currentVersion(spark, dir)
    val fresh = batch.filter(col("doc_id") > v0)
    val newMark = fresh.agg(coalesce(max(col("doc_id")), lit(-1L)))
      .head().getLong(0)
    if (newMark <= v0) return // nothing new (replay of a fully-applied batch)
    val delta = graft.analysis.TextAnalysis.lengthHistogram(fresh, bw)
    val merged = grid(spark, dir).unionByName(delta)
      .groupBy(col("lang"), col("bin"))
      .agg(sum(col("n_docs")).as("n_docs"))
    merged.coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(versionDir(dir, newMark))
  }

  /** Drop all complete versions but the newest `keep` (incomplete dirs —
    * crash debris without _SUCCESS — are removed too). Safe at any time:
    * applyBatch only ever reads the NEWEST complete version.
    */
  def expire(spark: SparkSession, dir: String, keep: Int = 1): Unit = {
    require(keep >= 1, "must keep at least the newest version")
    val root = new org.apache.hadoop.fs.Path(gridRoot(dir))
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val complete = completeVersions(spark, dir)
    val keepSet = complete.takeRight(keep).toSet
    fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .filter(s => !keepSet.contains(s.getPath.getName.stripPrefix("v=").toLong))
      .foreach(s => fs.delete(s.getPath, true))
  }

  /** Streaming maintenance: document deltas landing in `srcDir` fold
    * into the store per micro-batch — the corpus-stats sibling of
    * [[StreamingIngest.appendToIndex]], idempotent under foreachBatch
    * replay by the version-is-the-commit contract above.
    */
  def appendToStatsStore(spark: SparkSession, srcDir: String, dir: String,
                         checkpointDir: String) = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(spark, batch, dir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
