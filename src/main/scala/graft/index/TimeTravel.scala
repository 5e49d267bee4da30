package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.GraftExpressions

/** Time-travel reads over a maintained index — the Iceberg
  * snapshot-read analog for the engine's own tables. Every maintenance
  * operation moves docIds strictly upward (appendBuild requires
  * strictly-newer docIds, mergeIndexes shifts the source segment above
  * the destination's high-water mark, compact never reuses ids) and
  * appends its extent to the lineage table, so a docId high-water mark
  * IS a snapshot id: "the index as of mark M" = exactly the postings
  * and docs with docId <= M. No copy-on-write, no snapshot files — the
  * lineage the build already checkpoints doubles as the snapshot log.
  *
  * Scale shape: the chunk layout is docId-aligned (chunk = docId div
  * chunkDocs), so an as-of read prunes to partitions
  * `chunk <= M div chunkDocs` BEFORE any decode — a query against a
  * year-old mark over a 10^5-chunk index opens only the historical
  * partitions' footers. Within the one boundary chunk the mark splits,
  * per-doc filtering decodes the posting blob ([[GraftExpressions]]
  * posting_tfs) and keeps entries with docId <= M; positions are
  * doc-local, so dropped tail docs never affect surviving entries (the
  * same invariant compact relies on).
  */
object TimeTravel {

  /** The snapshot log: distinct lineage docId high-water marks in
    * ascending order. Lineage rows are per (stage, chunk)
    * (IndexBuilder.scala:1211-1236), so these are chunk-granular cut
    * points; each operation's own high-water mark is the largest one it
    * appended. Because docIds only move upward, EVERY value M here (and
    * in fact any docId at all) names a consistent corpus-prefix state —
    * the marks are just the labels the build already wrote down.
    */
  def marks(spark: SparkSession, idxDir: String): Seq[Long] = {
    require(IndexBuilder.pathExists(spark, IndexBuilder.lineageDir(idxDir)),
      s"marks: no lineage at $idxDir")
    import spark.implicits._
    spark.read.parquet(IndexBuilder.lineageDir(idxDir))
      .filter(col("status") === "complete")
      .select(col("docMax")).distinct().as[Long]
      .collect().sorted.toSeq
  }

  private def chunkDocsOf(spark: SparkSession, idxDir: String): Long =
    IndexStore.readStats(spark, idxDir)
      .agg(max(col("chunkDocs"))).head().getLong(0)

  /** Postings pruned to the snapshot: partition-pruned to the historical
    * chunks, then blob-decoded and per-doc filtered in the ONE boundary
    * chunk the mark splits (cheap everywhere else — for fully-covered
    * chunks the filter keeps every decoded entry). Emits
    * (chunk, term, docId, tf) rows.
    */
  def postingsAsOf(spark: SparkSession, idxDir: String,
                   asOfDocMax: Long): DataFrame = {
    require(asOfDocMax >= 0, "asOfDocMax must be >= 0")
    val posts = IndexStore.readPostings(spark, idxDir).toDF()
    val cd = chunkDocsOf(spark, idxDir)
    // legacy stats without chunkDocs (sentinel -1): skip the partition
    // prune rather than pruning with a guessed geometry
    val pruned = if (cd > 0) posts.filter(col("chunk") <= asOfDocMax / cd)
                 else posts
    pruned.select(col("chunk"), col("term"),
        explode(GraftExpressions.posting_tfs(col("df"), col("postingsBlob")))
          .as("p"))
      .filter(col("p.docId") <= asOfDocMax)
      .select(col("chunk"), col("term"),
        col("p.docId").as("docId"), col("p.tf").cast("long").as("tf"))
  }

  /** Postings in the (fromMark, toMark] docId window — "what changed
    * between two snapshots", the incremental-consumer read (Iceberg's
    * changelog scan analog). Prunes to the chunk RANGE the window spans
    * before any decode, then per-doc filters the (at most two) boundary
    * chunks' blobs.
    */
  def postingsBetween(spark: SparkSession, idxDir: String,
                      fromMark: Long, toMark: Long): DataFrame = {
    require(fromMark >= -1 && toMark >= fromMark,
      s"need -1 <= fromMark <= toMark, got ($fromMark, $toMark]")
    val posts = IndexStore.readPostings(spark, idxDir).toDF()
    val cd = chunkDocsOf(spark, idxDir)
    val pruned =
      if (cd > 0)
        posts.filter(col("chunk") >= (fromMark + 1) / cd &&
          col("chunk") <= toMark / cd)
      else posts
    pruned.select(col("chunk"), col("term"),
        explode(GraftExpressions.posting_tfs(col("df"), col("postingsBlob")))
          .as("p"))
      .filter(col("p.docId") > fromMark && col("p.docId") <= toMark)
      .select(col("chunk"), col("term"),
        col("p.docId").as("docId"), col("p.tf").cast("long").as("tf"))
  }

  /** Per-term stats DELTA between two snapshots: what one maintenance
    * window (e.g. an appendBuild) contributed. Must equal a fresh build
    * over only the docs in (fromMark, toMark] — the q_timetravel_delta
    * oracle pins it against tokenization truth on that doc window.
    */
  def termStatsDelta(spark: SparkSession, idxDir: String,
                     fromMark: Long, toMark: Long): DataFrame =
    postingsBetween(spark, idxDir, fromMark, toMark)
      .filter(!col("term").startsWith("#"))
      .groupBy(col("term"))
      .agg(sum(col("tf")).as("tf"), count(lit(1)).as("df"))

  /** Per-term corpus stats as of the mark — must equal what a fresh
    * build over only the docs <= mark would report (the q_timetravel
    * oracle pins it against tokenization truth). Body terms only
    * ('#'-prefixed title terms excluded, like the other stats queries).
    *
    * History retention: [[IndexBuilder.compact]] physically purges
    * tombstoned docs, so marks older than a compaction replay the
    * SURVIVORS' prefix, not the original corpus — exactly Iceberg's
    * snapshot-expiry semantics (compact = expire). TimeTravelSpec pins
    * this contract.
    */
  def termStatsAsOf(spark: SparkSession, idxDir: String,
                    asOfDocMax: Long): DataFrame =
    postingsAsOf(spark, idxDir, asOfDocMax)
      .filter(!col("term").startsWith("#"))
      .groupBy(col("term"))
      .agg(sum(col("tf")).as("tf"), count(lit(1)).as("df"))

  /** The document store as of the mark: one partition-pruned filter
    * (docs are chunk-partitioned on the same geometry).
    */
  def docsAsOf(spark: SparkSession, idxDir: String,
               asOfDocMax: Long): DataFrame = {
    val docs = IndexStore.readDocs(spark, idxDir).toDF()
    val cd = chunkDocsOf(spark, idxDir)
    val pruned = if (cd > 0) docs.filter(col("chunk") <= asOfDocMax / cd)
                 else docs
    pruned.filter(col("docId") <= asOfDocMax)
  }
}
