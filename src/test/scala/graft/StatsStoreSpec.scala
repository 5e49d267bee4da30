package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.analysis.TextAnalysis
import graft.streaming.StatsStore

/** Versioned streaming corpus-stats store: every incremental state must
  * equal a from-scratch lengthHistogram over exactly the docs covered by
  * its high-water mark — after init, after each delta batch, after a
  * FULL replay (re-delivered batch no-ops) and a PARTIAL replay (version
  * dir written without its _SUCCESS marker is invisible and gets
  * rewritten), as-of any historical mark, and through the streaming
  * foreachBatch maintenance loop.
  */
class StatsStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val BW = 4L

  /** Deterministic docs: token count i%23 spreads across bins, three
    * languages. */
  private def docs(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map { i =>
      val lang = Seq("en", "de", "fr")((i % 3).toInt)
      val text = Seq.tabulate((i % 23).toInt)(j => s"w$j").mkString(" ")
      (i, lang, text)
    }.toDF("doc_id", "lang", "text")
  }

  private def gridSet(df: DataFrame): Set[(String, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def expectUpTo(mark: Long): Set[(String, Long, Long)] =
    gridSet(TextAnalysis.lengthHistogram(docs(0L to mark), BW))

  test("init + two delta batches: each version equals a fresh histogram over its prefix") {
    val dir = SparkTestBase.tempDir("graft_stats")
    StatsStore.init(docs(0L to 19L), dir, BW)
    assert(StatsStore.currentVersion(spark, dir) === 19L)
    assert(gridSet(StatsStore.grid(spark, dir)) === expectUpTo(19L))

    StatsStore.applyBatch(spark, docs(20L to 34L), dir)
    assert(StatsStore.currentVersion(spark, dir) === 34L)
    assert(gridSet(StatsStore.grid(spark, dir)) === expectUpTo(34L))

    StatsStore.applyBatch(spark, docs(35L to 49L), dir)
    assert(StatsStore.currentVersion(spark, dir) === 49L)
    assert(gridSet(StatsStore.grid(spark, dir)) === expectUpTo(49L))

    // time travel: as-of marks between versions resolve to the newest
    // version at-or-below the mark
    assert(gridSet(StatsStore.gridAsOf(spark, dir, 19L)) === expectUpTo(19L))
    assert(gridSet(StatsStore.gridAsOf(spark, dir, 33L)) === expectUpTo(19L))
    assert(gridSet(StatsStore.gridAsOf(spark, dir, 34L)) === expectUpTo(34L))
    assert(gridSet(StatsStore.gridAsOf(spark, dir, 1000L)) === expectUpTo(49L))
  }

  test("full replay no-ops; overlapping rows at or below the mark are trimmed") {
    val dir = SparkTestBase.tempDir("graft_stats_replay")
    StatsStore.init(docs(0L to 9L), dir, BW)
    StatsStore.applyBatch(spark, docs(10L to 19L), dir)
    val before = gridSet(StatsStore.grid(spark, dir))

    // exact re-delivery of a fully-applied batch: no new version, no
    // double count
    StatsStore.applyBatch(spark, docs(10L to 19L), dir)
    assert(StatsStore.currentVersion(spark, dir) === 19L)
    assert(gridSet(StatsStore.grid(spark, dir)) === before)

    // a batch straddling the mark: rows <= 19 already counted and must
    // be trimmed, rows 20..24 folded exactly once
    StatsStore.applyBatch(spark, docs(15L to 24L), dir)
    assert(StatsStore.currentVersion(spark, dir) === 24L)
    assert(gridSet(StatsStore.grid(spark, dir)) === expectUpTo(24L))
  }

  test("partial replay: a version dir without _SUCCESS is invisible and is rewritten") {
    val dir = SparkTestBase.tempDir("graft_stats_crash")
    StatsStore.init(docs(0L to 9L), dir, BW)
    StatsStore.applyBatch(spark, docs(10L to 19L), dir)

    // simulate a crash after the v=19 write but before commit: strip the
    // _SUCCESS marker — the store must fall back to v=9
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/grid/v=19/_SUCCESS"), false)
    assert(StatsStore.currentVersion(spark, dir) === 9L)
    assert(gridSet(StatsStore.grid(spark, dir)) === expectUpTo(9L))

    // at-least-once re-delivery of the same batch recomputes v=19 from
    // stable inputs (the v=9 grid + the batch) — same content as the
    // uncrashed run
    StatsStore.applyBatch(spark, docs(10L to 19L), dir)
    assert(StatsStore.currentVersion(spark, dir) === 19L)
    assert(gridSet(StatsStore.grid(spark, dir)) === expectUpTo(19L))
  }

  test("expire keeps the newest versions and removes commit debris") {
    val dir = SparkTestBase.tempDir("graft_stats_exp")
    StatsStore.init(docs(0L to 9L), dir, BW)
    StatsStore.applyBatch(spark, docs(10L to 19L), dir)
    StatsStore.applyBatch(spark, docs(20L to 29L), dir)
    StatsStore.expire(spark, dir, keep = 1)
    assert(StatsStore.currentVersion(spark, dir) === 29L)
    assert(gridSet(StatsStore.grid(spark, dir)) === expectUpTo(29L))
    // the expired versions are gone
    intercept[IllegalArgumentException] {
      StatsStore.gridAsOf(spark, dir, 19L)
    }
  }

  test("streaming maintenance over landed delta files equals the batch histogram") {
    import spark.implicits._
    val dir = SparkTestBase.tempDir("graft_stats_stream")
    val srcDir = SparkTestBase.tempDir("graft_stats_src")
    val ckpt = SparkTestBase.tempDir("graft_stats_ckpt")

    StatsStore.init(docs(0L to 4L), dir, BW)
    // two delta files land (monotone doc_ids, the daily-delta contract)
    docs(5L to 14L).coalesce(1).write.mode("append").parquet(srcDir)
    docs(15L to 24L).coalesce(1).write.mode("append").parquet(srcDir)

    val q = StatsStore.appendToStatsStore(spark, srcDir, dir, ckpt)
    q.awaitTermination()
    assert(StatsStore.currentVersion(spark, dir) === 24L)
    assert(gridSet(StatsStore.grid(spark, dir)) === expectUpTo(24L))

    // more deltas land; a second AvailableNow pass folds only the new files
    docs(25L to 29L).coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = StatsStore.appendToStatsStore(spark, srcDir, dir, ckpt)
    q2.awaitTermination()
    assert(StatsStore.currentVersion(spark, dir) === 29L)
    assert(gridSet(StatsStore.grid(spark, dir)) === expectUpTo(29L))
  }
}
