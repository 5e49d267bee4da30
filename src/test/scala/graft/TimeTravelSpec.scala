package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexStore, TimeTravel}

/** Time-travel (as-of) reads over a maintained index: every as-of view
  * must equal a FRESH build over only the docs that existed at the mark
  * — including marks that split a chunk mid-blob, marks at operation
  * boundaries, and the degenerate ends (mark 0, mark >= high water).
  */
class TimeTravelSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val cfg = IndexBuilder.BuildConfig(chunkDocs = 7)

  /** One maintained index for the whole suite: base build over
    * docId <= 19, appendBuild over the rest (30 docs, chunkDocs=7 →
    * chunks 0..4, append boundary inside chunk 2).
    */
  private lazy val (idxDir, ids) = {
    val dir = SparkTestBase.tempDir("graft_tt")
    val raw = Corpus.synthetic(spark, numRepos = 3, filesPerRepo = 10)
    val withIds = Corpus.assignDocIds(spark, raw).cache()
    IndexBuilder.build(spark, withIds.filter(_.docId <= 19L), dir, cfg)
    IndexBuilder.appendBuild(spark, withIds.filter(_.docId > 19L), dir, cfg)
    (dir, withIds)
  }

  private def freshStats(mark: Long): Map[String, (Long, Long)] = {
    val dir = SparkTestBase.tempDir("graft_tt_fresh")
    IndexBuilder.build(spark, ids.filter(_.docId <= mark), dir, cfg)
    IndexStore.readPostings(spark, dir).toDF()
      .filter(!col("term").startsWith("#"))
      .groupBy(col("term"))
      .agg(sum(col("tf")).as("tf"), sum(col("df")).as("df"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
  }

  private def asOfStats(mark: Long): Map[String, (Long, Long)] =
    TimeTravel.termStatsAsOf(spark, idxDir, mark)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("as-of at a mid-chunk mark equals a fresh build over the prefix (boundary blob split)") {
    // mark 10 splits chunk 1 (docs 7..13): kept 7..10, trimmed 11..13
    assert(asOfStats(10L) === freshStats(10L))
  }

  test("as-of at the append boundary equals the pre-append index") {
    assert(asOfStats(19L) === freshStats(19L))
  }

  test("as-of at/above the high-water mark equals the full maintained index") {
    val hw = IndexBuilder.docIdHighWater(spark, idxDir)
    assert(hw === 29L)
    val full = IndexStore.readPostings(spark, idxDir).toDF()
      .filter(!col("term").startsWith("#"))
      .groupBy(col("term"))
      .agg(sum(col("tf")).as("tf"), sum(col("df")).as("df"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(asOfStats(hw) === full)
    assert(asOfStats(hw + 1000L) === full)
  }

  test("as-of mark 0 keeps exactly doc 0") {
    val got = TimeTravel.postingsAsOf(spark, idxDir, 0L)
      .select(col("docId")).distinct().collect().map(_.getLong(0)).toSet
    assert(got === Set(0L))
    assert(asOfStats(0L) === freshStats(0L))
  }

  test("docsAsOf equals the prefix doc rows (chunk-pruned path)") {
    val mark = 16L
    val got = TimeTravel.docsAsOf(spark, idxDir, mark)
      .select(col("docId"), col("url"), col("contentSha"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val want = IndexStore.readDocs(spark, idxDir).toDF()
      .filter(col("docId") <= mark)
      .select(col("docId"), col("url"), col("contentSha"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === want)
    assert(got.map(_._1) === (0L to mark).toSet)
  }

  test("marks are ascending, consistent snapshot labels; each replays a prefix") {
    val ms = TimeTravel.marks(spark, idxDir)
    assert(ms === ms.sorted)
    assert(ms.last === 29L)
    assert(ms.contains(19L)) // the append operation's own high-water mark
    // spot-check one interior mark end-to-end
    val interior = ms.filter(m => m > 0L && m < 19L)
    interior.take(1).foreach(m => assert(asOfStats(m) === freshStats(m)))
  }

  test("termStatsDelta == fresh build over only the window's docs; prefix + delta == full") {
    val (lo, hi) = (9L, 23L)
    val freshDir = SparkTestBase.tempDir("graft_tt_win")
    IndexBuilder.build(spark,
      ids.filter(d => d.docId > lo && d.docId <= hi), freshDir, cfg)
    // a fresh build REBASES docIds? No — IdDoc keeps its ids; stats are
    // id-invariant regardless, so compare the term aggregates
    val want = IndexStore.readPostings(spark, freshDir).toDF()
      .filter(!col("term").startsWith("#"))
      .groupBy(col("term"))
      .agg(sum(col("tf")).as("tf"), sum(col("df")).as("df"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val got = TimeTravel.termStatsDelta(spark, idxDir, lo, hi)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === want)
    // additivity: stats(<=lo) + delta(lo, hw] == stats(<=hw)
    val hw = IndexBuilder.docIdHighWater(spark, idxDir)
    val tail = TimeTravel.termStatsDelta(spark, idxDir, lo, hw)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val head = asOfStats(lo)
    val summed = (head.toSeq ++ tail.toSeq)
      .groupMapReduce(_._1)(_._2)((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(summed === asOfStats(hw))
  }

  test("compact EXPIRES history: as-of after compact replays the survivors' prefix") {
    import spark.implicits._
    // independent maintained index so the shared one stays pristine
    val dir = SparkTestBase.tempDir("graft_tt_cmp")
    IndexBuilder.build(spark, ids, dir, cfg)
    val deleted = ids.filter(_.docId % 5 == 2L).map(_.docId)
    IndexBuilder.markDeleted(spark, dir, deleted)
    IndexBuilder.compact(spark, dir)
    val mark = 16L
    val freshDir = SparkTestBase.tempDir("graft_tt_cmp_fresh")
    IndexBuilder.build(spark,
      ids.filter(d => d.docId <= mark && d.docId % 5 != 2L), freshDir, cfg)
    val want = IndexStore.readPostings(spark, freshDir).toDF()
      .filter(!col("term").startsWith("#"))
      .groupBy(col("term"))
      .agg(sum(col("tf")).as("tf"), sum(col("df")).as("df"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val got = TimeTravel.termStatsAsOf(spark, dir, mark)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === want)
  }

  test("as-of postings prune to historical chunk partitions before decode") {
    // mark 10 → chunks 0 and 1 only (10/7 = 1)
    val chunks = TimeTravel.postingsAsOf(spark, idxDir, 10L)
      .select(col("chunk")).distinct().collect().map(_.getLong(0)).toSet
    assert(chunks === Set(0L, 1L))
    val plan = TimeTravel.postingsAsOf(spark, idxDir, 10L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("chunk"), s"expected chunk partition pruning:\n$plan")
  }
}
