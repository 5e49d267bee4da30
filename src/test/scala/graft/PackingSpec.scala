package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.Packing

/** Sequence packing: hand-computed bins, zero-token docs, and the
  * two-pass prefix sum == global-window reference on a corpus that
  * spans many partitions (the partition-boundary offsets are the part
  * a bug would hit).
  */
class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("hand-computed offsets and bins (budget 6), zero-token doc included") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c"),            // 3 kept
      (1L, "d e f g"),          // 4
      (2L, "h i j k l"),        // 5
      (3L, "123 4_56"),         // 0 kept (non-alpha)
      (4L, "m n")               // 2
    ).toDF("doc_id", "text")
    val got = Packing.packSequences(docs, budget = 6, numPartitions = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Array(
      (0L, 3L, 0L, 0L),
      (1L, 4L, 3L, 0L),
      (2L, 5L, 7L, 1L),
      (3L, 0L, 12L, 2L),
      (4L, 2L, 12L, 2L)))
  }

  test("two-pass prefix sum == global window reference across partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val words = Array("alpha", "beta", "gamma", "delta", "x1", "ee")
    val docs = (0 until 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(30))(words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "text")

    val twoPass = Packing.packSequences(docs, budget = 64, numPartitions = 7)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)

    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ref = docs.select(col("doc_id"),
        size(filter(split(col("text"), "\\s+"),
          t => t.rlike("^[A-Za-z]+$") && length(t) < 20)).cast("long").as("n_tokens"))
      .withColumn("start_offset", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("start_offset"),
        floor(col("start_offset") / 64).cast("long").as("pack_bin"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)

    assert(twoPass === ref)
  }

  test("offsets survive a downstream coalesce(1) (the Verify write path)") {
    import spark.implicits._
    // regression: the first formulation read TaskContext.getPartitionId
    // across two jobs; coalesce(1) merges parent partitions into one
    // task and zeroed every merged partition's offset
    val docs = (0 until 120).map(i => (i.toLong, "a b c d e")).toDF("doc_id", "text")
    val got = Packing.packSequences(docs, budget = 7, numPartitions = 6)
      .coalesce(1)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._3).toSeq === (0 until 120).map(_ * 5L))
  }

  test("bins are contiguous from zero and offsets are monotone") {
    import spark.implicits._
    val docs = (0 until 50).map(i => (i.toLong, "a b c d e f g")).toDF("doc_id", "text")
    val got = Packing.packSequences(docs, budget = 10, numPartitions = 4)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val offsets = got.map(_._3)
    assert(offsets.zip(offsets.tail).forall { case (a, b) => a <= b })
    val bins = got.map(_._4).distinct.sorted
    assert(bins === (bins.head to bins.last).toArray && bins.head === 0L)
  }
}
