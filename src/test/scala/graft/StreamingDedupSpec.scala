package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingIngest
import graft.streaming.StreamingIngest.Event

/** Streaming exact dedup (dropDuplicatesWithinWatermark): first arrival
  * emits, exact copies within the watermark window are dropped, input
  * below the watermark is discarded, and the bounded replay harness's
  * output equals its declared batch twin (DISTINCT ∪ injected-new).
  */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def at(sec: Long) = new java.sql.Timestamp(sec * 1000)

  test("hand-built stream: dupe dropped, new-above-watermark emitted, ancient dropped") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamingIngest.dedupEvents(input.toDS(), latenessSeconds = 600)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_hand").start()
    try {
      // batch 1: two events for user 1 -> watermark becomes 9000 - 600 = 8400
      input.addData(Seq(Event(1L, at(5000), "a", 1.0), Event(1L, at(9000), "b", 2.0)))
      q.processAllAvailable()
      // batch 2: exact copy (dropped by dedup state), new event above the
      // watermark (emitted), ancient event below the watermark (discarded
      // by the late-input filter even though its key was never seen)
      input.addData(Seq(Event(1L, at(9000), "b", 2.0),
        Event(1L, at(8500), "n", 3.0), Event(1L, at(3000), "z", 4.0)))
      q.processAllAvailable()
      val got = spark.table("dedup_hand").as[Event].collect()
        .map(e => (e.user_id, e.ts.getTime / 1000, e.event_type, e.value)).toSet
      assert(got === Set((1L, 5000L, "a", 1.0), (1L, 9000L, "b", 2.0),
        (1L, 8500L, "n", 3.0)))
    } finally q.stop()
  }

  test("replay over the events table == DISTINCT ∪ injected-new (batch twin)") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val got = StreamingIngest.dedupEventsReplay(spark, events, latenessSeconds = 600)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .sorted.toSeq

    // batch twin, derived independently with DataFrame ops
    val e = events.select(col("user_id").cast("long").as("user_id"),
      floor(col("ts").cast("timestamp").cast("double")).cast("long").as("t"),
      coalesce(col("event_type"), lit("e")).as("event_type"),
      col("value").cast("double").as("value"))
    val g = e.agg(max(col("t"))).head().getLong(0)
    val distinctRows = e.distinct()
      .select(col("user_id"), col("t"), col("event_type"), round(col("value"), 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val injected = e.select(col("user_id")).distinct()
      .filter(col("user_id") % 5 === 0)
      .collect().map(r => (r.getLong(0), g - 300L, "inj", 0.0))
    val want = (distinctRows ++ injected).sorted.toSeq

    assert(got.nonEmpty)
    assert(got === want)
  }
}
