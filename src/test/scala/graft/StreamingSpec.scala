package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index.{IdDoc, Token}
import graft.streaming.StreamingIngest

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("incremental tokens: AvailableNow catches up, checkpoint resumes without dup") {
    import spark.implicits._
    val srcDir = SparkTestBase.tempDir("stream-src")
    val outDir = SparkTestBase.tempDir("stream-out")
    val ckDir = SparkTestBase.tempDir("stream-ck")

    val batch1 = Seq(
      IdDoc(0, "o/p", "a/f.txt", "c0", "txt", "alpha beta gamma"),
      IdDoc(1, "o/p", "b/f.txt", "c1", "txt", "beta delta"))
    spark.createDataset(batch1).write.mode("append").parquet(srcDir)

    val q1 = StreamingIngest.incrementalTokens(spark, srcDir, outDir, ckDir)
    q1.awaitTermination()
    val after1 = spark.read.parquet(outDir).as[Token].collect()
    // doc0: 3 title (#a #f #txt) + 3 body; doc1: 3 title + 2 body
    assert(after1.length === 11)

    // new files land; restart with same checkpoint -> only new docs tokenized
    spark.createDataset(Seq(
      IdDoc(2, "o/p", "c/f.txt", "c2", "txt", "epsilon"))).write.mode("append").parquet(srcDir)
    val q2 = StreamingIngest.incrementalTokens(spark, srcDir, outDir, ckDir)
    q2.awaitTermination()
    val after2 = spark.read.parquet(outDir).as[Token].collect()
    assert(after2.length === 11 + 4) // 3 title + 1 body
    assert(after2.count(_.docId == 0) === 6) // no duplication of old docs
  }

  test("streaming appendToIndex: catch-up batches, checkpoint resume, replay-safe trim") {
    import spark.implicits._
    import graft.index.{IndexBuilder, IndexStore}
    import graft.corpus.Corpus
    val cfg = IndexBuilder.BuildConfig(chunkDocs = 50)
    val ids = Corpus.assignDocIds(spark,
      Corpus.synthetic(spark, 2, 60, seed = 41)).persist() // docs 0..119

    def canon(dir: String) = (
      IndexStore.readPostings(spark, dir).collect()
        .map(r => ((r.chunk, r.term),
          (r.df, r.tf, r.blocks.toSeq, r.postingsBlob.toSeq))).toMap,
      IndexStore.readDocs(spark, dir).collect().map(r => (r.docId, r)).toMap,
      IndexStore.readStats(spark, dir).collect().map(r => (r.chunk, r)).toMap)

    val full = SparkTestBase.tempDir("sidx-full")
    IndexBuilder.build(spark, ids, full, cfg)
    graft.index.BloomSidecar.build(spark, full, mBits = 1 << 12, kHashes = 3)

    // bootstrap over 0..59; stream the rest in as landed parquet files.
    // The bootstrap index carries a Bloom sidecar: each streamed batch
    // must leave it fresh (appendToIndex refreshes a present sidecar)
    graft.index.TrigramSidecar.build(spark, full, nBuckets = 16)
    val idx = SparkTestBase.tempDir("sidx")
    IndexBuilder.build(spark, ids.filter(_.docId < 60L), idx, cfg)
    graft.index.BloomSidecar.build(spark, idx, mBits = 1 << 12, kHashes = 3)
    graft.index.TrigramSidecar.build(spark, idx, nBuckets = 16)
    def bloomCanon(dir: String) = graft.index.BloomSidecar.read(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def triCanon(dir: String) =
      spark.read.parquet(graft.index.TrigramSidecar.triDir(dir))
        .select("bucket", "tri", "term").collect()
        .map(r => (r.getAs[Number](0).longValue, r.getString(1), r.getString(2)))
        .toSet
    val srcDir = SparkTestBase.tempDir("sidx-src")
    val ckDir = SparkTestBase.tempDir("sidx-ck")
    ids.filter(d => d.docId >= 60L && d.docId < 90L)
      .write.mode("append").parquet(srcDir)
    val q1 = StreamingIngest.appendToIndex(spark, srcDir, idx, ckDir, cfg)
    q1.awaitTermination()

    // new files land; same checkpoint -> only the new delta is appended
    ids.filter(_.docId >= 90L).write.mode("append").parquet(srcDir)
    val q2 = StreamingIngest.appendToIndex(spark, srcDir, idx, ckDir, cfg)
    q2.awaitTermination()
    assert(canon(idx) === canon(full))
    // sidecars kept fresh batch-by-batch == ones built over the full index
    assert(bloomCanon(idx) === bloomCanon(full))
    assert(triCanon(idx) === triCanon(full))

    // a FRESH checkpoint replays every file; the docId high-water trim
    // must turn the replay into a no-op instead of a strictly-newer abort
    val ck2 = SparkTestBase.tempDir("sidx-ck2")
    val q3 = StreamingIngest.appendToIndex(spark, srcDir, idx, ck2, cfg)
    q3.awaitTermination()
    assert(canon(idx) === canon(full))
    assert(bloomCanon(idx) === bloomCanon(full)) // replay: refresh no-ops
    assert(triCanon(idx) === triCanon(full))
    ids.unpersist()
  }

  test("stateful sessionization (batch-mode semantics check)") {
    import spark.implicits._
    def ev(u: Long, t: Long, v: Double) =
      StreamingIngest.Event(u, new java.sql.Timestamp(t * 1000), "click", v)
    val events = spark.createDataset(Seq(
      ev(1, 1000, 1.0), ev(1, 1100, 2.0), ev(1, 5000, 3.0), // gap 3900 > 1800 -> 2 sessions
      ev(2, 1000, 1.0)))
    val sessions = StreamingIngest.sessionizeBatch(events, gapSeconds = 1800)
      .collect().sortBy(s => (s.user_id, s.start_ts))
    assert(sessions.map(s => (s.user_id, s.start_ts, s.end_ts, s.n_events, s.total_value)).toSeq ===
      Seq((1L, 1000L, 1100L, 2L, 3.0), (1L, 5000L, 5000L, 1L, 3.0), (2L, 1000L, 1000L, 1L, 1.0)))
  }

  test("event-time sessionization: watermark closes sessions, late events dropped") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ev(u: Long, t: Long, v: Double) =
      StreamingIngest.Event(u, new java.sql.Timestamp(t * 1000), "click", v)

    val input = MemoryStream[StreamingIngest.Event]
    val sessions = StreamingIngest.sessionizeEventTime(
      input.toDS(), gapSeconds = 1800, latenessSeconds = 600)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("evsess").start()
    def drain(): Unit = q.processAllAvailable()
    def emitted(): Seq[(Long, Long, Long, Long, Double)] =
      spark.sql("SELECT * FROM evsess").as[StreamingIngest.Session]
        .collect().map(s => (s.user_id, s.start_ts, s.end_ts, s.n_events, s.total_value))
        .sortBy(t => (t._1, t._2)).toSeq

    // batch 1: one session forming for user 1; user 99 is the "clock"
    input.addData(ev(1, 1000, 1.0), ev(1, 1100, 2.0), ev(99, 1000, 0.0))
    drain()
    assert(emitted().isEmpty) // watermark still at 0 -> nothing closed

    // batch 2 advances the max event time to 10000s -> watermark becomes
    // 9400s after the batch; batch 3 then fires user 1's timeout
    // (1100 + 1800 = 2900s < 9400s)
    input.addData(ev(99, 10000, 0.0))
    drain()
    input.addData(ev(99, 10001, 0.0))
    drain()
    // (the clock user's own first session closes too, via the batch fold)
    assert(emitted().filter(_._1 == 1L) === Seq((1L, 1000L, 1100L, 2L, 3.0)))

    // late event for user 1 at 1200s, far below the 9400s watermark:
    // dropped by the watermark filter -- it must not resurrect a session
    input.addData(ev(1, 1200, 5.0))
    drain()
    // advance the clock so any (incorrect) resurrected state would time out
    input.addData(ev(99, 20000, 0.0))
    drain()
    input.addData(ev(99, 20001, 0.0))
    drain()
    val after = emitted()
    assert(after.count(_._1 == 1L) === 1, s"late event resurrected a session: $after")

    q.stop()
  }

  test("event-time sessionization: out-of-order-but-valid event widens, not regresses") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ev(u: Long, t: Long, v: Double) =
      StreamingIngest.Event(u, new java.sql.Timestamp(t * 1000), "click", v)
    val input = MemoryStream[StreamingIngest.Event]
    val q = StreamingIngest.sessionizeEventTime(
        input.toDS(), gapSeconds = 1800, latenessSeconds = 600)
      .writeStream.outputMode("append")
      .format("memory").queryName("evsess2").start()

    input.addData(ev(1, 10000, 1.0), ev(99, 10000, 0.0))
    q.processAllAvailable() // watermark after batch: 9400
    // 9500 is BELOW the session's last (10000) but ABOVE the watermark:
    // it must join the session as a widening, leaving last at 10000
    input.addData(ev(1, 9500, 2.0))
    q.processAllAvailable()
    // 11500 - 10000 = 1500 <= gap -> extends; with the regression bug the
    // state's last would be 9500 and this would wrongly split
    input.addData(ev(1, 11500, 3.0))
    q.processAllAvailable()
    // advance the clock twice to fire the timeout
    input.addData(ev(99, 30000, 0.0)); q.processAllAvailable()
    input.addData(ev(99, 30001, 0.0)); q.processAllAvailable()

    val sessions = spark.sql("SELECT * FROM evsess2").as[StreamingIngest.Session]
      .collect().filter(_.user_id == 1L)
      .map(s => (s.start_ts, s.end_ts, s.n_events, s.total_value)).toSeq
    assert(sessions === Seq((9500L, 11500L, 3L, 6.0)), s"got $sessions")
    q.stop()
  }

  test("event-time replay == batch fold over on-time + accepted injections; dropped absent") {
    import spark.implicits._
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val got = StreamingIngest.sessionizeEventTimeReplay(spark, raw,
        gapSeconds = 1800, latenessSeconds = 600)
      .select($"user_id", $"start_ts", $"end_ts", $"n_events",
        round($"total_value", 6).as("tv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2)).toSeq

    // re-derive the injection rule (the oracle's SQL twin) and fold
    val ev = raw.select($"user_id".cast("long"), $"ts".cast("timestamp").as("ts"),
        $"event_type", $"value".cast("double")).as[StreamingIngest.Event].collect().toSeq
    val g = ev.map(_.ts.getTime / 1000).max
    val lastByUser = ev.groupBy(_.user_id).view.mapValues(_.map(_.ts.getTime / 1000).max)
    val injectedUsers = lastByUser.filter(_._2 <= g - 600).keys.toSeq
    assert(injectedUsers.nonEmpty, "injection rule selected no users — test vacuous")
    assert(injectedUsers.size < lastByUser.size,
      "every user selected — the not-injected branch is unexercised")
    val accepted = injectedUsers.map(u => StreamingIngest.Event(
      u, new java.sql.Timestamp((g - 600 + 1 + u % 60) * 1000), "late", 0.0))
    val expected = StreamingIngest.sessionizeBatch(
        spark.createDataset(ev ++ accepted), gapSeconds = 1800)
      .toDF().select($"user_id", $"start_ts", $"end_ts", $"n_events",
        round($"total_value", 6).as("tv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got === expected)

    // dropped injections (at g - 7200) must not have created or touched
    // any session: no session boundary sits at that timestamp unless an
    // on-time event does
    val droppedT = g - 12 * 600
    val onTimeTs = ev.map(_.ts.getTime / 1000).toSet
    if (!onTimeTs.contains(droppedT))
      assert(!got.exists(s => s._2 == droppedT || s._3 == droppedT))
  }

  test("sessionizeSql (window functions) == sessionizeBatch (typed fold) on events parquet") {
    import spark.implicits._
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"user_id", $"ts".cast("timestamp").as("ts"), $"event_type", $"value")
    val viaSql = StreamingIngest.sessionizeSql(raw, gapSeconds = 1800)
      .select($"user_id", $"start_ts", $"end_ts", $"n_events",
        round($"total_value", 6).as("tv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    val viaFold = StreamingIngest.sessionizeBatch(raw.as[StreamingIngest.Event], 1800)
      .toDF().select($"user_id", $"start_ts", $"end_ts", $"n_events",
        round($"total_value", 6).as("tv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(viaSql === viaFold)
    assert(viaSql.nonEmpty)
  }

  test("session_window (batch) == sessionizeSql on events parquet") {
    import spark.implicits._
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"user_id", $"ts".cast("timestamp").as("ts"), $"event_type", $"value")
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select($"user_id", $"start_ts", $"end_ts", $"n_events",
        round($"total_value", 6).as("tv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    val viaWindow = norm(StreamingIngest.sessionizeSessionWindow(raw, 1800))
    val viaSql = norm(StreamingIngest.sessionizeSql(raw, 1800))
    assert(viaWindow === viaSql)
    assert(viaWindow.nonEmpty)

    // the exact boundary (caught live at sf0.01: a natural 1801 s delta):
    // Spark merges session windows INCLUSIVELY, so delta == gap must
    // merge and delta == gap + 1 must split — same as the fold
    val b = Seq((1L, 10000L, 1.0), (1L, 11800L, 2.0),   // delta 1800: merge
                (2L, 10000L, 1.0), (2L, 11801L, 2.0))   // delta 1801: split
      .toDF("user_id", "tsec", "value")
      .select($"user_id", to_timestamp($"tsec").as("ts"), $"value")
    val gotB = norm(StreamingIngest.sessionizeSessionWindow(b, 1800))
    assert(gotB === Seq((1L, 10000L, 11800L, 2L, 3.0),
      (2L, 10000L, 10000L, 1L, 1.0), (2L, 11801L, 11801L, 1L, 2.0)))
    assert(gotB === norm(StreamingIngest.sessionizeSql(b, 1800)))
  }

  test("both streaming replays (flatMapGroups vs session_window) emit identical sessions") {
    import spark.implicits._
    // same feed, same injection rule: the append-mode path equals the
    // fold because the rule places accepted events at/after each user's
    // tail; the session-window path equals the fold by construction —
    // so the two streaming sessionizers must agree row-for-row
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select($"user_id", $"start_ts", $"end_ts", $"n_events",
        round($"total_value", 4).as("tv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    val viaFmg = norm(StreamingIngest.sessionizeEventTimeReplay(spark, ev))
    val viaSw = norm(StreamingIngest.sessionizeSessionWindowReplay(spark, ev))
    assert(viaSw === viaFmg)
    assert(viaSw.nonEmpty)
  }

  test("session_window MERGES the bridge case that append-mode streaming must split") {
    // The divergence documented in sessionizeEventTime: events at t0 and
    // t0+2000 close session [t0,t0] inside the fold (gap 1800 exceeded);
    // a late event at t0+1500 (accepted: above watermark t0+1400) then
    // bridges it to the current session. flatMapGroupsWithState has
    // already emitted [t0,t0] and can only split; session_window still
    // holds both sessions in state (watermark t0+1400 < first window's
    // end t0+1801) and must emit the ONE merged session the batch fold
    // produces over {t0, t0+1500, t0+2000}.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val t0 = 10000L
    def ev(t: Long, v: Double) =
      StreamingIngest.Event(1L, new java.sql.Timestamp(t * 1000), "click", v)

    def run(name: String, mk: org.apache.spark.sql.Dataset[StreamingIngest.Event] =>
        org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long, Double)] = {
      val input = MemoryStream[StreamingIngest.Event]
      val q = mk(input.toDS()).writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        input.addData(ev(t0, 1.0)); q.processAllAvailable()
        input.addData(ev(t0 + 2000, 2.0)); q.processAllAvailable() // wm -> t0+1400
        input.addData(ev(t0 + 1500, 4.0)); q.processAllAvailable() // accepted late bridge
        // clock ticks push the watermark past every window/timeout
        input.addData(StreamingIngest.Event(99L, new java.sql.Timestamp((t0 + 100000) * 1000), "c", 0.0))
        q.processAllAvailable()
        input.addData(StreamingIngest.Event(99L, new java.sql.Timestamp((t0 + 100001) * 1000), "c", 0.0))
        q.processAllAvailable()
        spark.sql(s"SELECT user_id, start_ts, end_ts, n_events, total_value FROM $name")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
          .filter(_._1 == 1L).sortBy(t => (t._1, t._2)).toSeq
      } finally q.stop()
    }

    val merged = run("swbridge",
      ds => StreamingIngest.sessionizeSessionWindow(ds.toDF(), 1800, 600))
    assert(merged === Seq((1L, t0, t0 + 2000, 3L, 7.0)),
      s"session_window failed to merge the bridge: $merged")

    val split = run("fmgbridge",
      ds => StreamingIngest.sessionizeEventTime(ds, 1800, 600).toDF())
    assert(split === Seq((1L, t0, t0, 1L, 1.0), (1L, t0 + 1500, t0 + 2000, 2L, 6.0)),
      s"premise changed: append-mode path no longer splits the bridge: $split")

    // and the batch fold agrees with session_window, not the split
    val fold = StreamingIngest.sessionizeBatch(
      Seq(ev(t0, 1.0), ev(t0 + 2000, 2.0), ev(t0 + 1500, 4.0)).toDS(), 1800)
      .collect().map(s => (s.user_id, s.start_ts, s.end_ts, s.n_events, s.total_value)).toSeq
    assert(fold === Seq((1L, t0, t0 + 2000, 3L, 7.0)))
  }

  test("streaming windowed aggregation over events parquet (memory sink)") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val srcDir = SparkTestBase.tempDir("stream-ev")
    events.write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(events.schema).parquet(srcDir)
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ -> event-time type
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("evagg")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.sql("SELECT window.start AS w, event_type, n FROM evagg")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = events.withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }
}
