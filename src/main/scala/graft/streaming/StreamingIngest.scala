package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._
import graft.index.{IdDoc, Token}
import graft.tokenizer.Tokenizer

/** Structured Streaming surfaces. The reference engine is batch-only
  * (SURVEY.md §2.10) — its crawler checkpoints + restart scripts map to
  * the lineage/resume path, not to streaming — but a training-data
  * pipeline needs streaming ingestion, so two canonical shapes are
  * provided:
  *
  *  1. [[incrementalTokens]]: file-source ingestion of newly landed
  *     source docs -> frozen tokenizer -> append sink, with
  *     Trigger.AvailableNow for catch-up batches and checkpointed
  *     progress (the ##EndDoc-style incremental chunking stretch goal).
  *  2. [[sessionize]]: stateful event sessionization with
  *     flatMapGroupsWithState + event-time watermark — the
  *     KeyValueGroupedDataset custom-state pattern.
  */
object StreamingIngest {

  val sourceSchema: StructType = StructType(Seq(
    StructField("docId", LongType), StructField("repo", StringType),
    StructField("path", StringType), StructField("commit", StringType),
    StructField("lang", StringType), StructField("content", StringType)))

  /** Streaming tokenize: docs landing in `srcDir` (parquet) become Token
    * rows appended to `outDir`, exactly-once via `checkpointDir`. Returns
    * the started query; callers trigger AvailableNow and await.
    */
  def incrementalTokens(spark: SparkSession, srcDir: String, outDir: String,
                        checkpointDir: String, chunkDocs: Long = 30000L) = {
    import spark.implicits._
    val stream = spark.readStream.schema(sourceSchema).parquet(srcDir).as[IdDoc]
    val toks = stream.flatMap { d =>
      val chunk = d.docId / chunkDocs
      Tokenizer.postings(d.path, d.content).iterator.map {
        case (term, pos) => Token(chunk, term, d.docId, pos)
      }
    }
    toks.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming index maintenance: docs landing in `srcDir` (parquet files
    * of the sourceSchema shape) are appended to the EXISTING index at
    * `idxDir` one micro-batch at a time through
    * [[graft.index.IndexBuilder.appendBuild]] — foreachBatch is the
    * canonical sink for running a batch operator Structured Streaming has
    * no native equivalent of. Bootstrap the index with IndexBuilder.build
    * first; landed files must carry monotonically increasing docIds (the
    * daily-delta landing pattern appendBuild requires).
    *
    * Exactly-once EFFECT from at-least-once delivery: foreachBatch can
    * replay a micro-batch after a crash, so each batch is first trimmed to
    * docIds past the index's lineage high-water mark
    * (IndexBuilder.docIdHighWater — advanced as appendBuild's LAST step).
    *   - replay after FULL application: the trim empties the batch and
    *     appendBuild no-ops;
    *   - replay after PARTIAL application (index partitions committed,
    *     lineage not yet): the mark is unchanged, the trim keeps the whole
    *     batch, and appendBuild's own replay guards re-apply it
    *     idempotently (dynamic overwrite rewrites the same partitions;
    *     the boundary merge trims previously-merged delta runs off the old
    *     side — IndexAppendSpec pins the partial-replay case).
    *
    * Derived structures: when the index carries a Bloom chunk-skip
    * sidecar, each batch ends with [[graft.index.BloomSidecar.refresh]]
    * (delta-cost: only the stale-tail chunks' grid rows are recomputed).
    * Replay-safe for free — refresh derives purely from the index's
    * current state, no-ops when the lineage mark hasn't moved, and a
    * crash between appendBuild and refresh just leaves a stale sidecar
    * that candidateChunks already tolerates until the next batch (or
    * query-time guard) catches it up.
    */
  def appendToIndex(spark: SparkSession, srcDir: String, idxDir: String,
                    checkpointDir: String,
                    cfg: graft.index.IndexBuilder.BuildConfig =
                      graft.index.IndexBuilder.BuildConfig()) = {
    import spark.implicits._
    val stream = spark.readStream.schema(sourceSchema).parquet(srcDir).as[IdDoc]
    stream.writeStream
      .foreachBatch { (batch: Dataset[IdDoc], _: Long) =>
        val mark = graft.index.IndexBuilder.docIdHighWater(spark, idxDir)
        graft.index.IndexBuilder.appendBuild(
          spark, batch.filter(_.docId > mark), idxDir, cfg)
        if (graft.index.BloomSidecar.exists(spark, idxDir))
          graft.index.BloomSidecar.refresh(spark, idxDir)
        if (graft.index.TrigramSidecar.exists(spark, idxDir))
          graft.index.TrigramSidecar.refresh(spark, idxDir)
        if (graft.index.ChampionSidecar.exists(spark, idxDir))
          graft.index.ChampionSidecar.refresh(spark, idxDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Streaming ANN-store maintenance — the vector sibling of
    * [[appendToIndex]]: embeddings landing in `srcDir` (parquet files of
    * (vec_id, embedding) shape) are appended to the EXISTING AnnStore at
    * `storeDir` per micro-batch through
    * [[graft.analysis.AnnStore.appendIdempotent]]. Exactly-once EFFECT
    * from at-least-once delivery comes from the append itself: each batch
    * is anti-joined against the store rows in only the buckets it touches
    * (partition-pruned, delta-proportional), so a replayed batch — full or
    * partial — appends exactly the rows not yet present. No high-water
    * mark is needed (and none would suffice: bucket routing is
    * content-keyed, not id-ordered).
    */
  def appendToAnnStore(spark: SparkSession, srcDir: String, storeDir: String,
                       checkpointDir: String, nBits: Int = 8) = {
    val stream = spark.readStream.schema(embSchema).parquet(srcDir)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.analysis.AnnStore.appendIdempotent(batch, storeDir, nBits)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming IVF-store maintenance — [[appendToAnnStore]]'s twin for
    * the centroid-partitioned store: micro-batches append through
    * [[graft.analysis.IvfStore.appendIdempotent]], whose frozen-centroid
    * routing + cell-pruned anti-join make every replay — full or
    * partial — idempotent. The store must already exist (cells are
    * frozen at build time).
    */
  def appendToIvfStore(spark: SparkSession, srcDir: String, storeDir: String,
                       checkpointDir: String) = {
    val stream = spark.readStream.schema(embSchema).parquet(srcDir)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.analysis.IvfStore.appendIdempotent(batch, storeDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, total: Double)
  case class Session(user_id: Long, start_ts: Long, end_ts: Long,
                     n_events: Long, total_value: Double)

  /** Sessionize events per user: a session closes after `gapSeconds` of
    * inactivity (processing-time timeout keeps the example runnable on a
    * bounded memory-sink test; swap to EventTimeTimeout + watermark for
    * production).
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800) = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (userId, evs, state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(_.ts.getTime)
          var cur = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            val t = e.ts.getTime / 1000
            cur match {
              case Some(s) if t - s.last <= gapSeconds =>
                // min/max so a cross-batch out-of-order event widens the
                // session instead of regressing `last` (which would
                // corrupt later gap decisions)
                cur = Some(SessionState(math.min(s.start, t), math.max(s.last, t),
                  s.n + 1, s.total + e.value))
              case Some(s) =>
                closed += Session(userId, s.start, s.last, s.n, s.total)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur match {
            case Some(s) => state.update(s)
            case None => state.remove()
          }
          closed.result().iterator
      }
  }

  /** Production-shape sessionization: event-time timeout + watermark.
    * Sessions are emitted when the WATERMARK (not the wall clock) passes
    * `last event + gapSeconds`, so results are deterministic under replay
    * and independent of processing speed; events arriving more than
    * `lateness` behind the max seen event time are dropped by the
    * watermark filter (FlatMapGroupsWithStateExec filters late input rows
    * under EventTimeTimeout) and can neither extend nor resurrect a
    * session. This is what [[sessionize]]'s doc comment promises for
    * production; the ProcessingTimeTimeout variant stays for bounded
    * wall-clock tests.
    */
  def sessionizeEventTime(events: Dataset[Event], gapSeconds: Long = 1800,
                          latenessSeconds: Long = 600) = {
    // What lateness <= gap actually guarantees: an accepted event can
    // never REGRESS state (the widening branch is min/max) and a dropped
    // event can never resurrect an emitted session. It does NOT make the
    // output identical to the batch fold in every case: an accepted late
    // event may land within `gap` of a session that was ALREADY emitted
    // and also join the current one — the batch fold would merge the two,
    // while append-mode streaming has irrevocably split them (the emitted
    // end is gone from state, so the bridge is undetectable here). True
    // merge semantics need merge-capable session windows —
    // [[sessionizeSessionWindow]] provides exactly that (spec-pinned on
    // the bridge case) — not flatMapGroupsWithState append. The bound is
    // kept as a sanity rail:
    // with lateness > gap even the no-regress property gets hard to
    // reason about, and sessionizeEventTimeReplay's oracle construction
    // depends on it.
    require(latenessSeconds <= gapSeconds,
      s"lateness ($latenessSeconds s) must be <= gap ($gapSeconds s)")
    import events.sparkSession.implicits._
    events.withWatermark("ts", s"$latenessSeconds seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId, evs, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap: close and emit
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start, s.last, s.n, s.total))
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime / 1000
              cur match {
                case Some(s) if t - s.last <= gapSeconds =>
                  // late-but-valid events (above the watermark, below the
                  // session's last) widen the session instead of
                  // regressing it: last/start are max/min, never "current"
                  cur = Some(SessionState(math.min(s.start, t), math.max(s.last, t),
                    s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += Session(userId, s.start, s.last, s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout fires once watermark > this; input rows are never
              // below the watermark here, so last + gap is always ahead
              state.setTimeoutTimestamp((s.last + gapSeconds) * 1000)
            }
            closed.result().iterator
          }
      }
  }

  /** Merge-capable sessionization via Spark's built-in session windows —
    * the operator that CLOSES the append-mode divergence documented in
    * [[sessionizeEventTime]]: an accepted late event that lands within
    * `gap` of two neighboring sessions MERGES them (the session-window
    * state store keeps every session until the watermark passes its end,
    * so nothing is irrevocably emitted while a bridge is still
    * admissible), exactly like the batch fold. flatMapGroupsWithState
    * append emits a session the moment a later event exceeds the gap and
    * cannot take it back; session_window's aggregation buffer can.
    *
    * Works identically over a BATCH DataFrame (the watermark is a no-op
    * there) and a streaming one (append mode: a session emits once the
    * watermark passes its window end).
    *
    * One convention reconciles it with the frozen fold semantics
    * ([[sessionizeBatch]]/[[sessionizeSql]], both spec-pinned equal):
    * timestamps are floored to whole seconds first (the fold's
    * `getTime / 1000`). Spark merges session windows on an INCLUSIVE
    * boundary (a new event at exactly the previous window's end joins
    * it — verified against a natural delta == gap + 1 split and a
    * delta == gap merge in the specs), so session_window(gap) merges
    * iff next - last <= gap: exactly the fold's rule, no gap
    * adjustment. end_ts converts back from the exclusive window end
    * (last + gap).
    */
  def sessionizeSessionWindow(events: DataFrame, gapSeconds: Long = 1800,
                              latenessSeconds: Long = 600): DataFrame = {
    val floored = events.select(
      col("user_id").cast("long").as("user_id"),
      to_timestamp(floor(col("ts").cast("timestamp").cast("double"))).as("ts"),
      col("value").cast("double").as("value"))
    floored
      .withWatermark("ts", s"$latenessSeconds seconds")
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapSeconds seconds").as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"),
        col("w.start").cast("double").cast("long").as("start_ts"),
        (col("w.end").cast("double").cast("long") - gapSeconds).as("end_ts"),
        col("n_events"), col("total_value"))
  }

  private val replaySeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def tsAt(sec: Long) = new java.sql.Timestamp(sec * 1000)

  /** The static table normalized to the replay's Event shape. */
  private def onTimeEvents(spark: SparkSession, events: DataFrame): Seq[Event] = {
    import spark.implicits._
    val onTime = events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        coalesce(col("event_type"), lit("e")).as("event_type"),
        col("value").cast("double").as("value"))
      .as[Event].collect().toSeq
    require(onTime.nonEmpty, "replay needs a non-empty events table")
    onTime
  }

  /** The deterministic injection rule shared by the streaming replays
    * (and re-derived by their SQL oracles): with G = max floor-second
    * and L = lateness, every user whose last event is <= G - L gets one
    * ACCEPTED late event at G - L + 1 + (user_id % 60) — strictly above
    * the watermark, at/after the user's open tail — and one DROPPED
    * event at G - 12L, far below it. Returns (G, accepted, dropped).
    */
  private def replayInjections(onTime: Seq[Event],
                               latenessSeconds: Long): (Long, Seq[Event], Seq[Event]) = {
    def floorSec(e: Event): Long = e.ts.getTime / 1000
    val g = onTime.map(floorSec).max
    val lastByUser = onTime.groupBy(_.user_id).view.mapValues(_.map(floorSec).max)
    val injectedUsers = lastByUser.filter(_._2 <= g - latenessSeconds).keys.toSeq.sorted
    val accepted = injectedUsers.map(u =>
      Event(u, tsAt(g - latenessSeconds + 1 + u % 60), "late", 0.0))
    val dropped = injectedUsers.map(u =>
      Event(u, tsAt(g - 12 * latenessSeconds), "late", 0.0))
    (g, accepted, dropped)
  }

  /** Bounded deterministic replay of [[sessionizeSessionWindow]] in
    * STREAMING mode — same injection rule (and therefore the same SQL
    * oracle) as [[sessionizeEventTimeReplay]]. With merge-capable
    * session windows the emitted sessions equal the batch gap-fold over
    * on-time ∪ accepted events BY CONSTRUCTION — no bridge caveat: a
    * late event that would bridge two sessions is merged exactly as the
    * fold merges it, because nothing is emitted while the watermark
    * still admits an event that could extend it. Dropped injections sit
    * far below the watermark and vanish.
    */
  def sessionizeSessionWindowReplay(spark: SparkSession, events: DataFrame,
                                    gapSeconds: Long = 1800,
                                    latenessSeconds: Long = 600): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val onTime = onTimeEvents(spark, events)
    val (g, accepted, dropped) = replayInjections(onTime, latenessSeconds)
    val input = MemoryStream[Event]
    val qname = s"graft_swreplay_${replaySeq.incrementAndGet()}"
    val q = sessionizeSessionWindow(input.toDS().toDF(), gapSeconds, latenessSeconds)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(qname).start()
    try {
      input.addData(onTime); q.processAllAvailable()
      input.addData(accepted ++ dropped); q.processAllAvailable()
      // two clock ticks: the first advances the watermark past every
      // window's end, the second runs a batch under it so the final
      // sessions actually emit (MemoryStream behavior pinned in specs)
      input.addData(Event(-1L, tsAt(g + 100000), "clock", 0.0)); q.processAllAvailable()
      input.addData(Event(-1L, tsAt(g + 100001), "clock", 0.0)); q.processAllAvailable()
      val out = spark.table(qname).filter(col("user_id") >= 0L)
        .collect().toSeq
      spark.createDataFrame(
        spark.sparkContext.parallelize(out), spark.table(qname).schema)
    } finally q.stop()
  }

  /** Bounded deterministic replay of [[sessionizeEventTime]] over a
    * static events table — the driver-oracle harness for the streaming
    * path. Three micro-batches through a MemoryStream:
    *
    *  1. every event of the table (watermark still 0 -> nothing dropped);
    *  2. injected late events, derived from the data by a rule a SQL
    *     oracle can re-derive: let G = max floor-second of the table and
    *     L = lateness; every user whose last event is <= G - L gets
    *     (a) an ACCEPTED late event at G - L + 1 + (user_id % 60) —
    *     strictly above the watermark G_exact - L, and at/after the
    *     user's open tail session, so the append-mode output provably
    *     equals the batch fold (the bridge divergence documented in
    *     [[sessionizeEventTime]] needs an accepted event BEFORE the
    *     user's last on-time event, which this rule excludes) — and
    *     (b) a DROPPED event at G - 12L, far below the watermark;
    *  3. two sentinel clock events (user_id -1) 100000 s ahead, pushing
    *     the watermark past every session's last + gap so every real
    *     user's tail times out and emits.
    *
    * Returns the emitted sessions (sentinel excluded) as a local batch
    * DataFrame: exactly the gap-sessions over (on-time ∪ accepted
    * injected) — which is what the DuckDB oracle recomputes — with the
    * dropped injections provably absent.
    */
  def sessionizeEventTimeReplay(spark: SparkSession, events: DataFrame,
                                gapSeconds: Long = 1800,
                                latenessSeconds: Long = 600): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val onTime = onTimeEvents(spark, events)
    val (g, accepted, dropped) = replayInjections(onTime, latenessSeconds)

    val input = MemoryStream[Event]
    val qname = s"graft_evreplay_${replaySeq.incrementAndGet()}"
    val q = sessionizeEventTime(input.toDS(), gapSeconds, latenessSeconds)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(qname).start()
    try {
      input.addData(onTime); q.processAllAvailable()
      input.addData(accepted ++ dropped); q.processAllAvailable()
      // two clock ticks: the first advances the watermark, the second
      // runs a batch under it so the timeouts actually fire (matches the
      // MemoryStream behavior pinned in StreamingSpec)
      input.addData(Event(-1L, tsAt(g + 100000), "clock", 0.0)); q.processAllAvailable()
      input.addData(Event(-1L, tsAt(g + 100001), "clock", 0.0)); q.processAllAvailable()
      val out = spark.table(qname).as[Session].collect().filter(_.user_id >= 0L).toSeq
      spark.createDataset(out).toDF()
    } finally q.stop()
  }

  /** Streaming exact dedup with watermark-bounded state: duplicate
    * events (same user/ts/type/value) arriving within `lateness` of the
    * watermark are dropped; the first arrival is emitted immediately and
    * its key's state is EVICTED once the watermark passes ts + lateness
    * — so state size is bounded by the event rate x the lateness window,
    * not the stream's lifetime (the property that makes streaming dedup
    * viable at all at 100 TB/day: an unbounded `dropDuplicates` state
    * grows forever). Late input below the watermark is discarded by the
    * operator's pre-filter, so an ancient replayed duplicate can neither
    * re-emit nor resurrect state.
    */
  def dedupEvents(events: Dataset[Event], latenessSeconds: Long = 600): Dataset[Event] =
    events.withWatermark("ts", s"$latenessSeconds seconds")
      .dropDuplicatesWithinWatermark("user_id", "ts", "event_type", "value")

  /** Bounded deterministic replay of [[dedupEvents]] — the driver-oracle
    * harness for the streaming dedup path (same shape as
    * [[sessionizeEventTimeReplay]]). Timestamps are floored to whole
    * seconds first so the stream's dedup key matches the SQL oracle's
    * floor(epoch(ts)) convention. Two micro-batches:
    *
    *  1. every event of the table — intra-batch exact duplicates
    *     collapse to one emitted row;
    *  2. injected rows, derived by rules a SQL oracle re-derives: with
    *     G = max floor-second and L = lateness, (a) every user with
    *     user_id % 3 == 0 re-feeds exact COPIES of their latest events —
    *     dropped (dedup state if ts is within [watermark - L, ∞), the
    *     late-input filter below it — either way absent from the
    *     output); (b) every user with user_id % 5 == 0 feeds one NEW
    *     event ('inj', G - L/2) above the watermark G - L — emitted.
    *
    * Returns the emitted rows as (user_id, t, event_type, value):
    * exactly DISTINCT(events) ∪ the injected-new rule.
    */
  def dedupEventsReplay(spark: SparkSession, events: DataFrame,
                        latenessSeconds: Long = 600): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val onTime = events
      .select(col("user_id").cast("long").as("user_id"),
        to_timestamp(floor(col("ts").cast("timestamp").cast("double"))).as("ts"),
        coalesce(col("event_type"), lit("e")).as("event_type"),
        col("value").cast("double").as("value"))
      .as[Event].collect().toSeq
    require(onTime.nonEmpty, "dedupEventsReplay needs a non-empty events table")
    def floorSec(e: Event): Long = e.ts.getTime / 1000
    val g = onTime.map(floorSec).max
    val lastByUser = onTime.groupBy(_.user_id).view.mapValues(_.map(floorSec).max).toMap
    val dupes = onTime.filter(e => e.user_id % 3 == 0 && floorSec(e) == lastByUser(e.user_id))
    val newbies = onTime.map(_.user_id).distinct.sorted.filter(_ % 5 == 0)
      .map(u => Event(u, tsAt(g - latenessSeconds / 2), "inj", 0.0))

    val input = MemoryStream[Event]
    val qname = s"graft_dedupreplay_${replaySeq.incrementAndGet()}"
    val q = dedupEvents(input.toDS(), latenessSeconds)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(qname).start()
    try {
      input.addData(onTime); q.processAllAvailable()
      input.addData(dupes ++ newbies); q.processAllAvailable()
      val out = spark.table(qname).as[Event].collect().toSeq
      spark.createDataset(out)
        .select(col("user_id"), (col("ts").cast("double")).cast("long").as("t"),
          col("event_type"), round(col("value"), 4).as("value"))
    } finally q.stop()
  }

  /** Scale-path batch sessionization: pure window functions (gap flag ->
    * running session id -> per-session aggregate). Unlike the
    * flatMapGroups twin below, nothing materializes a user's whole event
    * history in one task's memory — a mega-user is just more rows through
    * the windowed codegen pipeline — and the single shuffle key is
    * user_id. Output semantics are identical to [[sessionizeBatch]]
    * (spec-asserted); timestamps are floored to seconds like the fold's
    * `getTime / 1000`.
    */
  def sessionizeSql(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("t"))
    events
      .select(col("user_id"),
        floor(col("ts").cast("double")).cast("long").as("t"), col("value"))
      .withColumn("brk",
        when(lag(col("t"), 1).over(byUser).isNull ||
          col("t") - lag(col("t"), 1).over(byUser) > gapSeconds, 1L).otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("t")).as("start_ts"), max(col("t")).as("end_ts"),
        count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .drop("sid")
  }

  /** Batch-mode wrapper for tests: sessionize a static events table with
    * identical semantics (same fold, no state timeout), so streaming
    * session splits can be golden-checked against a plain computation.
    */
  def sessionizeBatch(events: Dataset[Event], gapSeconds: Long = 1800): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (userId, evs) =>
      val sorted = evs.toSeq.sortBy(e => e.ts.getTime)
      val out = Seq.newBuilder[Session]
      var cur: Option[SessionState] = None
      sorted.foreach { e =>
        val t = e.ts.getTime / 1000
        cur match {
          case Some(s) if t - s.last <= gapSeconds =>
            cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
          case Some(s) =>
            out += Session(userId, s.start, s.last, s.n, s.total)
            cur = Some(SessionState(t, t, 1, e.value))
          case None => cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach(s => out += Session(userId, s.start, s.last, s.n, s.total))
      out.result().iterator
    }
  }
}
