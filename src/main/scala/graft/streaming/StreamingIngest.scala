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
    // lateness <= gap makes the streaming output provably identical to the
    // batch fold: any accepted event t satisfies t >= last - lateness >=
    // start - gap, so the widening branch below can never merge an event
    // that the batch twin would place in an earlier session
    require(latenessSeconds <= gapSeconds,
      s"lateness ($latenessSeconds s) must be <= gap ($gapSeconds s) for batch-equivalent sessions")
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
