package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.TemporalJoins

/** As-of join and bucketed range join: hand fixtures covering the
  * boundary semantics (equal-timestamp inclusivity, no-match nulls,
  * bucket-edge points, multi-bucket intervals), an independent
  * plain-Scala twin over the real events table, and the plan contract
  * that neither operator degenerates to a broadcast-nested-loop join.
  */
class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  // ---------- asofJoin ----------

  test("asof: hand fixture — latest at-or-before match, inclusive ties, no-match null") {
    import spark.implicits._
    val l = Seq(
      (1L, 10L, "a"), // after r@5  -> 5
      (1L, 5L, "b"),  // EQUAL to r@5 -> inclusive match 5
      (1L, 4L, "c"),  // only r@2 before -> 2
      (1L, 1L, "d"),  // nothing before -> null
      (2L, 9L, "e")   // key 2 has no right rows at all -> null
    ).toDF("k", "t", "tag")
    val r = Seq((1L, 2L, 20.0), (1L, 5L, 50.0), (1L, 7L, 70.0))
      .toDF("k", "t", "v")
    val got = TemporalJoins.asofJoin(l, r, "k", "t")
      .collect().map(x => (x.getString(2),
        if (x.isNullAt(3)) -1L else x.getLong(3),
        if (x.isNullAt(4)) -1.0 else x.getDouble(4))).toSet
    assert(got === Set(
      ("a", 7L, 70.0), ("b", 5L, 50.0), ("c", 2L, 20.0),
      ("d", -1L, -1.0), ("e", -1L, -1.0)))
  }

  test("asof: a right row with a NULL value column still wins the match") {
    import spark.implicits._
    val l = Seq((1L, 10L, "x")).toDF("k", "t", "tag")
    val r = Seq((1L, 3L, Some(30.0)), (1L, 8L, None))
      .toDF("k", "t", "v")
    val row = TemporalJoins.asofJoin(l, r, "k", "t").collect().head
    // matched row IS t=8 (its null v must not fall through to t=3's 30.0)
    assert(row.getLong(3) === 8L)
    assert(row.isNullAt(4))
  }

  test("asof: equals the per-row plain-Scala twin on the real events table") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val t = floor(col("ts").cast("timestamp").cast("double")).cast("long")
    val l = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), t.as("t"), col("event_id"))
    val r = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), t.as("t"), col("event_id"), col("value"))
      .groupBy(col("user_id"), col("t"))
      .agg(max_by(col("value"), col("event_id")).as("v"))
    val got = TemporalJoins.asofJoin(l, r, "user_id", "t")
      .collect().map(x => x.getLong(2) ->
        (if (x.isNullAt(3)) None else Some((x.getLong(3), x.getDouble(4))))).toMap
    val rights = r.collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
      .groupBy(_._1)
    val lefts = l.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(lefts.nonEmpty && got.size === lefts.length)
    lefts.foreach { case (u, lt, id) =>
      val expect = rights.getOrElse(u, Array.empty).filter(_._2 <= lt)
        .sortBy(_._2).lastOption.map(p => (p._2, p._3))
      assert(got(id) === expect, s"event $id user $u t $lt")
    }
    // anti-vacuity: both matched and unmatched rows occur
    assert(got.values.exists(_.isDefined) && got.values.exists(_.isEmpty))
  }

  test("asof: plan is one exchange per side into a window — no nested-loop join") {
    import spark.implicits._
    val l = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    val r = Seq((1L, 2L, 20.0)).toDF("k", "t", "v")
    val plan = TemporalJoins.asofJoin(l, r, "k", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("Window"), plan.take(2000))
  }

  // ---------- rangeJoinBucketed ----------

  test("range: hand fixture — boundaries inclusive, multi-bucket interval, cross-bucket miss") {
    import spark.implicits._
    // bucket = 10: interval A [5, 25] covers buckets 0..2; B [31, 33] bucket 3
    val iv = Seq(("A", 5L, 25L), ("B", 31L, 33L)).toDF("iv", "s", "e")
    val pt = Seq((1L, 5L), (2L, 25L), (3L, 15L), (4L, 26L), (5L, 33L), (6L, 30L))
      .toDF("pid", "pt")
    val got = TemporalJoins.rangeJoinBucketed(iv, pt, "s", "e", "pt", 10L)
      .select(col("iv"), col("pid")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // each containment appears EXACTLY once (no bucket duplication)
    assert(got.length === got.toSet.size)
    assert(got.toSet === Set(("A", 1L), ("A", 2L), ("A", 3L), ("B", 5L)))
  }

  test("range: left_outer keeps empty intervals; null-skipping aggregate reads zero") {
    import spark.implicits._
    val iv = Seq(("A", 0L, 25L), ("B", 100L, 105L)).toDF("iv", "s", "e")
    val pt = Seq((1L, 7L)).toDF("pid", "pt")
    val agg = TemporalJoins.rangeJoinBucketed(iv, pt, "s", "e", "pt", 10L,
        joinType = "left_outer")
      .groupBy(col("iv")).agg(count(col("pid")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(agg === Map("A" -> 1L, "B" -> 0L))
  }

  test("range: equals the plain-Scala containment twin on the real events table") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val sess = graft.streaming.StreamingIngest.sessionizeSql(
        ev.select(col("user_id"), col("ts").cast("timestamp").as("ts"),
          col("value")), gapSeconds = 1800)
      .select(col("user_id"), col("start_ts"), col("end_ts"))
    val pts = ev.select(col("user_id").as("p_user"), col("event_id").as("p_event"),
      floor(col("ts").cast("timestamp").cast("double")).cast("long").as("p_t"))
    val got = TemporalJoins.rangeJoinBucketed(sess, pts,
        "start_ts", "end_ts", "p_t", bucketSec = 3600)
      .select(col("user_id"), col("start_ts"), col("p_event"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sessArr = sess.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ptsArr = pts.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = (for {
      (u, s, e) <- sessArr
      (_, pid, pt) <- ptsArr if pt >= s && pt <= e
    } yield (u, s, pid)).toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("range: plan is an equi-join on the bucket — no nested-loop join") {
    import spark.implicits._
    val iv = Seq(("A", 5L, 25L)).toDF("iv", "s", "e")
    val pt = Seq((1L, 5L)).toDF("pid", "pt")
    val plan = TemporalJoins.rangeJoinBucketed(iv, pt, "s", "e", "pt", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  // ---------- scd2 / snapshotAsOf ----------

  test("scd2: hand fixture — exclusive valid_to chain, null current, per-key versions") {
    import spark.implicits._
    val ch = Seq(
      (1L, 10L, "a", 1.0),
      (1L, 20L, "b", 2.0),
      (1L, 40L, "c", 3.0),
      (2L, 15L, "x", 9.0)
    ).toDF("k", "t", "state", "v")
    val got = TemporalJoins.scd2(ch, "k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getInt(5), r.getString(2), r.getDouble(3))).toSet
    assert(got === Set(
      (1L, 10L, 20L, 1, "a", 1.0),
      (1L, 20L, 40L, 2, "b", 2.0),
      (1L, 40L, -1L, 3, "c", 3.0),
      (2L, 15L, -1L, 1, "x", 9.0)))
  }

  test("scd2: intervals tile each key's timeline — no gaps, no overlaps") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val ch = ev.select(col("user_id"),
        floor(col("ts").cast("timestamp").cast("double")).cast("long").as("t"),
        col("event_id"), col("event_type"))
      .groupBy(col("user_id"), col("t"))
      .agg(max_by(col("event_type"), col("event_id")).as("event_type"))
    val rows = TemporalJoins.scd2(ch, "user_id", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) Long.MaxValue else r.getLong(3), r.getInt(4)))
    rows.groupBy(_._1).foreach { case (u, vs) =>
      val sorted = vs.sortBy(_._4)
      assert(sorted.map(_._4).toList === (1 to vs.length).toList, s"user $u versions")
      sorted.sliding(2).foreach {
        case Array((_, _, to1, _), (_, from2, _, _)) =>
          assert(to1 === from2, s"user $u: interval chain broken")
        case _ =>
      }
      assert(sorted.last._3 === Long.MaxValue, s"user $u: open current version")
    }
  }

  test("snapshotAsOf: equals filtering scd2 intervals at the instant") {
    import spark.implicits._
    val ch = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 40L, "c"),
      (2L, 15L, "x"), (3L, 99L, "late")
    ).toDF("k", "t", "state")
    val at = 25L
    val snap = TemporalJoins.snapshotAsOf(ch, "k", "t", lit(at)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // scd2 view of the same instant: valid_from <= at < valid_to
    val viaScd2 = TemporalJoins.scd2(ch, "k", "t")
      .filter(col("valid_from") <= at &&
        (col("valid_to").isNull || col("valid_to") > at))
      .select(col("k"), col("valid_from"), col("state")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(snap === Set((1L, 20L, "b"), (2L, 15L, "x"))) // key 3 not born yet
    assert(snap === viaScd2)
  }

  test("scd2: one window operator over one exchange; snapshot plan is agg, not window") {
    import spark.implicits._
    val ch = Seq((1L, 10L, "a")).toDF("k", "t", "state")
    val scd2Plan = TemporalJoins.scd2(ch, "k", "t")
      .queryExecution.executedPlan.toString
    // lead + row_number share one Window (same partition/order spec)
    assert(scd2Plan.sliding("Window".length).count(_ == "Window") === 1, scd2Plan.take(2000))
    val snapPlan = TemporalJoins.snapshotAsOf(ch, "k", "t", lit(25L))
      .queryExecution.executedPlan.toString
    assert(!snapPlan.contains("Window"), snapPlan.take(2000))
    assert(snapPlan.contains("HashAggregate") || snapPlan.contains("SortAggregate"),
      snapPlan.take(2000))
  }
}
