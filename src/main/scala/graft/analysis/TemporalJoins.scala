package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Temporal join operators Spark has no native form of: the AS-OF join
  * (each left row matched to the latest right row at or before its
  * timestamp) and the bucketed RANGE join (points against intervals).
  * Both are declarative single-shuffle plans — no broadcast-nested-loop
  * fallback, no per-key materialization — and both have DuckDB oracles
  * in graft.SparkEntry (DuckDB's native ASOF JOIN / IEJoin are the
  * independent second engine).
  */
object TemporalJoins {

  /** AS-OF join: for every left row, the single right row with the same
    * `key` and the greatest `t` <= the left row's `t` (inclusive — a
    * right row at the exact same instant matches, like SQL ASOF's
    * `l.t >= r.t`). Left rows with no prior right row survive with
    * nulls (LEFT ASOF semantics).
    *
    * Plan shape (the 100 TB argument): a naive formulation is an
    * inequality join — Spark plans those as broadcast-nested-loop, an
    * O(N·M) scan per partition. This instead UNIONS the two sides with
    * a side tag and takes a running `last(<right payload>, ignoreNulls)`
    * over a window partitioned by `key`, ordered by `(t, side)` with
    * right rows first at equal `t`. ONE exchange on `key`, and the
    * running frame (`unboundedPreceding..currentRow` + `last`) is
    * incremental — Spark keeps only the frame boundary, never a
    * buffered history, so a key with a billion rows streams through.
    * The right payload travels as ONE nullable struct so that a right
    * row whose value columns are legitimately null still registers as
    * the match (per-column `last(ignoreNulls)` would skip past it to an
    * older row).
    *
    * Determinism contract: callers must make the right side unique per
    * `(key, t)` (e.g. `groupBy(key, t).agg(max_by(...))`) — with
    * duplicates, "the" latest right row is undefined in ANY engine
    * (DuckDB ASOF picks arbitrarily too).
    *
    * Skew note: one key's rows sort within one task. Keys here are
    * users/entities (bounded history), not corpus-sized; a genuinely
    * unbounded key would need the [[graft.analysis.Packing]]-style
    * range-bucketed two-level scan.
    *
    * Output: every left column, then the matched right row's timestamp
    * as `<prefix><t>` and each right value column `c` as `<prefix><c>`
    * (null when no match).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, t: String,
               prefix: String = "r_"): DataFrame = {
    val lOther = left.columns.filterNot(c => c == key || c == t).toSeq
    val rVals = right.columns.filterNot(c => c == key || c == t).toSeq
    require(rVals.nonEmpty, "right side must carry at least one value column")
    require(!lOther.exists(rVals.contains),
      s"left/right value columns collide: ${lOther.intersect(rVals).mkString(",")}")
    val rPayload = StructType(
      StructField("rt", right.schema(t).dataType) +:
        rVals.map(c => right.schema(right.schema.fieldIndex(c))))
    val l2 = left.select(
      (col(key) :: col(t) :: lOther.map(col).toList) ++
        List(lit(null).cast(rPayload).as("__r"), lit(1L).as("__side")): _*)
    val r2 = right.select(
      (col(key) :: col(t) ::
        lOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)).toList) ++
        List(struct(col(t).as("rt") +: rVals.map(col): _*).as("__r"),
          lit(0L).as("__side")): _*)
    // right rows (side 0) sort BEFORE left rows at equal t -> inclusive
    val w = Window.partitionBy(col(key))
      .orderBy(col(t).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((col(key) :: col(t) :: lOther.map(col).toList) ++
        (col("__m.rt").as(s"$prefix$t") +:
          rVals.map(c => col(s"__m.$c").as(s"$prefix$c"))): _*)
  }

  /** Bucketed RANGE join: every (interval, point) pair with
    * `start <= t <= end`, computed as an EQUI-join on a time bucket.
    * Intervals explode to the buckets they cover (`sequence` over
    * `floor(start/b)..floor(end/b)` — bounded fan-out, ~len/b + 1 rows
    * each); each point maps to its ONE bucket, so a matching pair meets
    * in exactly one bucket and is emitted exactly once. The range
    * predicate rides on the equi-join as a post-condition.
    *
    * Why not the direct `t BETWEEN start AND end` join: Spark plans a
    * pure inequality join as broadcast-nested-loop — O(N·M) work that
    * no cluster size rescues at 10^9 x 10^9. The bucketed form is a
    * plain shuffled hash/sort-merge join whose volume is
    * SUM(points-per-bucket x intervals-covering-it): linear in both
    * inputs when `bucketSec` tracks the median interval length. A hot
    * time window is ordinary join skew — AQE's skew-join split applies.
    *
    * Column names must be disjoint across the two inputs (rename before
    * calling). With `joinType = "left_outer"`, an interval with no
    * matching point survives with null point columns — once per covered
    * bucket, so aggregate with null-skipping `count`/`countDistinct`
    * rather than treating rows as pairs.
    */
  def rangeJoinBucketed(intervals: DataFrame, points: DataFrame,
                        startCol: String, endCol: String, tCol: String,
                        bucketSec: Long,
                        joinType: String = "inner"): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    val collide = intervals.columns.toSet.intersect(points.columns.toSet)
    require(collide.isEmpty, s"column collision across inputs: $collide")
    val iv = intervals.withColumn("__ibkt",
      explode(sequence((col(startCol) / bucketSec).cast("long"),
        (col(endCol) / bucketSec).cast("long"))))
    val pt = points.withColumn("__pbkt", (col(tCol) / bucketSec).cast("long"))
    iv.join(pt,
        col("__ibkt") === col("__pbkt") &&
          col(tCol) >= col(startCol) && col(tCol) <= col(endCol),
        joinType)
      .drop("__ibkt", "__pbkt")
  }

  /** SCD2 versioning (Kimball slowly-changing-dimension type 2): turn a
    * change log — one row per `(key, t)` state change — into version
    * intervals `[valid_from, valid_to)` where `valid_to` is the NEXT
    * change's timestamp (exclusive, the standard SCD2 convention) and
    * null marks the current version. `version` numbers each key's
    * versions from 1 in time order.
    *
    * Plan shape: ONE exchange on `key`; both `lead` and `row_number`
    * share the same window sort, so Catalyst plans a single
    * Exchange+Sort feeding one Window operator. Nothing per-key is
    * buffered beyond the one-row lead lookahead — a key with a billion
    * changes streams through its task.
    *
    * Determinism contract (same as [[asofJoin]]): callers dedupe to one
    * row per `(key, t)` first — two changes at the same instant leave
    * "the" next version undefined in any engine.
    */
  def scd2(changes: DataFrame, key: String, t: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("valid_from").asc)
    val payload = changes.columns.filterNot(c => c == key || c == t).toSeq
    changes.select(
      (col(key) :: col(t).as("valid_from") :: payload.map(col).toList): _*)
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("version", row_number().over(w))
  }

  /** Point-in-time snapshot: each key's state as of instant `at`
    * (inclusive — a change AT `at` is visible). Implemented as a
    * filter + per-key argmax (`max_by` over the change struct), i.e.
    * one partial-aggregated exchange over only the rows at or before
    * `at` — NOT a window sort, and not a join against [[scd2]] output,
    * so a snapshot never pays for history later than `at`.
    * Keys whose first change is after `at` are absent (they did not
    * exist yet). Same one-row-per-`(key, t)` contract as [[scd2]].
    */
  def snapshotAsOf(changes: DataFrame, key: String, t: String,
                   at: Column): DataFrame = {
    val payload = changes.columns.filterNot(c => c == key || c == t).toSeq
    changes.filter(col(t) <= at)
      .groupBy(col(key))
      .agg(max_by(struct(col(t) +: payload.map(col): _*), col(t)).as("__s"))
      .select(col(key) +: (col(s"__s.$t") +: payload.map(c => col(s"__s.$c"))): _*)
  }
}
