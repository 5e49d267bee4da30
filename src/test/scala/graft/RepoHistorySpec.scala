package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.analysis.RepoHistory

/** Version-history operators: hand fixtures pinning the latest-version
  * rule (incl. the commit_ts tie broken on lexicographically larger
  * commit), as-of semantics (later-born paths vanish), churn's
  * revert-collapse, changed-since's latest-content contract, and the
  * one-exchange plan shape.
  */
class RepoHistorySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  //  rA/f.c : v ts=10 "one", ts=20 "two", ts=20 "zzz" (tie), ts=30 "two" (revert to content "two")
  //  rA/g.c : ts=15 "gee"
  //  rB/h.c : ts=25 "aitch", born after mark 18
  private def versions: DataFrame = {
    import spark.implicits._
    Seq(
      ("rA", "f.c", "aaaa", 10L, "one"),
      ("rA", "f.c", "bbbb", 20L, "two"),
      ("rA", "f.c", "cccc", 20L, "zzz"),
      ("rA", "f.c", "dddd", 30L, "two"),
      ("rA", "g.c", "eeee", 15L, "gee"),
      ("rB", "h.c", "ffff", 25L, "aitch")
    ).toDF("repo", "path", "commit", "commit_ts", "content")
  }

  test("latestSnapshot keeps one row per path; ties break on larger commit") {
    val got = RepoHistory.latestSnapshot(versions).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getString(2), r.getLong(3), r.getString(4)))).toMap
    assert(got === Map(
      ("rA", "f.c") -> (("dddd", 30L, "two")),
      ("rA", "g.c") -> (("eeee", 15L, "gee")),
      ("rB", "h.c") -> (("ffff", 25L, "aitch"))))
    // the tie itself: restrict to ts <= 20 — cccc ("zzz") must beat bbbb
    val tied = RepoHistory.snapshotAsOf(versions, 20L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(tied(("rA", "f.c")) === "cccc")
  }

  test("snapshotAsOf: later-born paths vanish; in-run marks pick the right version") {
    val got = RepoHistory.snapshotAsOf(versions, 18L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getString(2), r.getString(4)))).toMap
    // h.c (born ts=25) has NO row; f.c is at aaaa (ts=10 <= 18 < 20)
    assert(got === Map(
      ("rA", "f.c") -> (("aaaa", "one")),
      ("rA", "g.c") -> (("eeee", "gee"))))
  }

  test("churnStats: counts, lifetime, distinct contents collapse reverts") {
    val got = RepoHistory.churnStats(versions).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // f.c: 4 versions, contents {one, two, zzz} = 3 (the ts=30 revert collapses)
    assert(got === Map(
      ("rA", "f.c") -> ((4L, 10L, 30L, 3L)),
      ("rA", "g.c") -> ((1L, 15L, 15L, 1L)),
      ("rB", "h.c") -> ((1L, 25L, 25L, 1L))))
  }

  test("changedSince returns each changed path ONCE with its newest content") {
    val got = RepoHistory.changedSince(versions, 18L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    // f.c edited both before and after the mark -> once, at dddd;
    // g.c (ts=15) untouched since -> absent; h.c born after -> present
    assert(got === Map(("rA", "f.c") -> "dddd", ("rB", "h.c") -> "ffff"))
  }

  test("latestSnapshot plans exactly one exchange (the (repo, path) agg)") {
    val plan = RepoHistory.latestSnapshot(versions)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 2, // partial -> final agg
      s"more than the group-key exchange:\n$plan")
  }
}
