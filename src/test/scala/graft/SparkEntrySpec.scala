package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() must return rows on sf0.001, and every
  * queries/oracleSql key must be consistent.
  */
class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("entry() returns results (driver smoke contract)") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("every queries entry has an oracleSql (no amber rows in the driver gate)") {
    // round-1 lesson: a queries entry without oracle SQL degrades to a
    // rows-only check and shows up as err=no_oracle in CORRECTNESS
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracleSql: $missing")
  }

  test("all queries run on sf0.001 and return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }
}
