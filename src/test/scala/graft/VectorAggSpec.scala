package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.VectorAgg

/** Typed vector-sum Aggregator + group mean pooling
  * (analysis.VectorAgg): hand-computed centroids, equality with the
  * posexplode twin on real embeddings, the dimension contract, and the
  * explode-free plan shape.
  */
class VectorAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def embDf(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("hand-computed group centroids and counts") {
    val emb = embDf(
      0L -> Seq(1f, 2f), 2L -> Seq(3f, 4f),  // group 0 -> mean (2, 3)
      1L -> Seq(10f, 0f),                    // group 1 -> (10, 0)
      4L -> Seq[Float]())                    // degenerate, dropped
    val out = VectorAgg.groupCentroids(emb, col("vec_id") % 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Double](2)))
      .sortBy(_._1)
    assert(out.toSeq === Seq(
      ("0", 2L, Seq(2.0, 3.0)),
      ("1", 1L, Seq(10.0, 0.0))))
  }

  test("aggregator == posexplode twin on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = VectorAgg.groupCentroids(emb, col("vec_id") % 7)
      .select(col("group"), posexplode(col("centroid")))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getDouble(2))).toMap
    val twin = emb.filter(size(col("embedding")) > 0)
      .select((col("vec_id") % 7).cast("string").as("g"),
        posexplode(col("embedding")))
      .groupBy(col("g"), col("pos"))
      .agg(round(avg(col("col").cast("double")), 6).as("v"))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(got === twin)
  }

  test("dimension mismatch and empty vectors throw") {
    val bad = embDf(0L -> Seq(1f, 2f), 2L -> Seq(1f, 2f, 3f))
    val ex = intercept[Exception] {
      VectorAgg.groupCentroids(bad, lit("all")).collect()
    }
    assert(ex.getMessage.contains("dimension mismatch") ||
      ex.getCause != null)
  }

  test("plan is a typed partial aggregate, never a per-dimension explode") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = VectorAgg.groupCentroids(emb, col("vec_id") % 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), "posexplode leaked into the plan")
    assert(plan.contains("Aggregate"), "expected a partial aggregate")
  }
}
