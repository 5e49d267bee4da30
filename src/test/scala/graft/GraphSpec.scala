package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.{Graph, Similarity}

/** Integer-exact PageRank: a hand-traced 4-node fixture (two mutually
  * linked hubs fed by a splitter, plus an isolated node), an independent
  * plain-Scala twin over the real k-NN graph, and the mass/determinism
  * contracts the micro-unit discipline guarantees.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** Independent reference: the same integer-exact recurrence. */
  private def refRank(edges: Seq[(Long, Long)], nodes: Seq[Long],
                      iters: Int): Map[Long, Long] = {
    val n = nodes.distinct
    def roundL(x: Double) =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val r0 = roundL(1e6 / n.size)
    val base = roundL(0.15 * 1e6 / n.size)
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = n.map(_ -> r0).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => pr(s) / outdeg(s) }.sum).toMap
      pr = n.map(v => v -> (base + inflow.getOrElse(v, 0L) * 85 / 100)).toMap
    }
    pr
  }

  test("hand fixture: two hubs + splitter + isolate, 2 iterations traced") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L), (3L, 2L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val got = Graph.pageRank(edges, nodes, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // r0 = 250000, base = 37500; after iter1 hubs hold
    // 37500 + (250000 + 125000)*85 div 100 = 356250, splitter/isolate 37500;
    // iter2 reproduces the same values (fixpoint reached)
    assert(got === Map(
      1L -> (356250L, 0.35625), 2L -> (356250L, 0.35625),
      3L -> (37500L, 0.0375), 4L -> (37500L, 0.0375)))
  }

  test("equals the plain-Scala twin on the real k-NN graph") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val knn = Similarity.knnGraph(emb, k = 5, kCells = 8)
      .select(col("vec_a").as("src"), col("vec_b").as("dst"))
    val nodes = emb.select(col("vec_id").as("id"))
    val got = Graph.pageRank(knn, nodes, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edgeSeq = knn.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nodeSeq = nodes.collect().map(_.getLong(0)).toSeq
    val expect = refRank(edgeSeq, nodeSeq, iters = 2)
    assert(got === expect)
    // anti-vacuity: ranks actually differentiate (a popular neighbor
    // outranks the uniform base somewhere)
    assert(got.values.toSet.size > 1)
  }

  test("mass contract: total micro mass never exceeds the initial 1e6") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst") // 2 is dangling
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    (0 to 3).foreach { it =>
      val total = Graph.pageRank(edges, nodes, iters = it)
        .agg(sum(col("pr_micro"))).collect().head.getLong(0)
      assert(total <= 1000002L, s"iters=$it total=$total") // +rounding slack
    }
  }
}
