package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.{Clustering, Similarity}

/** Cell-local k-NN graph: a two-cell hand fixture, an independent
  * plain-Scala twin over the real embeddings, and structural contracts
  * (no self edges, neighbors share the source's cell, ranks dense).
  */
class KnnGraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("two-cell fixture: neighbors stay cell-local, ranked by cosine") {
    import spark.implicits._
    // seeds = vecs 0 ([1,0]) and 1 ([0,1]); 2,3 join cell 0; 4 joins cell 1
    val fx = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(4.0f, 1.0f)),
      (3L, Array(2.0f, 0.0f)),
      (4L, Array(1.0f, 8.0f))).toDF("vec_id", "embedding")
    val got = Similarity.knnGraph(fx, k = 2, kCells = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4)).toList
    def cos(a: (Double, Double), b: (Double, Double)) =
      r6((a._1 * b._1 + a._2 * b._2) /
        (math.sqrt(a._1 * a._1 + a._2 * a._2) * math.sqrt(b._1 * b._1 + b._2 * b._2)))
    val v = Map(0L -> ((1.0, 0.0)), 1L -> ((0.0, 1.0)), 2L -> ((4.0, 1.0)),
      3L -> ((2.0, 0.0)), 4L -> ((1.0, 8.0)))
    // cell 0 = {0,2,3}, cell 1 = {1,4}; vec 0's neighbors: 3 (cos 1.0)
    // then 2; vec 1 and 4 have only each other. Vec 2 ties exactly on
    // its two neighbors (0 and 3 are parallel) -> lower vec_b first.
    assert(cos(v(2L), v(0L)) === cos(v(2L), v(3L)))
    assert(got === List(
      (0L, 3L, 1.0, 1L), (0L, 2L, cos(v(0L), v(2L)), 2L),
      (1L, 4L, cos(v(1L), v(4L)), 1L),
      (2L, 0L, cos(v(2L), v(0L)), 1L), (2L, 3L, cos(v(2L), v(3L)), 2L),
      (3L, 0L, 1.0, 1L), (3L, 2L, cos(v(3L), v(2L)), 2L),
      (4L, 1L, cos(v(4L), v(1L)), 1L)))
  }

  test("real embeddings: matches an independent per-cell twin") {
    val cells = Clustering.assign(emb, 8)
      .select(col("vec_id"), col("cluster"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      r6(d / (math.sqrt(na) * math.sqrt(nb)))
    }
    val expect = (for {
      (a, ca) <- cells.toSeq
      ranked = cells.toSeq.filter { case (b, cb) => cb == ca && b != a }
        .map { case (b, _) => (b, cos(vecs(a), vecs(b))) }
        .sortBy { case (b, c) => (-c, b) }.take(5)
      ((b, c), i) <- ranked.zipWithIndex
    } yield (a, b, c, i + 1L)).toSet
    val got = Similarity.knnGraph(emb, k = 5, kCells = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got === expect)
  }

  test("plan: ONE wide exchange — the rank window reuses the join's cluster partitioning") {
    val plan = Similarity.knnGraph(emb, k = 5, kCells = 8)
      .queryExecution.executedPlan.toString
    val wide = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    // the cluster equi-join's two build/probe exchanges are the only
    // wide shuffles; the (cluster, vec_a) window must NOT add a third
    // re-shuffle of the sum(cell^2)-sized pair set
    assert(wide <= 2, plan.take(3000))
  }

  test("contracts: no self edges, dense ranks from 1, rnk <= k") {
    val rows = Similarity.knnGraph(emb, k = 3, kCells = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (a, b, _) => a != b })
    assert(rows.forall(_._3 <= 3L))
    rows.groupBy(_._1).foreach { case (a, es) =>
      assert(es.map(_._3).sorted.toSeq === (1L to es.length).toSeq, s"vec $a")
    }
  }
}
