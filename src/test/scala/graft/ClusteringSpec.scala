package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Clustering

/** Hand-planted k-means fixtures: deterministic seeding, argmin
  * assignment with lowest-id tie-break, and the Lloyd update digest.
  */
class ClusteringSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  // seeds are vec 0 = (0,0) and vec 1 = (10,0); the rest are planted at
  // known distances, including an exact tie at (5,0)
  private def emb = {
    import spark.implicits._
    Seq(
      (0L, Array(0f, 0f)),
      (1L, Array(10f, 0f)),
      (2L, Array(1f, 0f)),   // cluster 0, dist2 1
      (3L, Array(9f, 0f)),   // cluster 1, dist2 1
      (4L, Array(5f, 0f)),   // exact tie (25, 25) -> cluster 0
      (5L, Array(10f, 2f))   // cluster 1, dist2 4
    ).toDF("vec_id", "embedding")
  }

  test("assign: nearest seed centroid, exact ties to the lowest cluster") {
    import spark.implicits._
    val got = Clustering.assign(emb, k = 2)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got === Array(
      (0L, 0L, 0.0), (1L, 1L, 0.0), (2L, 0L, 1.0),
      (3L, 1L, 1.0), (4L, 0L, 25.0), (5L, 1L, 4.0)))
  }

  test("updateStats: per-cluster size and mean-centroid norm") {
    import spark.implicits._
    val got = Clustering.updateStats(emb, k = 2)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    // cluster 0 = {(0,0),(1,0),(5,0)} -> mean (2,0), norm 2
    // cluster 1 = {(10,0),(9,0),(10,2)} -> mean (29/3, 2/3), norm sqrt(845)/3
    val n1 = BigDecimal(math.sqrt(845.0) / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Array((0L, 3L, 2.0), (1L, 3L, n1)))
  }

  test("iteratedCentroids: iters=0 returns the seeds; assignWith == assign on them") {
    import spark.implicits._
    val c0 = Clustering.iteratedCentroids(emb, k = 2, iters = 0)
    assert(c0.map { case (j, c) => (j, c.toSeq) } ===
      Seq((0L, Seq(0.0, 0.0)), (1L, Seq(10.0, 0.0))))
    val a = Clustering.assignWith(emb, c0).as[(Long, Long, Double)].collect().sortBy(_._1)
    val b = Clustering.assign(emb, k = 2).as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(a === b)
  }

  test("iteratedCentroids: one Lloyd step re-centers at the member means") {
    import spark.implicits._
    val c1 = Clustering.iteratedCentroids(emb, k = 2, iters = 1)
    // iteration-1 members: cluster 0 = {(0,0),(1,0),(5,0)} -> (2, 0);
    // cluster 1 = {(10,0),(9,0),(10,2)} -> (29/3, 2/3)
    assert(c1.map { case (j, c) => (j, c.toSeq) } ===
      Seq((0L, Seq(2.0, 0.0)), (1L, Seq(29.0 / 3, 2.0 / 3))))
    // re-assignment against the new centroids: (5,0) stays with 0
    // (dist2 9 vs ~21.8); everything else keeps its cluster
    val got = Clustering.assignWith(emb, c1)
      .as[(Long, Long, Double)].collect().sortBy(_._1).map(t => (t._1, t._2))
    assert(got === Array((0L, 0L), (1L, 1L), (2L, 0L), (3L, 1L), (4L, 0L), (5L, 1L)))
  }

  test("seedCentroids: the k smallest vec_ids in order; too-small corpus rejected") {
    val cents = Clustering.seedCentroids(emb, 2)
    assert(cents.map(_.toSeq) === Array(Seq(0.0, 0.0), Seq(10.0, 0.0)).map(_.toSeq))
    assertThrows[IllegalArgumentException](Clustering.seedCentroids(emb, 7))
  }
}
