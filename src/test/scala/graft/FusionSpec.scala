package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.{Fusion, Similarity, TextAnalysis}

/** Reciprocal-rank fusion: hand fixture against an independent
  * nano-unit twin, the consensus property (a doc in both lists beats a
  * doc in one), tie-break and top-k contracts, and the real hybrid
  * dense+sparse composition.
  */
class FusionSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def nano(rnk: Long, k0: Int = 60): Long =
    BigDecimal(1e9 / (k0 + rnk)).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("hand fixture: nano sums, consensus wins, ties to lower id") {
    import spark.implicits._
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rnk")
    val b = Seq((20L, 1L), (40L, 2L)).toDF("id", "rnk")
    val got = Fusion.rrf(Seq(a, b), k0 = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toList.sortBy(_._4)
    val expect = List(
      (20L, nano(2) + nano(1), 2L, 1L), // in both lists -> consensus top
      (10L, nano(1), 1L, 2L),
      (40L, nano(2), 1L, 3L),
      (30L, nano(3), 1L, 4L))
    assert(got === expect)
  }

  test("tie-break: equal scores order by id; topK cuts after ranking") {
    import spark.implicits._
    val a = Seq((5L, 1L), (3L, 2L)).toDF("id", "rnk")
    val b = Seq((9L, 1L), (7L, 2L)).toDF("id", "rnk")
    val got = Fusion.rrf(Seq(a, b), k0 = 60, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toList.sortBy(_._2)
    // 5 and 9 tie at nano(1) -> id asc; 3 and 7 tie at nano(2), only 3 fits
    assert(got === List((5L, 1L), (9L, 2L), (3L, 3L)))
  }

  test("real hybrid composition: fused set ⊆ union of legs, consensus ids present, nano twin") {
    import org.apache.spark.sql.expressions.Window
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dense = Similarity.bruteForceTopK(emb, queryId = 0L, k = 10)
      .withColumn("rnk", row_number().over(
        Window.orderBy(desc("cosine"), asc("vec_id"))).cast("long"))
      .select(col("vec_id").as("id"), col("rnk"))
    val sparse = TextAnalysis.tokens(docs).filter(col("term") === "spark")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("tf"))
      .orderBy(desc("tf"), asc("doc_id")).limit(10)
      .withColumn("rnk", row_number().over(
        Window.orderBy(desc("tf"), asc("doc_id"))).cast("long"))
      .select(col("doc_id").as("id"), col("rnk"))
    val dl = dense.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val sl = sparse.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = Fusion.rrf(Seq(dense, sparse), k0 = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toList.sortBy(_._4)
    assert(got.nonEmpty && got.size <= 10)
    got.foreach { case (id, rrfNano, nLists, _) =>
      val expect = dl.get(id).map(nano(_)).getOrElse(0L) +
        sl.get(id).map(nano(_)).getOrElse(0L)
      assert(rrfNano === expect, s"id $id")
      assert(nLists === Seq(dl.contains(id), sl.contains(id)).count(identity))
    }
    // the fused top-k is exactly the twin's top-k over the union
    val twin = (dl.keySet ++ sl.keySet).toSeq
      .map(id => (id, dl.get(id).map(nano(_)).getOrElse(0L) +
        sl.get(id).map(nano(_)).getOrElse(0L)))
      .sortBy { case (id, n) => (-n, id) }.take(10).map(_._1)
    assert(got.map(_._1) === twin.toList)
  }

  test("combFusion hand fixture: min-max micro-units, degenerate list, MNZ") {
    import spark.implicits._
    val a = Seq((1L, 10.0), (2L, 5.0), (3L, 0.0)).toDF("id", "score")
    val b = Seq((2L, 7.0), (4L, 7.0)).toDF("id", "score") // degenerate
    val sum = Fusion.combFusion(Seq(a, b), topK = 10, mnz = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toList.sortBy(_._4)
    // a normalizes to 1e6/5e5/0; b (max==min) gives 1e6 to both members
    assert(sum === List(
      (2L, 1500000L, 2L, 1L),
      (1L, 1000000L, 1L, 2L),
      (4L, 1000000L, 1L, 3L),  // tie with 1 -> id asc
      (3L, 0L, 1L, 4L)))
    val mnz = Fusion.combFusion(Seq(a, b), topK = 10, mnz = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(mnz(2L) === 3000000L) // x2 lists
    assert(mnz(1L) === 1000000L)
  }

  test("MNZ rewards agreement where SUM prefers the single strong leg") {
    import spark.implicits._
    val a = Seq((1L, 1.0), (2L, 0.45), (9L, 0.0)).toDF("id", "score")
    val b = Seq((9L, 1.0), (2L, 0.45), (7L, 0.0)).toDF("id", "score")
    def order(mnz: Boolean) = Fusion.combFusion(Seq(a, b), 10, mnz)
      .collect().map(_.getLong(0)).toList
    // SUM: 1 and 9 tie at 1e6 (id asc), then 2 at 0.9e6
    assert(order(mnz = false) === List(1L, 9L, 2L, 7L))
    // MNZ: 9 (1e6 x 2) > 2 (0.9e6 x 2) > 1 (1e6 x 1)
    assert(order(mnz = true) === List(9L, 2L, 1L, 7L))
  }
}
