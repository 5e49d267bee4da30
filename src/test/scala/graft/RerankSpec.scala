package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.{Rerank, Similarity}

/** MMR rerank: a hand-traced fixture where diversity overrules
  * relevance, the lambda=1 degeneration to pure relevance order, and
  * pool/contract checks on real embeddings.
  */
class RerankSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** vec 0 is the query [1,0]; 1 and 2 are EXACT duplicates highly
    * relevant to it; 3 is less relevant but diverse. All coordinates
    * are float-exact so the double math below is bit-faithful.
    */
  private def fixture = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.25f)),
      (2L, Array(1.0f, 0.25f)),
      (3L, Array(1.0f, 0.75f))).toDF("vec_id", "embedding")
  }

  test("hand-traced walk: diversity overrules relevance at lambda=0.3") {
    // rel(1) = rel(2) = 1/sqrt(1.0625); rel(3) = 1/1.25 = 0.8 exactly
    val rel1 = r6(1.0 / math.sqrt(1.0625))
    // sim(1,3) = (1 + 0.1875) / (sqrt(1.0625) * 1.25)
    val sim13 = r6(1.1875 / (math.sqrt(1.0625) * 1.25))
    // step 1: ties on score -> lowest vec_id, so 1 beats its duplicate 2
    val sc1 = r6(0.3 * rel1)
    // step 2: 2 scores 0.3*rel - 0.7*1 (dup of picked 1); 3 scores
    // 0.3*0.8 - 0.7*sim13 — diverse 3 must win
    val sc2dup = r6(0.3 * rel1 - 0.7 * 1.0)
    val sc3 = r6(0.3 * 0.8 - 0.7 * sim13)
    assert(sc3 > sc2dup, s"fixture must make diversity win ($sc3 vs $sc2dup)")

    val got = Rerank.mmrTopK(fixture, queryId = 0L, k = 3, pool = 3, lambda = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq((1L, 1L, sc1), (2L, 3L, sc3), (3L, 2L, sc2dup)))
  }

  test("lambda=1 degenerates to pure relevance (brute-force) order") {
    val got = Rerank.mmrTopK(emb, queryId = 0L, k = 10, pool = 20, lambda = 1.0)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val brute = Similarity.bruteForceTopK(emb, queryId = 0L, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === brute)
  }

  test("contracts on real embeddings: k distinct picks from the pool, relevance anchor") {
    val pool = Similarity.bruteForceTopK(emb, queryId = 0L, k = 20)
      .collect().map(_.getLong(0)).toSet
    val got = Rerank.mmrTopK(emb, queryId = 0L, k = 10, pool = 20, lambda = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.map(_._1) === (1L to 10L))
    val ids = got.map(_._2)
    assert(ids.distinct === ids)
    ids.foreach(id => assert(pool.contains(id), s"vec $id not in pool"))
    // the first pick is always the pure-relevance argmax
    val top1 = Similarity.bruteForceTopK(emb, queryId = 0L, k = 1)
      .collect().head.getLong(0)
    assert(ids.head === top1)
  }

  test("k exceeding the pool returns the whole pool, every member once") {
    val got = Rerank.mmrTopK(fixture, queryId = 0L, k = 10, pool = 3, lambda = 0.5)
      .collect().map(_.getLong(1)).toSeq
    assert(got.sorted === Seq(1L, 2L, 3L))
  }
}
