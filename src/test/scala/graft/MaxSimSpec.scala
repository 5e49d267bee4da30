package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Similarity

/** Late-interaction MaxSim retrieval (Similarity.maxSimTopK): hand
  * fixture incl. the reordered-halves case pooled cosine washes out and
  * the degenerate-subvector floor, the m = 1 degeneration to plain
  * cosine on real embeddings, and the dimension-homogeneity filter.
  */
class MaxSimSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def embDf(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("hand-computed m=2 fixture: swap-invariance, ties, zero-norm floor") {
    val emb = embDf(
      0L -> Seq(1f, 0f, 0f, 1f),   // query
      1L -> Seq(0f, 1f, 1f, 0f),   // the query with halves SWAPPED
      2L -> Seq(1f, 0f, 0f, 1f),   // identical
      3L -> Seq(1f, 1f, 0f, 0f))   // second subvector zero-norm
    val out = Similarity.maxSimTopK(emb, queryId = 0L, k = 10, m = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // v1: each query half finds its best match in the OTHER doc half -> 2
    // v2: identical -> 2; tie broken by vec_id
    // v3: both query halves best-match the first doc half (1/sqrt(2));
    //     the zero-norm second half floors at -1 and never wins
    val r6 = (x: Double) =>
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === Seq(1L -> 2.0, 2L -> 2.0, 3L -> r6(2.0 / math.sqrt(2.0))))
    // pooled single-vector cosine CANNOT see the swapped match
    val pooled = Similarity.cosineToQuery(emb, 0L).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pooled(1L) === 0.0)
  }

  test("m = 1 degenerates to plain brute-force cosine (real embeddings)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ms = Similarity.maxSimTopK(emb, queryId = 0L, k = 10, m = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val bf = Similarity.bruteForceTopK(emb, queryId = 0L, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ms === bf)
  }

  test("dimension-mismatched vectors are filtered; bad m rejected") {
    val emb = embDf(
      0L -> Seq(1f, 0f, 0f, 1f),
      1L -> Seq(1f, 0f),           // wrong dimension
      2L -> Seq(0f, 1f, 1f, 0f))
    val ids = Similarity.maxSimTopK(emb, 0L, 10, 2)
      .collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(2L))
    val ex = intercept[IllegalArgumentException] {
      Similarity.maxSimTopK(emb, 0L, 10, 3)
    }
    assert(ex.getMessage.contains("not divisible"))
  }
}
