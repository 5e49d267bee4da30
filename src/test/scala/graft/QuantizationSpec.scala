package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis._

/** SQ8 scalar quantization: hand-computed codes/reconstruction on a
  * 3-dim fixture (incl. the vmax clamp and a degenerate dimension), the
  * analytic reconstruction-error bound on the real embeddings table, and
  * the quantized top-k contract.
  */
class QuantizationSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("quantize: hand-computed codes + midpoint recon, clamp and degenerate dim") {
    import spark.implicits._
    // dim1 env [0,10], dim2 env [10,30], dim3 degenerate [7,7]; levels=4:
    //   code = floor((v-vmin)*4/span) clamped to 3; v==vmax hits the clamp
    //   recon = vmin + (code+0.5)*span/4; degenerate dim -> code 0, recon vmin
    val fx = Seq(
      (1L, Array(0.0f, 10.0f, 7.0f)),
      (2L, Array(5.0f, 30.0f, 7.0f)),
      (3L, Array(10.0f, 20.0f, 7.0f))).toDF("vec_id", "embedding")
    val got = Quantization.quantizeExploded(fx, levels = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val want = Set(
      (1L, 1L, 0L, 1.25), (1L, 2L, 0L, 12.5), (1L, 3L, 0L, 7.0),
      (2L, 1L, 2L, 6.25), (2L, 2L, 3L, 27.5), (2L, 3L, 0L, 7.0),
      (3L, 1L, 3L, 8.75), (3L, 2L, 2L, 22.5), (3L, 3L, 0L, 7.0))
    assert(got === want)
    intercept[IllegalArgumentException] { Quantization.quantize(fx, levels = 1) }
  }

  test("quantize: recon error bounded by span/(2*levels) on real embeddings") {
    val levels = 256
    val q = Quantization.quantizeExploded(emb, levels)
    val env = Quantization.dimStats(emb)
    val joined = q.join(env, Seq("dim"))
      .join(Similarity.explodeDims(emb), Seq("vec_id", "dim"))
    // midpoint dequantization: |recon - v| <= span/(2*levels), plus the
    // 6-dp rounding of recon (5e-7) — including at the vmax clamp, whose
    // error is span/(2*levels) exactly
    val viol = joined.filter(
      abs(col("recon") - col("v")) >
        (col("vmax") - col("vmin")) / (2.0 * levels) + lit(5.1e-7)).count()
    assert(viol === 0L)
    // codes stay inside [0, levels-1]
    assert(q.filter(col("code") < 0 || col("code") >= levels).count() === 0L)
  }

  test("quantizedTopK: k rows, cosine non-increasing, excludes the query") {
    val top = Quantization.quantizedTopK(emb, queryId = 0L, k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.length === 10)
    assert(!top.map(_._1).contains(0L))
    assert(top.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }
}
