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

  // ---- product quantization ----

  /** d=4, m=2 (two 2-dim subspaces), k=2, one Lloyd step. Seeds are the
    * subvectors of vec 1 and 2. Hand trace:
    *   sub0 seeds [0,0] / [10,0]: iter-0 assign 1->0, 2->1, 3->0, 4->1;
    *     means -> c0=[0.5,0.5], c1=[9.5,0.5]
    *   sub1 seeds [0,0] / [0,10]: iter-0 assign 1->0, 2->1, 3->1
    *     (162 vs 82), 4->1 (82 vs 2); means -> c0=[0,0],
    *     c1=[10/3, 28/3] -> rounded [3.333333, 9.333333]
    *   final codes: 1->(0,0), 2->(1,1), 3->(0,1), 4->(1,1)
    */
  private def pqFixture = {
    import spark.implicits._
    Seq(
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(10.0f, 0.0f, 0.0f, 10.0f)),
      (3L, Array(1.0f, 1.0f, 9.0f, 9.0f)),
      (4L, Array(9.0f, 1.0f, 1.0f, 9.0f))).toDF("vec_id", "embedding")
  }

  test("pqCodebooks/pqCodes: hand-computed Lloyd step and codes") {
    val books = Quantization.pqCodebooks(pqFixture, m = 2, k = 2, iters = 1)
    assert(books(0).map { case (c, v) => (c, v.toSeq) } ===
      Seq((0L, Seq(0.5, 0.5)), (1L, Seq(9.5, 0.5))))
    assert(books(1).map { case (c, v) => (c, v.toSeq) } ===
      Seq((0L, Seq(0.0, 0.0)), (1L, Seq(3.333333, 9.333333))))
    val codes = Quantization.pqCodes(pqFixture, m = 2, k = 2, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(codes === Set(
      (1L, 0L, 0L), (1L, 1L, 0L),
      (2L, 0L, 1L), (2L, 1L, 1L),
      (3L, 0L, 0L), (3L, 1L, 1L),
      (4L, 0L, 1L), (4L, 1L, 1L)))
  }

  test("pqCodebooks: a codebook entry that loses every member drops out") {
    import spark.implicits._
    // sub1 seeds are duplicates ([0,0] twice): every sub1 vector ties or
    // lands on cid 0, so cid 1 has no members and must disappear after
    // the update step (the SQL oracle's mean CTE has no rows for it)
    val fx = Seq(
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(10.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(9.0f, 1.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val books = Quantization.pqCodebooks(fx, m = 2, k = 2, iters = 1)
    assert(books(1).map(_._1) === Seq(0L))
    assert(books(1).head._2.toSeq === Seq(0.0, 0.333333))
    val codes = Quantization.pqCodes(fx, m = 2, k = 2, iters = 1)
      .filter("sub = 1").collect().map(_.getLong(2)).toSet
    assert(codes === Set(0L))
  }

  test("pqTopK: ADC cosine matches an independent reconstruction twin") {
    // query = vec 2 (raw [10,0,0,10]); reconstructions from the traced
    // codebooks above; expected cosines computed by plain Scala
    // arithmetic, independent of the library's LUT assembly
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val q = Array(10.0, 0.0, 0.0, 10.0)
    val nq = math.sqrt(q.map(x => x * x).sum)
    def cosExp(recon: Array[Double]) = {
      val dot = recon.zip(q).map { case (a, b) => a * b }.sum
      r6(dot / (math.sqrt(recon.map(x => x * x).sum) * nq))
    }
    val want = Seq(
      4L -> cosExp(Array(9.5, 0.5, 3.333333, 9.333333)),
      3L -> cosExp(Array(0.5, 0.5, 3.333333, 9.333333)),
      1L -> cosExp(Array(0.5, 0.5, 0.0, 0.0)))
    val got = Quantization.pqTopK(pqFixture, queryId = 2L, k = 3, m = 2,
      kCents = 2, iters = 1).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === want)
    assert(got.last._2 === 0.5) // exact by construction
  }

  test("pqCodes/pqTopK contracts on real embeddings (m=4, k=8)") {
    val codes = Quantization.pqCodes(emb, m = 4, k = 8, iters = 1)
    assert(codes.count() === 4L * emb.count())
    assert(codes.filter(col("code") < 0 || col("code") >= 8).count() === 0L)
    val top = Quantization.pqTopK(emb, queryId = 0L, k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.length === 10)
    assert(!top.map(_._1).contains(0L))
    assert(top.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }
}
