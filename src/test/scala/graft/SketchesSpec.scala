package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.Sketches

/** KMV distinct-count sketch: the portable hash against a plain-Scala
  * twin (pins Spark's split("")-trailing-empty handling), the exact
  * below-k rule, the full-sketch estimator on a hand fixture, and an
  * accuracy sanity band on the real corpus.
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val P = 2147483647L

  /** Independent reference implementation of the portable hash. */
  private def refHash(term: String): Long = {
    val f = term.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % P)
    (f * 2654435761L) % P + 1
  }

  private def r4(x: Double) =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("portableTermHash equals the plain-Scala fold (split('') trailing empty filtered)") {
    import spark.implicits._
    val terms = Seq("a", "ab", "the", "zzzz", "quick", "nineteencharstring")
    val got = terms.toDF("term")
      .select(col("term"), Sketches.portableTermHash(col("term")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.foreach { t =>
      assert(got(t) === refHash(t), s"term '$t'")
      assert(got(t) >= 1L && got(t) <= P)
    }
  }

  test("below-k rule: fewer distinct terms than k reports the exact count") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma", "en"),
      (2L, "beta gamma alpha", "en") // same 3 distinct terms
    ).toDF("doc_id", "text", "lang")
    val row = Sketches.kmvDistinct(docs, k = 64).collect()
    assert(row.length === 1)
    assert(row.head.getLong(1) === 3L)       // n_kept
    assert(row.head.getDouble(3) === 3.0)    // est = exact
    assert(row.head.getLong(2) === Seq("alpha", "beta", "gamma").map(refHash).max)
  }

  test("full sketch: hand fixture replays the (k-1) * 2^31 / kth estimator") {
    import spark.implicits._
    val words = (0 until 40).map(i => ('a' + i % 26).toChar.toString * (i / 26 + 1))
    val docs = Seq((1L, words.mkString(" "), "en")).toDF("doc_id", "text", "lang")
    val k = 8
    val hashes = words.distinct.map(refHash).distinct.sorted
    val kth = hashes(k - 1)
    val row = Sketches.kmvDistinct(docs, k).collect().head
    assert(row.getLong(1) === k.toLong)
    assert(row.getLong(2) === kth)
    assert(row.getDouble(3) === r4((k - 1).toDouble * 2147483648.0 / kth))
  }

  // ---------- Count-Min sketch ----------

  /** Independent reference of the row-r CMS column index. */
  private def refCmsCol(term: String, r: Long, width: Int): Long = {
    val f = term.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % P)
    ((f + r * 131L) % P * 2654435761L % P + 1L) % width
  }

  test("cms: hand fixture grid equals the plain-Scala cell sums") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha", "en"),
      (2L, "beta gamma", "en")
    ).toDF("doc_id", "text", "lang")
    val (depth, width) = (3, 16)
    val tf = Map("alpha" -> 2L, "beta" -> 2L, "gamma" -> 1L)
    val want = (for {
      (t, n) <- tf.toSeq; r <- 0L until depth.toLong
    } yield (r, refCmsCol(t, r, width)) -> n)
      .groupMapReduce(_._1)(_._2)(_ + _)
    val got = Sketches.cmsCounters(docs, depth, width).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(got === want)
  }

  test("cms: grids merge cell-wise — sketch(A ++ B) == sketch(A) + sketch(B)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    def grid(d: org.apache.spark.sql.DataFrame) =
      Sketches.cmsCounters(d, depth = 4, width = 128).collect()
        .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    val merged = (grid(a).toSeq ++ grid(b).toSeq)
      .groupMapReduce(_._1)(_._2)(_ + _)
    assert(grid(docs) === merged)
  }

  test("cms: estimates never under-count; empty cells read 0; no-collision probes are exact") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = Sketches.cmsEstimate(docs, depth = 4, width = 4096,
        probes = Seq("spark", "merge", "dup", "qqqqabsent"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSet ===
      Set("spark", "merge", "dup", "qqqqabsent"))
    rows.foreach { case (t, est, exact) =>
      assert(est >= exact, s"CMS under-counted '$t': $est < $exact")
    }
    // wide grid vs the sf0.001 vocab: the absent probe must find at
    // least one empty cell (est 0); present probes must be counted
    val byTerm = rows.map(r => r._1 -> (r._2, r._3)).toMap
    assert(byTerm("qqqqabsent") === ((0L, 0L)))
    Seq("spark", "merge", "dup").foreach { t =>
      assert(byTerm(t)._2 > 0L, s"probe '$t' should exist in the corpus")
    }
  }

  test("estimator sanity on the real corpus: within a loose band of exact distinct") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = graft.analysis.TextAnalysis.tokens(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang")).agg(countDistinct(col("term")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketches.kmvDistinct(docs, k = 64).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toList
    assert(est.map(_._1).toSet === exact.keySet)
    est.foreach { case (lang, nKept, e) =>
      val x = exact(lang)
      if (nKept < 64) assert(e === x.toDouble, s"$lang exact path")
      else assert(e > x / 3.0 && e < x * 3.0, s"$lang est $e vs exact $x")
    }
  }

  // ---------- HyperLogLog ----------

  /** Independent reference of the (bucket, rank) HLL cell for m. */
  private def refHllCell(term: String, m: Int): (Long, Long) = {
    val wBits = 31 - Integer.numberOfTrailingZeros(m)
    val h = refHash(term)
    val w = h / m
    val rank = if (w == 0) wBits + 1L
               else wBits - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1L
    (h % m, rank)
  }

  test("hll: register grid equals the plain-Scala cell maxima") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "en"),
      (2L, "beta zeta eta theta alpha", "en"),
      (3L, "iota kappa", "fr")
    ).toDF("doc_id", "text", "lang")
    val m = 16
    val terms = Map(
      "en" -> Seq("alpha", "beta", "gamma", "delta", "epsilon",
        "zeta", "eta", "theta"),
      "fr" -> Seq("iota", "kappa"))
    val want = (for {
      (lang, ts) <- terms.toSeq; t <- ts
    } yield { val (b, r) = refHllCell(t, m); (lang, b) -> r })
      .groupMapReduce(_._1)(_._2)(math.max)
    val got = Sketches.hllRegisters(docs, m).collect()
      .map(x => (x.getString(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(got === want)
  }

  test("hll: grids merge by cellwise MAX — registers(A ++ B) == max(registers(A), registers(B))") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    def grid(d: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(d, m = 64).collect()
        .map(x => (x.getString(0), x.getLong(1)) -> x.getLong(2)).toMap
    val merged = (grid(a).toSeq ++ grid(b).toSeq)
      .groupMapReduce(_._1)(_._2)(math.max)
    assert(grid(docs) === merged)
  }

  test("hll: linear-counting branch on a tiny corpus (zeros > 0)") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma", "en")).toDF("doc_id", "text", "lang")
    val m = 64
    val row = Sketches.hllEstimate(docs, m).collect().head
    val buckets = Seq("alpha", "beta", "gamma").map(t => refHllCell(t, m)._1).distinct
    val zeros = m - buckets.size
    assert(row.getLong(1) === buckets.size.toLong) // n_set
    assert(row.getLong(2) === zeros.toLong)
    assert(row.getDouble(4) === r4(math.log(m.toDouble / zeros) * m)) // est_distinct
  }

  test("hll: estimator sanity on the real corpus (m=64, ~13% std error band x3)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = graft.analysis.TextAnalysis.tokens(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang")).agg(countDistinct(col("term")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketches.hllEstimate(docs, m = 64).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(est.keySet === exact.keySet)
    est.foreach { case (lang, e) =>
      val x = exact(lang)
      assert(e > x * 0.6 && e < x * 1.67, s"$lang est $e vs exact $x")
    }
  }

  test("hll: m must be a power of two") {
    import spark.implicits._
    val docs = Seq((1L, "a b", "en")).toDF("doc_id", "text", "lang")
    intercept[IllegalArgumentException] { Sketches.hllRegisters(docs, 48) }
    intercept[IllegalArgumentException] { Sketches.hllRegisters(docs, 8192) }
  }
}
