package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.LanguageModel

/** N-gram LM perplexity scoring (analysis.LanguageModel): the Dirichlet
  * bigram / Laplace unigram model pinned by hand-computed fixtures —
  * self-scoring, cross-corpus OOV fallbacks, the frozen kept-token rule,
  * and the perplexity gate.
  */
class LanguageModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r4(x: Double) =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  // fixture LM: docs "a b a" + "b b" -> uni a:2 b:3 (total 5, vocab 2,
  // Laplace denom 8), bi (a,b):1 (b,a):1 (b,b):1; mu = 10
  private val puA = 3.0 / 8.0
  private val puB = 4.0 / 8.0

  test("hand-computed self-scoring: counts, smoothing, first-token term") {
    val docs = df(1L -> "a b a", 2L -> "b b")
    val out = LanguageModel.scoreDocs(docs, docs, mu = 10.0).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val s1 = math.log(puA) +                      // first: p_u(a)
      math.log((1.0 + 10 * puB) / (2.0 + 10)) +   // a -> b
      math.log((1.0 + 10 * puA) / (3.0 + 10))     // b -> a
    val s2 = math.log(puB) +                      // first: p_u(b)
      math.log((1.0 + 10 * puB) / (3.0 + 10))     // b -> b
    assert(out(1L) === ((3L, r6(s1 / 3), r4(math.exp(-s1 / 3)))))
    assert(out(2L) === ((2L, r6(s2 / 2), r4(math.exp(-s2 / 2)))))
  }

  test("cross-corpus scoring: OOV tokens fall back to Laplace/Dirichlet floors") {
    val lm = df(1L -> "a b a", 2L -> "b b")
    val target = df(7L -> "z a")
    val out = LanguageModel.scoreDocs(target, lm, mu = 10.0).collect()
    assert(out.length === 1)
    val s = math.log(1.0 / 8.0) +              // p_u(z): count 0 + 1 over 8
      math.log((0.0 + 10 * puA) / (0.0 + 10))  // unseen bigram, unseen prev
    assert(out.head.getLong(1) === 2L)
    assert(out.head.getDouble(2) === r6(s / 2))
  }

  test("frozen kept-token rule applies; zero-token docs are omitted") {
    val lm = df(1L -> "a b a", 2L -> "b b")
    // 'A' lowercases, 'w0rd_1' and the 25-char token drop
    val target = df(8L -> ("A b w0rd_1 " + "x" * 25), 9L -> "123 !!")
    val out = LanguageModel.scoreDocs(target, lm, mu = 10.0).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(8L))
    val s = math.log(puA) + math.log((1.0 + 10 * puB) / (2.0 + 10)) // "a b"
    assert(out.head.getLong(1) === 2L)
    assert(out.head.getDouble(2) === r6(s / 2))
  }

  test("perplexityFilter keeps exactly the docs at or under the gate") {
    val lm = df(1L -> "a b a", 2L -> "b b")
    val target = df(1L -> "a b a", 7L -> "z z z z")
    val scored = LanguageModel.scoreDocs(target, lm, mu = 10.0).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scored(7L) > scored(1L), "OOV gibberish must score higher ppl")
    val cut = (scored(1L) + scored(7L)) / 2
    val kept = LanguageModel.perplexityFilter(target, lm, maxPpl = cut, mu = 10.0)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(1L))
  }

  test("bigram table is the lag-window truth (per-row slices == window pairs)") {
    val docs = df(1L -> "a b c a b", 2L -> "b a")
    val got = LanguageModel.bigrams(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === Map(("a", "b") -> 2L, ("b", "c") -> 1L,
      ("c", "a") -> 1L, ("b", "a") -> 1L))
  }
}
