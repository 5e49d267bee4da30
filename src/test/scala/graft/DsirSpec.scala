package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.{Dsir, Sketches}

/** DSIR importance weights: a hand-traceable two-lang corpus replayed by
  * an independent plain-Scala twin (same smoothing, same micro-unit
  * freeze), feature-construction edges (0/1-token docs), and the
  * monotonicity the operator exists for — target-domain docs outscore
  * off-domain docs.
  */
class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val P = 2147483647L

  private def refHash(s: String): Long = {
    val f = s.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % P)
    (f * 2654435761L) % P + 1
  }

  /** Independent reference: per-doc bigram buckets + micro-unit scores. */
  private def refScores(docs: Seq[(Long, String, String)], target: String,
                        nBuckets: Int): Map[Long, (Long, Long)] = {
    def keep(text: String): Seq[String] = text.split("\\s+").toSeq
      .filter(t => t.matches("[A-Za-z]+") && t.length < 20)
      .map(_.toLowerCase)
    val feats = docs.map { case (id, text, lang) =>
      val t = keep(text)
      (id, lang, t.zip(t.drop(1)).map(p => refHash(p._1 + " " + p._2) % nBuckets))
    }
    val all = feats.flatMap(_._3)
    val tgt = feats.filter(_._2 == target).flatMap(_._3)
    val cs = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ct = tgt.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val lrm = (0 until nBuckets).map { b =>
      val lr = math.log((ct.getOrElse(b.toLong, 0L) + 1).toDouble / (tgt.size + nBuckets)) -
        math.log((cs.getOrElse(b.toLong, 0L) + 1).toDouble / (all.size + nBuckets))
      BigDecimal(lr * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    feats.map { case (id, _, bks) =>
      id -> (bks.size.toLong, bks.map(b => lrm(b.toInt)).sum)
    }.toMap
  }

  private val fixture = Seq(
    (1L, "the quick fox jumps high", "en"),
    (2L, "the quick fox", "en"),
    (3L, "le renard rapide saute", "fr"),
    (4L, "le renard", "fr"),
    (5L, "single", "en"),          // 1 token -> zero bigrams
    (6L, "12345 67890", "fr"))     // no kept tokens at all

  test("hand corpus: Spark scores equal the plain-Scala twin exactly") {
    import spark.implicits._
    val docs = fixture.toDF("doc_id", "text", "lang")
    val got = Dsir.importanceWeights(docs, targetLang = "en", nBuckets = 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expect = refScores(fixture, "en", 16)
    assert(got === expect)
    assert(got(5L) === (0L, 0L) && got(6L) === (0L, 0L))
  }

  test("selection property: target-domain docs outscore off-domain docs per bigram") {
    import spark.implicits._
    val docs = fixture.toDF("doc_id", "text", "lang")
    val rows = Dsir.importanceWeights(docs, targetLang = "en", nBuckets = 16)
      .filter(col("n_bigrams") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2).toDouble / r.getLong(1)).toMap
    // every English doc's per-bigram score beats every French doc's
    val en = Seq(1L, 2L).map(rows); val fr = Seq(3L, 4L).map(rows)
    assert(en.min > fr.max, s"en=$en fr=$fr")
  }

  test("bigramBuckets: empty and single-token texts yield empty features, no descending-sequence artifact") {
    import spark.implicits._
    val got = Seq("", "one", "a b c").toDF("text")
      .select(Dsir.bigramBuckets(col("text"), 8).as("b"))
      .collect().map(_.getSeq[Long](0).toList)
    assert(got(0) === Nil && got(1) === Nil)
    assert(got(2) === List(refHash("a b") % 8, refHash("b c") % 8))
  }

  test("plan: scoring is a zero-shuffle projection (scan -> project, no Exchange/Join)") {
    import spark.implicits._
    val docs = fixture.toDF("doc_id", "text", "lang")
    val plan = Dsir.importanceWeights(docs, targetLang = "en", nBuckets = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("dsir_score is exactly dsir_micro / 1e6 rounded to 4 dp") {
    import spark.implicits._
    val docs = fixture.toDF("doc_id", "text", "lang")
    Dsir.importanceWeights(docs, targetLang = "en", nBuckets = 16)
      .collect().foreach { r =>
        val want = BigDecimal(r.getLong(2) / 1e6)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(3) === want)
      }
  }
}
