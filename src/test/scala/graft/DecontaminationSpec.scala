package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Decontamination

/** Planted-contamination fixtures for the n-gram decontamination rule:
  * a probe doc leaks its grams, a contaminated doc embeds one, clean
  * and too-short docs survive.
  */
class DecontaminationSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  // doc 0 (0 % 37 == 0) is the pseudo-benchmark probe; its 5-grams are
  // "a b c d e", "b c d e f", "c d e f g". doc 1 embeds the third one
  // mid-text; docs 2 and 3 share no gram (3 is too short to even form one).
  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "a b c d e f g"),
      (1L, "x x c d e f g y"),
      (2L, "p q r s t u v"),
      (3L, "a b c")
    ).toDF("doc_id", "text")
  }

  test("probeGrams: first perDoc grams of the probe docs, distinct") {
    import spark.implicits._
    val got = Decontamination.probeGrams(docs, n = 5).as[String].collect().toSet
    assert(got === Set("a b c d e", "b c d e f", "c d e f g"))
  }

  test("hits: distinct probe grams per contaminated doc; clean docs absent") {
    import spark.implicits._
    val got = Decontamination.hits(docs, Decontamination.probeGrams(docs, 5), 5)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 3L, 1L -> 1L))
  }

  test("clean: exactly the uncontaminated doc_ids survive") {
    import spark.implicits._
    val got = Decontamination.clean(docs, Decontamination.probeGrams(docs, 5), 5)
      .as[Long].collect().toSet
    assert(got === Set(2L, 3L))
  }

  test("shuffle-join variant (broadcastProbes=false) is result-identical, no broadcast of probes") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001/documents.parquet"
    val corpus = spark.read.parquet(sf)
    val probes = Decontamination.probeGrams(corpus, n = 3)
    val bc = Decontamination.hits(corpus, probes, 3)
      .as[(Long, Long)].collect().toMap
    val sj = Decontamination.hits(corpus, probes, 3, broadcastProbes = false)
      .as[(Long, Long)].collect().toMap
    assert(sj === bc, "shuffle-join decontamination diverged from broadcast path")
    val cleanSj = Decontamination.clean(corpus, probes, 3, broadcastProbes = false)
      .as[Long].collect().toSet
    val cleanBc = Decontamination.clean(corpus, probes, 3).as[Long].collect().toSet
    assert(cleanSj === cleanBc)
    // plan shape: no broadcast HINT on the probe side (AQE may still pick
    // a broadcast join at this tiny scale — the point is the API no longer
    // forces one when the probe set is corpus-sized)
    val planSj = Decontamination.hits(corpus, probes, 3, broadcastProbes = false)
      .queryExecution.optimizedPlan.toString.toLowerCase
    val planBc = Decontamination.hits(corpus, probes, 3)
      .queryExecution.optimizedPlan.toString.toLowerCase
    assert(!planSj.contains("strategy=broadcast"), s"unexpected broadcast hint:\n$planSj")
    assert(planBc.contains("strategy=broadcast"), "premise: default path carries the hint")
  }

  test("a repeated leaked gram counts once (DISTINCT semantics)") {
    import spark.implicits._
    val d = Seq(
      (0L, "a b c d e"),
      (1L, "a b c d e z a b c d e")).toDF("doc_id", "text")
    val got = Decontamination.hits(d, Decontamination.probeGrams(d, 5), 5)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) === 1L)
  }
}
