package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.engine.Proximity
import graft.index.{IdDoc, IndexBuilder}
import graft.tokenizer.Tokenizer

/** NEAR/k proximity: hand corpus with known positions, tokenizer twin on
  * the synthetic corpus, ordered-vs-unordered semantics, title-offset
  * cancellation, and the no-nested-loop plan contract.
  */
class ProximitySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def buildOf(docs: Seq[IdDoc]): String = {
    import spark.implicits._
    val dir = SparkTestBase.tempDir("graft_prox")
    IndexBuilder.build(spark, spark.createDataset(docs), dir,
      IndexBuilder.BuildConfig(chunkDocs = 7))
    dir
  }

  test("hand corpus: distances, ordered vs unordered, threshold cut") {
    // doc 0: alpha .. beta at body positions 1, 4 (distance 3)
    // doc 1: beta alpha adjacent, b BEFORE a
    // doc 2: only alpha
    val idx = buildOf(Seq(
      IdDoc(0L, "o/p", "f.txt", "c0", "txt", "alpha x y beta"),
      IdDoc(1L, "o/p", "f.txt", "c1", "txt", "beta alpha"),
      IdDoc(2L, "o/p", "f.txt", "c2", "txt", "alpha only")))
    def near(k: Long, ordered: Boolean) =
      Proximity.nearDocs(spark, idx, "alpha", "beta", k, ordered)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(near(10, ordered = false) === Map(0L -> 3L, 1L -> 1L))
    assert(near(2, ordered = false) === Map(1L -> 1L))
    // ordered = beta AFTER alpha: doc 0 qualifies (dist 3); doc 1's beta
    // precedes alpha -> no forward pair -> dropped
    assert(near(10, ordered = true) === Map(0L -> 3L))
    assert(near(2, ordered = true) === Map.empty[Long, Long])
  }

  test("title offset cancels: distances unaffected by title token count") {
    // same body, wildly different title lengths
    val idx = buildOf(Seq(
      IdDoc(0L, "o/p", "f.txt", "c0", "txt", "alpha beta"),
      IdDoc(1L, "o/p", "many/title/words/in/this/path/f.txt", "c1", "txt",
        "alpha beta")))
    val got = Proximity.nearDocs(spark, idx, "alpha", "beta", 1)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got === Map(0L -> 1L, 1L -> 1L))
  }

  test("synthetic corpus: equals the tokenizer-position twin (both modes)") {
    val docs = Corpus.assignDocIds(spark,
      Corpus.synthetic(spark, numRepos = 2, filesPerRepo = 8)).collect().toSeq
    val idx = buildOf(docs)
    // two most frequent terms co-occur often
    val freq = docs.flatMap(d => Tokenizer.bodyTokens(d.content).distinct)
      .groupBy(identity).view.mapValues(_.length).toSeq.sortBy(-_._2)
    val Seq(a, b) = freq.take(2).map(_._1)
    def twin(k: Long, ordered: Boolean): Map[Long, Long] =
      docs.flatMap { d =>
        val toks = Tokenizer.bodyTokens(d.content).zipWithIndex
        val paPos = toks.filter(_._1 == a).map(_._2 + 1L)
        val pbPos = toks.filter(_._1 == b).map(_._2 + 1L)
        val ds = for {
          x <- paPos; y <- pbPos
          d0 = if (ordered) y - x else math.abs(y - x)
          if !ordered || d0 >= 1
        } yield d0
        if (ds.nonEmpty && ds.min <= k) Some(d.docId -> ds.min) else None
      }.toMap
    for (ordered <- Seq(false, true); k <- Seq(2L, 5L)) {
      val got = Proximity.nearDocs(spark, idx, a, b, k, ordered)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(got === twin(k, ordered), s"ordered=$ordered k=$k")
    }
  }

  test("plan: term-pushdown scan + equi join, no nested loop") {
    val idx = buildOf(Seq(
      IdDoc(0L, "o/p", "f.txt", "c0", "txt", "alpha beta")))
    val plan = Proximity.nearDocs(spark, idx, "alpha", "beta", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested loop in:\n$plan")
    assert(plan.contains("PushedFilters"), s"no scan pushdown in:\n$plan")
  }
}
