package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.engine.Facets
import graft.index.IndexBuilder
import graft.tokenizer.Tokenizer

/** Facet counts: plain-Scala conjunctive twin over the corpus, AND
  * semantics (subset of each single term's counts), empty-result shape,
  * and the chunk-pruned plan contract.
  */
class FacetsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private lazy val (idxDir, docs) = {
    val dir = SparkTestBase.tempDir("graft_facets")
    val withIds = Corpus.assignDocIds(spark,
      Corpus.synthetic(spark, numRepos = 4, filesPerRepo = 8)).cache()
    IndexBuilder.build(spark, withIds, dir,
      IndexBuilder.BuildConfig(chunkDocs = 7))
    (dir, withIds.collect())
  }

  /** Plain-Scala twin: repo facet counts of docs whose BODY tokens
    * contain every query term.
    */
  private def twin(terms: Seq[String]): Map[String, Long] =
    docs.filter { d =>
      val toks = Tokenizer.bodyTokens(d.content).toSet
      terms.forall(toks.contains)
    }.groupBy(_.repo).view.mapValues(_.length.toLong).toMap

  private def got(terms: Seq[String]): Map[String, Long] =
    Facets.conjunctiveFacets(spark, idxDir, terms)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("single-term facet counts equal the tokenizer twin") {
    // pick a mid-df term so several repos hit
    val term = docs.flatMap(d => Tokenizer.bodyTokens(d.content))
      .groupBy(identity).view.mapValues(_.length).maxBy(_._2)._1
    assert(got(Seq(term)) === twin(Seq(term)))
  }

  test("conjunctive facets: AND semantics, pointwise <= each single term") {
    val freq = docs.flatMap(d => Tokenizer.bodyTokens(d.content).distinct)
      .groupBy(identity).view.mapValues(_.length).toSeq.sortBy(-_._2)
    val Seq(a, b) = freq.take(2).map(_._1)
    val and = got(Seq(a, b))
    assert(and === twin(Seq(a, b)))
    val ga = got(Seq(a))
    and.foreach { case (f, n) => assert(n <= ga.getOrElse(f, 0L)) }
  }

  test("absent term yields the empty (facet, n_docs) frame") {
    val df = Facets.conjunctiveFacets(spark, idxDir, Seq("zzqqabsent"))
    assert(df.columns.toSeq === Seq("facet", "n_docs"))
    assert(df.count() === 0L)
  }

  test("docs scan is chunk-pruned to qualifying chunks and the hit join broadcasts") {
    val term = docs.head.content.split("\\s+")
      .map(_.toLowerCase).find(t => t.matches("[a-z]+") && t.length < 20).get
    val plan = Facets.conjunctiveFacets(spark, idxDir, Seq(term))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"hit join must broadcast:\n$plan")
    assert(plan.contains("PartitionFilters"), s"docs scan must prune:\n$plan")
  }
}
