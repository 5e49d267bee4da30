package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.{Clustering, Dedup}

/** Cluster-scoped semantic near-dup: must equal the exhaustive pairwise
  * variant restricted to same-cell pairs, and the candidate restriction
  * must actually bite (fewer pairs than the all-pairs upper bound).
  */
class SemanticDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("semanticNearDupsKmeans == exhaustive near-dups restricted to same-cell pairs") {
    import spark.implicits._
    val got = Dedup.semanticNearDupsKmeans(emb, threshold = 0.35, k = 8)
      .as[(Long, Long, Double)].collect().toSet
    val assign = Clustering.assign(emb, 8)
      .select($"vec_id", $"cluster").as[(Long, Long)].collect().toMap
    val want = Dedup.embeddingNearDups(emb, threshold = 0.35)
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => assign(a) == assign(b) }.toSet
    assert(want.nonEmpty, "fixture produced no same-cell near-dup pairs")
    assert(got === want)
  }

  test("cell restriction bounds candidate volume below all-pairs") {
    import spark.implicits._
    val n = emb.count()
    val cellSizes = Clustering.assign(emb, 8)
      .groupBy($"cluster").count().as[(Long, Long)].collect().map(_._2)
    val cellPairs = cellSizes.map(s => s * (s - 1) / 2).sum
    assert(cellSizes.length > 1, "all vectors in one cell — restriction vacuous")
    assert(cellPairs < n * (n - 1) / 2)
  }
}
