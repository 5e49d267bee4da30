package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.{Clustering, IvfStore, Similarity}

/** Persisted IVF store: cells must match Clustering.assign, nprobe = k
  * must degenerate to exact brute force, and the probe read must prune
  * cell partitions (the whole point of the store).
  */
class IvfStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  lazy val storeDir: String = {
    val dir = SparkTestBase.tempDir("graft-ivf-store")
    IvfStore.build(emb, dir, k = 8)
    dir
  }

  test("centroid sidecar round-trips the deterministic seeds") {
    val persisted = IvfStore.loadCentroids(spark, storeDir)
    val seeds = Clustering.seedCentroids(emb, 8)
    assert(persisted.length === 8)
    persisted.foreach { case (j, c) =>
      assert(c.toSeq === seeds(j.toInt).toSeq, s"centroid $j")
    }
  }

  test("store round-trip: persisted cells match Clustering.assign") {
    import spark.implicits._
    val persisted = IvfStore.load(spark, storeDir)
      .select($"vec_id", $"cluster").as[(Long, Long)].collect().toMap
    val recomputed = Clustering.assign(emb, 8)
      .select($"vec_id", $"cluster").as[(Long, Long)].collect().toMap
    assert(persisted.nonEmpty)
    assert(persisted === recomputed)
  }

  test("nprobe = k degenerates to exact brute-force top-k") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val store = IvfStore.load(spark, storeDir)
    val cents = IvfStore.loadCentroids(spark, storeDir)
    val qv = graft.analysis.AnnStore.vectorOf(emb, 0L)
    assert(rows(IvfStore.topK(store, cents, qv, k = 10, nprobe = 8, excludeVecId = 0L)) ===
      rows(Similarity.bruteForceTopK(emb, queryId = 0L, k = 10)))
  }

  test("append assigns the delta to PERSISTED centroids; nprobe = k stays exact") {
    import spark.implicits._
    val dir = SparkTestBase.tempDir("graft-ivf-app")
    IvfStore.build(emb.filter($"vec_id" < 50L), dir, k = 8)
    val centsBefore = IvfStore.loadCentroids(spark, dir)
    IvfStore.append(emb.filter($"vec_id" >= 50L), dir)

    // centroids frozen (the sidecar is build-time state, append reads it)
    val centsAfter = IvfStore.loadCentroids(spark, dir)
    assert(centsAfter.map(_._1).toSeq === centsBefore.map(_._1).toSeq)
    centsAfter.zip(centsBefore).foreach { case ((_, a), (_, b)) =>
      assert(a.toSeq === b.toSeq)
    }
    // every delta row landed in its nearest FROZEN centroid's cell
    val persisted = IvfStore.load(spark, dir)
      .select($"vec_id", $"cluster").as[(Long, Long)].collect().toMap
    assert(persisted.size.toLong === emb.count())
    emb.filter($"vec_id" >= 50L)
      .select($"vec_id", transform($"embedding", _.cast("double")))
      .as[(Long, Seq[Double])].collect().foreach { case (id, v) =>
      val expect = IvfStore.probeClusters(centsBefore, v.toArray, 1).head
      assert(persisted(id) === expect, s"vec $id")
    }
    // nprobe = k is exact over the grown corpus regardless of assignment
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val qv = graft.analysis.AnnStore.vectorOf(emb, 0L)
    assert(rows(IvfStore.topK(IvfStore.load(spark, dir), centsAfter, qv,
      k = 10, nprobe = 8, excludeVecId = 0L)) ===
      rows(Similarity.bruteForceTopK(emb, queryId = 0L, k = 10)))
  }

  test("nprobe < k reads only probe-cell partitions (PartitionFilters)") {
    import spark.implicits._
    val store = IvfStore.load(spark, storeDir)
    val cents = IvfStore.loadCentroids(spark, storeDir)
    val qv = graft.analysis.AnnStore.vectorOf(emb, 0L)
    val probes = IvfStore.probeClusters(cents, qv, nprobe = 3).toSet
    assert(probes.size === 3)
    val q = IvfStore.topK(store, cents, qv, k = 10, nprobe = 3, excludeVecId = 0L)
    val plan = q.queryExecution.executedPlan.toString
    // the cluster predicate must land in PartitionFilters (directory
    // pruning), not in the post-scan Filter
    assert(plan.contains("PartitionFilters"), plan.take(2000))
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("cluster"), pf)
    // every returned vector really lives in a probed cell
    val assign = Clustering.assign(emb, 8)
      .select($"vec_id", $"cluster").as[(Long, Long)].collect().toMap
    val got = q.collect().map(_.getLong(0)).toSeq
    assert(got.nonEmpty)
    got.foreach(v => assert(probes.contains(assign(v)), s"vec $v"))
  }
}
