package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.{AnnStore, Similarity}

/** Persisted ANN store: the driver-side bucket twin must be
  * row-identical to the Catalyst bucket expression, query results must
  * equal the recompute-everything LSH variants, and the probe read must
  * actually prune partitions (the whole point of the store).
  */
class AnnStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  lazy val storeDir: String = {
    val dir = SparkTestBase.tempDir("graft-ann-store")
    AnnStore.build(emb, dir, nBits = 5)
    dir
  }

  test("driver bucketOf == Catalyst bucketExpr on every corpus vector") {
    import spark.implicits._
    val viaSpark = Similarity.lshBuckets(emb, nBits = 5)
      .as[(Long, Long)].collect().toMap
    val vecs = emb.select($"vec_id",
        transform($"embedding", _.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect()
    assert(vecs.nonEmpty)
    vecs.foreach { case (id, v) =>
      assert(AnnStore.bucketOf(v.toArray, 5) === viaSpark(id), s"vec $id")
    }
  }

  test("store round-trip: persisted buckets match recomputed buckets") {
    import spark.implicits._
    val persisted = AnnStore.load(spark, storeDir)
      .select($"vec_id", $"bucket").as[(Long, Long)].collect().toMap
    val recomputed = Similarity.lshBuckets(emb, nBits = 5)
      .as[(Long, Long)].collect().toMap
    assert(persisted === recomputed)
  }

  test("store topK == lshTopK; store multiprobe == lshTopKMultiProbe") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val store = AnnStore.load(spark, storeDir)
    val qv = AnnStore.vectorOf(emb, 0L)
    assert(rows(AnnStore.topK(store, qv, 10, 5, multiProbe = false, excludeVecId = 0L)) ===
      rows(Similarity.lshTopK(emb, 0L, 10, nBits = 5)))
    assert(rows(AnnStore.topK(store, qv, 10, 5, multiProbe = true, excludeVecId = 0L)) ===
      rows(Similarity.lshTopKMultiProbe(emb, 0L, 10, nBits = 5)))
  }

  test("append == from-scratch build: rows identical, old bucket files untouched") {
    import spark.implicits._
    val dir = SparkTestBase.tempDir("graft-ann-app")
    AnnStore.build(emb.filter($"vec_id" < 50L), dir, nBits = 5)
    // snapshot a pre-append bucket's files (mode Append never rewrites)
    val bucketDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.toString).toSeq
    def files(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified(), f.length())).toSet
    val before = bucketDirs.map(d => d -> files(d)).toMap

    AnnStore.append(emb.filter($"vec_id" >= 50L), dir, nBits = 5)
    val appended = AnnStore.load(spark, dir)
      .select($"vec_id", $"bucket").as[(Long, Long)].collect().toMap
    val scratch = AnnStore.load(spark, storeDir)
      .select($"vec_id", $"bucket").as[(Long, Long)].collect().toMap
    assert(appended === scratch)
    bucketDirs.foreach(d => assert(files(d).intersect(before(d)) === before(d),
      s"$d lost or rewrote pre-append files"))
    // query equivalence over the appended store
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val qv = AnnStore.vectorOf(emb, 0L)
    assert(rows(AnnStore.topK(AnnStore.load(spark, dir), qv, 10, 5,
      multiProbe = true, excludeVecId = 0L)) ===
      rows(Similarity.lshTopKMultiProbe(emb, 0L, 10, nBits = 5)))
  }

  test("probe read prunes partitions: only probe buckets are scanned") {
    val store = AnnStore.load(spark, storeDir)
    val qv = AnnStore.vectorOf(emb, 0L)
    val qb = AnnStore.bucketOf(qv, 5)
    val plan = AnnStore.topK(store, qv, 10, 5).queryExecution.executedPlan.toString
    // the bucket predicate must land in PartitionFilters (directory
    // pruning), not in the post-scan Filter
    assert(plan.contains("PartitionFilters"), plan.take(2000))
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("bucket"), pf)
    assert(pf.contains(qb.toString), pf)
  }

  test("bucketExpr stays in one projection over the scan (no Exchange)") {
    val plan = Similarity.lshBuckets(emb, nBits = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }
}
