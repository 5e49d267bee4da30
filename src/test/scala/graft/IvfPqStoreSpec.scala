package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.{AnnStore, Clustering, IvfPqStore, Quantization, Similarity}

/** Persisted IVF-PQ store: the sidecars must round-trip the trained
  * model, the store must hold codes only (never raw floats), nprobe =
  * kCells must degenerate EXACTLY to Quantization.pqTopK (the ADC
  * anchor), batch-split adds must be row-identical under the frozen
  * model, probes must prune cell partitions, and the tombstone story
  * must match a frozen-model re-add of the survivors.
  */
class IvfPqStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  lazy val storeDir: String = {
    val dir = SparkTestBase.tempDir("graft-ivfpq-store")
    IvfPqStore.build(emb, dir, kCells = 8, m = 4, kCents = 8, iters = 1)
    dir
  }

  private def storeRows(dir: String): Set[(Long, Seq[Long], Long)] =
    IvfPqStore.load(spark, dir)
      .select(col("vec_id"), col("codes"), col("cluster"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq, r.getLong(2))).toSet

  test("sidecars round-trip the trained model; store holds codes only") {
    val cents = IvfPqStore.loadCentroids(spark, storeDir)
    val seeds = Clustering.seedCentroids(emb, 8)
    assert(cents.length === 8)
    cents.foreach { case (j, c) => assert(c.toSeq === seeds(j.toInt).toSeq) }

    val books = IvfPqStore.loadCodebooks(spark, storeDir)
    val trained = Quantization.pqCodebooks(emb, m = 4, k = 8, iters = 1)
    assert(books.length === 4)
    books.zip(trained).foreach { case (persisted, twin) =>
      assert(persisted.map { case (cid, c) => (cid, c.toSeq) } ===
        twin.map { case (cid, c) => (cid, c.toSeq) })
    }

    val store = IvfPqStore.load(spark, storeDir)
    assert(store.columns.toSet === Set("vec_id", "codes", "cluster"))
    assert(store.count() === emb.count())
  }

  test("persisted cells match Clustering.assign; codes match pqCodes") {
    import spark.implicits._
    val cells = IvfPqStore.load(spark, storeDir)
      .select($"vec_id", $"cluster").as[(Long, Long)].collect().toMap
    val expect = Clustering.assign(emb, 8)
      .select($"vec_id", $"cluster").as[(Long, Long)].collect().toMap
    assert(cells === expect)

    val codes = IvfPqStore.load(spark, storeDir)
      .select($"vec_id", posexplode($"codes"))
      .select($"vec_id", $"pos".cast("long"), $"col")
      .as[(Long, Long, Long)].collect().toSet
    val twin = Quantization.pqCodes(emb, m = 4, k = 8, iters = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(codes === twin)
  }

  test("nprobe = kCells degenerates exactly to Quantization.pqTopK") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = IvfPqStore.topK(IvfPqStore.load(spark, storeDir),
      IvfPqStore.loadCentroids(spark, storeDir),
      IvfPqStore.loadCodebooks(spark, storeDir),
      AnnStore.vectorOf(emb, 0L), k = 10, nprobe = 8, excludeVecId = 0L)
    assert(rows(got) ===
      rows(Quantization.pqTopK(emb, queryId = 0L, k = 10, m = 4, kCents = 8, iters = 1)))
  }

  test("frozen-model adds: two-batch == one-shot build, sidecars untouched") {
    import spark.implicits._
    val dir = SparkTestBase.tempDir("graft-ivfpq-add")
    val mid = emb.agg(max($"vec_id")).as[Long].head() / 2
    IvfPqStore.train(emb, dir, kCells = 8, m = 4, kCents = 8, iters = 1)
    val centsBefore = IvfPqStore.loadCentroids(spark, dir)
    val booksBefore = IvfPqStore.loadCodebooks(spark, dir)
    IvfPqStore.add(emb.filter($"vec_id" <= mid), dir)
    IvfPqStore.add(emb.filter($"vec_id" > mid), dir)

    assert(storeRows(dir) === storeRows(storeDir))
    val centsAfter = IvfPqStore.loadCentroids(spark, dir)
    centsAfter.zip(centsBefore).foreach { case ((ja, a), (jb, b)) =>
      assert(ja === jb); assert(a.toSeq === b.toSeq)
    }
    val booksAfter = IvfPqStore.loadCodebooks(spark, dir)
    booksAfter.zip(booksBefore).foreach { case (a, b) =>
      assert(a.map { case (cid, c) => (cid, c.toSeq) } ===
        b.map { case (cid, c) => (cid, c.toSeq) })
    }
  }

  test("nprobe < kCells reads only probe-cell partitions (PartitionFilters)") {
    import spark.implicits._
    val store = IvfPqStore.load(spark, storeDir)
    val cents = IvfPqStore.loadCentroids(spark, storeDir)
    val books = IvfPqStore.loadCodebooks(spark, storeDir)
    val qv = AnnStore.vectorOf(emb, 0L)
    val probes = graft.analysis.IvfStore.probeClusters(cents, qv, nprobe = 3).toSet
    val q = IvfPqStore.topK(store, cents, books, qv, k = 10, nprobe = 3,
      excludeVecId = 0L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(2000))
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("cluster"), pf)
    val assign = Clustering.assign(emb, 8)
      .select($"vec_id", $"cluster").as[(Long, Long)].collect().toMap
    val got = q.collect().map(_.getLong(0)).toSeq
    assert(got.nonEmpty)
    got.foreach(v => assert(probes.contains(assign(v)), s"vec $v"))
  }

  test("markDeleted/compact == frozen-model re-add of the survivors; live view masks pending") {
    import spark.implicits._
    val dir = SparkTestBase.tempDir("graft-ivfpq-maint")
    IvfPqStore.build(emb, dir, kCells = 8, m = 4, kCents = 8, iters = 1)
    val doomed = emb.filter($"vec_id" % 7 === 3)
    val nDoomed = doomed.count()
    assert(nDoomed > 0)
    assert(IvfPqStore.markDeleted(doomed, dir) === nDoomed)

    // pending tombstones masked by the live view, still present raw
    assert(IvfPqStore.load(spark, dir).count() === emb.count())
    val live = IvfPqStore.loadLive(spark, dir)
    assert(live.count() === emb.count() - nDoomed)
    assert(live.filter($"vec_id" % 7 === 3).count() === 0L)

    val compacted = IvfPqStore.compact(spark, dir)
    assert(compacted.nonEmpty)
    // physically identical to training on the FULL corpus (the frozen
    // model never retrains on delete) and adding only the survivors
    val twin = SparkTestBase.tempDir("graft-ivfpq-maint-twin")
    IvfPqStore.train(emb, twin, kCells = 8, m = 4, kCents = 8, iters = 1)
    IvfPqStore.add(emb.filter($"vec_id" % 7 =!= 3), twin)
    assert(storeRows(dir) === storeRows(twin))
  }
}
