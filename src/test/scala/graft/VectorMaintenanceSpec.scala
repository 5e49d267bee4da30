package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.analysis._

/** Delete/compact lifecycle for the two persisted vector stores — the
  * vector twin of CompactionSpec: compact must be row-identical to a
  * from-scratch build over the survivors, untouched partitions keep
  * their physical files, emptied partitions lose their dirs, the live
  * view masks pending tombstones, and probe queries never see a deleted
  * vector.
  */
class VectorMaintenanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** Canonical store content: (vec_id, partition, embedding hash). */
  private def canon(df: DataFrame, partCol: String): Set[(Long, Long, Int)] =
    df.select(col("vec_id"), col(partCol), hash(col("embedding")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private def files(dir: String, part: String): Set[(String, Long, Long)] = {
    val d = new java.io.File(dir, part)
    assert(d.isDirectory, s"missing partition dir $d")
    d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified(), f.length())).toSet
  }

  test("AnnStore: compact == from-scratch build over survivors; untouched buckets keep files") {
    val dir = SparkTestBase.tempDir("vm_ann")
    AnnStore.build(emb, dir, nBits = 5)
    val before = AnnStore.load(spark, dir)
    val affected = before.filter(col("vec_id") % 7 === 3)
      .select("bucket").distinct().collect().map(_.getLong(0)).toSet
    val untouched = before.select("bucket").distinct().collect()
      .map(_.getLong(0)).toSet -- affected
    assert(affected.nonEmpty && untouched.nonEmpty, "fixture must split buckets")
    val filesBefore = untouched.map(b => b -> files(dir, s"bucket=$b")).toMap

    assert(AnnStore.markDeleted(emb.filter(col("vec_id") % 7 === 3), dir,
      nBits = 5) > 0L)
    assert(AnnStore.compact(spark, dir) === affected)

    val fresh = SparkTestBase.tempDir("vm_ann_fresh")
    AnnStore.build(emb.filter(col("vec_id") % 7 =!= 3), fresh, nBits = 5)
    assert(canon(AnnStore.load(spark, dir), "bucket") ===
      canon(AnnStore.load(spark, fresh), "bucket"))
    untouched.foreach(b =>
      assert(files(dir, s"bucket=$b") === filesBefore(b), s"bucket $b rewritten"))
    // tombstones cleared; a second compact is a no-op
    assert(!new java.io.File(VectorMaintenance.tombstonesDir(dir)).exists())
    assert(AnnStore.compact(spark, dir) === Set.empty[Long])
  }

  test("AnnStore: loadLive masks pending tombstones; probe queries never see deleted ids") {
    val dir = SparkTestBase.tempDir("vm_ann_live")
    AnnStore.build(emb, dir, nBits = 5)
    val total = AnnStore.load(spark, dir).count()
    val nDel = AnnStore.markDeleted(emb.filter(col("vec_id") % 11 === 5), dir,
      nBits = 5)
    assert(nDel > 0L)
    // physical store untouched by the delete
    assert(AnnStore.load(spark, dir).count() === total)
    val live = AnnStore.loadLive(spark, dir)
    assert(live.count() === total - nDel)
    assert(live.filter(col("vec_id") % 11 === 5).count() === 0L)
    // a probe over the live view cannot surface a deleted vector
    val qv = AnnStore.vectorOf(emb, 0L)
    val hits = AnnStore.topK(live, qv, k = 50, nBits = 5, multiProbe = true,
      excludeVecId = 0L).collect().map(_.getLong(0))
    assert(hits.nonEmpty, "vacuous: no probe hits")
    hits.foreach(id => assert(id % 11 !== 5L, s"deleted $id surfaced"))
    // duplicate tombstones are tolerated (set semantics)
    AnnStore.markDeleted(emb.filter(col("vec_id") % 11 === 5), dir, nBits = 5)
    assert(AnnStore.loadLive(spark, dir).count() === total - nDel)
  }

  test("AnnStore: a fully-tombstoned bucket loses its partition dir") {
    val dir = SparkTestBase.tempDir("vm_ann_empty")
    AnnStore.build(emb, dir, nBits = 5)
    val store = AnnStore.load(spark, dir)
    // smallest bucket (deterministic tie-break by bucket id)
    val victim = store.groupBy("bucket").count()
      .orderBy(asc("count"), asc("bucket")).head().getLong(0)
    val victimIds = store.filter(col("bucket") === victim).select("vec_id")
    val delRows = emb.join(victimIds, Seq("vec_id"))
    val expectGone = victimIds.count()
    val totalBefore = store.count() // before compact replaces the files
    assert(AnnStore.markDeleted(delRows, dir, nBits = 5) === expectGone)
    assert(AnnStore.compact(spark, dir) === Set(victim))
    assert(!new java.io.File(dir, s"bucket=$victim").exists(),
      s"emptied bucket=$victim dir survived compact")
    val after = AnnStore.load(spark, dir)
    assert(after.filter(col("bucket") === victim).count() === 0L)
    assert(after.count() === totalBefore - expectGone)
  }

  test("IvfStore: compact purges rows under FROZEN centroids; sidecar untouched") {
    val dir = SparkTestBase.tempDir("vm_ivf")
    IvfStore.build(emb, dir, k = 8)
    val before = canon(IvfStore.load(spark, dir), "cluster")
    val centsBefore = IvfStore.loadCentroids(spark, dir)
      .map { case (j, c) => (j, c.toSeq) }.toSeq
    val deadIds = emb.filter(col("vec_id") % 9 === 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(IvfStore.markDeleted(emb.filter(col("vec_id") % 9 === 4), dir) ===
      deadIds.size.toLong)
    val compacted = IvfStore.compact(spark, dir)
    assert(compacted.nonEmpty)
    // compacted store == original assignment restricted to survivors —
    // NOT a reseeded fresh build (deleting a seed must not move cells)
    assert(canon(IvfStore.load(spark, dir), "cluster") ===
      before.filterNot { case (id, _, _) => deadIds(id) })
    val centsAfter = IvfStore.loadCentroids(spark, dir)
      .map { case (j, c) => (j, c.toSeq) }.toSeq
    assert(centsAfter === centsBefore, "centroid sidecar changed under compact")
  }

  test("IvfStore: live view at nprobe = k is exact brute force over survivors") {
    val dir = SparkTestBase.tempDir("vm_ivf_live")
    IvfStore.build(emb, dir, k = 8)
    IvfStore.markDeleted(emb.filter(col("vec_id") % 9 === 4), dir)
    IvfStore.compact(spark, dir)
    IvfStore.markDeleted(emb.filter(col("vec_id") % 13 === 6), dir) // pending
    val live = IvfStore.loadLive(spark, dir)
    val cents = IvfStore.loadCentroids(spark, dir)
    val qv = AnnStore.vectorOf(emb, 0L)
    val got = IvfStore.topK(live, cents, qv, k = 10, nprobe = 8,
      excludeVecId = 0L).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") % 9 =!= 4 && col("vec_id") % 13 =!= 6), 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === want)
  }

  test("appendIdempotent: overlapping deltas append only the new rows") {
    val dir = SparkTestBase.tempDir("vm_ann_idem")
    val half = emb.filter(col("vec_id") < 250)
    AnnStore.build(half, dir, nBits = 5)
    val base = canon(AnnStore.load(spark, dir), "bucket")
    // full replay of already-present rows: nothing appended
    assert(AnnStore.appendIdempotent(half, dir, nBits = 5) === 0L)
    assert(canon(AnnStore.load(spark, dir), "bucket") === base)
    // overlapping delta (200..499): only 250..499 are new
    val overlap = emb.filter(col("vec_id") >= 200)
    val expectedNew = emb.filter(col("vec_id") >= 250).count()
    assert(AnnStore.appendIdempotent(overlap, dir, nBits = 5) === expectedNew)
    // grown store == from-scratch build over the union
    val fresh = SparkTestBase.tempDir("vm_ann_idem_fresh")
    AnnStore.build(emb, fresh, nBits = 5)
    assert(canon(AnnStore.load(spark, dir), "bucket") ===
      canon(AnnStore.load(spark, fresh), "bucket"))
    // second replay of the overlap: a no-op again
    assert(AnnStore.appendIdempotent(overlap, dir, nBits = 5) === 0L)
  }

  test("streaming appendToAnnStore: catch-up, checkpoint resume, replay no-op") {
    val storeDir = SparkTestBase.tempDir("vm_ann_stream")
    AnnStore.build(emb.filter(col("vec_id") < 200), storeDir, nBits = 5)
    val srcDir = SparkTestBase.tempDir("vm_ann_src")
    val ckDir = SparkTestBase.tempDir("vm_ann_ck")
    emb.filter(col("vec_id") >= 200 && col("vec_id") < 350)
      .write.mode("append").parquet(srcDir)
    val q1 = graft.streaming.StreamingIngest.appendToAnnStore(
      spark, srcDir, storeDir, ckDir, nBits = 5)
    q1.awaitTermination()
    // new files land; same checkpoint -> only the new delta appends
    emb.filter(col("vec_id") >= 350).write.mode("append").parquet(srcDir)
    val q2 = graft.streaming.StreamingIngest.appendToAnnStore(
      spark, srcDir, storeDir, ckDir, nBits = 5)
    q2.awaitTermination()
    val fresh = SparkTestBase.tempDir("vm_ann_stream_fresh")
    AnnStore.build(emb, fresh, nBits = 5)
    assert(canon(AnnStore.load(spark, storeDir), "bucket") ===
      canon(AnnStore.load(spark, fresh), "bucket"))
    // a FRESH checkpoint replays every landed file; the bucket-pruned
    // anti-join must make the replay a no-op
    val ck2 = SparkTestBase.tempDir("vm_ann_ck2")
    val q3 = graft.streaming.StreamingIngest.appendToAnnStore(
      spark, srcDir, storeDir, ck2, nBits = 5)
    q3.awaitTermination()
    assert(canon(AnnStore.load(spark, storeDir), "bucket") ===
      canon(AnnStore.load(spark, fresh), "bucket"))
  }

  test("IvfStore.appendIdempotent: overlapping deltas append only the new rows") {
    val dir = SparkTestBase.tempDir("vm_ivf_idem")
    val half = emb.filter(col("vec_id") < 250)
    IvfStore.build(half, dir, k = 8)
    val base = canon(IvfStore.load(spark, dir), "cluster")
    // full replay of already-present rows: nothing appended
    assert(IvfStore.appendIdempotent(half, dir) === 0L)
    assert(canon(IvfStore.load(spark, dir), "cluster") === base)
    // overlapping delta (200..499): only 250..499 are new
    val overlap = emb.filter(col("vec_id") >= 200)
    val expectedNew = emb.filter(col("vec_id") >= 250).count()
    assert(IvfStore.appendIdempotent(overlap, dir) === expectedNew)
    // grown store == plain disjoint-delta append onto the same build
    // (NOT a from-scratch build over the union: that would re-seed the
    // centroids — cells are frozen, so the plain append IS the contract)
    val twin = SparkTestBase.tempDir("vm_ivf_idem_twin")
    IvfStore.build(half, twin, k = 8)
    IvfStore.append(emb.filter(col("vec_id") >= 250), twin)
    assert(canon(IvfStore.load(spark, dir), "cluster") ===
      canon(IvfStore.load(spark, twin), "cluster"))
    // second replay of the overlap: a no-op again
    assert(IvfStore.appendIdempotent(overlap, dir) === 0L)
    // no store, no centroids to route by: refuse loudly
    intercept[IllegalArgumentException] {
      IvfStore.appendIdempotent(emb.limit(1),
        SparkTestBase.tempDir("vm_ivf_idem_none") + "/nope")
    }
  }

  test("streaming appendToIvfStore: catch-up, checkpoint resume, replay no-op") {
    val storeDir = SparkTestBase.tempDir("vm_ivf_stream")
    IvfStore.build(emb.filter(col("vec_id") < 200), storeDir, k = 8)
    val srcDir = SparkTestBase.tempDir("vm_ivf_src")
    val ckDir = SparkTestBase.tempDir("vm_ivf_ck")
    emb.filter(col("vec_id") >= 200 && col("vec_id") < 350)
      .write.mode("append").parquet(srcDir)
    val q1 = graft.streaming.StreamingIngest.appendToIvfStore(
      spark, srcDir, storeDir, ckDir)
    q1.awaitTermination()
    emb.filter(col("vec_id") >= 350).write.mode("append").parquet(srcDir)
    val q2 = graft.streaming.StreamingIngest.appendToIvfStore(
      spark, srcDir, storeDir, ckDir)
    q2.awaitTermination()
    val twin = SparkTestBase.tempDir("vm_ivf_stream_twin")
    IvfStore.build(emb.filter(col("vec_id") < 200), twin, k = 8)
    IvfStore.append(emb.filter(col("vec_id") >= 200), twin)
    assert(canon(IvfStore.load(spark, storeDir), "cluster") ===
      canon(IvfStore.load(spark, twin), "cluster"))
    // a FRESH checkpoint replays every landed file; the cell-pruned
    // anti-join must make the replay a no-op
    val ck2 = SparkTestBase.tempDir("vm_ivf_ck2")
    val q3 = graft.streaming.StreamingIngest.appendToIvfStore(
      spark, srcDir, storeDir, ck2)
    q3.awaitTermination()
    assert(canon(IvfStore.load(spark, storeDir), "cluster") ===
      canon(IvfStore.load(spark, twin), "cluster"))
  }

  test("markDeleted refuses a missing store") {
    intercept[IllegalArgumentException] {
      AnnStore.markDeleted(emb.limit(1),
        SparkTestBase.tempDir("vm_none") + "/nope", nBits = 5)
    }
  }
}
