package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexStore}

/** Incremental append (IndexBuilder.appendBuild): an index extended with a
  * delta must be BLOB-IDENTICAL to a from-scratch build over the union —
  * per-(chunk, term) df/tf/blocks/postingsBlob bytes, doc rows, and stats
  * all equal — while touching only the boundary + new chunk partitions.
  */
class IndexAppendSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import IndexBuilder.BuildConfig

  private def corpus(n: Int, seed: Long) = {
    val docs = Corpus.synthetic(spark, 2, n, seed = seed)
    Corpus.assignDocIds(spark, docs)
  }

  /** canonical view of a persisted index: postings keyed by (chunk, term)
    * with blob hex, docs keyed by docId, stats keyed by chunk
    */
  private def canon(dir: String) = {
    val p = IndexStore.readPostings(spark, dir).collect()
      .map(r => ((r.chunk, r.term),
        (r.df, r.tf, r.blocks.toSeq, r.postingsBlob.toSeq)))
      .toMap
    val d = IndexStore.readDocs(spark, dir).collect()
      .map(r => (r.docId, r)).toMap
    val s = IndexStore.readStats(spark, dir).collect()
      .map(r => (r.chunk, r)).toMap
    (p, d, s)
  }

  private def splitBuild(ids: org.apache.spark.sql.Dataset[graft.index.IdDoc],
                         splitAt: Long, cfg: BuildConfig): (String, Set[Long]) = {
    val dir = SparkTestBase.tempDir("graft_append")
    IndexBuilder.build(spark, ids.filter(_.docId < splitAt), dir, cfg)
    val appended = IndexBuilder.appendBuild(
      spark, ids.filter(_.docId >= splitAt), dir, cfg)
    (dir, appended)
  }

  test("append across a partial boundary chunk == from-scratch build (combined layout)") {
    val ids = corpus(60, seed = 11).persist() // 120 docs
    val cfg = BuildConfig(chunkDocs = 50)     // chunks 0,1 full; 2 partial
    // base = docs 0..109 (chunk 2 partial at 10 docs); delta = docs
    // 110..119, all landing in chunk 2 — pure merge, no new chunk
    val full = SparkTestBase.tempDir("graft_full")
    IndexBuilder.build(spark, ids, full, cfg)
    val (inc, touched) = splitBuild(ids, 110L, cfg)
    assert(touched === Set(2L))
    assert(canon(inc) === canon(full))
    ids.unpersist()
  }

  test("append spanning merge + new chunks == from-scratch build, old partitions untouched") {
    val ids = corpus(90, seed = 13).persist() // 180 docs
    val cfg = BuildConfig(chunkDocs = 50)
    val full = SparkTestBase.tempDir("graft_full")
    IndexBuilder.build(spark, ids, full, cfg)

    val dir = SparkTestBase.tempDir("graft_append")
    IndexBuilder.build(spark, ids.filter(_.docId < 120L), dir, cfg)
    // snapshot the untouched chunks' partition files before the append
    def files(chunk: Long) = {
      val d = new java.io.File(s"$dir/postings/chunk=$chunk")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified(), f.length())).toSet
    }
    val before = Seq(0L, 1L).map(c => c -> files(c)).toMap

    val touched = IndexBuilder.appendBuild(spark, ids.filter(_.docId >= 120L), dir, cfg)
    assert(touched === Set(2L, 3L)) // chunk 2 merged, chunk 3 new
    assert(canon(dir) === canon(full))
    // closed chunks were never rewritten (file identity, not just content)
    Seq(0L, 1L).foreach(c => assert(files(c) === before(c), s"chunk $c was rewritten"))
    ids.unpersist()
  }

  test("append at an exact chunk boundary skips the merge (pure new chunks)") {
    val ids = corpus(75, seed = 17).persist() // 150 docs
    val cfg = BuildConfig(chunkDocs = 50)
    val full = SparkTestBase.tempDir("graft_full")
    IndexBuilder.build(spark, ids, full, cfg)
    val (inc, touched) = splitBuild(ids, 100L, cfg) // base ends exactly at chunk 1 edge
    assert(touched === Set(2L))
    assert(canon(inc) === canon(full))
    ids.unpersist()
  }

  test("append preserves a legacy two-table layout (grouped strategy)") {
    val ids = corpus(60, seed = 19).persist() // 120 docs
    val cfg = BuildConfig(chunkDocs = 50, strategy = "grouped")
    val full = SparkTestBase.tempDir("graft_full")
    IndexBuilder.build(spark, ids, full, cfg)
    val (inc, _) = splitBuild(ids, 110L, cfg)
    // layout preserved: docs dir still present (two-table), no kind column
    assert(new java.io.File(s"$inc/docs").exists())
    assert(canon(inc) === canon(full))
    ids.unpersist()
  }

  test("append rejects docIds overlapping the existing corpus") {
    val ids = corpus(30, seed = 23).persist() // 60 docs
    val cfg = BuildConfig(chunkDocs = 50)
    val dir = SparkTestBase.tempDir("graft_append")
    IndexBuilder.build(spark, ids.filter(_.docId < 50L), dir, cfg)
    val e = intercept[IllegalArgumentException] {
      IndexBuilder.appendBuild(spark, ids.filter(_.docId >= 40L), dir, cfg)
    }
    assert(e.getMessage.contains("strictly past"))
    ids.unpersist()
  }

  test("append uses the index's persisted chunkDocs, not the caller's cfg") {
    val ids = corpus(60, seed = 29).persist() // 120 docs
    val cfg = BuildConfig(chunkDocs = 50)
    val full = SparkTestBase.tempDir("graft_full")
    IndexBuilder.build(spark, ids, full, cfg)
    val dir = SparkTestBase.tempDir("graft_append")
    IndexBuilder.build(spark, ids.filter(_.docId < 110L), dir, cfg)
    // caller passes the WRONG chunkDocs; the persisted geometry must win
    IndexBuilder.appendBuild(spark, ids.filter(_.docId >= 110L), dir,
      BuildConfig(chunkDocs = 30))
    assert(canon(dir) === canon(full))
    ids.unpersist()
  }

  test("replaying an append over a partially-applied boundary merge is idempotent") {
    // Simulate the crash window appendBuild's replay guards exist for: the
    // boundary partition was committed (delta already merged in) but the
    // last step — the lineage append — never ran, so the high-water mark
    // still reads the pre-append corpus. A re-run of the same append must
    // not double-apply the delta.
    val ids = corpus(60, seed = 37).persist() // docs 0..119
    val cfg = BuildConfig(chunkDocs = 50)     // delta 110..119 all in chunk 2
    val union = SparkTestBase.tempDir("graft_union")
    IndexBuilder.build(spark, ids, union, cfg)
    val dir = SparkTestBase.tempDir("graft_append")
    IndexBuilder.build(spark, ids.filter(_.docId < 110L), dir, cfg)

    // graft the POST-merge boundary partition from the union build onto
    // the base index, leaving stats + lineage at their PRE-append state
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
    }
    def cpTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(src).iterator().asScala.foreach { p =>
        val t = dst.resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t)
      }
    }
    val part = java.nio.file.Paths.get(dir, "postings", "chunk=2")
    rmTree(part)
    cpTree(java.nio.file.Paths.get(union, "postings", "chunk=2"), part)
    assert(IndexBuilder.docIdHighWater(spark, dir) === 109L) // mark unmoved

    IndexBuilder.appendBuild(spark, ids.filter(_.docId >= 110L), dir, cfg)
    assert(canon(dir) === canon(union))
    ids.unpersist()
  }

  test("appended lineage extends the corpus extent for the NEXT append") {
    val ids = corpus(90, seed = 31).persist() // 180 docs
    val cfg = BuildConfig(chunkDocs = 50)
    val full = SparkTestBase.tempDir("graft_full")
    IndexBuilder.build(spark, ids, full, cfg)
    val dir = SparkTestBase.tempDir("graft_append")
    IndexBuilder.build(spark, ids.filter(_.docId < 80L), dir, cfg)
    IndexBuilder.appendBuild(spark,
      ids.filter(d => d.docId >= 80L && d.docId < 130L), dir, cfg)
    IndexBuilder.appendBuild(spark, ids.filter(_.docId >= 130L), dir, cfg)
    assert(canon(dir) === canon(full))
    ids.unpersist()
  }
}
