package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Corpus
import graft.engine.SearchEngine
import graft.index.{IndexBuilder, IndexStore}

/** Segment merge (IndexBuilder.mergeIndexes): an independently-built index
  * folded into another must be BLOB-IDENTICAL to a from-scratch build over
  * (dest docs ∪ src docs shifted by the returned chunk-aligned offset) —
  * the transcode (decode → shift docIds → re-encode) must reproduce every
  * posting blob byte, block table, doc row, and stats row — while dest's
  * pre-existing partitions keep file identity (never rewritten).
  */
class IndexMergeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import IndexBuilder.BuildConfig

  private def corpus(filesPerRepo: Int, seed: Long) = {
    val docs = Corpus.synthetic(spark, 2, filesPerRepo, seed = seed)
    Corpus.assignDocIds(spark, docs)
  }

  /** canonical view of a persisted index: postings keyed by (chunk, term)
    * with blob bytes, docs keyed by docId, stats keyed by chunk
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

  private def postingFiles(dir: String, chunk: Long) = {
    val d = new java.io.File(s"$dir/postings/chunk=$chunk")
    d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified(), f.length())).toSet
  }

  test("merge == from-scratch build over dest ∪ shifted src; dest partitions untouched") {
    import spark.implicits._
    val cfg = BuildConfig(chunkDocs = 50)
    val idsA = corpus(60, seed = 21).persist() // 120 docs: chunks 0,1 full; 2 partial
    val idsB = corpus(40, seed = 22).persist() // 80 docs, ids 0..79 — COLLIDING with A

    val dest = SparkTestBase.tempDir("graft_mrg_dest")
    val srcD = SparkTestBase.tempDir("graft_mrg_src")
    IndexBuilder.build(spark, idsA, dest, cfg)
    IndexBuilder.build(spark, idsB, srcD, cfg)
    val before = Seq(0L, 1L, 2L).map(c => c -> postingFiles(dest, c)).toMap

    val (offset, written) = IndexBuilder.mergeIndexes(spark, dest, srcD)
    // dest docMax = 119 (chunk 2) -> first boundary strictly past it
    assert(offset === 150L)
    assert(written === Set(3L, 4L)) // shifted ids 150..229

    val full = SparkTestBase.tempDir("graft_mrg_full")
    IndexBuilder.build(spark,
      idsA.unionByName(idsB.map(d => d.copy(docId = d.docId + offset))),
      full, cfg)
    assert(canon(dest) === canon(full))
    Seq(0L, 1L, 2L).foreach(c =>
      assert(postingFiles(dest, c) === before(c), s"dest chunk $c was rewritten"))
    idsA.unpersist(); idsB.unpersist()
  }

  test("merged index answers queries from both sides (end-to-end search)") {
    import spark.implicits._
    val cfg = BuildConfig(chunkDocs = 50)
    val idsA = corpus(30, seed = 31)
    val idsB = corpus(30, seed = 32)
    val dest = SparkTestBase.tempDir("graft_mrg_q_dest")
    val srcD = SparkTestBase.tempDir("graft_mrg_q_src")
    IndexBuilder.build(spark, idsA, dest, cfg)
    IndexBuilder.build(spark, idsB, srcD, cfg)
    val (offset, _) = IndexBuilder.mergeIndexes(spark, dest, srcD)

    val engine = new SearchEngine(spark, dest, chunkCapacity = cfg.chunkDocs)
    // a body term that lives in a MERGED chunk (so it came from src)
    val base = offset / cfg.chunkDocs
    val srcTerm = IndexStore.readPostings(spark, dest)
      .filter(r => r.chunk >= base && !r.term.startsWith("#"))
      .head().term
    val hits = engine.search(srcTerm)
    assert(hits.nonEmpty)
    assert(hits.exists(_.docId >= offset),
      s"no result from the merged side for '$srcTerm'")
    // and a dest-side term still resolves (dest partitions intact)
    val destTerm = IndexStore.readPostings(spark, dest)
      .filter(r => r.chunk < base && !r.term.startsWith("#"))
      .head().term
    assert(engine.search(destTerm).nonEmpty)
  }

  test("merge preserves a legacy two-table dest layout") {
    import spark.implicits._
    val cfg = BuildConfig(chunkDocs = 50, strategy = "grouped")
    val idsA = corpus(40, seed = 41).persist()
    val idsB = corpus(25, seed = 42).persist()
    val dest = SparkTestBase.tempDir("graft_mrg_leg_dest")
    val srcD = SparkTestBase.tempDir("graft_mrg_leg_src")
    IndexBuilder.build(spark, idsA, dest, cfg)   // legacy two-table
    IndexBuilder.build(spark, idsB, srcD,
      BuildConfig(chunkDocs = 50))               // combined src into legacy dest
    val (offset, _) = IndexBuilder.mergeIndexes(spark, dest, srcD)

    assert(new java.io.File(s"$dest/docs").exists(), "legacy layout lost")
    val full = SparkTestBase.tempDir("graft_mrg_leg_full")
    IndexBuilder.build(spark,
      idsA.unionByName(idsB.map(d => d.copy(docId = d.docId + offset))),
      full, BuildConfig(chunkDocs = 50))
    assert(canon(dest) === canon(full))
    idsA.unpersist(); idsB.unpersist()
  }

  test("merge rejects mismatched chunk geometry and pending src tombstones") {
    import spark.implicits._
    val idsA = corpus(30, seed = 51)
    val idsB = corpus(20, seed = 52)
    val dest = SparkTestBase.tempDir("graft_mrg_rej_dest")
    val srcGeom = SparkTestBase.tempDir("graft_mrg_rej_geom")
    IndexBuilder.build(spark, idsA, dest, BuildConfig(chunkDocs = 50))
    IndexBuilder.build(spark, idsB, srcGeom, BuildConfig(chunkDocs = 40))
    val e1 = intercept[IllegalArgumentException] {
      IndexBuilder.mergeIndexes(spark, dest, srcGeom)
    }
    assert(e1.getMessage.contains("chunk geometry"))

    val srcTomb = SparkTestBase.tempDir("graft_mrg_rej_tomb")
    IndexBuilder.build(spark, idsB, srcTomb, BuildConfig(chunkDocs = 50))
    IndexBuilder.markDeleted(spark, srcTomb, idsB.filter(_.docId == 3L).map(_.docId))
    val e2 = intercept[IllegalArgumentException] {
      IndexBuilder.mergeIndexes(spark, dest, srcTomb)
    }
    assert(e2.getMessage.contains("tombstones"))
  }

  test("re-merging the same src is a second merge at a fresh offset (documented contract)") {
    import spark.implicits._
    val cfg = BuildConfig(chunkDocs = 50)
    val idsA = corpus(30, seed = 61) // 60 docs
    val idsB = corpus(15, seed = 62) // 30 docs
    val dest = SparkTestBase.tempDir("graft_mrg_re_dest")
    val srcD = SparkTestBase.tempDir("graft_mrg_re_src")
    IndexBuilder.build(spark, idsA, dest, cfg)
    IndexBuilder.build(spark, idsB, srcD, cfg)
    val (off1, _) = IndexBuilder.mergeIndexes(spark, dest, srcD)
    val docs1 = IndexStore.readDocs(spark, dest).collect().map(_.docId).toSet
    val (off2, _) = IndexBuilder.mergeIndexes(spark, dest, srcD)
    assert(off2 > off1)
    val docs2 = IndexStore.readDocs(spark, dest).collect().map(_.docId).toSet
    assert(docs1.subsetOf(docs2)) // first copy untouched
    assert(docs2.size === docs1.size + 30)
  }
}
