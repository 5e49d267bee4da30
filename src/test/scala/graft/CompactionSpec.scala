package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexStore}

/** Deletion tombstones + compaction (IndexBuilder.markDeleted/compact): a
  * compacted index must be BLOB-IDENTICAL to a from-scratch build over the
  * surviving docs — per-(chunk, term) df/tf/blocks/postingsBlob bytes, doc
  * rows, and stats all equal — while rewriting ONLY tombstone-bearing
  * chunks. Positions are doc-local, so purging a doc never shifts its
  * neighbors' blobs (Tokenizer scaladoc).
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import IndexBuilder.BuildConfig

  private def corpus(n: Int, seed: Long) = {
    val docs = Corpus.synthetic(spark, 2, n, seed = seed)
    Corpus.assignDocIds(spark, docs)
  }

  /** canonical view of a persisted index (same shape as IndexAppendSpec) */
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

  private def toDs(ids: Seq[Long]) = {
    import spark.implicits._
    spark.createDataset(ids)
  }

  test("compact == from-scratch build over survivors; untouched chunks keep their files (combined)") {
    val ids = corpus(60, seed = 21).persist() // docs 0..119
    val cfg = BuildConfig(chunkDocs = 50)     // chunks 0,1 full; 2 partial
    val dir = SparkTestBase.tempDir("graft_cmp")
    IndexBuilder.build(spark, ids, dir, cfg)

    def files(chunk: Long) = {
      val d = new java.io.File(s"$dir/postings/chunk=$chunk")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified(), f.length())).toSet
    }
    val before = Seq(0L, 2L).map(c => c -> files(c)).toMap

    val dead = Seq(55L, 57L, 83L) // all in chunk 1
    assert(IndexBuilder.markDeleted(spark, dir, toDs(dead)) === 3L)
    assert(IndexStore.readTombstones(spark, dir).count() === 3L)
    assert(IndexBuilder.compact(spark, dir) === Set(1L))

    val full = SparkTestBase.tempDir("graft_cmp_full")
    IndexBuilder.build(spark, ids.filter(d => !dead.contains(d.docId)), full, cfg)
    assert(canon(dir) === canon(full))
    // tombstones cleared; chunks without tombstones were never rewritten
    assert(IndexStore.readTombstones(spark, dir).count() === 0L)
    Seq(0L, 2L).foreach(c => assert(files(c) === before(c), s"chunk $c was rewritten"))
    ids.unpersist()
  }

  test("compact preserves a legacy two-table layout (grouped strategy)") {
    val ids = corpus(60, seed = 23).persist()
    val cfg = BuildConfig(chunkDocs = 50, strategy = "grouped")
    val dir = SparkTestBase.tempDir("graft_cmp")
    IndexBuilder.build(spark, ids, dir, cfg)
    val dead = Seq(3L, 49L, 101L) // chunks 0 and 2
    IndexBuilder.markDeleted(spark, dir, toDs(dead))
    assert(IndexBuilder.compact(spark, dir) === Set(0L, 2L))

    val full = SparkTestBase.tempDir("graft_cmp_full")
    IndexBuilder.build(spark, ids.filter(d => !dead.contains(d.docId)), full, cfg)
    assert(canon(dir) === canon(full))
    // still two tables: the docs dir survived as its own table
    assert(new java.io.File(s"$dir/docs").exists())
    ids.unpersist()
  }

  test("a fully-tombstoned chunk loses its partition dir and stats row") {
    val ids = corpus(60, seed = 25).persist() // docs 0..119
    val cfg = BuildConfig(chunkDocs = 50)
    val dir = SparkTestBase.tempDir("graft_cmp")
    IndexBuilder.build(spark, ids, dir, cfg)
    IndexBuilder.markDeleted(spark, dir, toDs(50L to 99L))
    assert(IndexBuilder.compact(spark, dir) === Set(1L))

    assert(!new java.io.File(s"$dir/postings/chunk=1").exists())
    val full = SparkTestBase.tempDir("graft_cmp_full")
    IndexBuilder.build(spark, ids.filter(d => d.docId < 50L || d.docId > 99L), full, cfg)
    assert(canon(dir) === canon(full))
    assert(IndexStore.readStats(spark, dir).collect().map(_.chunk).toSet === Set(0L, 2L))
    ids.unpersist()
  }

  test("markDeleted rejects docIds outside the corpus extent") {
    val ids = corpus(30, seed = 27) // docs 0..59
    val cfg = BuildConfig(chunkDocs = 50)
    val dir = SparkTestBase.tempDir("graft_cmp")
    IndexBuilder.build(spark, ids, dir, cfg)
    val ex = intercept[IllegalArgumentException] {
      IndexBuilder.markDeleted(spark, dir, toDs(Seq(60L)))
    }
    assert(ex.getMessage.contains("corpus extent"))
    assert(IndexBuilder.markDeleted(spark, dir, toDs(Nil)) === 0L)
  }

  test("compact with no tombstones is a no-op; double compact is idempotent") {
    val ids = corpus(30, seed = 29).persist()
    val cfg = BuildConfig(chunkDocs = 50)
    val dir = SparkTestBase.tempDir("graft_cmp")
    IndexBuilder.build(spark, ids, dir, cfg)
    assert(IndexBuilder.compact(spark, dir) === Set.empty)
    val snap = canon(dir)
    IndexBuilder.markDeleted(spark, dir, toDs(Seq(7L)))
    IndexBuilder.markDeleted(spark, dir, toDs(Seq(7L))) // re-mark: harmless
    assert(IndexBuilder.compact(spark, dir) === Set(0L))
    assert(IndexBuilder.compact(spark, dir) === Set.empty) // tombstones cleared
    val full = SparkTestBase.tempDir("graft_cmp_full")
    IndexBuilder.build(spark, ids.filter(_.docId != 7L), full, cfg)
    assert(canon(dir) === canon(full))
    assert(snap._2.contains(7L) && !canon(dir)._2.contains(7L))
    ids.unpersist()
  }

  test("readDocsLive hides pending tombstones; compact makes it the physical view") {
    val ids = corpus(30, seed = 33).persist() // docs 0..59
    val cfg = BuildConfig(chunkDocs = 50)
    val dir = SparkTestBase.tempDir("graft_cmp")
    IndexBuilder.build(spark, ids, dir, cfg)
    IndexBuilder.markDeleted(spark, dir, toDs(Seq(5L, 51L)))
    // postings reads stay tombstone-blind; the live doc view hides them
    assert(IndexStore.readDocs(spark, dir).count() === 60L)
    val live = IndexStore.readDocsLive(spark, dir).collect().map(_.docId).toSet
    assert(!live.contains(5L) && !live.contains(51L) && live.size === 58)
    IndexBuilder.compact(spark, dir)
    assert(IndexStore.readDocs(spark, dir).collect().map(_.docId).toSet === live)
    assert(IndexStore.readDocsLive(spark, dir).count() === 58L)
    ids.unpersist()
  }

  test("the flagship query path runs unchanged over a maintained index") {
    // an index that lived: base build -> append -> delete -> compact must
    // serve SearchEngine queries exactly like a fresh build over the same
    // surviving corpus (blob identity makes this a consequence; this test
    // pins the END-TO-END wiring, engine included)
    import graft.engine.SearchEngine
    val ids = corpus(60, seed = 35).persist() // docs 0..119
    val cfg = BuildConfig(chunkDocs = 50)
    val dir = SparkTestBase.tempDir("graft_cmp")
    IndexBuilder.build(spark, ids.filter(_.docId < 100L), dir, cfg)
    IndexBuilder.appendBuild(spark, ids.filter(_.docId >= 100L), dir, cfg)
    IndexBuilder.markDeleted(spark, dir, toDs(Seq(7L, 55L, 111L)))
    IndexBuilder.compact(spark, dir)
    val full = SparkTestBase.tempDir("graft_cmp_full")
    val survivors = ids.filter(d => !Seq(7L, 55L, 111L).contains(d.docId))
    IndexBuilder.build(spark, survivors, full, cfg)

    val maintained = new SearchEngine(spark, dir, 50)
    val fresh = new SearchEngine(spark, full, 50)
    // vocabulary comes from the seeded synthetic lexicon; probe with terms
    // drawn from a surviving doc so at least one query returns hits
    val sample = survivors.filter(_.docId == 0L).head().content
      .split("\\s+").filter(_.matches("[A-Za-z]{1,19}")).take(2).map(_.toLowerCase)
    val queries = Seq(sample.mkString(" "), sample.head, s"${sample.head} OR ${sample.last}")
    queries.foreach { q =>
      val got = maintained.search(q).map(h => (h.url, h.score))
      val want = fresh.search(q).map(h => (h.url, h.score))
      assert(got === want, s"query '$q'")
    }
    assert(queries.exists(q => fresh.search(q).nonEmpty))
    ids.unpersist()
  }

  test("property: random geometry/split/delete trials — maintained == fresh") {
    // seeded-random sweep (house scalatest/scalacheck bridge, cf.
    // CodecSpec): whatever the chunk geometry, append split point, and
    // delete set, build -> append -> delete -> compact must equal a fresh
    // build over the survivors
    val rnd = new scala.util.Random(4242)
    (1 to 4).foreach { trial =>
      val n = 20 + rnd.nextInt(20) // files per repo; corpus = 2n docs
      val ids = corpus(n, seed = 100 + trial).persist()
      val total = 2L * n
      val cd = Seq(20L, 30L, 50L)(rnd.nextInt(3))
      val cfg = BuildConfig(chunkDocs = cd)
      val split = 1L + rnd.nextInt((total - 1).toInt)
      val dir = SparkTestBase.tempDir("graft_prop")
      IndexBuilder.build(spark, ids.filter(_.docId < split), dir, cfg)
      IndexBuilder.appendBuild(spark, ids.filter(_.docId >= split), dir, cfg)
      val dead = (0L until total).filter(_ => rnd.nextDouble() < 0.15)
      IndexBuilder.markDeleted(spark, dir, toDs(dead))
      IndexBuilder.compact(spark, dir)
      val full = SparkTestBase.tempDir("graft_prop_full")
      IndexBuilder.build(spark, ids.filter(d => !dead.contains(d.docId)), full, cfg)
      assert(canon(dir) === canon(full),
        s"trial $trial (n=$n chunkDocs=$cd split=$split |dead|=${dead.size})")
      ids.unpersist()
    }
  }

  test("append after compact keeps the docId high-water mark") {
    val ids = corpus(60, seed = 31).persist() // docs 0..119
    val cfg = BuildConfig(chunkDocs = 50)
    val dir = SparkTestBase.tempDir("graft_cmp")
    // base = 0..99; delete the tail 90..99, compact, then append 100..119
    IndexBuilder.build(spark, ids.filter(_.docId < 100L), dir, cfg)
    IndexBuilder.markDeleted(spark, dir, toDs(90L to 99L))
    assert(IndexBuilder.compact(spark, dir) === Set(1L))
    // docIds are never reused: lineage history still pins docMax=99, so a
    // re-grant of 90..99 must be rejected even though they were purged
    intercept[IllegalArgumentException] {
      IndexBuilder.appendBuild(spark, ids.filter(_.docId >= 90L), dir, cfg)
    }
    IndexBuilder.appendBuild(spark, ids.filter(_.docId >= 100L), dir, cfg)
    val full = SparkTestBase.tempDir("graft_cmp_full")
    IndexBuilder.build(spark,
      ids.filter(d => d.docId < 90L || d.docId >= 100L), full, cfg)
    assert(canon(dir) === canon(full))
    ids.unpersist()
  }
}
