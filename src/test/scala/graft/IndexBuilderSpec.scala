package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.codec.PostingCodec
import graft.corpus.Corpus
import graft.index._
import graft.tokenizer.Tokenizer

class IndexBuilderSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import IndexBuilder.BuildConfig

  def tinyCorpus: org.apache.spark.sql.Dataset[IdDoc] = {
    import spark.implicits._
    spark.createDataset(Seq(
      IdDoc(0, "o/p", "a/doc.txt", "c0ffee00", "txt", "quick brown fox jumps the fence"),
      IdDoc(1, "o/p", "b/doc.txt", "c0ffee01", "txt", "quick quick slow fox"),
      IdDoc(2, "o/p", "c/doc.txt", "c0ffee02", "txt", "brown bear sleeps"),
      IdDoc(3, "o/p", "d/doc.txt", "c0ffee03", "txt", "fox fox fox quick")))
  }

  test("tokens: title-first positions, chunk assignment") {
    import spark.implicits._
    val toks = IndexBuilder.tokens(tinyCorpus, BuildConfig(chunkDocs = 2))
      .collect().toSeq
    // doc 0 chunk 0, doc 2/3 chunk 1
    assert(toks.filter(_.docId == 0).forall(_.chunk == 0))
    assert(toks.filter(_.docId == 3).forall(_.chunk == 1))
    val d0 = toks.filter(_.docId == 0).sortBy(_.pos)
    assert(d0.map(_.term) === Seq("#a", "#doc", "#txt", "quick", "brown", "fox", "jumps", "the", "fence"))
    assert(d0.map(_.pos) === (1L to 9L))
  }

  test("Catalyst tokenizer == typed flatMap tokenizer (frozen rules)") {
    import spark.implicits._
    val docs = Corpus.synthetic(spark, 2, 40, seed = 3) // includes tokenizer noise
    val ids = Corpus.assignDocIds(spark, docs)
    val cfg = BuildConfig(chunkDocs = 30)
    def canon(ds: org.apache.spark.sql.Dataset[graft.index.Token]) =
      ds.collect().map(t => (t.chunk, t.docId, t.pos, t.term)).sorted.toSeq
    assert(canon(IndexBuilder.tokens(ids, cfg)) === canon(IndexBuilder.tokensTyped(ids, cfg)))
    assert(IndexBuilder.tokens(ids, cfg).count() > 0)
  }

  test("assignDocIds: dense ids survive a downstream coalesce(1)") {
    import spark.implicits._
    // regression guard (same class of bug as Packing's): the id pass uses
    // rdd.mapPartitionsWithIndex, whose index is the parent partition's
    // own — a consumer coalesce(1) must not collapse the offsets
    val docs = Corpus.synthetic(spark, 3, 40, seed = 5)
    val ids = Corpus.assignDocIds(spark, docs, numPartitions = 7)
      .coalesce(1).collect().map(_.docId).sorted
    assert(ids.toSeq === (0L until docs.count()).toSeq)
  }

  test("postings aggregation: df/tf exact, positions sorted, round-trips") {
    import spark.implicits._
    val cfg = BuildConfig(chunkDocs = 100)
    val postings = IndexBuilder
      .buildPostings(IndexBuilder.tokens(tinyCorpus, cfg), cfg)
      .collect().map(p => (p.term, p)).toMap
    val quick = postings("quick")
    assert(quick.df === 3 && quick.tf === 4)
    val decoded = PostingCodec.decode(quick.df, quick.postingsBlob)
    assert(decoded.map(_._1).toSeq === Seq(0L, 1L, 3L))
    // doc1: "quick quick slow fox" -> title #b #doc #txt at 1..3, quick at 4,5
    assert(decoded(1)._2.toSeq === Seq(4L, 5L))
    val fox = postings("fox")
    assert(fox.df === 3 && fox.tf === 5)
    assert(postings("#doc").df === 4)
  }

  test("sorted, aggregator, salted, grouped, bychunk builds produce identical postings") {
    import spark.implicits._
    val docs = Corpus.synthetic(spark, 2, 30, seed = 7)
    val ids = Corpus.assignDocIds(spark, docs)
    def canonRows(rows: Array[PostingRow]) = rows
      .map(p => ((p.chunk, p.term),
        (p.df, p.tf, PostingCodec.decode(p.df, p.postingsBlob)
          .map { case (d, ps) => (d, ps.toSeq) }.toSeq)))
      .toMap
    def canon(cfg: BuildConfig) =
      canonRows(IndexBuilder.buildPostings(IndexBuilder.tokens(ids, cfg), cfg).collect())
    def canonFor(cfg: BuildConfig) =
      canonRows(IndexBuilder.buildPostingsFor(ids, cfg).collect())
    val sorted = canon(BuildConfig(chunkDocs = 25, strategy = "sorted"))
    assert(sorted === canon(BuildConfig(chunkDocs = 25, strategy = "aggregator")))
    assert(sorted === canon(BuildConfig(chunkDocs = 25, salts = 4)))
    assert(sorted === canonFor(BuildConfig(chunkDocs = 25, strategy = "grouped")))
    assert(sorted === canonRows(IndexBuilder.buildPostingsByChunk(
      ids, BuildConfig(chunkDocs = 25, strategy = "bychunk")).collect()))
    // blob-level (not just decoded) identity between the two single-pass
    // strategies, which share the persisted write path
    def blobs(rows: Array[PostingRow]) =
      rows.map(p => ((p.chunk, p.term), p.postingsBlob.toSeq)).toMap
    assert(blobs(IndexBuilder.buildPostingsFor(ids, BuildConfig(chunkDocs = 25)).collect()) ===
      blobs(IndexBuilder.buildPostingsByChunk(ids, BuildConfig(chunkDocs = 25)).collect()))
    assert(sorted.nonEmpty)
  }

  test("docs table: url, title, abstract, docLength, sha") {
    import spark.implicits._
    val rows = IndexBuilder.buildDocs(tinyCorpus, BuildConfig(chunkDocs = 2))
      .collect().sortBy(_.docId)
    assert(rows(0).url === "o/p/a/doc.txt@c0ffee00")
    assert(rows(0).title === "a doc txt")
    assert(rows(0).numTitleWords === 3)
    assert(rows(0).docLength === 9)
    assert(rows(0).summary === "fence") // body idx >= 5 -> 6th body word
    assert(rows(0).contentSha === Sha.hex256("quick brown fox jumps the fence"))
    assert(rows(3).chunk === 1)
  }

  test("stats: totalPosts includes one EndDoc posting per doc; avgdl uses chunk capacity") {
    import spark.implicits._
    val cfg = BuildConfig(chunkDocs = 100)
    val docRows = IndexBuilder.buildDocs(tinyCorpus, cfg)
    val postings = IndexBuilder.buildPostings(IndexBuilder.tokens(tinyCorpus, cfg), cfg)
    val stats = IndexBuilder.buildStats(docRows, postings, cfg).collect()
    assert(stats.length === 1)
    val s = stats(0)
    val totalTokens = docRows.collect().map(_.docLength).sum
    assert(s.numDocs === 4)
    assert(s.totalTokens === totalTokens)
    assert(s.totalPosts === totalTokens + 4)
    assert(s.avgdl === (totalTokens + 4).toDouble / 100.0)
  }

  test("full build + resume: completed chunks are not re-tokenized") {
    import spark.implicits._
    val out = SparkTestBase.tempDir("graft-index")
    val docs = Corpus.synthetic(spark, 2, 20, seed = 11)
    val ids = Corpus.assignDocIds(spark, docs).cache()
    val cfg = BuildConfig(chunkDocs = 10)
    // first build: only chunks 0 and 1 (docIds < 20)
    val firstHalf = ids.filter(_.docId < 20)
    val built1 = IndexBuilder.build(spark, firstHalf, out, cfg)
    assert(built1 === Set(0L, 1L))
    assert(IndexBuilder.completedChunks(spark, out, "postings") === Set(0L, 1L))
    // resume with the full corpus: only chunks 2,3 get built
    val built2 = IndexBuilder.build(spark, ids, out, cfg)
    assert(built2 === Set(2L, 3L))
    // a second resume is a no-op
    assert(IndexBuilder.build(spark, ids, out, cfg) === Set.empty)
    // the persisted index equals a from-scratch build
    val out2 = SparkTestBase.tempDir("graft-index2")
    IndexBuilder.build(spark, ids, out2, cfg)
    def canonP(dir: String) = IndexStore.readPostings(spark, dir).collect()
      .map(p => ((p.chunk, p.term), (p.df, p.tf, p.postingsBlob.toSeq))).toMap
    def canonD(dir: String) = IndexStore.readDocs(spark, dir).collect()
      .map(d => (d.docId, d)).toMap
    assert(canonP(out) === canonP(out2))
    assert(canonD(out) === canonD(out2))
    // sha invariant vs source
    val srcSha = ids.collect().map(d => d.docId -> Sha.hex256(d.content)).toMap
    IndexStore.readDocs(spark, out).collect().foreach { d =>
      assert(d.contentSha === srcSha(d.docId))
    }
  }

  test("combined layout: one table, doc rows identical to buildDocs") {
    import spark.implicits._
    val out = SparkTestBase.tempDir("graft-combined")
    val docs = Corpus.synthetic(spark, 2, 25, seed = 13)
    val ids = Corpus.assignDocIds(spark, docs).cache()
    val cfg = BuildConfig(chunkDocs = 10) // default strategy = bychunk
    IndexBuilder.build(spark, ids, out, cfg)
    // physical layout: no separate docs dir; postings table carries kind
    assert(!new java.io.File(IndexBuilder.docsDir(out)).exists())
    val raw = spark.read.parquet(IndexBuilder.postingsDir(out))
    assert(raw.columns.contains("kind"))
    // the reader-projected docs equal the two-table flow's buildDocs
    def canonD(rows: Array[DocRow]) = rows.map(d => (d.docId, d)).toMap
    assert(canonD(IndexStore.readDocs(spark, out).collect()) ===
      canonD(IndexBuilder.buildDocs(ids, cfg).collect()))
    // and the reader-projected postings equal the legacy strategies'
    def canonP(rows: Array[PostingRow]) = rows
      .map(p => ((p.chunk, p.term), (p.df, p.tf, p.postingsBlob.toSeq))).toMap
    assert(canonP(IndexStore.readPostings(spark, out).collect()) ===
      canonP(IndexBuilder.buildPostingsGrouped(
        IndexBuilder.tokenGroups(ids, cfg)).collect()))
    // lineage bytes come from the persisted blobBytes column (no blob
    // re-read) and must equal the actual blob lengths per chunk
    val blobSums = IndexStore.readPostings(spark, out).collect()
      .groupBy(_.chunk).view.mapValues(_.map(_.postingsBlob.length.toLong).sum).toMap
    val lineage = spark.read.parquet(IndexBuilder.lineageDir(out))
      .filter($"stage" === "postings").select($"chunk", $"bytes")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lineage === blobSums)
  }

  test("layout dispatch through the Hadoop FileSystem: scheme-qualified URIs resume correctly") {
    import spark.implicits._
    // the probes that decide combined-vs-legacy layout and resume state
    // must go through the path's OWN FileSystem: a java.io.File probe
    // reports every scheme-qualified URI as missing, which here would
    // misread a legacy two-table index as combined and corrupt it on
    // resume (review finding; file: URIs are the sandbox stand-in for
    // hdfs:// or s3a://)
    val out = "file:" + SparkTestBase.tempDir("graft-uri")
    val docs = Corpus.synthetic(spark, 2, 20, seed = 23)
    val ids = Corpus.assignDocIds(spark, docs).cache()
    val cfg = BuildConfig(chunkDocs = 10, strategy = "grouped") // legacy two-table
    IndexBuilder.build(spark, ids.filter(_.docId < 20), out, cfg)
    assert(IndexBuilder.completedChunks(spark, out, "postings") === Set(0L, 1L))
    // resume over the URI: must detect the LEGACY layout (docs dir exists
    // through the FS, invisible to java.io.File) and extend it, not write
    // combined union-schema rows into the postings table
    val built = IndexBuilder.build(spark, ids, out, cfg)
    assert(built === Set(2L, 3L))
    val raw = spark.read.parquet(IndexBuilder.postingsDir(out))
    assert(!raw.columns.contains("kind"),
      "resume misdispatched to the combined layout over a file: URI")
    // readers resolve the URI too and the index equals a local build
    val out2 = SparkTestBase.tempDir("graft-uri2")
    IndexBuilder.build(spark, ids, out2, cfg)
    def canonP(dir: String) = IndexStore.readPostings(spark, dir).collect()
      .map(p => ((p.chunk, p.term), (p.df, p.tf, p.postingsBlob.toSeq))).toMap
    def canonD(dir: String) = IndexStore.readDocs(spark, dir).collect()
      .map(d => (d.docId, d)).toMap
    assert(canonP(out) === canonP(out2))
    assert(canonD(out) === canonD(out2))
  }

  test("cross-strategy resume onto a combined index keeps the layout homogeneous") {
    import spark.implicits._
    val out = SparkTestBase.tempDir("graft-combined-resume")
    val docs = Corpus.synthetic(spark, 2, 20, seed = 17)
    val ids = Corpus.assignDocIds(spark, docs).cache()
    // fresh bychunk build of chunks 0,1 -> combined layout
    IndexBuilder.build(spark, ids.filter(_.docId < 20), out, BuildConfig(chunkDocs = 10))
    assert(!new java.io.File(IndexBuilder.docsDir(out)).exists())
    // resume the rest with the GROUPED strategy: rows must land in the
    // same union schema (not a second layout inside one table)
    val built = IndexBuilder.build(spark, ids, out,
      BuildConfig(chunkDocs = 10, strategy = "grouped"))
    assert(built === Set(2L, 3L))
    assert(!new java.io.File(IndexBuilder.docsDir(out)).exists())
    // full index readable and equal to a from-scratch build
    val out2 = SparkTestBase.tempDir("graft-combined-resume2")
    IndexBuilder.build(spark, ids, out2, BuildConfig(chunkDocs = 10))
    def canonP(dir: String) = IndexStore.readPostings(spark, dir).collect()
      .map(p => ((p.chunk, p.term), (p.df, p.tf, p.postingsBlob.toSeq))).toMap
    def canonD(dir: String) = IndexStore.readDocs(spark, dir).collect()
      .map(d => (d.docId, d)).toMap
    assert(canonP(out) === canonP(out2))
    assert(canonD(out) === canonD(out2))
  }
}
