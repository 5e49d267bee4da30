package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Corpus
import graft.engine.SearchEngine
import graft.index.{IdDoc, IndexBuilder}
import graft.oracle.RefOracle

/** End-to-end rank-identity: the distributed engine (tokenize -> typed
  * aggregation -> delta+varint chunks -> persisted store -> chunk-pruned
  * cogroup ranking -> driver merge) must reproduce the single-threaded
  * oracle exactly — top-k (url, score) lists in order — on the frozen
  * reference query set (FIXTURES.md §7) remapped onto each corpus's
  * vocabulary.
  */
class EngineGoldenSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** queries remapped onto the documents.parquet vocabulary (31 terms,
    * 'dup' rare).
    */
  val docQueries: Seq[String] = Seq(
    "spark merge sort",                 // hidden AND (university of michigan)
    "\"sort merge\"",                   // phrase
    "spark join \"group by\"",          // returns empty: 'by' not in vocab
    "spark join \"sort merge\"",        // hidden AND + phrase mix
    "spark OR dup", "spark | dup", "spark || dup",
    "spark AND dup", "spark & dup", "spark && dup",
    "(spark OR dup) join",              // nesting + hidden AND
    "dup",                              // single rare term
    "spark",                            // single common term
    "spark zzzmissing",                 // absent term -> empty everywhere
    "the a",                            // stopword-ish pair
    "scan column window order")         // 4-term AND

  def assertIdentical(docs: Seq[IdDoc], indexDir: String, chunkDocs: Long,
                      queries: Seq[String]): Unit = {
    val engine = new SearchEngine(spark, indexDir, chunkDocs)
    queries.foreach { q =>
      val got = engine.search(q).map(h => (h.url, h.score))
      val want = RefOracle.search(docs, q, chunkDocs).map(h => (h.url, h.score))
      assert(got === want, s"query [$q]")
    }
  }

  test("rank-identity on documents.parquet corpus (sf0.001, 3 chunks)") {
    val src = Corpus.fromDocumentsParquet(spark, "/root/testdata/sf0.001")
    val docs = src.collect().toSeq
    val out = SparkTestBase.tempDir("graft-golden-docs")
    IndexBuilder.build(spark, src, out, IndexBuilder.BuildConfig(chunkDocs = 200))
    assertIdentical(docs, out, 200, docQueries)
  }

  test("rank-identity on synthetic corpus (multi-chunk, salted build)") {
    val src = Corpus.synthetic(spark, 4, 100, seed = 5)
    val ids = Corpus.assignDocIds(spark, src).cache()
    val docs = ids.collect().toSeq
    val out = SparkTestBase.tempDir("graft-golden-syn")
    IndexBuilder.build(spark, ids, out,
      IndexBuilder.BuildConfig(chunkDocs = 150, salts = 4))
    // pick corpus-specific query terms: the 2 most common + 2 mid + a rare
    val freq = docs.flatMap(d => graft.tokenizer.Tokenizer.bodyTokens(d.content))
      .groupBy(identity).view.mapValues(_.size).toSeq.sortBy(-_._2)
    val common = freq.take(2).map(_._1)
    val mid = freq.drop(20).take(2).map(_._1)
    val rare = freq.takeRight(1).map(_._1)
    val queries = Seq(
      common.mkString(" "),
      s"${common.head} OR ${rare.head}",
      s"(${mid.head} OR ${mid(1)}) ${common.head}",
      "\"" + common.mkString(" ") + "\"",
      rare.head,
      s"${common.head} && ${mid.head}")
    assertIdentical(docs, out, 150, queries)
  }

  test("rank-identity holds across randomized seeded corpora") {
    // two more seeded corpora with corpus-derived query sets — catches
    // ISR/codec/merge corners the two fixed corpora might not exercise
    Seq(11, 23).foreach { seed =>
      val src = Corpus.synthetic(spark, 3, 60, seed = seed)
      val ids = Corpus.assignDocIds(spark, src).cache()
      val docs = ids.collect().toSeq
      val out = SparkTestBase.tempDir(s"graft-golden-seed$seed")
      IndexBuilder.build(spark, ids, out, IndexBuilder.BuildConfig(chunkDocs = 70))
      val freq = docs.flatMap(d => graft.tokenizer.Tokenizer.bodyTokens(d.content))
        .groupBy(identity).view.mapValues(_.size).toSeq.sortBy(-_._2)
      val common = freq.take(2).map(_._1)
      val mid = freq.drop(15).take(2).map(_._1)
      val rare = freq.takeRight(2).map(_._1)
      val queries = Seq(
        s"${common.head} ${mid.head}",
        s"${rare.head} OR ${rare(1)}",
        "\"" + s"${common.head} ${common(1)}" + "\"",
        s"(${mid.head} OR ${rare.head}) && ${common.head}",
        mid(1))
      assertIdentical(docs, out, 70, queries)
      // debug surface too: component-level identity on the AND query
      val engine = new SearchEngine(spark, out, 70)
      val got = engine.searchDebug(s"${common.head} ${mid.head}")
        .map(h => (h.chunk, h.docId, h.total))
      val want = RefOracle.searchDebug(docs, s"${common.head} ${mid.head}", 70)
        .sortBy { case (c, d) => (c, d.docId) }
        .map { case (c, d) => (c, d.docId, d.total) }
      assert(got === want, s"seed $seed debug")
    }
  }

  test("pagination slices the merged top-k (T6)") {
    val src = Corpus.fromDocumentsParquet(spark, "/root/testdata/sf0.001")
    val out = SparkTestBase.tempDir("graft-page")
    IndexBuilder.build(spark, src, out, IndexBuilder.BuildConfig(chunkDocs = 200))
    val engine = new SearchEngine(spark, out, 200)
    val all = engine.search("spark merge sort")
    assert(engine.searchPage("spark merge sort", 0) === all.slice(0, 10))
    assert(engine.searchPage("spark merge sort", 2) === all.slice(20, 30))
    assert(engine.searchPage("spark merge sort", 5).isEmpty)
  }

  test("searchDebug breakdown is golden-identical to RefOracle (DebugScore)") {
    val src = Corpus.fromDocumentsParquet(spark, "/root/testdata/sf0.001")
    val docs = src.collect().toSeq
    val out = SparkTestBase.tempDir("graft-debug")
    IndexBuilder.build(spark, src, out, IndexBuilder.BuildConfig(chunkDocs = 200))
    val engine = new SearchEngine(spark, out, 200)
    Seq("dup", "spark merge sort", "spark OR dup").foreach { q =>
      val got = engine.searchDebug(q)
        .map(h => (h.chunk, h.docId, h.sStatic, h.sUrl, h.sTitle, h.sBodyRaw,
          h.sBody, h.dynamicWeight, h.total))
      val want = RefOracle.searchDebug(docs, q, 200)
        .sortBy { case (c, d) => (c, d.docId) }
        .map { case (c, d) => (c, d.docId, d.sStatic, d.sUrl, d.sTitle,
          d.sBodyRaw, d.sBody, d.dynamicWeight, d.total) }
      assert(got === want, s"query [$q]")
      assert(got.nonEmpty, s"query [$q] produced no candidates")
    }
  }

  test("T3: exactly 999 candidates scored at the per-chunk cap boundary") {
    // a single chunk with 1,100 matching docs: the reference loop
    // (ranker.h:756-765) post-increments numDocsFound in the while
    // condition and breaks BEFORE scoring once it reaches 1000, so docs
    // 0..998 are scored and 999..1099 are not — on both engines.
    import spark.implicits._
    val docs = (0 until 1100).map { i =>
      IdDoc(i.toLong, s"org${i % 7}/proj${i % 7}", s"cap/doc$i.txt",
        f"c$i%08d", "txt",
        // vary occurrence count and length so scores are not uniform
        ("capword " * (1 + i % 4)) + ("filler " * (i % 9)))
    }
    val out = SparkTestBase.tempDir("graft-cap")
    IndexBuilder.build(spark, spark.createDataset(docs), out,
      IndexBuilder.BuildConfig(chunkDocs = 2000))
    val engine = new SearchEngine(spark, out, 2000)

    val dbg = engine.searchDebug("capword")
    assert(dbg.size === 999)
    assert(dbg.map(_.docId) === (0L until 999L))
    val oracle = RefOracle.searchDebug(docs, "capword", 2000)
    assert(oracle.size === 999)
    assert(dbg.map(h => (h.docId, h.total)) ===
      oracle.map { case (_, d) => (d.docId, d.total) })

    // end-to-end: the capped candidate walk feeds the same top-30
    assert(engine.search("capword").map(h => (h.docId, h.score)) ===
      RefOracle.search(docs, "capword", 2000).map(h => (h.docId, h.score)))
  }

  test("byte-capped doc broadcast: fallback cogroup path stays rank-identical") {
    // broadcastDocsBytes = 1 forces the big-index fallback (per-query
    // chunk-pruned cogroup against the docs table) even though the row
    // count is tiny — both plan shapes must produce identical rankings
    val src = Corpus.fromDocumentsParquet(spark, "/root/testdata/sf0.001")
    val out = SparkTestBase.tempDir("graft-bytecap")
    IndexBuilder.build(spark, src, out, IndexBuilder.BuildConfig(chunkDocs = 200))
    val resident = new SearchEngine(spark, out, 200)
    val fallback = new SearchEngine(spark, out, 200, broadcastDocsBytes = 1L)
    Seq("dup", "spark merge sort", "spark OR dup", "\"sort merge\"").foreach { q =>
      val a = resident.search(q).map(h => (h.url, h.score))
      val b = fallback.search(q).map(h => (h.url, h.score))
      assert(a === b, s"query [$q]")
      assert(a.nonEmpty, s"query [$q] vacuous")
    }
    assert(resident.searchDebug("dup") === fallback.searchDebug("dup"))
  }

  test("chunk pruning returns nothing when a term is missing everywhere") {
    val src = Corpus.fromDocumentsParquet(spark, "/root/testdata/sf0.001")
    val out = SparkTestBase.tempDir("graft-prune")
    IndexBuilder.build(spark, src, out, IndexBuilder.BuildConfig(chunkDocs = 200))
    val engine = new SearchEngine(spark, out, 200)
    assert(engine.search("zzznotaword").isEmpty)
    assert(engine.search("spark zzznotaword").isEmpty)
    assert(engine.search("").isEmpty)
  }
}
