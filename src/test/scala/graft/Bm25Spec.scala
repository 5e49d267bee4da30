package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.codec.PostingCodec
import graft.corpus.Corpus
import graft.engine.Bm25Engine
import graft.index.IndexBuilder
import graft.rank.Bm25

class Bm25Spec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** deterministic synthetic posting lists with varied tf/df. */
  def synthLists(seed: Int, nTerms: Int, nDocs: Int): (Seq[Bm25.TermList], Bm25.DocLen, Double) = {
    val rnd = new scala.util.Random(seed)
    val docLens = Array.fill(nDocs)(20.0 + rnd.nextInt(200))
    val avgdl = docLens.sum / nDocs
    val lists = (0 until nTerms).map { t =>
      val df = 1 + rnd.nextInt(nDocs)
      val docIds = rnd.shuffle((0 until nDocs).toList).take(df).sorted
      val docs = docIds.map { d =>
        val tf = 1 + rnd.nextInt(9)
        (d.toLong, (1L to tf).toArray)
      }.toIndexedSeq
      val (dfL, _, blocks, blob) = PostingCodec.encode(docs)
      Bm25.TermList(s"t$t", Bm25.idf(nDocs, dfL), blocks.map(_.maxTf).max, dfL, blocks, blob)
    }
    (lists, id => docLens(id.toInt), avgdl)
  }

  def norm(hits: Array[Bm25.Hit]): Seq[(Long, Double)] =
    hits.map(h => (h.docId, math.rint(h.score * 1e9) / 1e9)).toSeq

  test("WAND == exhaustive on synthetic lists (many shapes)") {
    for (seed <- 1 to 15; k <- Seq(1, 5, 10, 50)) {
      val (lists, dl, avgdl) = synthLists(seed, 2 + seed % 5, 300 + seed * 37)
      val ex = Bm25.scoreExhaustive(lists, dl, avgdl, k)
      val wd = Bm25.scoreWand(lists, dl, avgdl, k)
      assert(norm(wd) === norm(ex), s"seed=$seed k=$k")
    }
  }

  test("WAND == exhaustive with block-skipping lists (> BlockDocs docs)") {
    for (seed <- 1 to 5) {
      val (lists, dl, avgdl) = synthLists(seed, 4, 1000)
      assert(norm(Bm25.scoreWand(lists, dl, avgdl, 10)) ===
        norm(Bm25.scoreExhaustive(lists, dl, avgdl, 10)), s"seed=$seed")
    }
  }

  test("conjunctive == exhaustive-conjunctive") {
    for (seed <- 1 to 10) {
      val (lists, dl, avgdl) = synthLists(seed, 3, 400)
      val ex = Bm25.scoreExhaustive(lists, dl, avgdl, 10, conjunctive = true)
      val lf = Bm25.scoreConjunctive(lists, dl, avgdl, 10)
      assert(norm(lf) === norm(ex), s"seed=$seed")
    }
  }

  test("idf/tfPart sanity") {
    assert(Bm25.idf(1000, 1) > Bm25.idf(1000, 500))
    assert(Bm25.idf(1000, 1000) >= 0.0)
    assert(Bm25.tfPart(5, 100, 100) > Bm25.tfPart(1, 100, 100))
    assert(Bm25.tfPart(5, 200, 100) < Bm25.tfPart(5, 50, 100))
    assert(Bm25.tfPartUpperBound(7) >= Bm25.tfPart(7, 1, 100))
  }

  test("distributed BM25: WAND == exhaustive on a real index; AND ⊆ OR semantics") {
    val src = Corpus.fromDocumentsParquet(spark, "/root/testdata/sf0.001")
    val out = SparkTestBase.tempDir("graft-bm25")
    IndexBuilder.build(spark, src, out, IndexBuilder.BuildConfig(chunkDocs = 200))
    val engine = new Bm25Engine(spark, out)
    for (terms <- Seq(Seq("spark", "merge"), Seq("dup"), Seq("spark", "dup", "join"))) {
      val wand = engine.searchTerms(terms, 20, engine.Or, useWand = true)
      val ex = engine.searchTerms(terms, 20, engine.Or, useWand = false)
      assert(wand.map(h => (h.docId, math.rint(h.score * 1e9))) ===
        ex.map(h => (h.docId, math.rint(h.score * 1e9))), terms.toString)
      assert(wand.size === 20)
      // scores strictly ordered desc, docId asc on ties
      assert(wand.sliding(2).forall { case Seq(a, b) =>
        a.score > b.score || (a.score == b.score && a.docId < b.docId) })
    }
    val and = engine.searchTerms(Seq("spark", "dup"), 50, engine.And)
    val andDocs = and.map(_.docId).toSet
    // every AND hit must contain both terms: cross-check via the raw corpus
    val texts = src.collect().map(d => d.docId -> d.content).toMap
    andDocs.foreach { id =>
      val toks = graft.tokenizer.Tokenizer.bodyTokens(texts(id)).toSet
      assert(toks.contains("spark") && toks.contains("dup"), s"doc $id")
    }
    // absent term -> empty under And
    assert(engine.searchTerms(Seq("spark", "zzzz"), 5, engine.And).isEmpty)
  }

  test("searchTermsExplain: contributions sum to the hit score; tfs are token-count truth") {
    val src = Corpus.fromDocumentsParquet(spark, "/root/testdata/sf0.001")
    val out = SparkTestBase.tempDir("graft-bm25-expl")
    IndexBuilder.build(spark, src, out, IndexBuilder.BuildConfig(chunkDocs = 200))
    val engine = new Bm25Engine(spark, out)
    val terms = Seq("spark", "dup", "merge")
    val hits = engine.searchTerms(terms, 15, engine.Or)
    val rows = engine.searchTermsExplain(terms, 15)
    // every hit is explained; totals match; contributions sum to them
    val byDoc = rows.groupBy(_.docId)
    assert(byDoc.keySet === hits.map(_.docId).toSet)
    hits.foreach { h =>
      val rs = byDoc(h.docId)
      assert(rs.forall(_.score === h.score))
      assert(math.abs(rs.map(_.contribution).sum - h.score) < 1e-9, s"doc ${h.docId}")
      rs.foreach(r => assert(math.abs(r.idf * r.tfPart - r.contribution) < 1e-12))
    }
    // tf/df are tokenization truth (cross-check via the raw corpus)
    val texts = src.collect().map(d => d.docId -> d.content).toMap
    val dfTruth = terms.map(t => t ->
      texts.values.count(c => graft.tokenizer.Tokenizer.bodyTokens(c).contains(t)).toLong).toMap
    rows.foreach { r =>
      val toks = graft.tokenizer.Tokenizer.bodyTokens(texts(r.docId))
      assert(r.tf === toks.count(_ == r.term).toLong, s"tf for ${r.docId}/${r.term}")
      assert(r.df === dfTruth(r.term), s"df for ${r.term}")
    }
    // a term absent from a doc produces no row
    assert(rows.forall(r => r.tf > 0))
  }

  test("searchTermsCollapsed: first perRepo per repo in global order, exact vs brute twin") {
    val src = Corpus.fromDocumentsParquet(spark, "/root/testdata/sf0.001")
    val out = SparkTestBase.tempDir("graft-bm25-coll")
    IndexBuilder.build(spark, src, out, IndexBuilder.BuildConfig(chunkDocs = 200))
    val engine = new Bm25Engine(spark, out)
    val terms = Seq("spark", "dup", "merge")
    val got = engine.searchTermsCollapsed(terms, k = 30, perRepo = 2, pool = 100)
    // brute twin: same pool, repo from the corpus derivation, same walk
    val pool = engine.searchTerms(terms, 100, engine.Or)
    val repoOf = src.collect().map(d => d.docId -> d.repo).toMap
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val cnt = scala.collection.mutable.HashMap.empty[String, Int]
    pool.foreach { h =>
      val r = repoOf(h.docId)
      if (kept.size < 30 && cnt.getOrElse(r, 0) < 2) {
        cnt(r) = cnt.getOrElse(r, 0) + 1; kept += ((h.docId, r))
      }
    }
    assert(got.map { case (h, r) => (h.docId, r) } === kept.toSeq)
    // the cap holds and scores stay in global order
    assert(got.groupBy(_._2).values.forall(_.size <= 2))
    assert(got.map(_._1).sliding(2).forall {
      case Seq(a, b) => a.score > b.score || (a.score == b.score && a.docId < b.docId)
      case _ => true
    })
    assert(got.size === 30)
  }

  test("searchTermsSince == global ranking filtered to docId > mark (boundary transcode)") {
    val src = Corpus.fromDocumentsParquet(spark, "/root/testdata/sf0.001")
    val out = SparkTestBase.tempDir("graft-bm25-since")
    IndexBuilder.build(spark, src, out, IndexBuilder.BuildConfig(chunkDocs = 200))
    val engine = new Bm25Engine(spark, out)
    val terms = Seq("spark", "dup", "merge")
    // every OR-matching doc with its global score (k=600 > corpus size)
    val all = engine.searchTerms(terms, 600, engine.Or)
    for (mark <- Seq(0L, 250L, 399L, 499L)) { // mid-chunk marks straddle chunk 1
      val got = engine.searchTermsSince(terms, 30, mark)
      val exp = all.filter(_.docId > mark)
        .sorted(Bm25.better.reverse).take(30)
      assert(got.map(h => (h.docId, math.rint(h.score * 1e9))) ===
        exp.map(h => (h.docId, math.rint(h.score * 1e9))), s"mark=$mark")
      assert(got.forall(_.docId > mark), s"mark=$mark leaked old docs")
    }
    // And mode: all terms must co-occur within the fresh tail
    val andSince = engine.searchTermsSince(Seq("spark", "dup"), 50, 250L, engine.And)
    val andAll = engine.searchTerms(Seq("spark", "dup"), 600, engine.And)
    assert(andSince.map(_.docId) ===
      andAll.filter(_.docId > 250L).sorted(Bm25.better.reverse).take(50).map(_.docId))
    // mark at/after the high-water: empty
    assert(engine.searchTermsSince(terms, 10, 499L).map(_.docId).forall(_ > 499L))
    assert(engine.searchTermsSince(terms, 10, 10000L).isEmpty)
  }

  test("moreLikeThis == keywordsTfIdf-rule selection + searchTerms, seed excluded") {
    val src = Corpus.fromDocumentsParquet(spark, "/root/testdata/sf0.001")
    val out = SparkTestBase.tempDir("graft-mlt")
    IndexBuilder.build(spark, src, out, IndexBuilder.BuildConfig(chunkDocs = 200))
    val engine = new Bm25Engine(spark, out)
    val texts = src.collect().map(d => d.docId -> d.content).toMap
    // first-principles keyword selection for the seed, independent of
    // the engine: tf from the seed's body tokens, df over the corpus
    val seed = 0L
    val allToks = texts.map { case (id, c) =>
      id -> graft.tokenizer.Tokenizer.bodyTokens(c) }
    val tf = allToks(seed).groupBy(identity).map { case (t, a) => t -> a.length }
    val n = texts.size.toDouble
    val dfOf = (t: String) => allToks.count(_._2.contains(t)).toDouble
    val expTerms = tf.toSeq.map { case (t, f) =>
      (t, BigDecimal(f * math.log(n / dfOf(t)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (t, w) => (-w, t) }.take(5).map(_._1)
    val got = engine.moreLikeThis(seed, texts(seed), kTerms = 5, k = 30)
    val exp = engine.searchTerms(expTerms, 31, engine.Or)
      .filter(_.docId != seed).take(30)
    assert(got.map(h => (h.docId, math.rint(h.score * 1e9))) ===
      exp.map(h => (h.docId, math.rint(h.score * 1e9))))
    assert(got.nonEmpty && !got.exists(_.docId == seed) && got.size === 30)
    // text with no indexable tokens -> empty
    assert(engine.moreLikeThis(seed, "12345 !!", kTerms = 5, k = 10).isEmpty)
  }

  test("concurrent queries on ONE engine are identical to sequential (dfCache race)") {
    // the pthread-per-request analog (index/indexServer.cpp:178-198): N
    // threads share one engine; the global-df memo must not race. Term
    // sets overlap deliberately so cache hits and concurrent misses mix.
    val src = Corpus.fromDocumentsParquet(spark, "/root/testdata/sf0.001")
    val out = SparkTestBase.tempDir("graft-bm25-conc")
    IndexBuilder.build(spark, src, out, IndexBuilder.BuildConfig(chunkDocs = 200))
    val engine = new Bm25Engine(spark, out)
    val querySets = Seq(
      Seq("spark", "dup"), Seq("spark", "merge", "sort"), Seq("dup"),
      Seq("merge", "join"), Seq("spark"), Seq("sort", "dup"))
    val expected = querySets.map(t => engine.searchTerms(t, 10, engine.Or))

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    (1 to 3).foreach { round =>
      val fresh = new Bm25Engine(spark, out) // empty dfCache each round
      val futures = (0 until 12).map { i =>
        Future(querySets(i % querySets.size) -> fresh.searchTerms(
          querySets(i % querySets.size), 10, fresh.Or))
      }
      val results = Await.result(Future.sequence(futures), 120.seconds)
      results.foreach { case (terms, hits) =>
        val exp = expected(querySets.indexOf(terms))
        assert(hits === exp, s"round $round terms $terms diverged under concurrency")
      }
    }
  }
}
