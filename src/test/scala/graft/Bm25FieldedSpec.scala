package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Corpus
import graft.engine.Bm25Engine
import graft.index.{IdDoc, IndexBuilder}
import graft.rank.Bm25
import graft.tokenizer.Tokenizer

/** BM25F field-weighted top-k and champion-list static pruning, pinned
  * against plain-Scala twins (no Spark, no codec) over a fixture corpus
  * whose TITLES actually vary — the sf corpora synthesize uniform
  * ['src','doc','txt'] titles, so the driver oracle (q_bm25f_topk)
  * validates the plumbing while this spec carries the discriminating
  * cases: title-only matches, per-doc title-length variation, weights.
  */
class Bm25FieldedSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** 24 docs, varied paths (some contain query terms, varied lengths),
    * varied bodies; seeded and deterministic.
    */
  def fixtureDocs: Seq[IdDoc] = {
    val rnd = new scala.util.Random(91)
    val words = Array("spark", "merge", "sort", "dup", "join", "scan",
      "index", "query", "chunk", "blob")
    (0 until 24).map { i =>
      val path = i % 4 match {
        case 0 => s"alpha/spark/notes$i.txt"       // 'spark' in title
        case 1 => s"beta/merge/deep/tree$i.md"     // 'merge' in title, longer
        case 2 => s"gamma/plain$i.rst"             // no query term in title
        case 3 => "verylongtitlesegmentxx/doc.txt" // >=19-char word dropped
      }
      val body = Seq.fill(8 + rnd.nextInt(25))(words(rnd.nextInt(words.length)))
        .mkString(" ")
      IdDoc(i.toLong, s"org$i/proj", path, f"c$i%08d", "scala",
        // doc 8 (i%4==0, so its title contains 'spark'): 'spark' in TITLE
        // only, never in body
        if (i == 8) "alpha body merge sort " + body.replace("spark", "scan")
        else body)
    }
  }

  def buildIndex(docs: Seq[IdDoc], tag: String): String = {
    import spark.implicits._
    val out = SparkTestBase.tempDir(s"graft-bm25f-$tag")
    IndexBuilder.build(spark, spark.createDataset(docs), out,
      IndexBuilder.BuildConfig(chunkDocs = 10))
    out
  }

  def round9(hits: Seq[Bm25.Hit]): Seq[(Long, Double)] =
    hits.map(h => (h.docId, math.rint(h.score * 1e9) / 1e9))

  /** plain-Scala BM25F over the raw docs — the engine's definition
    * re-derived: dlT = raw title count (numTitleWords), dlB = kept total
    * minus raw title clamped at 0, idf over the body∪title union.
    */
  def bm25fTwin(docs: Seq[IdDoc], terms: Seq[String],
                wB: Double, wT: Double, k: Int): Seq[(Long, Double)] = {
    val body = docs.map(d => d.docId -> Tokenizer.bodyTokens(d.content)).toMap
    val titleKept = docs.map(d =>
      d.docId -> Tokenizer.titleTokens(d.path).map(_.substring(1))).toMap
    val titleRaw = docs.map(d =>
      d.docId -> Tokenizer.titleWordsRaw(d.path).length).toMap
    val dlB = docs.map(d => d.docId -> math.max(
      titleKept(d.docId).length + body(d.docId).length - titleRaw(d.docId),
      0).toDouble).toMap
    val dlT = docs.map(d => d.docId -> titleRaw(d.docId).toDouble).toMap
    val n = docs.size
    val avgB = dlB.values.sum / n
    val avgT = dlT.values.sum / n
    val dfU = terms.map { t =>
      t -> docs.count(d =>
        body(d.docId).contains(t) || titleKept(d.docId).contains(t)).toLong
    }.toMap
    val scored = docs.flatMap { d =>
      var s = 0.0
      var any = false
      terms.foreach { t =>
        val tfB = body(d.docId).count(_ == t)
        val tfT = titleKept(d.docId).count(_ == t)
        var w = 0.0
        if (tfB > 0 && avgB > 0)
          w += wB * tfB / (1.0 + 0.75 * (dlB(d.docId) / avgB - 1.0))
        if (tfT > 0 && avgT > 0)
          w += wT * tfT / (1.0 + 0.75 * (dlT(d.docId) / avgT - 1.0))
        if (w > 0) {
          any = true
          s += Bm25.idf(n, dfU(t)) * w / (Bm25.K1 + w)
        }
      }
      if (any) Some((d.docId, math.rint(s * 1e9) / 1e9)) else None
    }
    scored.sortBy { case (id, s) => (-s, id) }.take(k)
  }

  /** plain-Scala champion-list twin: per-term top-m by (tf desc, docId),
    * then full BM25 (dl = kept total, avgdl over all docs) on the union.
    */
  def championTwin(docs: Seq[IdDoc], terms: Seq[String],
                   k: Int, m: Int): Seq[(Long, Double)] = {
    val body = docs.map(d => d.docId -> Tokenizer.bodyTokens(d.content)).toMap
    val titleKeptN = docs.map(d =>
      d.docId -> Tokenizer.titleTokens(d.path).length).toMap
    val dl = docs.map(d =>
      d.docId -> (titleKeptN(d.docId) + body(d.docId).length).toDouble).toMap
    val n = docs.size
    val avgdl = dl.values.sum / n
    val tf = terms.map { t =>
      t -> docs.map(d => d.docId -> body(d.docId).count(_ == t).toLong)
        .filter(_._2 > 0).toMap
    }.toMap
    val cand = terms.flatMap { t =>
      tf(t).toSeq.sortBy { case (id, f) => (-f, id) }.take(m).map(_._1)
    }.distinct
    val scored = cand.flatMap { id =>
      var s = 0.0
      var any = false
      terms.foreach { t =>
        val f = tf(t).getOrElse(id, 0L)
        if (f > 0) {
          any = true
          s += Bm25.idf(n, tf(t).size.toLong) *
            Bm25.tfPart(f.toDouble, dl(id), avgdl)
        }
      }
      if (any) Some((id, math.rint(s * 1e9) / 1e9)) else None
    }
    scored.sortBy { case (id, s) => (-s, id) }.take(k)
  }

  test("BM25F == plain-Scala twin; title-only match surfaces; fallback path identical") {
    val docs = fixtureDocs
    val idx = buildIndex(docs, "main")
    val engine = new Bm25Engine(spark, idx)
    for ((terms, wT) <- Seq(
        (Seq("spark", "merge"), 2.5), (Seq("spark"), 4.0),
        (Seq("gamma", "sort", "dup"), 1.5), (Seq("txt"), 2.0))) {
      val got = round9(engine.searchTermsFielded(terms, 15, wBody = 1.0, wTitle = wT))
      val want = bm25fTwin(docs, terms, 1.0, wT, 15)
      assert(got === want, s"terms=$terms wT=$wT")
    }
    // doc 8 has 'spark' ONLY in its title — a pure-body engine misses it,
    // the fielded engine must surface it
    val fielded = engine.searchTermsFielded(Seq("spark"), 24, 1.0, 2.5)
    assert(fielded.exists(_.docId == 8L))
    assert(!engine.searchTerms(Seq("spark"), 24, engine.Or).exists(_.docId == 8L))
    // cogroup fallback (broadcast gate forced shut) is result-identical
    val engineNb = new Bm25Engine(spark, idx, broadcastDocsLimit = 0)
    assert(round9(engineNb.searchTermsFielded(Seq("spark", "merge"), 15, 1.0, 2.5)) ===
      round9(engine.searchTermsFielded(Seq("spark", "merge"), 15, 1.0, 2.5)))
  }

  test("BM25F weight monotonicity: raising wTitle promotes the title-only match (doc 8)") {
    val docs = fixtureDocs
    val engine = new Bm25Engine(spark, buildIndex(docs, "wts"))
    def rankOf8(wT: Double): Int =
      engine.searchTermsFielded(Seq("spark"), 24, 1.0, wT).indexWhere(_.docId == 8L)
    val low = rankOf8(0.5)
    val high = rankOf8(8.0)
    assert(low >= 0 && high >= 0)
    assert(high < low, s"doc 8 rank should improve: wT=0.5 -> $low, wT=8.0 -> $high")
  }

  test("champion list == plain-Scala twin; m >= corpus recovers full BM25") {
    val docs = fixtureDocs
    val idx = buildIndex(docs, "champ")
    val engine = new Bm25Engine(spark, idx)
    for (m <- Seq(2, 5, 24)) {
      val got = round9(engine.searchTermsChampion(Seq("spark", "dup", "merge"), 10, m))
      val want = championTwin(docs, Seq("spark", "dup", "merge"), 10, m)
      assert(got === want, s"m=$m")
    }
    // m covering every df: champion == exhaustive full BM25
    val full = round9(engine.searchTerms(Seq("spark", "dup"), 10, engine.Or, useWand = false))
    val champ = round9(engine.searchTermsChampion(Seq("spark", "dup"), 10, m = 24))
    assert(champ === full)
    // fallback path identical
    val engineNb = new Bm25Engine(spark, idx, broadcastDocsLimit = 0)
    assert(round9(engineNb.searchTermsChampion(Seq("spark", "dup"), 10, 3)) ===
      round9(engine.searchTermsChampion(Seq("spark", "dup"), 10, 3)))
  }

  /** The champion stage-1 candidate set, re-derived from tokenization
    * truth: per term, the global top-m docIds by BODY (tf desc, id asc).
    */
  def champCandTwin(docs: Seq[IdDoc], terms: Seq[String], m: Int): Set[Long] = {
    val body = docs.map(d => d.docId -> Tokenizer.bodyTokens(d.content)).toMap
    terms.flatMap { t =>
      docs.map(d => d.docId -> body(d.docId).count(_ == t).toLong)
        .filter(_._2 > 0).sortBy { case (id, f) => (-f, id) }.take(m).map(_._1)
    }.toSet
  }

  /** plain-Scala proximity-BM25 twin: exhaustive BM25 + per-pair windowed
    * 1/dist² micro-unit boosts (body positions; the engine's title offset
    * cancels in every distance).
    */
  def proximityTwin(docs: Seq[IdDoc], terms: Seq[String],
                    k: Int, window: Int): Seq[(Long, Double)] = {
    val body = docs.map(d => d.docId -> Tokenizer.bodyTokens(d.content)).toMap
    val titleKeptN = docs.map(d =>
      d.docId -> Tokenizer.titleTokens(d.path).length).toMap
    val dl = docs.map(d =>
      d.docId -> (titleKeptN(d.docId) + body(d.docId).length).toDouble).toMap
    val n = docs.size
    val avgdl = dl.values.sum / n
    val idf = terms.map { t =>
      t -> Bm25.idf(n, docs.count(d => body(d.docId).contains(t)).toLong)
    }.toMap
    val scored = docs.flatMap { d =>
      val toks = body(d.docId)
      var s = 0.0
      var any = false
      terms.foreach { t =>
        val tf = toks.count(_ == t)
        if (tf > 0) {
          any = true
          s += idf(t) * Bm25.tfPart(tf.toDouble, dl(d.docId), avgdl)
        }
      }
      for (i <- terms.indices; j <- i + 1 until terms.size) {
        val pa = toks.zipWithIndex.filter(_._1 == terms(i)).map(_._2 + 1L)
        val pb = toks.zipWithIndex.filter(_._1 == terms(j)).map(_._2 + 1L)
        var accM = 0L
        for (a <- pa; b <- pb) {
          val dist = math.abs(a - b).toInt
          if (dist >= 1 && dist <= window) accM += math.round(1e6 / (dist.toDouble * dist))
        }
        if (accM > 0) {
          val a = accM.toDouble / 1e6
          s += math.min(idf(terms(i)), idf(terms(j))) * a / (a + Bm25.K1)
        }
      }
      if (any) Some((d.docId, math.rint(s * 1e9) / 1e9)) else None
    }
    scored.sortBy { case (id, sc) => (-sc, id) }.take(k)
  }

  test("fielded/proximity champion == exhaustive restricted to the candidate set") {
    val docs = fixtureDocs
    val idx = buildIndex(docs, "champfp")
    val engine = new Bm25Engine(spark, idx)
    val terms = Seq("spark", "dup", "merge")
    // per-doc scores are restriction-invariant (both models score each
    // doc independently), so the champion variant must equal the
    // exhaustive twin filtered to the stage-1 candidate set — at every m
    for (m <- Seq(2, 5, 24)) {
      val cands = champCandTwin(docs, terms, m)
      val wantF = bm25fTwin(docs, terms, 1.0, 2.5, docs.size * 2)
        .filter(c => cands(c._1)).take(10)
      assert(round9(engine.searchTermsFieldedChampion(terms, 10, m, 1.0, 2.5))
        === wantF, s"fielded m=$m")
      val wantP = proximityTwin(docs, terms, docs.size * 2, 5)
        .filter(c => cands(c._1)).take(10)
      assert(round9(engine.searchTermsProximityChampion(terms, 10, m, 5))
        === wantP, s"prox m=$m")
    }
    // m >= corpus: the proximity candidate set IS the exhaustive
    // evaluation set (prox only scores body matches), so the champion
    // variant recovers the full ranking exactly; the fielded variant
    // recovers everything except TITLE-ONLY matches (candidates are
    // body-routed — the documented approximation)
    assert(round9(engine.searchTermsProximityChampion(terms, 10, 24, 5)) ===
      round9(engine.searchTermsProximity(terms, 10, 5)))
    // fallback (cogroup) path identical
    val engineNb = new Bm25Engine(spark, idx, broadcastDocsLimit = 0)
    assert(round9(engineNb.searchTermsFieldedChampion(terms, 10, 5)) ===
      round9(engine.searchTermsFieldedChampion(terms, 10, 5)))
    assert(round9(engineNb.searchTermsProximityChampion(terms, 10, 5)) ===
      round9(engine.searchTermsProximityChampion(terms, 10, 5)))
    // sidecar-served stage 1 (built prefix depth 8 covers m = 5):
    // both variants must be unchanged when candidates come from the
    // persisted store instead of the inline window
    val inlineF = round9(engine.searchTermsFieldedChampion(terms, 10, 5))
    val inlineP = round9(engine.searchTermsProximityChampion(terms, 10, 5))
    graft.index.ChampionSidecar.build(spark, idx, m = 8, nBuckets = 4)
    val engineSc = new Bm25Engine(spark, idx)
    assert(round9(engineSc.searchTermsFieldedChampion(terms, 10, 5)) === inlineF)
    assert(round9(engineSc.searchTermsProximityChampion(terms, 10, 5)) === inlineP)
  }

  test("proximity BM25 == plain-Scala twin; window=0 recovers plain BM25; boost is additive") {
    val docs = fixtureDocs
    val idx = buildIndex(docs, "prox")
    val engine = new Bm25Engine(spark, idx)
    for ((terms, w) <- Seq((Seq("spark", "merge"), 5), (Seq("sort", "dup", "join"), 3),
        (Seq("spark", "scan"), 8))) {
      val got = round9(engine.searchTermsProximity(terms, 15, window = w))
      val want = proximityTwin(docs, terms, 15, w)
      assert(got === want, s"terms=$terms w=$w")
    }
    // window 0: no pair qualifies -> exactly the exhaustive BM25 ranking
    assert(round9(engine.searchTermsProximity(Seq("spark", "merge"), 15, window = 0)) ===
      round9(engine.searchTerms(Seq("spark", "merge"), 15, engine.Or, useWand = false)))
    // every proximity score >= the plain score of the same doc
    val plain = engine.searchTerms(Seq("spark", "merge"), 24, engine.Or, useWand = false)
      .map(h => h.docId -> h.score).toMap
    engine.searchTermsProximity(Seq("spark", "merge"), 24, window = 5).foreach { h =>
      assert(h.score >= plain(h.docId) - 1e-12, s"doc ${h.docId}")
    }
    // fallback path identical
    val engineNb = new Bm25Engine(spark, idx, broadcastDocsLimit = 0)
    assert(round9(engineNb.searchTermsProximity(Seq("spark", "merge"), 15, 5)) ===
      round9(engine.searchTermsProximity(Seq("spark", "merge"), 15, 5)))
  }

  /** plain-Scala Dirichlet query-likelihood twin (Zhai-Lafferty): full
    * query incl. smoothed background for absent-in-doc terms; OOV terms
    * (cf = 0) dropped; candidates = docs matching >= 1 kept term.
    */
  def qlTwin(docs: Seq[IdDoc], terms: Seq[String],
             k: Int, mu: Double): Seq[(Long, Double)] = {
    val body = docs.map(d => d.docId -> Tokenizer.bodyTokens(d.content)).toMap
    val titleKeptN = docs.map(d =>
      d.docId -> Tokenizer.titleTokens(d.path).length).toMap
    val dl = docs.map(d =>
      d.docId -> (titleKeptN(d.docId) + body(d.docId).length).toDouble).toMap
    val totalC = dl.values.sum
    val cf = terms.map(t => t -> docs.map(d => body(d.docId).count(_ == t)).sum.toLong).toMap
    val kept = terms.filter(cf(_) > 0L)
    val scored = docs.flatMap { d =>
      val tfs = kept.map(t => body(d.docId).count(_ == t))
      if (tfs.forall(_ == 0)) None
      else {
        var s = 0.0
        kept.zip(tfs).foreach { case (t, tf) =>
          s += math.log((tf + mu * (cf(t).toDouble / totalC)) / (dl(d.docId) + mu))
        }
        Some((d.docId, math.rint(s * 1e9) / 1e9))
      }
    }
    scored.sortBy { case (id, s) => (-s, id) }.take(k)
  }

  /** plain-Scala phrase-BM25 twin: tf = consecutive-run count, df =
    * matching docs, BM25 of the one virtual term.
    */
  def phraseTwin(docs: Seq[IdDoc], phrase: Seq[String], k: Int): Seq[(Long, Double)] = {
    val body = docs.map(d => d.docId -> Tokenizer.bodyTokens(d.content)).toMap
    val titleKeptN = docs.map(d =>
      d.docId -> Tokenizer.titleTokens(d.path).length).toMap
    val dl = docs.map(d =>
      d.docId -> (titleKeptN(d.docId) + body(d.docId).length).toDouble).toMap
    val n = docs.size
    val avgdl = dl.values.sum / n
    val tfs = docs.map { d =>
      val toks = body(d.docId)
      d.docId -> (0 to toks.length - phrase.length)
        .count(i => phrase.indices.forall(j => toks(i + j) == phrase(j)))
    }.filter(_._2 > 0).toMap
    if (tfs.isEmpty) return Seq.empty
    val idf = Bm25.idf(n, tfs.size.toLong)
    tfs.toSeq.map { case (id, tf) =>
      (id, math.rint(idf * Bm25.tfPart(tf.toDouble, dl(id), avgdl) * 1e9) / 1e9)
    }.sortBy { case (id, s) => (-s, id) }.take(k)
  }

  test("Dirichlet QL == plain-Scala twin; OOV terms dropped; fallback identical") {
    val docs = fixtureDocs
    val idx = buildIndex(docs, "ql")
    val engine = new Bm25Engine(spark, idx)
    for ((terms, mu) <- Seq((Seq("spark", "merge"), 300.0),
        (Seq("sort", "dup", "join"), 50.0), (Seq("scan"), 1000.0))) {
      assert(round9(engine.searchTermsQl(terms, 15, mu)) ===
        qlTwin(docs, terms, 15, mu), s"terms=$terms mu=$mu")
    }
    // an OOV term contributes nothing (dropped, not -inf)
    assert(round9(engine.searchTermsQl(Seq("spark", "zzzznotaword"), 15, 300.0)) ===
      round9(engine.searchTermsQl(Seq("spark"), 15, 300.0)))
    val engineNb = new Bm25Engine(spark, idx, broadcastDocsLimit = 0)
    assert(round9(engineNb.searchTermsQl(Seq("spark", "merge"), 15, 300.0)) ===
      round9(engine.searchTermsQl(Seq("spark", "merge"), 15, 300.0)))
  }

  test("phrase BM25 == plain-Scala twin (2- and 3-term, repeated-term); fallback identical") {
    val docs = fixtureDocs
    val idx = buildIndex(docs, "phr")
    val engine = new Bm25Engine(spark, idx)
    for (phrase <- Seq(Seq("merge", "sort"), Seq("sort", "merge"),
        Seq("dup", "dup"), Seq("spark", "merge", "sort"), Seq("spark", "zzz"))) {
      val got = round9(engine.searchPhrase(phrase, 15))
      val want = phraseTwin(docs, phrase, 15)
      assert(got === want, s"phrase=$phrase")
    }
    // at least one of the 2-term phrases must actually match (fixture sanity)
    assert(phraseTwin(docs, Seq("merge", "sort"), 15).nonEmpty ||
      phraseTwin(docs, Seq("sort", "merge"), 15).nonEmpty)
    val engineNb = new Bm25Engine(spark, idx, broadcastDocsLimit = 0)
    assert(round9(engineNb.searchPhrase(Seq("merge", "sort"), 15)) ===
      round9(engine.searchPhrase(Seq("merge", "sort"), 15)))
  }

  /** unrounded plain-BM25 score map (dl = kept total, idf over body df). */
  def bm25ScoreMap(docs: Seq[IdDoc], terms: Seq[String]): Map[Long, Double] = {
    val body = docs.map(d => d.docId -> Tokenizer.bodyTokens(d.content)).toMap
    val titleKeptN = docs.map(d =>
      d.docId -> Tokenizer.titleTokens(d.path).length).toMap
    val dl = docs.map(d =>
      d.docId -> (titleKeptN(d.docId) + body(d.docId).length).toDouble).toMap
    val n = docs.size
    val avgdl = dl.values.sum / n
    val idf = terms.map { t =>
      t -> Bm25.idf(n, docs.count(d => body(d.docId).contains(t)).toLong)
    }.toMap
    docs.flatMap { d =>
      var s = 0.0
      var any = false
      terms.foreach { t =>
        val tf = body(d.docId).count(_ == t)
        if (tf > 0) { any = true; s += idf(t) * Bm25.tfPart(tf.toDouble, dl(d.docId), avgdl) }
      }
      if (any) Some(d.docId -> s) else None
    }.toMap
  }

  /** plain-Scala PRF twin: stage-1 top-r, rdf·idf offer-weight top-e
    * expansion (ties by term), stage-2 BM25 over the expanded set.
    */
  def prfTwin(docs: Seq[IdDoc], terms: Seq[String], k: Int, r: Int, e: Int)
      : (Seq[String], Seq[(Long, Double)]) = {
    val body = docs.map(d => d.docId -> Tokenizer.bodyTokens(d.content)).toMap
    val n = docs.size
    val fb = bm25ScoreMap(docs, terms).toSeq
      .sortBy { case (id, s) => (-s, id) }.take(r).map(_._1).toSet
    val cand = docs.filter(d => fb(d.docId)).flatMap(d => body(d.docId).distinct)
      .filterNot(terms.contains).groupBy(identity)
    val ow = cand.map { case (t, occ) =>
      val gdf = docs.count(d => body(d.docId).contains(t)).toLong
      t -> occ.size.toDouble * Bm25.idf(n, gdf)
    }
    val expansion = ow.toSeq.sortBy { case (t, w) => (-w, t) }.take(e).map(_._1)
    val hits = bm25ScoreMap(docs, terms ++ expansion).toSeq
      .map { case (id, s) => (id, math.rint(s * 1e9) / 1e9) }
      .sortBy { case (id, s) => (-s, id) }.take(k)
    (expansion, hits)
  }

  test("PRF == plain-Scala staged twin; expansion excludes query terms; e=0 degenerates") {
    val docs = fixtureDocs
    val idx = buildIndex(docs, "prf")
    val engine = new Bm25Engine(spark, idx)
    for ((terms, r, e) <- Seq((Seq("spark", "merge"), 4, 3),
        (Seq("dup"), 6, 2), (Seq("sort", "join"), 3, 5))) {
      val (gotExp, gotHits) = engine.searchTermsPrf(terms, 12, r, e)
      val (wantExp, wantHits) = prfTwin(docs, terms, 12, r, e)
      assert(gotExp === wantExp, s"expansion terms=$terms r=$r e=$e")
      assert(round9(gotHits) === wantHits, s"hits terms=$terms r=$r e=$e")
      assert(gotExp.forall(t => !terms.contains(t) && !t.startsWith("#")))
    }
    val (exp0, hits0) = engine.searchTermsPrf(Seq("spark", "merge"), 12, r = 4, e = 0)
    assert(exp0.isEmpty)
    assert(round9(hits0) ===
      round9(engine.searchTerms(Seq("spark", "merge"), 12, engine.Or)))
  }

  test("fielded + champion on the sf0.001 corpus (uniform titles) stay twin-identical") {
    val src = Corpus.fromDocumentsParquet(spark, "/root/testdata/sf0.001")
    val docs = src.collect().toSeq
    val out = SparkTestBase.tempDir("graft-bm25f-sf")
    IndexBuilder.build(spark, src, out, IndexBuilder.BuildConfig(chunkDocs = 200))
    val engine = new Bm25Engine(spark, out)
    assert(round9(engine.searchTermsFielded(Seq("spark", "doc", "merge"), 30, 1.0, 2.5)) ===
      bm25fTwin(docs, Seq("spark", "doc", "merge"), 1.0, 2.5, 30))
    assert(round9(engine.searchTermsChampion(Seq("spark", "dup", "merge"), 30, 40)) ===
      championTwin(docs, Seq("spark", "dup", "merge"), 30, 40))
    assert(round9(engine.searchTermsProximity(Seq("spark", "merge", "dup"), 30, 5)) ===
      proximityTwin(docs, Seq("spark", "merge", "dup"), 30, 5))
    val cands40 = champCandTwin(docs, Seq("spark", "doc", "merge"), 40)
    assert(round9(engine.searchTermsFieldedChampion(Seq("spark", "doc", "merge"), 30, 40, 1.0, 2.5)) ===
      bm25fTwin(docs, Seq("spark", "doc", "merge"), 1.0, 2.5, docs.size * 2)
        .filter(c => cands40(c._1)).take(30))
    val candsP40 = champCandTwin(docs, Seq("spark", "merge", "dup"), 40)
    assert(round9(engine.searchTermsProximityChampion(Seq("spark", "merge", "dup"), 30, 40, 5)) ===
      proximityTwin(docs, Seq("spark", "merge", "dup"), docs.size * 2, 5)
        .filter(c => candsP40(c._1)).take(30))
    assert(round9(engine.searchTermsQl(Seq("spark", "dup", "merge"), 30, 300.0)) ===
      qlTwin(docs, Seq("spark", "dup", "merge"), 30, 300.0))
    assert(round9(engine.searchPhrase(Seq("sort", "merge"), 30)) ===
      phraseTwin(docs, Seq("sort", "merge"), 30))
    val (expS, hitsS) = engine.searchTermsPrf(Seq("spark", "dup", "merge"), 30, 5, 3)
    val (expW, hitsW) = prfTwin(docs, Seq("spark", "dup", "merge"), 30, 5, 3)
    assert(expS === expW)
    assert(round9(hitsS) === hitsW)
  }
}
