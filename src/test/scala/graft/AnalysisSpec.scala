package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis._

class AnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("qualityGate: per-language bottom quartile dropped, deterministic ties") {
    import spark.implicits._
    // lang en: ratios 0.25 (doc 1), 0.5 (docs 2 and 3 — tie broken by
    // doc_id; doc 3 listed FIRST so input-order sort stability cannot
    // fake the doc_id tiebreak), 1.0 (doc 4): floor(0.25*4)=1 -> doc 1
    // dropped. lang fr: 2 docs, floor(0.25*2)=0 -> nothing dropped.
    // doc 12: whitespace-only text — zero raw tokens must yield
    // kept_ratio 0.0 (ANSI Spark would THROW on an unguarded division;
    // the DuckDB twin would return NULL — the guard pins both engines
    // to 0.0) and rank at the bottom of its language.
    val fx = Seq(
      (3L, "en", "gamma delta x9 y9"),     // 2/4 kept (tie with doc 2)
      (1L, "en", "alpha x9 y9 z9"),        // 1/4 kept
      (4L, "en", "alpha beta gamma delta"),// 4/4
      (2L, "en", "alpha beta x9 y9"),      // 2/4 kept
      (10L, "fr", "le la x9 y9"),          // 2/4
      (11L, "fr", "le la les de"),         // 4/4
      (12L, "fr", "   "))                  // 0 raw tokens -> 0.0
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.qualityGate(fx, 0.25)
      .collect().map(_.getLong(0)).toSet
    // fr now has 3 docs: floor(0.25*3)=0 -> all three kept, incl. the
    // ratio-0.0 doc (the gate drops by RANK, not by value)
    assert(got === Set(2L, 3L, 4L, 10L, 11L, 12L), s"gate kept $got")
    // ascending rank: the tie (docs 2,3) orders by doc_id, so at
    // dropFraction 0.5 (floor(0.5*4)=2) docs 1 AND 2 drop, 3 survives
    val got2 = TextAnalysis.qualityGate(fx, 0.5)
      .filter(col("lang") === "en").collect().map(_.getLong(0)).toSet
    assert(got2 === Set(3L, 4L), s"tie-break wrong: $got2")
    // quality() itself must survive the zero-raw-token doc too
    val q12 = TextAnalysis.quality(fx.filter($"doc_id" === 12L))
      .select($"kept_ratio").as[Double].head()
    assert(q12 === 0.0)
    // contract: dropFraction is a FRACTION
    intercept[IllegalArgumentException] {
      TextAnalysis.qualityGate(fx, 1.0)
    }
  }

  test("qualityGate: floor epsilon survives non-dyadic fractions (49 * 1/49)") {
    import spark.implicits._
    // 49 * (1.0/49) = 0.9999999999999999 in binary: without the +1e-9
    // inside the floor, floor(f*n) = 0 and NOTHING is dropped; the true
    // product is 1, so exactly one doc (the worst) must go. Distinct
    // ratios via increasing kept-token counts over a fixed raw count.
    // i kept tokens + (50 - i) rejected tokens -> ratio i/50
    val fx = (1 to 49).map { i =>
      val keptToks = Seq.fill(i)("alpha")
      val rejected = Seq.fill(50 - i)("x9")
      (i.toLong, "en", (keptToks ++ rejected).mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val kept = TextAnalysis.qualityGate(fx, 1.0 / 49)
      .collect().map(_.getLong(0)).toSet
    assert(kept.size === 48, s"expected exactly one doc dropped, kept ${kept.size}")
    assert(!kept.contains(1L), "the lowest-ratio doc must be the one dropped")
  }

  test("redactPii: staged email/IP/long-number scrub with per-stage counts") {
    import spark.implicits._
    val fx = Seq(
      // email whose local part is a 10-digit run and host has digits: the
      // digits die WITH the email (stage order), so n_nums stays 0
      (1L, "mail 1234567890@host99.example.com then ip 10.20.30.40 acct 98765432109 done"),
      // two emails, two ips, no long number (9 digits is below threshold)
      (2L, "a@b.co c.d@e-f.org 1.2.3.4 255.255.255.255 num 123456789"),
      // nothing to redact
      (3L, "plain text only"),
      // aggressive boundary-free scrub: digit runs inside tokens are
      // redacted too, and non-ASCII adjacency behaves the same in Java
      // and RE2 BECAUSE no \b is used (Java's \b is Unicode-aware,
      // RE2's is ASCII-only — the one construct this operator bans)
      (4L, "id12345678901x bare 12345678901 unicode é98765432100"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(fx).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) === ((1L, 1L, 1L, "mail <EMAIL> then ip <IP> acct <NUM> done")))
    assert(got(2L) === ((2L, 2L, 0L, "<EMAIL> <EMAIL> <IP> <IP> num 123456789")))
    assert(got(3L) === ((0L, 0L, 0L, "plain text only")))
    assert(got(4L) === ((0L, 0L, 3L, "id<NUM>x bare <NUM> unicode é<NUM>")))
  }

  test("multimodal: typed batch extraction with stubbed decoder") {
    val meta = Multimodal.extractMeta(Multimodal.syntheticBinary(docs)).collect()
    assert(meta.length === 500)
    meta.foreach { m =>
      assert(m.n_bytes === 16) // md5 payload
      assert(m.kind === "image")
      assert(m.header_hex.length === 4)
      assert(m.width >= 1 && m.width <= 64 && m.height >= 1 && m.height <= 64)
      assert(m.payload_sha.length === 64)
    }
    // deterministic: same input -> same features
    val again = Multimodal.extractMeta(Multimodal.syntheticBinary(docs)).collect()
    assert(meta.map(m => (m.doc_id, m.width, m.height, m.payload_sha)).sortBy(_._1).toSeq ===
      again.map(m => (m.doc_id, m.width, m.height, m.payload_sha)).sortBy(_._1).toSeq)
  }

  test("dedup: lsh candidates contain all truly-identical shingle sets") {
    // docs sharing identical text must always be LSH candidates
    val twins = docs.limit(3).withColumn("doc_id", col("doc_id") + 10000)
    val corpus = docs.unionByName(twins)
    val pairs = Dedup.lshCandidatePairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 3).foreach { i =>
      assert(pairs.contains((i.toLong, i + 10000L)), s"twin pair $i")
    }
    val j = Dedup.jaccard(corpus, Dedup.lshCandidatePairs(corpus))
      .filter(col("doc_a") < 3 && col("doc_b") >= 10000 && col("doc_b") === col("doc_a") + 10000)
      .collect()
    assert(j.length === 3, s"jaccard lost twin pairs: ${j.length}/3") // anti-vacuity
    j.foreach(r => assert(r.getDouble(2) === 1.0))
  }

  test("dedup: nearDuplicates finds the planted twins and nothing below threshold") {
    val twins = docs.limit(2).withColumn("doc_id", col("doc_id") + 10000)
    val nd = Dedup.nearDuplicates(docs.unionByName(twins), threshold = 0.99).collect()
    val pairSet = nd.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet.contains((0L, 10000L)) && pairSet.contains((1L, 10001L)))
  }

  test("similarity: lshTopK results are a subset of brute-force cosine ordering") {
    val brute = Similarity.bruteForceTopK(emb, 0L, 50).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // nBits=5 like the q_ann_* queries: at the sf0.001 corpus size the
    // 8-bit default leaves the query vector ALONE in its bucket and the
    // old form of this test passed vacuously on zero rows (caught by
    // the anti-vacuity guard below)
    val lsh = Similarity.lshTopK(emb, 0L, 10, nBits = 5).collect()
    assert(lsh.nonEmpty, "vacuous: lshTopK returned no rows") // anti-vacuity
    var checked = 0
    lsh.foreach { r =>
      val id = r.getLong(0)
      // every lsh hit's cosine must equal the brute-force cosine when present
      brute.get(id).foreach { c => assert(c === r.getDouble(1)); checked += 1 }
    }
    assert(checked > 0, "vacuous: no lsh hit appeared in the brute-force top-50")
  }

  test("similarity: multi-probe LSH dominates single-probe recall") {
    // probing the Hamming-1 neighbor buckets can only ADD candidates, so
    // at every rank position the multi-probe cosine is >= the single-probe
    // cosine, and its candidate pool contains the single-probe pool
    val single = Similarity.lshTopK(emb, 0L, 10, nBits = 5).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val multi = Similarity.lshTopKMultiProbe(emb, 0L, 10, nBits = 5).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(single.nonEmpty && multi.nonEmpty, "vacuous: empty probe results")
    assert(multi.length >= single.length)
    // the multi-probe candidate pool CONTAINS the single-probe pool: any
    // id ranked by single-probe but displaced from multi's top-k must be
    // displaced by a strictly better cosine (never silently lost)
    val multiIds = multi.map(_._1).toSet
    val multiMin = multi.map(_._2).min
    single.foreach { case (id, c) =>
      assert(multiIds.contains(id) || multiMin >= c,
        s"single-probe hit $id (cosine $c) vanished from multi-probe without displacement")
    }
    single.zip(multi).foreach { case ((_, cs), (_, cm)) =>
      assert(cm >= cs, s"rank slipped: single=$cs multi=$cm")
    }
    // cosines agree with brute force wherever both rank a vector
    val brute = Similarity.bruteForceTopK(emb, 0L, 500).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    multi.foreach { case (id, c) => brute.get(id).foreach(b => assert(b === c)) }
  }

  test("similarity: recallAtK equals the structural |ann ∩ brute|/k twin") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ids = Seq(0L, 1L, 2L)
    val got = Similarity.recallAtK(emb, ids, k = 10, nBits = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got.keySet === ids.toSet)
    ids.foreach { qid =>
      val brute = Similarity.bruteForceTopK(emb, qid, 10).collect()
        .map(_.getLong(0)).toSet
      val ann = Similarity.lshTopK(emb, qid, 10, nBits = 5).collect()
        .map(_.getLong(0)).toSet
      assert(got(qid) === r6((ann & brute).size / 10.0), s"query $qid")
      assert(got(qid) >= 0.0 && got(qid) <= 1.0)
    }
    // anti-vacuity: the single-bucket search finds SOMETHING true
    assert(got.values.max > 0.0)
  }

  test("repetition: dup-3gram mass and top-shingle share, hand-computed") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c a b c a b c"),   // 7 shingles: abc x3, bca x2, cab x2
      (2L, "one two three four"),  // 2 shingles, all distinct
      (3L, "x y")).toDF("doc_id", "text") // no shingle
    val out = TextAnalysis.repetition(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out(1L) === ((7L, 3L, math.rint((1.0 - 3.0 / 7) * 1e6) / 1e6, math.rint(3.0 / 7 * 1e6) / 1e6)))
    assert(out(2L) === ((2L, 2L, 0.0, 0.5)))
    assert(out(3L) === ((0L, 0L, 0.0, 0.0)))
  }

  test("slidingChunks: hand-computed windows incl. partial tail") {
    import spark.implicits._
    val d = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text") // 10 tokens
    val out = TextAnalysis.slidingChunks(d, size = 8, stride = 4).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // w0 covers pos 1-8, w1 covers 5-12 (tokens 5-10), w2 covers 9-16 (9-10)
    assert(out === Map(0L -> ((8L, 1L, 8L)), 1L -> ((6L, 5L, 10L)), 2L -> ((2L, 9L, 10L))))
  }

  test("lmCrossEntropy: add-one bigram LM, hand-computed") {
    import spark.implicits._
    // corpus: doc1 tokens a,b,a,b; doc2 token z (widens V to 3, no
    // bigram); doc3 empty after the kept-token filter
    val d = Seq((1L, "a b a b"), (2L, "z"), (3L, "x9 y9"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmCrossEntropy(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // c1: a=2 b=2 z=1; V=3; c2: "a b"=2, "b a"=1
    // p(a b)=(2+1)/(2+3)=0.6; p(b a)=(1+1)/(2+3)=0.4
    val expected = math.rint(
      -(2 * math.log(0.6) + math.log(0.4)) / 3 * 1e4) / 1e4
    assert(out(1L) === ((3L, expected)))
    assert(out(2L) === ((0L, 0.0)))
    assert(out(3L) === ((0L, 0.0)))
  }

  test("snippets: window slice clamps at both doc boundaries, case-folds") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta merge gamma delta epsilon zeta"), // interior hit
      (2L, "merge alpha beta"),                          // start clamp
      (3L, "alpha beta gamma merge"),                    // end clamp
      (4L, "no hit here"),                               // filtered out
      (5L, "x Merge y"))                                 // kept-token lowering
      .toDF("doc_id", "text")
    val out = TextAnalysis.snippets(d, "merge", window = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out === Map(
      1L -> ((3L, "alpha beta merge gamma delta")),
      2L -> ((1L, "merge alpha beta")),
      3L -> ((4L, "beta gamma merge")),
      5L -> ((2L, "x merge y"))))
  }

  test("shardForTraining: total, dense per-shard positions, deterministic") {
    import spark.implicits._
    val d = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val rows = TextAnalysis.shardForTraining(d, numShards = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 200) // total: every doc assigned exactly once
    assert(rows.map(_._1).toSet === (0L until 200L).toSet)
    rows.foreach { case (_, s, _) => assert(s >= 0 && s < 16) }
    // positions are dense 1..n within each shard
    rows.groupBy(_._2).foreach { case (s, g) =>
      assert(g.map(_._3).sorted.toSeq === (1L to g.length).toSeq,
        s"shard $s positions not dense")
    }
    // reproducible: a second run yields the identical assignment
    val again = TextAnalysis.shardForTraining(d, numShards = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    intercept[IllegalArgumentException] {
      TextAnalysis.shardForTraining(d, numShards = 0)
    }
  }

  test("keywordsTfIdf: hand-computed scores, rounded-value tie-break") {
    import spark.implicits._
    val d = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry date")).toDF("doc_id", "text")
    val out = TextAnalysis.keywordsTfIdf(d, k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // N=3; df: apple 1, banana 2, cherry 2, date 1
    assert(out((1L, "apple")) === ((2L, r6(2 * math.log(3.0)), 1L)))
    assert(out((1L, "banana")) === ((1L, r6(math.log(1.5)), 2L)))
    // doc2: banana and cherry tie exactly -> term asc breaks it
    assert(out((2L, "banana"))._3 === 1L)
    assert(out((2L, "cherry"))._3 === 2L)
    // doc3: cherry (3·ln1.5 = 1.216395) outranks date (ln3 = 1.098612)
    assert(out((3L, "cherry")) === ((3L, r6(3 * math.log(1.5)), 1L)))
    assert(out((3L, "date")) === ((1L, r6(math.log(3.0)), 2L)))
  }

  test("hardNegatives: ranks non-matching docs by cosine to the positives' centroid") {
    import spark.implicits._
    val d = Seq(
      (1L, "apple pie"), (2L, "apple tart"),
      (3L, "banana"), (4L, "cherry"), (5L, "plum"))
      .toDF("doc_id", "text")
    val e = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)), // centroid (0.5, 0.5)
      (3L, Seq(1.0f, 1.0f)),   // cosine 1.0
      (4L, Seq(1.0f, 0.0f)),   // cosine sqrt(0.5)
      (5L, Seq(-1.0f, -1.0f))) // cosine -1.0
      .toDF("vec_id", "embedding")
    val out = Similarity.hardNegatives(d, e, "apple", 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.map(_._1).toSeq === Seq(3L, 4L))
    assert(out(0)._2 === 1.0)
    assert(out(1)._2 === math.rint(math.sqrt(0.5) * 1e6) / 1e6)
    // positives themselves are never negatives
    assert(!out.map(_._1).contains(1L) && !out.map(_._1).contains(2L))
    // no positive docs -> fail loudly, not an empty centroid
    intercept[IllegalArgumentException] {
      Similarity.hardNegatives(d, e, "zzzmissing", 2)
    }
  }

  test("leakageSafeSplit: near-dup twins share a side; every doc assigned") {
    val twins = docs.limit(3).withColumn("doc_id", col("doc_id") + 10000)
    val corpus = docs.unionByName(twins)
    val out = Dedup.leakageSafeSplit(corpus, 0.99, testPermille = 300)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length.toLong === corpus.count())
    val byId = out.map(r => r._1 -> r).toMap
    (0 until 3).foreach { i =>
      assert(byId(i.toLong)._2 === byId(i + 10000L)._2, s"twin $i component differs")
      assert(byId(i.toLong)._3 === byId(i + 10000L)._3, s"twin $i split apart")
    }
    assert(out.map(_._3).toSet.subsetOf(Set("train", "test")))
    assert(out.count(_._3 == "test") > 0 && out.count(_._3 == "train") > 0,
      "vacuous: one-sided split")
    // reproducible end to end
    val again = Dedup.leakageSafeSplit(corpus, 0.99, testPermille = 300)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("tokenBudgetMix: prefix-sum kept set, bucket-count invariance, budget edges") {
    import spark.implicits._
    // doc i carries i kept tokens (all-alpha 'alpha' repeats), so the
    // prefix sums are knowable; the ORDER is the operator's own hash
    // h(doc_id) — the reference below is an independent sequential fold
    // over that order, which is exactly the semantics the distributed
    // bucketed prefix sum must reproduce
    val fx = (1 to 6).map(i => (i.toLong, "en", Seq.fill(i)("alpha").mkString(" "))) ++
             (11 to 14).map(i => (i.toLong, "fr", Seq.fill(i - 10)("beta").mkString(" "))) ++
             Seq((21L, "zz", "gamma gamma gamma")) // lang outside the map
    val df = fx.toDF("doc_id", "lang", "text")
    def h(id: Long) = (id % 99991L) * 2654435761L % 104729L
    def expected(budget: Map[String, Long], dflt: Long): Set[Long] = {
      fx.groupBy(_._2).flatMap { case (lang, rows) =>
        val b = budget.getOrElse(lang, dflt)
        val ordered = rows.map(_._1).sortBy(id => (h(id), id))
        val nTok = rows.map(r => r._1 -> r._3.split("\\s+").length.toLong).toMap
        ordered.zip(ordered.scanLeft(0L)(_ + nTok(_)))
          .collect { case (id, start) if start < b => id }
      }.toSet
    }
    val budgets = Map("en" -> 9L, "fr" -> 4L)
    val want = expected(budgets, 2L)
    // sanity on the fixture: the budget must cut INSIDE both languages
    // (some docs kept, some dropped) or the test is vacuous
    for (lang <- Seq("en", "fr")) {
      val ids = fx.filter(_._2 == lang).map(_._1).toSet
      assert((want & ids).nonEmpty && (ids -- want).nonEmpty, s"vacuous for $lang")
    }
    for (parts <- Seq(1, 3, 7)) {
      val got = TextAnalysis.tokenBudgetMix(df, budgets, defaultBudget = 2L,
        numPartitions = parts).collect().map(_.getLong(0)).toSet
      assert(got === want, s"parts=$parts")
    }
    // the boundary doc is KEPT (exclusive prefix < budget): a lang whose
    // first doc alone exceeds the budget still yields that one doc
    val tiny = TextAnalysis.tokenBudgetMix(df, Map("en" -> 1L, "fr" -> 1L),
      defaultBudget = 1L).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tiny === Map("en" -> 1L, "fr" -> 1L, "zz" -> 1L))
    // budget 0 = lang fully dropped
    val none = TextAnalysis.tokenBudgetMix(df, Map("en" -> 0L), defaultBudget = 100L)
    assert(none.filter(col("lang") === "en").count() === 0L)
    assert(none.filter(col("lang") === "fr").count() === 4L)
    intercept[IllegalArgumentException] {
      TextAnalysis.tokenBudgetMix(df, Map("en" -> -1L))
    }
  }

  test("temperatureMix: exact sqrt-micro quotas, hash-order selection, bucket invariance") {
    import spark.implicits._
    // lang counts 9/4/1 -> sqrt 3/2/1 -> micro 3e6/2e6/1e6, total 6e6;
    // budget 6 -> quotas exactly 3/2/1 (and the tail lang zz gets 2.3x
    // its proportional share 1/14*6 = 0.43 — the point of α < 1)
    val fx = (1 to 9).map(i => (i.toLong, "en", "x")) ++
             (11 to 14).map(i => (i.toLong, "fr", "x")) ++
             Seq((21L, "zz", "x"))
    val df = fx.toDF("doc_id", "lang", "text")
    val q = TextAnalysis.temperatureQuotas(df, 6L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(q === Set(("en", 9L, 3000000L, 3L), ("fr", 4L, 2000000L, 2L),
      ("zz", 1L, 1000000L, 1L)))
    def h(id: Long) = (id % 99991L) * 2654435761L % 104729L
    val want = fx.groupBy(_._2).flatMap { case (lang, rows) =>
      val quota = Map("en" -> 3, "fr" -> 2, "zz" -> 1)(lang)
      rows.map(_._1).sortBy(id => (h(id), id)).take(quota)
    }.toSet
    for (parts <- Seq(1, 3, 7)) {
      val got = TextAnalysis.temperatureMix(df, 6L, numPartitions = parts)
        .collect().map(_.getLong(0)).toSet
      assert(got === want, s"parts=$parts")
    }
    // rk is the 1-based in-language hash rank
    val rks = TextAnalysis.temperatureMix(df, 6L).collect()
      .map(r => (r.getString(1), r.getLong(2))).groupBy(_._1)
      .map { case (l, a) => l -> a.map(_._2).sorted.toSeq }
    assert(rks === Map("en" -> Seq(1L, 2L, 3L), "fr" -> Seq(1L, 2L), "zz" -> Seq(1L)))
    assert(TextAnalysis.temperatureMix(df, 0L).count() === 0L)
  }

  test("perplexityBuckets: per-lang rank tiers over the 4-dp score, div rule") {
    import spark.implicits._
    // 7 en docs + 3 fr docs; expected buckets re-derived by an
    // independent fold over the (spec-pinned) lmCrossEntropy output:
    // rank by (xent, doc_id) per lang, bucket = 3*(rnk-1) div n —
    // for n=7 that is sizes 3/2/2, for n=3 sizes 1/1/1
    val texts = Seq(
      "alpha beta alpha beta alpha beta",      // repetitive -> low xent
      "alpha beta gamma delta epsilon zeta",
      "gamma alpha delta beta zeta epsilon",
      "one two three four five six",
      "six five four three two one",
      "alpha alpha alpha alpha",
      "beta gamma beta gamma")
    val fx = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, "en", t) } ++
      Seq((11L, "fr", "un deux un deux"), (12L, "fr", "deux trois quatre"),
          (13L, "fr", "un un un"))
    val df = fx.toDF("doc_id", "lang", "text")
    val xent = TextAnalysis.lmCrossEntropy(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val langOf = fx.map(r => r._1 -> r._2).toMap
    val want = fx.groupBy(_._2).flatMap { case (_, rows) =>
      val ordered = rows.map(_._1).sortBy(id => (xent(id), id))
      val n = ordered.size
      ordered.zipWithIndex.map { case (id, i) => id -> (3L * i / n) }
    }
    val got = TextAnalysis.perplexityBuckets(df, 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getString(4)))
    assert(got.map(r => r._1 -> r._3).toMap === want)
    got.foreach { case (id, lang, b, tier) =>
      assert(lang === langOf(id))
      assert(tier === (if (b == 0) "head" else if (b == 2) "tail" else "middle"))
    }
    // en sizes 3/2/2, fr 1/1/1
    val sizes = got.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.size).toMap
    assert(sizes === Map(0L -> 3, 1L -> 2, 2L -> 2))
    // nBuckets = 1: everything is head/0
    val one = TextAnalysis.perplexityBuckets(df, 1).collect()
    assert(one.forall(r => r.getLong(3) == 0L && r.getString(4) == "head"))
  }

  test("langId picks en for stopword-rich english text") {
    import spark.implicits._
    val d = Seq((1L, "the cat and the dog in a house"),
                (2L, "le chat et le chien dans la maison"),
                (3L, "zzz qqq www")).toDF("doc_id", "text")
    val out = TextAnalysis.languageId(d).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "fr")
    assert(out(3L) === "und")
  }

  test("relatedTerms: hand fixture — vocab cut, pair counts, integer PMI rank") {
    import spark.implicits._
    val fx = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "apple banana"),
      (3L, "banana cherry"),
      (4L, "apple durian")
    ).toDF("doc_id", "text")
    // df: apple 3, banana 3, cherry 2, durian 1; vocabSize=3 cuts durian.
    // c_xy: (apple,banana)=2, (apple,cherry)=1 (< minPairDocs, dropped),
    // (banana,cherry)=2. n=4:
    //   score(banana,cherry) = 8e6 div (3*2) = 1333333
    //   score(apple,banana)  = 8e6 div (3*3) =  888888
    val got = TextAnalysis.relatedTerms(fx, vocabSize = 3, minPairDocs = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toList === List(
      ("banana", "cherry", 2L, 1333333L),
      ("apple", "banana", 2L, 888888L)))
  }

  test("relatedTerms: equals the plain-Scala twin on the real corpus") {
    val raw = docs.collect().map(r => r.getLong(0) -> r.getString(1))
    val docTerms = raw.map { case (_, text) =>
      text.split("\\s+").filter(t => t.matches("[A-Za-z]+") && t.length < 20)
        .map(_.toLowerCase).toSet
    }
    val df_ = docTerms.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val vocab = df_.toSeq.sortBy { case (t, d) => (-d, t) }.take(32)
    val vset = vocab.map(_._1).toSet
    val dfMap = vocab.toMap
    val n = raw.length.toLong
    val cxy = docTerms.flatMap { ts =>
      val vt = ts.intersect(vset).toSeq.sorted
      for (i <- vt.indices; j <- i + 1 until vt.length) yield (vt(i), vt(j))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = cxy.toSeq.filter(_._2 >= 2).map { case ((a, b), c) =>
      (a, b, c, c * n * 1000000L / (dfMap(a) * dfMap(b)))
    }.sortBy { case (a, b, _, s) => (-s, a, b) }.take(15)
    val got = TextAnalysis.relatedTerms(docs, vocabSize = 32, minPairDocs = 2, k = 15)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toList
    assert(got === want.toList)
  }

  test("lengthHistogram: hand bins, shard mergeability by bin-wise sum") {
    import spark.implicits._
    // ws token counts: 0 (empty), 2, 3, 4, 8 -> bins (width 4): 0,0,0,1,2
    val fx = Seq(
      (1L, "en", ""),                        // 0 tokens -> bin 0
      (2L, "en", "a b"),                     // 2 -> bin 0
      (3L, "en", "a b c"),                   // 3 -> bin 0
      (4L, "en", "a b c d"),                 // 4 -> bin 1 (div, not round)
      (5L, "fr", "a b c d e f g h"))         // 8 -> bin 2
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.lengthHistogram(fx, 4L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(("en", 0L, 3L), ("en", 1L, 1L), ("fr", 2L, 1L)))
    // mergeable: hist(A union B) == cellwise sum of hist(A) + hist(B)
    val a = fx.filter($"doc_id" % 2 === 0)
    val b = fx.filter($"doc_id" % 2 === 1)
    def m(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.lengthHistogram(df, 4L).collect()
        .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val merged = (m(a).keySet ++ m(b).keySet).map { k =>
      k -> (m(a).getOrElse(k, 0L) + m(b).getOrElse(k, 0L)) }.toMap
    assert(merged === m(fx))
  }

  test("histogramQuantiles: smallest bin with cum*1000 >= q*total, edges") {
    import spark.implicits._
    // en: 10 docs, token counts 1..10, width 2 -> bins 0(1),1(2,3),2(4,5),
    // 3(6,7),4(8,9),5(10); cum: 1,3,5,7,9,10
    val fx = (1 to 10).map(i =>
      (i.toLong, "en", (1 to i).map(_ => "w").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.histogramQuantiles(fx, 2L, Seq(100, 500, 900, 1000))
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    // q=100: need cum*10 >= total=10 -> first bin (cum 1). q=500: cum >= 5
    // -> bin 2. q=900: cum >= 9 -> bin 4. q=1000: cum >= 10 -> bin 5.
    assert(got === Set((100, 0L, 2L), (500, 2L, 6L), (900, 4L, 10L),
      (1000, 5L, 12L)))
    intercept[IllegalArgumentException] {
      TextAnalysis.histogramQuantiles(fx, 2L, Seq(0))
    }
  }

  test("curriculumOrder: equals the row_number Window twin; coalesce(1)-safe") {
    import org.apache.spark.sql.expressions.Window
    val d = docs.limit(40)
    val twin = TextAnalysis.lmCrossEntropy(d)
      .select(col("doc_id"), col("xent"),
        (row_number().over(Window.orderBy(col("xent"), col("doc_id"))) - 1)
          .cast("long").as("pos"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val got = TextAnalysis.curriculumOrder(d)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got === twin)
    // positions stay a dense 0..N-1 permutation under a downstream
    // coalesce(1) (the TaskContext partition-id hazard regression)
    val pos1 = TextAnalysis.curriculumOrder(d).coalesce(1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(pos1.values.toSeq.sorted === (0L until pos1.size.toLong))
    assert(pos1 === got.map(t => (t._1, t._3)).toMap)
  }

  test("vocabStats: hand-computed report card incl. the Zipf OLS slope") {
    import spark.implicits._
    // tf: a:2 b:2 c:1 (plus filtered noise) -> n=5 vocab=3 hapax=1
    val docs = Seq((1L, "a a b w0rd_1"), (2L, "b c " + "x" * 25))
      .toDF("doc_id", "text")
    val r = graft.analysis.TextAnalysis.vocabStats(docs, zipfTopR = 100)
      .collect().head
    assert(r.getLong(0) === 5L)   // n_tokens
    assert(r.getLong(1) === 3L)   // vocab
    assert(r.getLong(2) === 1L)   // hapax
    assert(r.getDouble(3) === 0.6)  // ttr
    assert(r.getDouble(4) === 0.4)  // top_share (max c = 2)
    // OLS over ranks (a,2) (b,2) (c,1): x = ln 1..3, y = ln 2, ln 2, ln 1
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(2.0, 2.0, 1.0).map(math.log)
    val n = 3.0
    val slope = (n * xs.zip(ys).map { case (x, y) => x * y }.sum -
      xs.sum * ys.sum) / (n * xs.map(x => x * x).sum - xs.sum * xs.sum)
    val r4 = BigDecimal(slope).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(5) === r4)
  }

  test("winnowing == plain-Scala twin; guarantee, tie rule, short docs") {
    import spark.implicits._
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def twin(text: String, k: Int, w: Int): Set[(Long, Long)] = {
      val toks = graft.tokenizer.Tokenizer.bodyTokens(text).toVector
      if (toks.length < k) return Set.empty
      val hs = toks.sliding(k).map(_.mkString(" ")).map(h60).toVector
      (0 to hs.length - w).flatMap { s =>
        val mh = hs.slice(s, s + w).min
        val rm = (s until s + w).filter(i => hs(i) == mh).max
        Some(((rm + 1).toLong, mh))
      }.toSet
    }

    // tie-rule stress: periodic text repeats gram hashes inside windows
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "a b c a b c a b c a b"),
      (3L, "one two three"),             // 1 gram < w -> empty
      (4L, "solo pair"))                 // < k tokens -> empty
      .toDF("doc_id", "text")
    val got = graft.analysis.TextAnalysis.winnowing(docs, k = 3, w = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val texts = Map(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "a b c a b c a b c a b")
    texts.foreach { case (id, t) =>
      assert(got.getOrElse(id, Set.empty) === twin(t, 3, 4), s"doc $id")
    }
    assert(!got.contains(3L) && !got.contains(4L))

    // the winnowing guarantee: a shared run of w + k - 1 = 6 tokens
    // between otherwise-different docs shares >= 1 fingerprint
    val shared = "lorem ipsum dolor sit amet consectetur"
    val pair = Seq(
      (10L, "red green blue " + shared + " yellow purple"),
      (11L, "north south east west " + shared + " up down"))
      .toDF("doc_id", "text")
    val fps = graft.analysis.TextAnalysis.winnowing(pair, 3, 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(10L) & fps(11L)).nonEmpty, "guarantee violated")
  }

  test("clonePairs: planted overlap surfaces, a < b, shared-count gate") {
    import spark.implicits._
    val shared = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    val docs = Seq(
      (10L, "red green blue " + shared + " yellow purple"),
      (11L, "north south east west " + shared + " up down"),
      (12L, "totally different words without any overlap here at all"))
      .toDF("doc_id", "text")
    val pairs = graft.analysis.TextAnalysis.clonePairs(docs, minShared = 1L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs.keySet === Set((10L, 11L)), s"got ${pairs.keySet}")
    val fps = graft.analysis.TextAnalysis.winnowing(docs)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expect = (fps(10L) & fps(11L)).size.toLong
    assert(pairs((10L, 11L)) === expect)
    assert(graft.analysis.TextAnalysis.clonePairs(docs, minShared = expect + 1)
      .collect().isEmpty)
  }
}
