package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.{Dedup, Similarity}

/** Scale-shape guarantees of the dedup family: the pathological corpora a
  * web-scale pipeline actually hits (mega-clusters of identical docs,
  * planted near-twin embeddings) must stay sub-quadratic through the
  * guarded paths while keeping the exhaustive-path semantics.
  */
class DedupScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("1k identical docs: exact-first near-dup stays sub-quadratic (LSH guard)") {
    import spark.implicits._
    // the common web pathology: one mega-cluster of M identical documents
    // plus a handful of distinct near-dup texts. Naive LSH would put all M
    // in one band bucket and materialize M^2/2 ~ 500k candidate pairs.
    val mega = (0 until 1000).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta eta theta"))
    val near = Seq(
      (2000L, "alpha beta gamma delta epsilon zeta eta iota"),   // near-dup of mega text
      (2001L, "one two three four five six seven eight"),
      (2002L, "one two three four five six seven nine"))         // near-dup of 2001
    val docs = (mega ++ near).toDF("doc_id", "text")

    // the guard collapses the mega-cluster to one representative: the
    // candidate join sees 4 docs, not 1003
    val reps = docs.join(
      Dedup.exactGroups(docs).select(col("keep_doc_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    assert(reps.count() === 4) // doc 0 represents the mega-cluster

    val candPairs = Dedup.lshCandidatePairs(reps).count()
    assert(candPairs <= 6, s"quadratic blowup: $candPairs candidate pairs")

    // semantics: representative pairs above threshold; the mega-cluster's
    // full membership stays available from exactGroups
    val pairs = Dedup.nearDuplicatesScalable(docs, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2000L)), s"mega-rep near-dup missing: $pairs")
    assert(pairs.contains((2001L, 2002L)), s"distinct near-dup missing: $pairs")
    assert(pairs.forall { case (a, b) => a == 0L || a >= 2000L }, s"non-rep leaked: $pairs")
    val g = Dedup.exactGroups(docs)
      .filter(col("keep_doc_id") === 0L).select("n_docs").as[Long].head()
    assert(g === 1000L)
  }

  test("planted near-twin embeddings: bucketed LSH finds them without the dim join") {
    import spark.implicits._
    // seeded base vectors + two planted twins: an exact scaled copy
    // (cosine 1.0 -> identical SRP signs -> same bucket, guaranteed) and a
    // tiny-perturbation near-twin
    val rnd = new scala.util.Random(7)
    val base = (0 until 40).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2f - 1f))
    }
    val v0 = base.head._2
    val planted = Seq(
      (100L, v0.map(_ * 2f)),                                  // cosine(0, 100) = 1.0
      (101L, v0.zipWithIndex.map { case (x, i) =>              // cosine ~ 0.999
        if (i == 0) x + 0.01f else x }))
    val emb = (base ++ planted).toDF("vec_id", "embedding")

    val lsh = Dedup.embeddingNearDupsLsh(emb, threshold = 0.95, nBits = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(lsh.contains((0L, 100L)), s"scaled twin not found: ${lsh.keys}")
    assert(lsh((0L, 100L)) === 1.0)

    // LSH pairs are a subset of the exhaustive pairs with identical cosines
    val full = Dedup.embeddingNearDups(emb, threshold = 0.95)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    lsh.foreach { case (k, c) =>
      assert(full.contains(k), s"LSH pair $k not in exhaustive set")
      assert(math.abs(full(k) - c) < 1e-9, s"cosine mismatch for $k")
    }

    // and the bucketed plan materializes only same-bucket pairs: with the
    // corpus spread over 2^5 buckets the pair volume is far below C(42,2)
    val buckets = Similarity.lshBuckets(emb, nBits = 5)
    val pairVolume = buckets.groupBy("bucket").count()
      .agg(sum(col("count") * (col("count") - 1) / 2).cast("long")).as[Long].head()
    assert(pairVolume < 42L * 41 / 2, s"buckets degenerate: $pairVolume pairs")
  }

  test("prefix-filtered exact join: complete vs brute force, fewer candidates") {
    import spark.implicits._
    // varied-overlap corpus: near-dups at several similarity levels plus
    // unrelated docs; threshold 0.5 so some pairs pass and some don't
    val words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split(" ")
    val docs = (0 until 20).map { i =>
      // doc i shares a sliding window of the vocabulary with neighbors
      val body = (0 until 8).map(j => words((i + j) % words.length)).mkString(" ")
      (i.toLong, body)
    }.toDF("doc_id", "text")
    val t = 0.5

    val exact = Dedup.nearDuplicatesExact(docs, t)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

    // brute force: every (a < b) pair through the same exact jaccard
    val ids = docs.select(col("doc_id"))
    val allPairs = ids.as("x").join(ids.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val brute = Dedup.jaccard(docs, allPairs).filter(col("jaccard") >= t)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

    assert(exact === brute, s"prefix join lost/invented pairs: ${exact.keySet} vs ${brute.keySet}")
    assert(brute.nonEmpty, "degenerate test: no qualifying pairs")

    // pruning evidence: the candidate set is strictly smaller than all pairs
    val cands = Dedup.prefixCandidatePairs(docs, t).count()
    assert(cands < 20L * 19 / 2, s"prefix filter pruned nothing: $cands candidates")
    assert(cands >= brute.size, "candidates must cover all qualifying pairs")
  }

  test("connected components: transitivity, disjoint clusters, deep-chain convergence") {
    import spark.implicits._
    // chain 1-2-3 (no 1-3 edge: label must propagate transitively),
    // disjoint pair 10-11, and a 12-node path 100..111 whose diameter
    // forces ~11 propagation rounds
    val chain = (100L until 111L).map(i => (i, i + 1))
    val pairs = (Seq((1L, 2L), (2L, 3L), (10L, 11L)) ++ chain)
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 3L).forall(got(_) == 1L), s"triangle chain broken: $got")
    assert(got(10L) == 10L && got(11L) == 10L)
    assert((100L to 111L).forall(got(_) == 100L), s"deep chain unconverged: $got")
    assert(got.size === 3 + 2 + 12)
  }

  test("connected components: 200-node path converges in O(log n) rounds") {
    import spark.implicits._
    // a template-drift chain: diameter 199, so min-label propagation
    // would need ~199 rounds (>2x the default 50-round cap and fail);
    // the alternating large-star/small-star contraction must close it
    // in logarithmic rounds with exact min labels
    val n = 200L
    val pairs = (1000L until 1000L + n - 1).map(i => (i, i + 1))
      .toDF("doc_a", "doc_b")
    val (labels, rounds, exceptRounds) =
      Dedup.connectedComponentsWithDiag(pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === n)
    assert((1000L until 1000L + n).forall(got(_) == 1000L),
      s"path labels wrong: ${got.filter(_._2 != 1000L).take(5)}")
    assert(rounds <= 12, s"star contraction took $rounds rounds on a " +
      s"$n-node path — expected O(log n), got diameter-like behavior")
    // the exact set-equality certificate must fire ONLY on the fixpoint
    // round — every contracting round is decided by the free
    // (count, sum, sum) aggregate, one job per round instead of two
    assert(exceptRounds === 1, s"expected the except certificate on the " +
      s"final round only, saw it on $exceptRounds of $rounds rounds")
    labels.unpersist()
  }

  test("connected components: self-pair-only nodes stay singleton labeled") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (7L, 7L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
  }

  test("duplicated-span removal: shared 8-gram scrubbed from both docs, unique text kept") {
    import spark.implicits._
    val span = "one two three four five six seven eight" // the shared 8-gram
    val docs = Seq(
      (1L, s"alpha beta $span gamma delta"),
      (2L, s"$span omega"),
      (3L, "no shared content here at all kappa lambda mu nu xi"))
      .toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedSpans(docs, n = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def sha(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    // doc 1: the span sits at positions 3..10; overlapping 8-grams that
    // include 'alpha beta'/'gamma delta' are unique to doc 1, so exactly
    // the span's 8 tokens vanish
    assert(got(1L) === ((12L, 8L, sha("alpha beta gamma delta"))))
    // doc 2: span + 'omega'; the span covers positions 1..8
    assert(got(2L) === ((9L, 8L, sha("omega"))))
    // doc 3: untouched
    assert(got(3L) === ((11L, 0L, sha("no shared content here at all kappa lambda mu nu xi"))))
  }

  test("prefix bound survives FP-poisoned ceil (0.07*100 = 7.000000000000001)") {
    import spark.implicits._
    // doubles represent some t*sz a hair ABOVE the true product; a naive
    // ceil then shortens the prefix below the AllPairs completeness bound
    // (sz - ceil(t*sz) + 1 = 93 instead of 94 here) and drops qualifying
    // pairs. prefixBound's epsilon restores the true ceiling; exact and
    // non-integer products must be unaffected.
    assert(math.ceil(0.07 * 100) == 8.0, "FP premise changed?") // the poison
    val cases = Seq(
      (100L, 0.07, 94L), // poisoned exact-integer product: true ceil is 7
      (100L, 0.70, 31L), // exact-in-binary threshold, integer product
      (10L, 0.07, 10L),  // non-integer product 0.7 -> ceil 1
      (7L, 0.50, 4L))    // non-integer product 3.5 -> ceil 4
    for ((sz, t, want) <- cases) {
      val got = spark.range(1)
        .select(Dedup.prefixBound(lit(sz), t).cast("long")).as[Long].head()
      assert(got == want, s"prefixBound($sz, $t) = $got, want $want")
    }
  }

  test("keepBestPerCluster: highest kept-token member wins, ties to lower id, singletons kept") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta" // 8 kept
    val docs = Seq(
      (1L, base),                                   // cluster {1,2,3}, score 8
      (2L, base + " iota kappa x9 w_1"),            // score 10 (junk not kept)
      (3L, base),                                   // score 8 (exact dup of 1)
      (10L, "one two three four five six"),         // tie cluster {10,11}
      (11L, "one two three four five six"),
      (20L, "lonely standalone document text here") // singleton
    ).toDF("doc_id", "text")
    val got = Dedup.keepBestPerCluster(docs, threshold = 0.7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // cluster {1,2,3}: component 1, the LONGER doc 2 wins (score 10 > 8)
    assert(got(1L) === ((1L, 8L, 0L)), got)
    assert(got(2L) === ((1L, 10L, 1L)), got)
    assert(got(3L) === ((1L, 8L, 0L)), got)
    // tie cluster: equal scores, lower id kept
    assert(got(10L) === ((10L, 6L, 1L)), got)
    assert(got(11L) === ((10L, 6L, 0L)), got)
    // singleton: own component, always kept
    assert(got(20L) === ((20L, 5L, 1L)), got)
    // exactly one keeper per component, every doc assigned
    assert(got.size === 6)
    val keepers = got.values.groupBy(_._1).map { case (c, vs) =>
      c -> vs.count(_._3 == 1L) }
    assert(keepers.values.forall(_ == 1), keepers)
  }
}
