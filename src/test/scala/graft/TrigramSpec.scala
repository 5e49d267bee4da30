package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexStore, TrigramSidecar}

/** Trigram wildcard sidecar: scalar/Column trigram twins, required-
  * trigram derivation, completeness vs regex truth (the no-false-
  * negatives contract), staleness + refresh, and the partition-pruned
  * probe plan.
  */
class TrigramSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val cfg = IndexBuilder.BuildConfig(chunkDocs = 7)

  private lazy val (idxDir, ids) = {
    val dir = SparkTestBase.tempDir("graft_tri")
    val withIds = Corpus.assignDocIds(spark,
      Corpus.synthetic(spark, numRepos = 3, filesPerRepo = 10)).cache()
    IndexBuilder.build(spark, withIds, dir, cfg)
    TrigramSidecar.build(spark, dir, nBuckets = 16)
    (dir, withIds)
  }

  private def vocabTerms: Set[String] =
    IndexStore.readPostings(spark, idxDir).toDF()
      .filter(!col("term").startsWith("#"))
      .select("term").distinct().collect().map(_.getString(0)).toSet

  test("trigramsScalar == trigramsCol on edge and random terms") {
    import spark.implicits._
    val terms = Seq("a", "ab", "abc", "aaaa", "spark", "nineteencharstring")
    val got = terms.toDF("term")
      .select(col("term"), TrigramSidecar.trigramsCol(col("term")).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    terms.foreach { t =>
      assert(got(t) === TrigramSidecar.trigramsScalar(t), s"term '$t'")
    }
    assert(TrigramSidecar.trigramsScalar("a") === Seq("^a$"))
    // repeated trigram deduped
    assert(TrigramSidecar.trigramsScalar("aaaa") ===
      Seq("^aa", "aaa", "aa$"))
  }

  test("requiredTrigrams: anchors, middle fragments, fallback-empty") {
    assert(TrigramSidecar.requiredTrigrams("sp*k") === Seq("^sp"))
    assert(TrigramSidecar.requiredTrigrams("*ark") === Seq("ark", "rk$"))
    assert(TrigramSidecar.requiredTrigrams("qu*") === Seq("^qu"))
    assert(TrigramSidecar.requiredTrigrams("*zz*") === Seq.empty)
    assert(TrigramSidecar.requiredTrigrams("spark") ===
      Seq("^sp", "spa", "par", "ark", "rk$"))
    assert(TrigramSidecar.requiredTrigrams("ab*cdef*g") ===
      Seq("^ab", "cde", "def"))
    intercept[IllegalArgumentException] {
      TrigramSidecar.requiredTrigrams("")
    }
  }

  test("completeness: wildcardTerms == regex truth over the vocabulary, every branch") {
    val vocab = vocabTerms
    val patterns = Seq(
      "a*",      // prefix (1-char fragment + anchor = '^a' len 2 → but '^a'
                 // is 2 chars: fragment '^a' length 2 < 3 → FALLBACK)
      "ab*",     // prefix trigram '^ab'
      "*yz",     // suffix trigrams
      "q*z",     // both anchors, short
      "*aa*",    // middle len-2 → fallback
      "nosuchtermxyz") // no match at all
    patterns.foreach { p =>
      val rx = TrigramSidecar.patternRegex(p).r
      val want = vocab.filter(t => rx.matches(t))
      val got = TrigramSidecar.wildcardTerms(spark, idxDir, p)
        .collect().map(_.getString(0)).toSet
      assert(got === want, s"pattern '$p'")
    }
  }

  test("exact pattern (no star) resolves through the full trigram AND") {
    val some = vocabTerms.filter(_.length >= 4).take(3)
    some.foreach { t =>
      val got = TrigramSidecar.wildcardTerms(spark, idxDir, t)
        .collect().map(_.getString(0)).toSet
      assert(got === Set(t), s"term '$t'")
    }
  }

  test("stale sidecar still finds NEW vocabulary (tail union); refresh folds it in") {
    import spark.implicits._
    val dir = SparkTestBase.tempDir("graft_tri_stale")
    val mid = 19L
    IndexBuilder.build(spark, ids.filter(_.docId <= mid), dir, cfg)
    TrigramSidecar.build(spark, dir, nBuckets = 16)
    // append docs carrying a brand-new term
    val extra = ids.filter(_.docId > mid)
      .map(d => d.copy(content = d.content + " zzquuxnovel"))
    IndexBuilder.appendBuild(spark, extra, dir, cfg)
    def matches() = TrigramSidecar.wildcardTerms(spark, dir, "zzquux*")
      .collect().map(_.getString(0)).toSet
    assert(matches() === Set("zzquuxnovel"), "stale probe must union the tail")
    TrigramSidecar.refresh(spark, dir)
    assert(matches() === Set("zzquuxnovel"), "post-refresh probe")
    // refreshed grid == a from-scratch sidecar over the same index
    val fresh = SparkTestBase.tempDir("graft_tri_fresh")
    IndexBuilder.build(spark, ids.filter(_.docId <= mid), fresh, cfg)
    IndexBuilder.appendBuild(spark,
      ids.filter(_.docId > mid)
        .map(d => d.copy(content = d.content + " zzquuxnovel")), fresh, cfg)
    TrigramSidecar.build(spark, fresh, nBuckets = 16)
    def grid(d: String) = spark.read.parquet(TrigramSidecar.triDir(d))
      .select("bucket", "tri", "term").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1), r.getString(2)))
      .toSet
    assert(grid(dir) === grid(fresh))
    // refresh on a fresh sidecar is a no-op
    TrigramSidecar.refresh(spark, dir)
    assert(grid(dir) === grid(fresh))
  }

  test("probe prunes to the required trigrams' bucket partitions") {
    val required = TrigramSidecar.requiredTrigrams("ab*")
    assert(required === Seq("^ab"))
    val plan = TrigramSidecar.wildcardTerms(spark, idxDir, "ab*")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected bucket partition pruning:\n$plan")
  }

  test("wildcardStats == tokenization truth for the matched terms") {
    import graft.analysis.TextAnalysis
    val docs = ids.toDF().select(col("docId").as("doc_id"),
      col("content").as("text"))
    val rx = TrigramSidecar.patternRegex("b*")
    val want = TextAnalysis.tokens(docs)
      .filter(col("term").rlike(rx))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val got = TrigramSidecar.wildcardStats(spark, idxDir, "b*")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === want)
  }
}
