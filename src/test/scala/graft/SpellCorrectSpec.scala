package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.SpellCorrect

/** SymSpell suggestion: variant-set construction edges, the hand-traced
  * candidate/verify split (a transposition shares a delete variant but
  * fails the distance check), tf-then-term ranking, and a completeness
  * twin — every vocabulary term within distance 1 is found.
  */
class SpellCorrectSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("deleteVariants: the term itself plus every delete-1, deduped") {
    import spark.implicits._
    val got = Seq("abc", "aa", "x").toDF("t")
      .select(col("t"), SpellCorrect.deleteVariants(col("t")).as("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(got("abc") === Set("bc", "ac", "ab", "abc"))
    assert(got("aa") === Set("a", "aa")) // both deletes collapse
    assert(got("x") === Set("", "x"))
  }

  test("hand corpus: correction found, exact match wins at dist 0, transposition rejected") {
    import spark.implicits._
    val docs = Seq(
      (1L, "join join join hash", "en"),
      (2L, "join hash scan", "en")).toDF("doc_id", "text", "lang")
    val got = SpellCorrect.suggest(docs, Seq("joib", "hash", "jion"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val byQ = got.groupBy(_._1)
    // joib -> join (substitution, dist 1, tf 4)
    assert(byQ("joib").toSet === Set(("joib", "join", 4L, 1L, 1L)))
    // hash matches itself at dist 0 first
    assert(byQ("hash").head === (("hash", "hash", 2L, 0L, 1L)))
    // jion shares delete variants with join but levenshtein = 2 -> gone
    assert(!byQ.contains("jion"))
  }

  test("ranking: dist before tf, tf desc within dist, term asc ties") {
    import spark.implicits._
    // query "cat": cat (dist 0); bat/hat (dist 1, equal tf -> term asc)
    val docs = Seq(
      (1L, "cat bat bat hat hat", "en")).toDF("doc_id", "text", "lang")
    val got = SpellCorrect.suggest(docs, Seq("cat"), k = 3)
      .orderBy(col("rnk")).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(4))).toList
    assert(got === List(("cat", 0L, 1L), ("bat", 1L, 2L), ("hat", 1L, 3L)))
  }

  test("plan: query side broadcasts into the variant join — no nested loop, no query-side shuffle join") {
    import spark.implicits._
    val docs = Seq((1L, "join hash scan", "en")).toDF("doc_id", "text", "lang")
    val plan = SpellCorrect.suggest(docs, Seq("joib"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("prefixIndex: hand corpus — shared prefixes rank by tf then term, every prefix present") {
    import spark.implicits._
    val docs = Seq(
      (1L, "scan scan scan sort sort so", "en")).toDF("doc_id", "text", "lang")
    val got = graft.analysis.SpellCorrect.prefixIndex(docs, k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    // vocab: scan(3), sort(2), so(1); prefix "s"/"sc"... k=2 keeps top 2
    val expect = Set(
      ("s", "scan", 3L, 1L), ("s", "sort", 2L, 2L),
      ("sc", "scan", 3L, 1L), ("sca", "scan", 3L, 1L), ("scan", "scan", 3L, 1L),
      ("so", "sort", 2L, 1L), ("so", "so", 1L, 2L),
      ("sor", "sort", 2L, 1L), ("sort", "sort", 2L, 1L))
    assert(got === expect)
  }

  test("prefixIndex: every (prefix, term) pair of the real vocabulary is indexed within k") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val vocab = graft.analysis.TextAnalysis.tokens(docs)
      .groupBy(col("term")).agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val k = 4
    val got = graft.analysis.SpellCorrect.prefixIndex(docs, k)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    val byPrefix = got.groupBy(_._1)
    // twin: for each prefix, the top-k completions by (tf desc, term)
    val prefixes = vocab.flatMap { case (t, _) => (1 to t.length).map(t.take) }.distinct
    prefixes.foreach { p =>
      val expect = vocab.filter(_._1.startsWith(p))
        .sortBy { case (t, tf) => (-tf, t) }.take(k).map(_._1).toList
      val gotTerms = byPrefix(p).sortBy(_._3).map(_._2).toList
      assert(gotTerms === expect, s"prefix '$p'")
    }
  }

  test("completeness twin on the real corpus: every distance<=1 term is suggested") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val vocab = graft.analysis.TextAnalysis.tokens(docs)
      .groupBy(col("term")).agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val queries = Seq("quary", "scann", "ort", "hash", "zzz")
    val got = SpellCorrect.suggest(docs, queries, k = 1000)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    queries.foreach { q =>
      val expect = vocab.map(_._1).filter(t => lev(q, t) <= 1).toSet
      assert(got.collect { case (`q`, t) => t }.toSet === expect, s"query $q")
    }
  }
}
