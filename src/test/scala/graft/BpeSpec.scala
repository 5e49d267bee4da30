package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.Bpe

/** BPE trainer: hand-traced 3-round fixture (pair counts, tie rule,
  * greedy merges, final segmentations), the left-to-right
  * non-overlapping fold edges, and reconstruction contracts on the real
  * corpus.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  /** words: aaab x2, ab x3, ba x1 ("x9" dropped by the kept-token rule).
    * Trace:
    *  round 1 pairs: (a,a)=4, (a,b)=5, (b,a)=1 -> merge (a,b)
    *    aaab -> [a,a,ab], ab -> [ab], ba -> [b,a]
    *  round 2 pairs: (a,a)=2, (a,ab)=2, (b,a)=1 -> tie on cnt, rhs
    *    'a' < 'ab' -> merge (a,a); aaab -> [aa,ab]
    *  round 3 pairs: (aa,ab)=2, (b,a)=1 -> merge (aa,ab); aaab -> [aaab]
    */
  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, "aaab ab ab"),
      (2L, "ab aaab x9 ba")).toDF("doc_id", "text")
  }

  test("hand-traced: round-0 pair counts") {
    val got = Bpe.pairCounts(Bpe.initialSegments(fixture))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("a", "a", 4L), ("a", "b", 5L), ("b", "a", 1L)))
  }

  test("hand-traced: 3 greedy merges with the (cnt, lhs, rhs) tie rule") {
    val got = Bpe.merges(fixture, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === Seq(
      (1L, "a", "b", 5L),
      (2L, "a", "a", 2L),
      (3L, "aa", "ab", 2L)))
  }

  test("hand-traced: segmentations after 3 merges") {
    val got = Bpe.segments(fixture, rounds = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got === Set(
      ("aaab", 2L, "aaab"),
      ("ab", 3L, "ab"),
      ("ba", 1L, "b a")))
  }

  test("merge fold is left-to-right non-overlapping (the Sennrich scan)") {
    import spark.implicits._
    // one doc, words aaa and aaaa; merge (a,a) must fuse pairs 0-1 (and
    // 2-3), never chain onto the freshly made symbol
    val d = Seq((1L, "aaa aaaa")).toDF("doc_id", "text")
    val seg1 = Bpe.segments(d, rounds = 1)
      .collect().map(r => (r.getString(0), r.getString(2))).toMap
    assert(seg1("aaa") === "aa a")
    assert(seg1("aaaa") === "aa aa")
  }

  test("encodeDocs: hand-traced counts, segments-consistency, zero Exchange, empty docs") {
    import spark.implicits._
    val ms = Seq(("a", "b"), ("a", "a"), ("aa", "ab")) // the fixture's merges
    // doc 1: aaab|ab|ab -> 1+1+1 pieces; doc 2: ab|aaab|ba -> 1+1+2
    // (x9 dropped); doc 3: no kept tokens at all
    val d = fixture.union(Seq((3L, "x9 99")).toDF("doc_id", "text"))
    val got = Bpe.encodeDocs(d, ms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 3L, 3L), (2L, 3L, 4L), (3L, 0L, 0L)))
    // the encode is a pure projection: no Exchange anywhere in the plan
    val plan = Bpe.encodeDocs(d, ms).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode shuffles:\n$plan")
    // real corpus: per-doc n_pieces == sum over its tokens of the trained
    // segmentation length (the segments surface re-aggregated per doc)
    val ms3 = Bpe.merges(docs, rounds = 3).orderBy(col("round"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val segLen = Bpe.segments(docs, rounds = 3)
      .collect().map(r => r.getString(0) -> r.getString(2).split(' ').length.toLong).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = texts.map { case (id, text) =>
      val toks = graft.tokenizer.Tokenizer.bodyTokens(text)
      (id, toks.length.toLong, toks.map(segLen).sum)
    }.toSet
    val gotReal = Bpe.encodeDocs(docs, ms3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotReal === want)
  }

  test("real corpus: merges are well-formed, counts non-increasing, words reconstruct") {
    val ms = Bpe.merges(docs, rounds = 3)
      .orderBy(col("round")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(ms.map(_._1).toSeq === Seq(1L, 2L, 3L))
    // a merged pair never outgrows an earlier round's argmax
    assert(ms.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    val segs = Bpe.segments(docs, rounds = 3)
    assert(segs.filter(regexp_replace(col("seg"), " ", "") =!= col("word")).count() === 0L)
    assert(segs.count() === Bpe.wordFreqs(docs).count())
  }
}
