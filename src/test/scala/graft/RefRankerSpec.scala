package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query._
import graft.rank._

/** Hand-computed scoring fixtures for the RefRanker port (ranker/ranker.h
  * §2.9). These are computed manually from the reference's formulas — the
  * oracle and Spark engine share this ranker, so this spec is what pins
  * its correctness.
  */
class RefRankerSpec extends AnyFunSuite {

  test("url helpers (ranker.h:285-356)") {
    assert(RefRanker.simplifyUrl("https://www.umich.edu") === "umich.edu")
    assert(RefRanker.simplifyUrl("https://lib.umich.edu/a") === "lib.umich.edu/a")
    assert(RefRanker.getDomainName("umich.edu") === "umich")
    assert(RefRanker.getDomainName("lib.umich.edu") === "umich")
    assert(RefRanker.getDomainName("https://www.umich.edu") === "umich")
    assert(RefRanker.getDomainSuffix("umich.edu/activity") === ".edu")
    assert(RefRanker.getDomainSuffix("umich.edu") === ".edu")
    assert(RefRanker.isHomePage("umich.edu"))
    assert(!RefRanker.isHomePage("lib.umich.edu"))
    assert(!RefRanker.isHomePage("umich.edu/activity"))
  }

  /** Manual chunk: three docs, query "quick brown" (hidden AND).
    * Flat layout: d0 tokens 1-6 (#alpha #beta #txt quick brown fox),
    * EndDoc 7; d1 tokens 8-12 (#gamma #delta #txt brown quick), EndDoc 13;
    * d2 tokens 14-19 (#eps #zeta #txt quick only here), EndDoc 20.
    */
  def fixtureCtx: ChunkContext = new ChunkContext(
    chunk = 0,
    termLocs = Map("quick" -> Array(4L, 12L, 17L), "brown" -> Array(5L, 11L)),
    termTf = Map("quick" -> 3L, "brown" -> 2L),
    termDf = Map("quick" -> 3L, "brown" -> 2L),
    endLocs = Array(7L, 13L, 20L),
    docs = Array(
      RankDoc(0, "o/p/alpha/beta.txt@c0ffee00", "alpha beta txt", "", 3, 6),
      RankDoc(1, "o/p/gamma/delta.txt@c0ffee01", "gamma delta txt", "", 3, 5),
      RankDoc(2, "o/p/eps/zeta.txt@c0ffee02", "eps zeta txt", "", 3, 6)),
    totalPosts = 20, // 17 tokens + 3 EndDoc
    chunkCapacity = 100)

  test("rankChunk: hand-computed scores for 'quick brown'") {
    val (Some(ast), flat) = QueryParser.parseQuery("quick brown"): @unchecked
    val top = RefRanker.rankChunk(ast, flat, fixtureCtx)
    val hits = top.filter(_.url.nonEmpty)
    // d0: static 60 (shortUrl+shortTitle); body spans: short1 order1
    //     top1 phrase1 double1 -> 16; norm = docLength(QUIRK 7)/0.2/10 =
    //     3.5 -> 16/3.5 = 4; total = 10*60 + 10*4 = 640
    // d1: body 7 (short1 top1 double1), norm 5/0.2/10=2.5 -> 2;
    //     total = 600 + 20 = 620
    assert(hits.map(h => (h.docId, h.score)).toSeq === Seq((0L, 640L), (1L, 620L)))
  }

  test("rankChunk: single-word query applies score/3 (ranker.h:540)") {
    val (Some(ast), flat) = QueryParser.parseQuery("brown"): @unchecked
    val top = RefRanker.rankChunk(ast, flat, fixtureCtx).filter(_.url.nonEmpty)
    // d0: spans anchored at brown@5: [5] short1 top1 (n==1: no pairs)
    //     -> score 2+3 = 5; /3 -> 1; norm 3.5 -> 1/3.5 -> 0
    //     total = 600 + 0 = 600
    // d1: brown@11: short1 top1 -> 5 /3 -> 1; norm 2.5 -> 0; total 600
    // d1 arrives second with equal (title? no — titles differ) score --
    //   both kept, d0 first (insertion order)
    assert(top.map(h => (h.docId, h.score)).toSeq === Seq((0L, 600L), (1L, 600L)))
  }

  test("rankChunk: absent term aborts the whole chunk (ranker.h:718-720)") {
    val (Some(ast), flat) = QueryParser.parseQuery("quick missing"): @unchecked
    assert(RefRanker.rankChunk(ast, flat, fixtureCtx).forall(_.url.isEmpty))
    // even for OR queries
    val (Some(ast2), flat2) = QueryParser.parseQuery("quick OR missing"): @unchecked
    assert(RefRanker.rankChunk(ast2, flat2, fixtureCtx).forall(_.url.isEmpty))
  }

  /** Web-style fixture for the title/url score paths. One doc, query
    * "umich": url-rank homepage double (rarest), title-some.
    */
  test("rankChunk: url + title ranks on a web-like doc") {
    val ctx = new ChunkContext(
      chunk = 0,
      // tokens: #www 1, #umich 2, #edu 3, campus 4, umich 5; EndDoc 6
      termLocs = Map("umich" -> Array(5L), "#umich" -> Array(2L)),
      termTf = Map("umich" -> 1L, "#umich" -> 1L),
      termDf = Map("umich" -> 1L, "#umich" -> 1L),
      endLocs = Array(6L),
      docs = Array(RankDoc(0, "https://www.umich.edu", "www umich edu", "", 3, 5)),
      totalPosts = 6,
      chunkCapacity = 100)
    val (Some(ast), flat) = QueryParser.parseQuery("umich"): @unchecked
    val top = RefRanker.rankChunk(ast, flat, ctx).filter(_.url.nonEmpty)
    // static: domainName("https://www.umich.edu")="umich" != ".edu" -> 0;
    //   len 21 < 40 -> +30; titleWords 3 < 6 -> +30 => 60
    // url: simplify -> "umich.edu"; domain == "umich" == word, homepage
    //   -> 250, rarest x2 -> 500
    // title: #umich within doc -> count 1/3 = 0.33 >= 0.24 -> 35
    // body: anchor umich@5: span [5]; short 1 (0 span < 3), nearTop 1
    //   -> 5; single word /3 -> 1; norm: dl(QUIRK 6)/0.06/10 = 10 -> 1/10
    //   -> 0
    // total = 10*60 + 10*(0 + 35 + 500) = 5950
    assert(top.map(h => (h.docId, h.score)).toSeq === Seq((0L, 5950L)))
  }

  test("rare-word weight selection (ranker.h:362-392)") {
    // totalPosts / tf > 100000 -> rare; one of two words rare -> 0.5 ->
    // SOME (12); both rare -> 1.0 -> MOST (15)
    val mk = (tfA: Long, tfB: Long) => new ChunkContext(
      chunk = 0,
      termLocs = Map("a" -> Array(4L), "b" -> Array(5L)),
      termTf = Map("a" -> tfA, "b" -> tfB),
      termDf = Map("a" -> 1L, "b" -> 1L),
      endLocs = Array(7L),
      docs = Array(RankDoc(0, "u/r/l/long/enough.txt@x", "t", "", 1, 6)),
      totalPosts = 1000000L,
      chunkCapacity = 100)
    val (Some(ast), flat) = QueryParser.parseQuery("a b"): @unchecked
    // not rare (1000000/9 = 111111 > 100000 is true; use tf 10 -> 100000,
    // not > -> common)
    val common = RefRanker.rankChunk(ast, flat, mk(10, 10)).filter(_.url.nonEmpty)
    val some = RefRanker.rankChunk(ast, flat, mk(9, 10)).filter(_.url.nonEmpty)
    val most = RefRanker.rankChunk(ast, flat, mk(9, 9)).filter(_.url.nonEmpty)
    // identical span structure; only the dynamic weight differs.
    // dynamic part for weight w: total = 10*static + w*dyn
    val dyn = (sc: Long) => sc - 10 * 60 // static = shortUrl 30 + shortTitle 30
    assert(dyn(some.head.score) / 12 === dyn(common.head.score) / 10)
    assert(dyn(most.head.score) / 15 === dyn(common.head.score) / 10)
    assert(dyn(some.head.score) % 12 === 0)
    assert(dyn(most.head.score) % 15 === 0)
  }

  test("insertionSort: dedup by url and by (title, score)") {
    val top = Array.fill(5)(DocScore.empty)
    RefRanker.insertionSort(DocScore("t1", "a", "url-one-long", 10, 1), top)
    RefRanker.insertionSort(DocScore("t2", "a", "url-two-long", 20, 2), top)
    RefRanker.insertionSort(DocScore("t3", "a", "url-one-long", 30, 3), top) // dup url
    RefRanker.insertionSort(DocScore("t2", "a", "url-thr-long", 20, 4), top) // similar
    RefRanker.insertionSort(DocScore("t5", "a", "url-fiv-long", 15, 5), top)
    assert(top.filter(_.url.nonEmpty).map(_.docId).toSeq === Seq(2L, 5L, 1L))
  }
}
