package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.isr._

/** ISR semantics replayed from the reference's tests/testISR.cpp
  * TestCase 3 location tables (FIXTURES.md §5):
  *   quick @ {1,3,11,14,18,19,26}
  *   brown @ {4,5,6,7,15,22}
  *   fox   @ {9,12,16,20,24,28}
  *   DocEnd@ {13,21,23,25,29}
  * Documents: d0 = locs 1-12, d1 = 14-20, d2 = 22, d3 = 24, d4 = 26-28.
  */
class IsrSpec extends AnyFunSuite {
  val quick = Array(1L, 3, 11, 14, 18, 19, 26)
  val brown = Array(4L, 5, 6, 7, 15, 22)
  val fox = Array(9L, 12, 16, 20, 24, 28)
  val docEnds = Array(13L, 21, 23, 25, 29)

  def endDoc() = new IsrEndDoc(docEnds, Array.range(0, docEnds.length))

  def docsOf(node: { def nextDocument(): Boolean; def docEnd: IsrEndDoc }): Seq[Long] = {
    val out = Seq.newBuilder[Long]
    while (node.nextDocument()) out += node.docEnd.startLocation
    out.result()
  }

  test("ISRWord next walks all locations") {
    val w = new IsrWord(quick)
    val locs = Iterator.continually(if (w.next()) Some(w.startLocation) else None)
      .takeWhile(_.isDefined).flatten.toSeq
    assert(locs === quick.toSeq)
    assert(w.startLocation === Isr.Max)
  }

  test("ISRWord seek = first location >= target") {
    val w = new IsrWord(quick)
    assert(w.seek(4) && w.startLocation === 11)
    assert(w.seek(11) && w.startLocation === 11)
    assert(w.seek(20) && w.startLocation === 26)
    assert(!w.seek(27))
    assert(w.startLocation === Isr.Max)
  }

  test("ISREndDoc next yields (loc, urlIndex, docLength)") {
    val e = endDoc()
    val walked = Iterator.continually(
      if (e.next()) Some((e.startLocation, e.urlIndex, e.docLength)) else None)
      .takeWhile(_.isDefined).flatten.toSeq
    assert(walked === Seq((13L, 0, 12L), (21L, 1, 7L), (23L, 2, 1L), (25L, 3, 1L), (29L, 4, 3L)))
  }

  test("ISREndDoc seek: sync-jump docLength quirk on the stripe-first doc (isr.h:131)") {
    val e = endDoc()
    // target 1: stripe 0's first EndDoc is 13 -> jump lands at-or-past the
    // target, docLength = raw delta 13 (not 12)
    assert(e.seek(1) && e.startLocation === 13 && e.docLength === 13 && e.urlIndex === 0)
    // target 14: jump back to 13, then Next() -> correct docLength
    assert(e.seek(14) && e.startLocation === 21 && e.docLength === 7 && e.urlIndex === 1)
  }

  test("ISROr(quick, brown) documents") {
    val or = new IsrOr(Array(new IsrWord(quick), new IsrWord(brown)), endDoc())
    assert(docsOf(or) === Seq(13L, 21, 23, 29))
  }

  test("ISROr(quick, fox) documents") {
    val or = new IsrOr(Array(new IsrWord(quick), new IsrWord(fox)), endDoc())
    assert(docsOf(or) === Seq(13L, 21, 25, 29))
  }

  test("ISRAnd(quick, brown) documents") {
    val and = new IsrAnd(Array(new IsrWord(quick), new IsrWord(brown)), endDoc())
    assert(docsOf(and) === Seq(13L, 21))
  }

  test("ISRAnd(quick, fox) documents") {
    val and = new IsrAnd(Array(new IsrWord(quick), new IsrWord(fox)), endDoc())
    assert(docsOf(and) === Seq(13L, 21, 29))
  }

  test("ISRAnd(quick, brown, fox) documents") {
    val and = new IsrAnd(
      Array(new IsrWord(quick), new IsrWord(brown), new IsrWord(fox)), endDoc())
    assert(docsOf(and) === Seq(13L, 21))
  }

  test("ISRPhrase(quick, brown) documents: adjacency 3->4 (d0), 14->15 (d1)") {
    val ph = new IsrPhrase(Array(new IsrWord(quick), new IsrWord(brown)), endDoc())
    assert(docsOf(ph) === Seq(13L, 21))
  }

  test("ISRPhrase(brown, fox) documents: only 15->16 (d1)") {
    val ph = new IsrPhrase(Array(new IsrWord(brown), new IsrWord(fox)), endDoc())
    assert(docsOf(ph) === Seq(21L))
  }

  test("ISRPhrase(quick, fox): 11->12 (d0), 19->20 (d1)") {
    val ph = new IsrPhrase(Array(new IsrWord(quick), new IsrWord(fox)), endDoc())
    assert(docsOf(ph) === Seq(13L, 21))
  }

  test("absent term: ISRWord(null) is dead; AND with it yields nothing") {
    val dead = new IsrWord(null)
    assert(!dead.hasPost && dead.startLocation === Isr.Max)
    assert(!dead.seek(1) && !dead.next())
    val and = new IsrAnd(Array(new IsrWord(quick), dead), endDoc())
    assert(docsOf(and) === Seq.empty)
  }

  test("OR with one dead term degrades to the live term") {
    val or = new IsrOr(Array(new IsrWord(quick), new IsrWord(null)), endDoc())
    // docs containing quick: d0, d1, d4
    assert(docsOf(or) === Seq(13L, 21, 29))
  }

  test("nested: And(quick, Or(brown, fox)) documents") {
    val inner = new IsrOr(Array(new IsrWord(brown), new IsrWord(fox)), endDoc())
    val and = new IsrAnd(Array[IsrNode](new IsrWord(quick), inner), endDoc())
    // docs with quick and (brown or fox): d0, d1, d4
    assert(docsOf(and) === Seq(13L, 21, 29))
  }

  test("stripe jump across 1Mi boundaries") {
    // locations straddling the >>20 stripes
    val locs = Array(5L, 100L, (1L << 20) + 7, (1L << 20) + 9, (3L << 20) + 1)
    val w = new IsrWord(locs)
    assert(w.seek((1L << 20)) && w.startLocation === (1L << 20) + 7)
    assert(w.seek((2L << 20)) && w.startLocation === (3L << 20) + 1)
    // backward seek with an existing stripe entry rewinds (sync-jump)
    assert(w.seek(50) && w.startLocation === 100L)
  }
}
