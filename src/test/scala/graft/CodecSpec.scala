package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.codec.{Varint, PostingCodec}

/** Varint fixtures from the reference's tests/testDelta.cpp and the byte
  * boundaries in index/DeltaConverter.h:66-73; property tests per
  * FIXTURES.md §6 (seeded sampling — the scalatest/scalacheck bridge is
  * not on the offline classpath, so properties run as deterministic
  * sampled loops).
  */
class CodecSpec extends AnyFunSuite {

  private val boundaries: Seq[Long] =
    Seq(0x1FL, 0x1FFFL, 0x1FFFFFL, 0x1FFFFFFFL, 0x1FFFFFFFFFL,
        0x1FFFFFFFFFFFL, 0x1FFFFFFFFFFFFFL, 0x1FFFFFFFFFFFFFFFL)

  test("varint round-trips fixture values (testDelta.cpp)") {
    val values = Seq(0L, 1L, 17L, 81L, 28709L) ++
      boundaries.flatMap(b => Seq(b - 1, b, math.min(b + 1, Varint.MaxValue)))
    values.foreach { v =>
      val buf = new Array[Byte](9)
      val end = Varint.encode(buf, 0, v)
      val (decoded, off) = Varint.decode(buf, 0)
      assert(decoded === v, s"round trip of $v")
      assert(off === end)
      assert(end === Varint.encodedLength(v))
      assert(Varint.indicatedLength(buf(0)) === end || v == 0)
    }
  }

  test("varint byte-length boundaries match DeltaConverter.h:66-73") {
    boundaries.zipWithIndex.foreach { case (b, i) =>
      assert(Varint.encodedLength(b) === i + 1)
      if (b < Varint.MaxValue) assert(Varint.encodedLength(b + 1) === i + 2)
    }
  }

  test("varint round-trips forall n in [0, 2^61-1] (seeded sample)") {
    val rnd = new scala.util.Random(42)
    (1 to 20000).foreach { _ =>
      // bias across all byte-length regimes: random bit width 1..61
      val bits = 1 + rnd.nextInt(61)
      val v = (rnd.nextLong() & ((1L << bits) - 1)) & Varint.MaxValue
      val buf = new Array[Byte](9)
      Varint.encode(buf, 0, v)
      assert(Varint.decode(buf, 0)._1 === v, s"round trip of $v")
    }
  }

  test("0x00 first byte is the end sentinel") {
    assert(Varint.decode(Array[Byte](0, 5), 0) === ((0L, 1)))
  }

  test("posting list encode/decode round-trip") {
    val docs = IndexedSeq(
      0L -> Array(1L, 5L, 9L),
      3L -> Array(2L),
      4L -> Array(1L, 2L, 3L, 4L),
      1000L -> Array(7L, 1000000L))
    val (df, tf, blocks, blob) = PostingCodec.encode(docs)
    assert(df === 4)
    assert(tf === 10)
    assert(blocks.length === 1)
    assert(blocks(0).firstDocId === 0 && blocks(0).lastDocId === 1000)
    assert(blocks(0).maxTf === 4)
    val decoded = PostingCodec.decode(df, blob)
    assert(decoded.map(_._1).toSeq === docs.map(_._1))
    decoded.zip(docs).foreach { case ((_, got), (_, want)) =>
      assert(got.toSeq === want.toSeq)
    }
  }

  test("posting cursor seeks across blocks") {
    // 1000 docs at even docIds, tf = 1 + docId % 3
    val docs = (0 until 1000).map(i => (i * 2L, (1L to (1 + i % 3)).toArray))
    val (df, tf, blocks, blob) = PostingCodec.encode(docs)
    assert(blocks.length === math.ceil(1000.0 / graft.config.GraftConfig.BlockDocs).toInt)
    val cur = new PostingCodec.Cursor(df, blocks, blob)
    assert(cur.seek(0) && cur.docId === 0)
    assert(cur.seek(777) && cur.docId === 778)
    assert(cur.positions.toSeq === (1L to (1 + 389 % 3)).toSeq)
    assert(cur.seek(777) && cur.docId === 778) // idempotent
    assert(cur.seek(1998) && cur.docId === 1998)
    assert(!cur.seek(1999))
    // sequential next() from scratch matches full decode
    val cur2 = new PostingCodec.Cursor(df, blocks, blob)
    val walked = Iterator.continually { if (cur2.next()) Some((cur2.docId, cur2.positions.toSeq)) else None }
      .takeWhile(_.isDefined).flatten.toList
    assert(walked === docs.map { case (d, p) => (d, p.toSeq) }.toList)
  }

  test("posting cursor random seeks match naive lower-bound") {
    val ids = (0 until 500).scanLeft(1L)((acc, i) => acc + 1 + (i * 7919) % 13).tail
    val docs = ids.map(d => (d, Array(1L + d % 5)))
    val (df, _, blocks, blob) = PostingCodec.encode(docs.toIndexedSeq)
    val cur = new PostingCodec.Cursor(df, blocks, blob)
    var target = 0L
    (1 to 200).foreach { k =>
      target += (k * 31) % 40
      val expected = ids.find(_ >= target)
      val ok = cur.seek(target)
      assert(ok === expected.isDefined, s"seek($target)")
      expected.foreach(e => assert(cur.docId === e, s"seek($target)"))
    }
  }
}
