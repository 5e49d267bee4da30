package graft.codec

import graft.config.GraftConfig
import scala.collection.mutable.ArrayBuffer

/** Per-block skip metadata — our generalization of the reference's
  * 128-entry syncTable (index/PostingList.h:19-23; index/index.h:64-70).
  * One entry per [[GraftConfig.BlockDocs]] documents of a posting list:
  * docId bounds + byte offset let a cursor jump over whole blocks
  * (ISRWord::Seek's sync-jump, constraintSolver/isr.h:83-91), and maxTf is
  * the block-max statistic for block-max WAND pruning on the BM25 path.
  */
case class PostingBlock(firstDocId: Long, lastDocId: Long, offset: Int, maxTf: Int)

/** Delta + varint codec for one (chunk, term) posting list.
  *
  * Blob layout, per document in ascending docId order:
  *   varint(docIdDelta)  — gap to previous docId; at a block boundary the
  *                         absolute docId + 1 is stored instead so a
  *                         cursor can start decoding at any block
  *   varint(tf)          — number of positions in this document
  *   varint(posDelta)*tf — 1-based doc-local positions, gap-encoded
  *                         (first = the position itself)
  * All varints use the reference byte format (DeltaConverter.h:86-211).
  * Values are always >= 1 so the 0x00 sentinel byte never appears inside a
  * list; no terminator is stored (df bounds the decode loop, replacing the
  * reference's AddSentinel, index/index.h:197-204).
  */
object PostingCodec {

  /** Encode a sorted run of (docId, sorted positions). Returns
    * (df, tf, blocks, blob).
    */
  def encode(docs: scala.collection.IndexedSeq[(Long, Array[Long])]): (Long, Long, Array[PostingBlock], Array[Byte]) = {
    val out = new Varint.ByteBuilder(docs.length * 4)
    val blocks = new ArrayBuffer[PostingBlock]
    var tf = 0L
    var prevDocId = -1L
    var blockFirst = -1L
    var blockMaxTf = 0
    var blockOffset = 0
    var i = 0
    while (i < docs.length) {
      val (docId, positions) = docs(i)
      require(docId > prevDocId, s"unsorted/duplicate docId $docId")
      if (i % GraftConfig.BlockDocs == 0) {
        if (i > 0)
          blocks += PostingBlock(blockFirst, prevDocId, blockOffset, blockMaxTf)
        blockFirst = docId; blockMaxTf = 0; blockOffset = out.length
        out.append(docId + 1) // absolute at block start
      } else {
        out.append(docId - prevDocId)
      }
      out.append(positions.length.toLong)
      var prevPos = 0L
      var j = 0
      while (j < positions.length) {
        require(positions(j) > prevPos, s"unsorted positions for doc $docId")
        out.append(positions(j) - prevPos)
        prevPos = positions(j)
        j += 1
      }
      tf += positions.length
      if (positions.length > blockMaxTf) blockMaxTf = positions.length
      prevDocId = docId
      i += 1
    }
    if (docs.nonEmpty)
      blocks += PostingBlock(blockFirst, prevDocId, blockOffset, blockMaxTf)
    (docs.length.toLong, tf, blocks.toArray, out.result())
  }

  /** Full decode back to (docId, positions) pairs. */
  def decode(df: Long, blob: Array[Byte]): Array[(Long, Array[Long])] = {
    val out = new Array[(Long, Array[Long])](df.toInt)
    val r = new Varint.Reader(blob)
    var prevDocId = -1L
    var i = 0
    while (i < df) {
      val delta = r.read()
      val docId =
        if (i % GraftConfig.BlockDocs == 0) delta - 1
        else prevDocId + delta
      val n = r.read().toInt
      val positions = new Array[Long](n)
      var prevPos = 0L
      var j = 0
      while (j < n) {
        prevPos += r.read()
        positions(j) = prevPos
        j += 1
      }
      out(i) = (docId, positions)
      prevDocId = docId
      i += 1
    }
    out
  }

  /** Block-skipping cursor over an encoded list. Positions are decoded
    * eagerly per visited document (they are needed by the phrase and
    * RefScore paths); whole blocks are skipped without decoding.
    */
  final class Cursor(df: Long, blocks: Array[PostingBlock], blob: Array[Byte]) {
    private val r = new Varint.Reader(blob)
    private var idx = -1          // index of current doc within the list
    private var blockIdx = 0      // current block
    var docId: Long = -1L
    var positions: Array[Long] = Array.emptyLongArray
    def tf: Int = positions.length
    def exhausted: Boolean = idx >= df

    private def readDoc(): Unit = {
      idx += 1
      if (idx >= df) { docId = Long.MaxValue; positions = Array.emptyLongArray; return }
      val delta = r.read()
      docId = if (idx % GraftConfig.BlockDocs == 0) delta - 1 else docId + delta
      val n = r.read().toInt
      val ps = new Array[Long](n)
      var prev = 0L
      var j = 0
      while (j < n) { prev += r.read(); ps(j) = prev; j += 1 }
      positions = ps
      blockIdx = idx / GraftConfig.BlockDocs
    }

    /** Advance to the next document; returns false when exhausted. */
    def next(): Boolean = { readDoc(); idx < df }

    /** Advance to the first document with docId >= target, skipping whole
      * blocks via the skip metadata. Returns false when exhausted.
      */
    def seek(target: Long): Boolean = {
      if (idx >= df) return false
      if (idx >= 0 && docId >= target) return true
      // first block at-or-after the cursor that could contain target
      var b = if (idx < 0) 0 else blockIdx
      while (b < blocks.length && blocks(b).lastDocId < target) b += 1
      if (b >= blocks.length) { idx = df.toInt; docId = Long.MaxValue; return false }
      val startIdx = b * GraftConfig.BlockDocs
      if (idx < startIdx) { // jump: decode restarts at the block boundary
        r.off = blocks(b).offset
        idx = startIdx - 1
        readDoc()
      }
      while (idx < df && docId < target) readDoc()
      idx < df
    }

    /** Max tf among blocks that may still contain docs (for block-max
      * WAND upper bounds); refined to the current block's max once seeked.
      */
    def currentBlockMaxTf: Int =
      if (blockIdx < blocks.length) blocks(blockIdx).maxTf else 0
    def currentBlockLastDocId: Long =
      if (blockIdx < blocks.length) blocks(blockIdx).lastDocId else Long.MaxValue
  }
}
