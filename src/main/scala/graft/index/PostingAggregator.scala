package graft.index

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer
import graft.codec.{PostingBlock, PostingCodec}

/** The encoded output of one (chunk, term[, salt]) aggregation. */
case class PostingPayload(df: Long, tf: Long, blocks: Array[PostingBlock],
                          postingsBlob: Array[Byte])

/** Typed Aggregator building one compressed posting list from a stream of
  * (docId, pos) occurrences — the Spark partial/final re-expression of the
  * reference's incremental PostingListInMem insert
  * (index/index.h:43-79 DictionaryInMemInsert; index/PostingList.h:58-66).
  *
  * reduce/merge just accumulate packed (docId, pos) pairs (map-side
  * partial aggregation collapses each partition's occurrences of a term
  * into one buffer row before the shuffle); finish() sorts once and
  * delta+varint-encodes with per-block skip metadata. df is exact — the
  * reference's lastOccurDocId dedup (index/index.h:58-62) relies on sorted
  * input; sorting in finish() gives the same exact distinct count.
  *
  * Memory bound: all positions of one term within one chunk (<= 30k docs
  * x positions). For df≈N stopword-like terms at full chunk width, use the
  * salted two-level path in IndexBuilder (north rule's explicit skew
  * handling) which bounds each buffer to a docId range slice.
  */
class PostingAggregator extends Aggregator[(Long, Long), ArrayBuffer[Long], PostingPayload] {

  def zero: ArrayBuffer[Long] = new ArrayBuffer[Long]

  def reduce(b: ArrayBuffer[Long], in: (Long, Long)): ArrayBuffer[Long] = {
    b += in._1 += in._2
    b
  }

  def merge(a: ArrayBuffer[Long], b: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    if (a.length >= b.length) { a ++= b; a } else { b ++= a; b }
  }

  def finish(b: ArrayBuffer[Long]): PostingPayload = PostingAggregator.encodePairs(b)

  def bufferEncoder: Encoder[ArrayBuffer[Long]] = Encoders.kryo[ArrayBuffer[Long]]
  def outputEncoder: Encoder[PostingPayload] = Encoders.product[PostingPayload]
}

object PostingAggregator {
  /** Sort packed (docId, pos) pairs and encode. Shared by the Aggregator
    * and the salted merge stage.
    */
  def encodePairs(b: ArrayBuffer[Long]): PostingPayload = {
    val n = b.length / 2
    val idx = Array.range(0, n)
    // sort pair indices by (docId, pos)
    val sorted = idx.sortWith { (i, j) =>
      val di = b(2 * i); val dj = b(2 * j)
      if (di != dj) di < dj else b(2 * i + 1) < b(2 * j + 1)
    }
    val docs = new ArrayBuffer[(Long, Array[Long])]
    var i = 0
    while (i < n) {
      val docId = b(2 * sorted(i))
      var j = i
      while (j < n && b(2 * sorted(j)) == docId) j += 1
      val positions = new Array[Long](j - i)
      var k = i
      while (k < j) { positions(k - i) = b(2 * sorted(k) + 1); k += 1 }
      docs += ((docId, positions))
      i = j
    }
    val (df, tf, blocks, blob) = PostingCodec.encode(docs)
    PostingPayload(df, tf, blocks, blob)
  }
}
