package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer TRAINING — the other
  * half of the tokenizer story: [[graft.tokenizer.Tokenizer]] applies a
  * frozen vocabulary; this trains one from the corpus (Sennrich et al.
  * '16, the subword algorithm behind GPT-2/RoBERTa-style vocabularies).
  *
  * Classic loop, Spark-shaped:
  *  1. the corpus collapses ONCE to a (word, freq) table — kept-token
  *     rule, one shuffle; every later round works on the vocabulary,
  *     never the corpus again (at 100 TB the word table is orders of
  *     magnitude smaller than the text);
  *  2. each round counts adjacent symbol pairs weighted by word freq —
  *     a per-row projection (zip the segmentation with its own tail)
  *     into one partial agg whose key space is bounded by the SYMBOL
  *     vocabulary squared, not by N;
  *  3. the argmax pair (cnt DESC, then lexicographic — deterministic)
  *     is ONE collected row; applying the merge is a per-row
  *     left-to-right non-overlapping fold (`aggregate` over the
  *     segmentation array) — zero shuffles.
  *
  * Everything is integer/string arithmetic — no floats to reconcile —
  * and the DuckDB oracle replays the identical rounds with a
  * `list_reduce` fold, so merges, counts, and final segmentations are
  * all driver-checked exactly.
  */
object Bpe {

  /** The corpus word-frequency table (kept-token rule, lowercased) —
    * the ONLY corpus-sized job in the trainer.
    */
  def wordFreqs(docs: DataFrame): DataFrame =
    TextAnalysis.tokens(docs).groupBy(col("term").as("word"))
      .agg(count(lit(1)).as("freq"))

  /** Initial segmentation: one single-char symbol per character. */
  private def charSeg(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1)))

  /** The round-0 state: every word char-segmented (word, freq, seg). */
  def initialSegments(docs: DataFrame): DataFrame =
    wordFreqs(docs)
      .select(col("word"), col("freq"), charSeg(col("word")).as("seg"))

  /** Adjacent symbol-pair counts over a segmented word table, weighted
    * by word frequency: zip the segmentation with its own tail (a
    * projection — single-symbol words contribute nothing), then ONE
    * partial agg keyed by (lhs, rhs).
    */
  def pairCounts(segWords: DataFrame): DataFrame =
    segWords
      // posexplode the init slice; the pair's right element is the next
      // symbol of the carried array (single-symbol words slice to empty
      // and drop out) — no struct naming inside a lambda (the Catalyst
      // caveat Clustering.updateStats documents)
      .select(col("freq"), col("seg"),
        posexplode(slice(col("seg"), lit(1), size(col("seg")) - 1)))
      .select(col("col").as("lhs"),
        element_at(col("seg"), (col("pos") + 2).cast("int")).as("rhs"),
        col("freq"))
      .groupBy(col("lhs"), col("rhs"))
      .agg(sum(col("freq")).as("cnt"))

  /** Apply ONE merge (lhs, rhs) -> lhs||rhs to a segmentation, scanning
    * left-to-right non-overlapping (the Sennrich rule: in "aaa" with
    * merge (a,a) the first two symbols fuse, the third stands) — a
    * per-row `aggregate` fold, zero shuffles.
    */
  private[analysis] def applyMerge(seg: Column, lhs: String, rhs: String): Column =
    aggregate(seg, array().cast("array<string>"),
      (acc, x) =>
        when(x === lit(rhs) && size(acc) > 0 && element_at(acc, -1) === lit(lhs),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(lhs + rhs))))
          .otherwise(concat(acc, array(x))))

  /** The trained merge table and the final segmentation after `rounds`
    * greedy rounds. Each round: count pairs (one bounded agg), collect
    * the single argmax row, fold the merge into every word's
    * segmentation (projection). The segmentation persists per round so
    * round i never re-runs rounds 1..i-1's folds.
    */
  private def trainLoop(docs: DataFrame, rounds: Int): (Seq[(Long, String, String, Long)], DataFrame) = {
    var seg = initialSegments(docs).persist()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    (1 to rounds).foreach { round =>
      val top = pairCounts(seg)
        .orderBy(desc("cnt"), asc("lhs"), asc("rhs")).limit(1)
        .collect()
      if (top.nonEmpty) {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((round.toLong, l, r, c))
        val next = seg
          .select(col("word"), col("freq"), applyMerge(col("seg"), l, r).as("seg"))
          .persist()
        next.count() // materialize before dropping the parent
        seg.unpersist()
        seg = next
      }
    }
    (merges.toSeq, seg)
  }

  /** The merge table: (round 1-based, lhs, rhs, cnt at selection time). */
  def merges(docs: DataFrame, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (ms, seg) = trainLoop(docs, rounds)
    seg.unpersist()
    ms.toDF("round", "lhs", "rhs", "cnt")
  }

  /** Tokenizer APPLY — the inference half of the BPE story: encode every
    * document with a FROZEN merge table (train once on a sample, encode
    * the full corpus). The merges are a tiny ordered driver-side list
    * folded into the plan at construction time (the broadcast-vocabulary
    * pattern), so the whole encode is a ZERO-shuffle per-row projection:
    * per doc, per kept token, the char segmentation folds each merge
    * left-to-right non-overlapping — semantics identical to the
    * training-side [[applyMerge]]. Output (doc_id, n_toks, n_pieces):
    * the real token-budget numbers a data-mixing pipeline feeds on
    * (Packing/token-budget sampling currently count whitespace words).
    */
  def encodeDocs(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    def encodeTok(tok: Column): Column =
      merges.foldLeft(charSeg(tok)) { case (seg, (l, r)) => applyMerge(seg, l, r) }
    val toks = TextAnalysis.keptTokens(col("text"))
    docs.select(col("doc_id"),
      size(toks).cast("long").as("n_toks"),
      aggregate(transform(toks, t => size(encodeTok(lower(t)))),
        lit(0L), (a, x) => a + x.cast("long")).as("n_pieces"))
  }

  /** Every word's segmentation after `rounds` merges, space-joined:
    * (word, freq, seg) — the tokenizer-apply surface.
    */
  def segments(docs: DataFrame, rounds: Int): DataFrame = {
    val (_, seg) = trainLoop(docs, rounds)
    // drop the final round's cache: the lineage stays valid for whoever
    // consumes the frame, and repeated calls must not accumulate cache
    seg.unpersist()
    seg.select(col("word"), col("freq"),
      array_join(col("seg"), " ").as("seg"))
  }
}
