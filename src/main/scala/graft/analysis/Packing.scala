package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents (in deterministic doc_id order)
  * to fixed-token-budget training bins by EXCLUSIVE prefix sum of
  * per-doc kept-token counts — the "concatenate everything, then split
  * every `budget` tokens" packing rule of pre-training pipelines (a
  * document's bin is wherever its first token lands).
  *
  * A naive `sum() OVER (ORDER BY doc_id)` is a single-partition window
  * at corpus scale. This is the scalable distributed prefix sum in
  * fully DECLARATIVE form: doc_ids are sliced into `parts` contiguous
  * buckets by value range (dense docIds — the Corpus.assignDocIds
  * contract — make the slices balanced by construction), per-bucket
  * token totals are one tiny partial-aggregated job (parts rows to the
  * driver), their exclusive scan becomes a broadcast-joined offset, and
  * the within-bucket prefix is a window PARTITIONED BY bucket. No
  * physical-partition identities are involved (an earlier formulation
  * read TaskContext.getPartitionId across two jobs — downstream
  * `coalesce(1)` merges parent partitions into one task and silently
  * zeroes every merged partition's offset), so the result is invariant
  * under any downstream re-planning, AQE coalescing included.
  */
object Packing {

  /** (doc_id, n_tokens, start_offset, pack_bin): n_tokens = kept-token
    * count (frozen tokenizer rules, identical to
    * TextAnalysis.quality.n_kept_tokens), start_offset = exclusive
    * prefix sum in doc_id order, pack_bin = start_offset / budget
    * (floor; offsets are non-negative).
    */
  def packSequences(docs: DataFrame, budget: Long,
                    numPartitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = docs.sparkSession
    val counts = docs.select(
      col("doc_id").cast("long").as("doc_id"),
      size(TextAnalysis.keptTokens(col("text"))).cast("long").as("n_tokens"))
    val parts = if (numPartitions > 0) numPartitions
                else spark.sessionState.conf.numShufflePartitions

    // value-range buckets over [min, max] doc_id: one column-pruned agg
    val bounds = counts.agg(min(col("doc_id")), max(col("doc_id"))).head()
    if (bounds.isNullAt(0)) return counts
      .withColumn("start_offset", lit(0L)).withColumn("pack_bin", lit(0L))
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (hi - lo) / parts + 1)
    val bucketed = counts.withColumn("bucket",
      floor((col("doc_id") - lo) / width).cast("long"))

    // per-bucket totals -> exclusive scan on the driver (parts longs)
    val sums = bucketed.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = sums.zip(sums.scanLeft(0L)(_ + _._2))
      .map { case ((b, _), off) => (b, off) }
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("bucket", "bucket_offset")

    // within-bucket exclusive prefix (window partitioned by bucket) +
    // the broadcast bucket offset
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(broadcast(offsetDf), Seq("bucket"))
      .withColumn("start_offset",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)) + col("bucket_offset"))
      .select(col("doc_id"), col("n_tokens"), col("start_offset"),
        floor(col("start_offset") / budget).cast("long").as("pack_bin"))
  }
}
