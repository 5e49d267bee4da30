package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.IndexStore
import graft.plans.GraftExpressions

/** NEAR/k proximity queries — "terms within k positions of each other",
  * the classic operator between AND (any distance) and phrase (exact
  * adjacency, isr.h's positional join). The reference has no NEAR form;
  * its span heuristics (ranker.h:132) reward proximity inside scoring
  * but cannot FILTER on it.
  *
  * Positions in the posting blob are doc-local with the doc's kept
  * TITLE tokens occupying 1..T and body tokens T+1.. (Tokenizer.postings
  * rule). For two BODY terms the title offset T is common to both, so
  * position DIFFERENCES equal differences of 1-based body positions —
  * which is exactly what the DuckDB oracle computes from tokenization
  * truth.
  *
  * Plan shape: term-pushdown postings scan → ONE posting_entries decode
  * per blob (never a per-doc blob re-walk) → a (chunk, docId) equi
  * self-join of the two terms' entry sets (each side is that term's df,
  * the information floor) → the min pair distance as an array fold over
  * the two carried position arrays (O(tfA·tfB) per doc, bounded by doc
  * length — a projection, not a join).
  */
object Proximity {

  /** Docs where `a` and `b` occur within `within` positions
    * (unordered: min |posB - posA|; ordered: min (posB - posA) over
    * pairs with b AFTER a). Emits (chunk, docId, min_dist).
    */
  def nearDocs(spark: SparkSession, idxDir: String, a: String, b: String,
               within: Long, ordered: Boolean = false): DataFrame = {
    require(a != b, "proximity needs two distinct terms")
    require(within >= 1, "within must be >= 1")
    require(!a.startsWith("#") && !b.startsWith("#"),
      "proximity is a body-term operator (title terms have their own space)")
    val entries = IndexStore.readPostings(spark, idxDir).toDF()
      .filter(col("term").isin(a, b))
      .select(col("chunk"), col("term"),
        explode(GraftExpressions.posting_entries(col("df"), col("postingsBlob")))
          .as("e"))
      .select(col("chunk"), col("term"),
        col("e.docId").as("docId"), col("e.positions").as("pos"))
    val pa = entries.filter(col("term") === a)
      .select(col("chunk"), col("docId"), col("pos").as("pa"))
    val pb = entries.filter(col("term") === b)
      .select(col("chunk"), col("docId"), col("pos").as("pb"))
    val dists =
      if (ordered)
        flatten(transform(col("pa"),
          x => filter(transform(col("pb"), y => y - x), d => d >= 1L)))
      else
        flatten(transform(col("pa"),
          x => transform(col("pb"), y => abs(y - x))))
    pa.join(pb, Seq("chunk", "docId"))
      .select(col("chunk"), col("docId"), array_min(dists).as("min_dist"))
      // ordered: no b-after-a pair at all -> empty dists -> null min
      .filter(col("min_dist").isNotNull && col("min_dist") <= within)
  }
}
