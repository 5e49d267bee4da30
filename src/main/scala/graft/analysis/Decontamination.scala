package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag (or drop) training documents that
  * share any n-gram with an evaluation/benchmark probe set — the
  * standard n-gram-collision decontamination rule of LLM data pipelines
  * (GPT-3 appendix-C / PaLM-style 8–13-gram overlap test).
  *
  * Scale shape: the probe side is benchmark-sized (10^4–10^7 grams,
  * far below corpus scale), so it is broadcast and the corpus side is
  * never wide-shuffled: per-row derived n-grams (the zero-shuffle
  * [[TextAnalysis.shingles]] projection) -> broadcast hash join ->
  * partial-aggregated per-doc hit counts (only MATCHED rows reach the
  * exchange). [[clean]] finishes with an anti join against the
  * contaminated-doc set — the reference's seen-set/except shape
  * (SURVEY.md §2.7 U3) applied to corpus hygiene; AQE broadcasts that
  * side when it is small (the common case: contamination is rare).
  */
object Decontamination {

  /** Deterministic pseudo-benchmark probe set derived from the corpus
    * itself — docs with doc_id % mod == 0 contribute their first
    * `perDoc` n-grams. Stands in for an external benchmark table in
    * tests/oracles (no external data in this sandbox); production calls
    * [[hits]]/[[clean]] with any one-column `gram` DataFrame.
    */
  def probeGrams(docs: DataFrame, n: Int, mod: Long = 37L,
                 perDoc: Int = 5): DataFrame =
    TextAnalysis.shingles(docs.filter(col("doc_id") % mod === 0), n)
      .filter(col("pos") <= perDoc)
      .select(col("shingle").as("gram"))
      .distinct()

  /** Contamination accounting: (doc_id, n_hits) for every document
    * containing at least one probe gram; n_hits counts DISTINCT probe
    * grams present (a doc repeating one leaked gram scores 1).
    *
    * `broadcastProbes = false` is the corpus-vs-corpus escape hatch for
    * probe sets too large to broadcast (decontaminating against another
    * training corpus rather than a benchmark): the same equi-join runs
    * as a shuffle join — the corpus side pays its one wide exchange by
    * gram. The probe side is distinct (one row per gram) so any hot key
    * comes from corpus-side df skew (stopword grams), which AQE's
    * skew-join splitting absorbs; results are identical by construction
    * (spec-pinned).
    */
  def hits(docs: DataFrame, probes: DataFrame, n: Int,
           broadcastProbes: Boolean = true): DataFrame = {
    val p = probes.select(col("gram")).distinct()
    TextAnalysis.shingles(docs, n)
      .join(if (broadcastProbes) broadcast(p) else p,
        col("shingle") === col("gram"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("shingle")).as("n_hits"))
  }

  /** The decontaminated corpus: doc_ids with zero probe-gram
    * collisions.
    */
  def clean(docs: DataFrame, probes: DataFrame, n: Int,
            broadcastProbes: Boolean = true): DataFrame =
    docs.join(hits(docs, probes, n, broadcastProbes), Seq("doc_id"), "left_anti")
      .select(col("doc_id"))
}
