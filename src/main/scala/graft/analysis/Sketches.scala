package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable sketch operators. Unlike HyperLogLog (whose register layout
  * differs engine to engine, so `approx_count_distinct` can never be
  * oracle-checked), KMV — the K-Minimum-Values distinct-count sketch of
  * Bar-Yossef et al. — is DEFINED by an order statistic: keep the k
  * smallest distinct hash values; the k-th smallest estimates the
  * distinct count as (k-1)/fraction-of-hash-space. Any engine that
  * computes the same hash computes the same sketch bit for bit, which
  * makes it the one distinct-count sketch a DuckDB oracle can replay
  * exactly.
  */
object Sketches {

  /** Hash-space modulus (2^31 - 1). Hash values land in [1, P]. */
  val P: Long = 2147483647L

  /** Engine-portable string hash: a 31x polynomial fold over the
    * term's character codes mod P, then one multiplicative mix. Pure
    * bounded integer arithmetic (max intermediate < 2^63) so DuckDB
    * replays it exactly — the md5->int alternative needs hex-to-integer
    * conversions that differ across engines. The `filter(length > 0)`
    * drops the trailing empty string Java's `split("")` keeps under
    * Spark's limit=-1 (DuckDB's `string_split` never emits it).
    */
  private[graft] def portableTermHash(term: Column): Column = {
    val chars = filter(split(term, ""), c => length(c) > 0)
    val folded = aggregate(chars, lit(0L),
      (h, c) => (h * 31 + ascii(c)) % P)
    (folded * 2654435761L) % P + 1
  }

  /** Per-language distinct-term estimate via a KMV sketch of size k.
    *
    * Output: `(lang, n_kept, kth_h, est_distinct)` where `n_kept` =
    * min(k, distinct hashes), `kth_h` = the n_kept-th smallest hash,
    * and `est_distinct` = (k-1) * 2^31 / kth_h when the sketch is full,
    * or the exact count when fewer than k distinct values exist (the
    * standard KMV exact-below-k rule). Rounded to 4 dp.
    *
    * Plan shape: tokens explode with `lang` carried from the same row —
    * no join back to the documents table. The first `distinct` is the
    * only corpus-sized exchange and its OUTPUT is vocabulary-sized (the
    * same information floor as any df computation); everything after —
    * the hash projection, the per-language rank window, the final
    * aggregate — runs over distinct (lang, hash) rows, i.e. vocabulary
    * rows, never corpus rows. Two terms colliding to one hash collapse
    * to one sketch entry in BOTH engines (hash-multiset semantics), so
    * collisions cost a little estimator accuracy, never determinism.
    */
  def kmvDistinct(docs: DataFrame, k: Int): DataFrame = {
    require(k > 1, "k must be > 1")
    val dt = docs
      .select(col("lang"), explode(TextAnalysis.keptTokens(col("text"))).as("tok"))
      .select(col("lang"), lower(col("tok")).as("term"))
      .distinct()
    val hs = dt.select(col("lang"), portableTermHash(col("term")).as("h")).distinct()
    val w = Window.partitionBy(col("lang")).orderBy(col("h"))
    hs.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_h"))
      .select(col("lang"), col("n_kept"), col("kth_h"),
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble * 2147483648.0) / col("kth_h")), 4)
          .as("est_distinct"))
  }

  /** Row-r Count-Min hash column: the same polynomial fold as
    * [[portableTermHash]] with the row index folded in BEFORE the
    * multiplicative mix (so the d rows are d genuinely different hash
    * functions, not d rotations of one), reduced to a column index in
    * [0, width). All intermediates stay below 2^63 (fold < 2^31,
    * + r*131 tiny, mix constant ~2^31.3), so DuckDB replays it exactly.
    */
  private[graft] def cmsCol(term: Column, row: Column, width: Int): Column = {
    val chars = filter(split(term, ""), c => length(c) > 0)
    val folded = aggregate(chars, lit(0L),
      (h, c) => (h * 31 + ascii(c)) % P)
    (((folded + row * 131L) % P * 2654435761L) % P + 1L) % width
  }

  /** Count-Min sketch (Cormode & Muthukrishnan) of corpus term
    * frequencies: a `depth` x `width` grid of counters where
    * `counter(r, c)` = Σ tf over terms whose row-r hash lands in column
    * c. Point estimates (see [[cmsEstimate]]) take the min over rows and
    * can only OVER-estimate — the sketch never undercounts.
    *
    * Output: `(row, col, counter)` — the full grid, every cell exactly
    * reproducible by any engine computing the same hash (the reason this
    * sketch is driver-checkable while an engine's built-in
    * `approx_count_distinct` registers never are).
    *
    * Plan shape: tokens collapse to the per-term tf table first (ONE
    * corpus-sized exchange, vocabulary-sized output — the information
    * floor shared with any df/tf computation); the depth-way fan-out and
    * the (row, col) grid aggregation then run over vocab-sized rows, and
    * the grid itself is depth·width rows — constant-sized, mergeable by
    * cell-wise sum across corpus shards, which is the whole point of a
    * CMS at 100 TB: a bounded summary that a later pass (or a stream)
    * can keep adding to.
    */
  def cmsCounters(docs: DataFrame, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 1, "depth must be > 0, width > 1")
    val tf = docs
      .select(explode(TextAnalysis.keptTokens(col("text"))).as("tok"))
      .select(lower(col("tok")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("tf"))
    tf.select(col("term"), col("tf"),
        explode(sequence(lit(0L), lit(depth - 1L))).as("row"))
      .select(col("row"), cmsCol(col("term"), col("row"), width).as("col"),
        col("tf"))
      .groupBy(col("row"), col("col"))
      .agg(sum(col("tf")).as("counter"))
  }

  /** Point-query the CMS grid for `probes`: est_tf = min over rows of
    * the counter each probe hashes to (0 when the cell is empty — the
    * term never occurred and nothing collided into its cells), beside
    * the exact tf so the one-sided error (`est_tf >= tf`, equality when
    * no collision) is visible in the output. The grid side of the join
    * is depth·width rows — broadcast — and the probe side is |probes|
    * rows; nothing corpus-sized moves.
    */
  def cmsEstimate(docs: DataFrame, depth: Int, width: Int,
                  probes: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val grid = cmsCounters(docs, depth, width)
    val cells = probes.toDF("term")
      .select(col("term"), explode(sequence(lit(0L), lit(depth - 1L))).as("row"))
      .select(col("term"), col("row"), cmsCol(col("term"), col("row"), width).as("col"))
      .join(broadcast(grid), Seq("row", "col"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("counter"), lit(0L))).as("est_tf"))
    val exact = docs
      .select(explode(TextAnalysis.keptTokens(col("text"))).as("tok"))
      .select(lower(col("tok")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("tf"))
    cells.join(exact, Seq("term"), "left")
      .select(col("term"), col("est_tf"),
        coalesce(col("tf"), lit(0L)).as("true_tf"))
  }

  /** HyperLogLog register grid (Flajolet et al.) over per-language
    * distinct terms — the industry-standard distinct sketch beside the
    * KMV above, here with ENGINE-PORTABLE registers: bucket = the hash's
    * low log2(m) bits, rank = leading zeros + 1 of the remaining
    * `wBits = 31 - log2(m)` bits, computed via `length(bin(w))` (an
    * integer identity both Spark and DuckDB expose — never a float
    * log2). Output `(lang, bucket, reg)`, exact integers, mergeable
    * across corpus shards by cell-wise MAX — the bounded-summary
    * property that makes HLL the 100 TB distinct counter (m cells per
    * group vs KMV's k full hash values).
    *
    * Plan shape: the one corpus-sized exchange is the (lang, term)
    * distinct (the information floor); hashing and bucket/rank are
    * per-row projections and the register groupBy runs over
    * vocabulary-sized rows into an m-bounded grid.
    */
  def hllRegisters(docs: DataFrame, m: Int): DataFrame = {
    require(m > 1 && (m & (m - 1)) == 0 && m <= 4096,
      "m must be a power of two in (1, 4096]")
    val wBits = 31 - Integer.numberOfTrailingZeros(m)
    docs
      .select(col("lang"), explode(TextAnalysis.keptTokens(col("text"))).as("tok"))
      .select(col("lang"), lower(col("tok")).as("term"))
      .distinct()
      .select(col("lang"), portableTermHash(col("term")).as("h"))
      .select(col("lang"), (col("h") % m).as("bucket"),
        expr(s"h div $m").as("w"))
      .select(col("lang"), col("bucket"),
        when(col("w") === 0, lit(wBits + 1L))
          .otherwise(lit(wBits.toLong) - length(bin(col("w"))) + 1L)
          .cast("long").as("rank"))
      .groupBy(col("lang"), col("bucket"))
      .agg(max(col("rank")).as("reg"))
  }

  /** The HLL estimate from the register grid: harmonic mean
    * `est_raw = alpha_m * m^2 / (Σ 2^-reg + zeros)` (absent buckets
    * contribute 2^0 = 1 each), with the standard linear-counting
    * correction `m * ln(m / zeros)` when est_raw <= 2.5m and empty
    * buckets remain. Determinism note: every 2^-reg term is a dyadic
    * rational exactly representable in a double and the sum's value
    * needs < 53 mantissa bits at m <= 4096, so the Σ is EXACT in both
    * engines regardless of order; the remaining float ops are
    * single-rounded identical-operand operations, rounded to 4 dp on
    * both sides (the KMV convention).
    */
  def hllEstimate(docs: DataFrame, m: Int): DataFrame = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val zeros = lit(m.toLong) - col("n_set")
    val estRaw = lit(alpha) * m * m /
      (col("s_set") + zeros.cast("double"))
    hllRegisters(docs, m)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_set"),
        sum(pow(lit(2.0), -col("reg"))).as("s_set"))
      .select(col("lang"), col("n_set"), zeros.as("zeros"),
        round(estRaw, 4).as("est_raw"),
        round(when(estRaw <= 2.5 * m && zeros > 0,
            log(lit(m.toDouble) / zeros.cast("double")) * m)
          .otherwise(estRaw), 4).as("est_distinct"))
  }
}
