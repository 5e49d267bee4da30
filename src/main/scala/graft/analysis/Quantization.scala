package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQ8-style scalar quantization for the embedding store — the classic
  * vector-database compression step (FAISS `SQ8`, pgvector `halfvec`/
  * int8 lineage): each dimension's values are linearly mapped onto
  * `levels` integer codes inside the corpus-wide per-dimension envelope
  * [vmin_d, vmax_d], shrinking a float32 store 4x so far more of the
  * corpus fits executor memory at query time; queries score
  * ASYMMETRICALLY (raw query vector vs midpoint-dequantized corpus
  * vectors — the ADC trick), trading a bounded reconstruction error for
  * the memory win.
  *
  * Scale shape: the envelope is one partial-agg groupBy over exploded
  * dims (shuffle = tasks x d rows, result d rows — driver-tiny like
  * IvfStore's centroids); code/reconstruction are ZERO-SHUFFLE per-row
  * projections against the envelope re-broadcast as array literals
  * (`transform` with index over the embedding array); quantized top-k is
  * the same scan -> project -> TakeOrdered plan as
  * [[Similarity.bruteForceTopK]].
  *
  * Cross-engine determinism: codes are floor() over per-dim scalar IEEE
  * arithmetic written in the same operation order as the DuckDB twin
  * (no summations, so no reassociation risk); reconstructed values are
  * rounded to 6 dp BEFORE any dot product (the hardNegatives centroid
  * lesson), and cosine summation-order noise is absorbed by the final
  * round(…, 6) exactly as in the other ANN oracles.
  */
object Quantization {

  /** Corpus-wide per-dimension envelope (dim 1-based, vmin, vmax). */
  def dimStats(emb: DataFrame): DataFrame =
    Similarity.explodeDims(emb)
      .groupBy(col("dim").cast("long").as("dim"))
      .agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))

  /** The envelope collected to the driver (d rows — tiny by
    * construction, like IvfStore.loadCentroids), dim-ordered.
    */
  private def envelope(emb: DataFrame): (Seq[Double], Seq[Double]) = {
    val rows = dimStats(emb).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    (rows.map(_._2).toSeq, rows.map(_._3).toSeq)
  }

  /** (vec_id, codes array<long>, recon array<double>):
    * code_d  = floor((v - vmin_d) * levels / (vmax_d - vmin_d)) clamped
    *           to levels-1 (v == vmax_d lands on the clamp; a degenerate
    *           dimension vmin_d == vmax_d codes to 0),
    * recon_d = vmin_d + (code_d + 0.5) * (vmax_d - vmin_d) / levels
    *           (midpoint dequantization), rounded to 6 dp.
    * One projection over the scan — no joins, no shuffles.
    */
  def quantize(emb: DataFrame, levels: Int = 256): DataFrame = {
    require(levels > 1, "levels must be > 1")
    val (vmin, vmax) = envelope(emb)
    val lo = typedLit(vmin)
    val hi = typedLit(vmax)
    val codes = transform(Similarity.vecD(col("embedding")), (x, i) => {
      val l = element_at(lo, i + 1)
      val h = element_at(hi, i + 1)
      when(h === l, lit(0L))
        .otherwise(least(floor((x - l) * levels / (h - l)), lit(levels - 1L)))
        .cast("long")
    })
    val recon = (cs: org.apache.spark.sql.Column) => transform(cs, (c, i) => {
      val l = element_at(lo, i + 1)
      val h = element_at(hi, i + 1)
      round(l + (c.cast("double") + 0.5d) * (h - l) / levels, 6)
    })
    Similarity.nonDegenerate(emb)
      .select(col("vec_id"), codes.as("codes"))
      .select(col("vec_id"), col("codes"), recon(col("codes")).as("recon"))
  }

  /** Oracle-facing exploded view: (vec_id, dim 1-based, code, recon). */
  def quantizeExploded(emb: DataFrame, levels: Int = 256): DataFrame =
    quantize(emb, levels)
      .select(col("vec_id"), posexplode(arrays_zip(col("codes"), col("recon"))))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
        col("col").getField("codes").as("code"),
        col("col").getField("recon").as("recon"))

  /** Asymmetric quantized top-k (ADC): the RAW query vector scores the
    * midpoint-RECONSTRUCTED corpus vectors by cosine — the production
    * shape where only the compressed store is resident. Same
    * zero-shuffle scan -> project -> TakeOrdered plan as the exact
    * brute force; its result is the recall benchmark against
    * [[Similarity.bruteForceTopK]].
    */
  def quantizedTopK(emb: DataFrame, queryId: Long, k: Int,
                    levels: Int = 256): DataFrame = {
    val q = AnnStore.vectorOf(emb, queryId)
    val nq = math.sqrt(q.map(x => x * x).sum)
    val qlit = typedLit(q.toSeq)
    quantize(emb, levels)
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"),
        round(Similarity.dotCol(col("recon"), qlit) /
          (Similarity.normCol(col("recon")) * lit(nq)), 6).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  // --------------------------------------------------------------------
  // Product quantization (PQ) — the other classic FAISS compression:
  // the d-dim space is cut into m contiguous subspaces of d/m dims; each
  // subspace gets its own small k-means codebook (trained with the same
  // deterministic Lloyd machinery as Clustering: seeds = the subvectors
  // of the k smallest vec_ids, per-row argmin assignment, partial-agg
  // re-centering), and a vector compresses to m small codes (m=4, k=8:
  // 256 float bytes -> 4 codes). Queries score with the ADC trick —
  // per-subspace lookup tables <q_sub, centroid> computed once on the
  // driver, so scoring a vector is m table lookups, never a d-dim dot.
  //
  // Scale shape: training shuffles numPartitions x m x k x (d/m) partial
  // sums per Lloyd step (independent of N, like Clustering.updateStats);
  // encoding and ADC top-k are ZERO-SHUFFLE per-row projections against
  // broadcast-literal codebooks/LUTs.
  //
  // Cross-engine determinism: re-centered codebook values are rounded to
  // 6 dp on BOTH engines before any distance/LUT math (HALF_UP == DuckDB
  // round), so the argmin and the lookups see identical inputs; the
  // final cosine round(…, 6) absorbs summation-order ulp drift exactly
  // as in the other ANN oracles.
  // --------------------------------------------------------------------

  /** Per-subspace code assignment as ONE per-row projection: element s
    * of the result array is the argmin codebook id for the vector's
    * s-th subvector (ties to the lowest id — Clustering.bestStructIds).
    */
  private[analysis] def pqAssignArray(m: Int, dsub: Int,
                            books: Seq[Seq[(Long, Array[Double])]]): org.apache.spark.sql.Column =
    array((0 until m).map { s =>
      Clustering.bestStructIds(
        slice(col("embedding"), s * dsub + 1, dsub), books(s)).getField("j")
    }: _*)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Train the m per-subspace codebooks: seeds = the k smallest
    * vec_ids' subvectors (cid = seed rank, [[Clustering.seedCentroids]]
    * convention), then `iters` Lloyd steps — assignment is the per-row
    * argmin projection above (zero shuffles), re-centering is ONE
    * posexplode -> partial-agg job per step whose exchange carries
    * numPartitions x m x k x dsub partial sums (independent of N).
    * Clusters that lose every member drop out, mirroring the SQL
    * oracle's mean CTE; surviving means are rounded to 6 dp (HALF_UP ==
    * DuckDB round) so both engines train bit-identical codebooks.
    */
  def pqCodebooks(emb: DataFrame, m: Int, k: Int,
                  iters: Int = 1): Seq[Seq[(Long, Array[Double])]] = {
    val seeds = Clustering.seedCentroids(emb, k)
    val d = seeds.head.length
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    val dsub = d / m
    var books: Seq[Seq[(Long, Array[Double])]] =
      (0 until m).map { s =>
        seeds.toSeq.zipWithIndex.map { case (v, j) =>
          (j.toLong, v.slice(s * dsub, (s + 1) * dsub)) }
      }
    (1 to iters).foreach { _ =>
      // two selects: the argmin-struct getField must resolve before the
      // generator select (same Catalyst caveat as Clustering.updateStats)
      val means = Similarity.nonDegenerate(emb)
        .select(col("embedding"), pqAssignArray(m, dsub, books).as("asg"))
        .select(col("asg"), posexplode(Similarity.vecD(col("embedding"))))
        .select(floor(col("pos") / dsub).cast("long").as("sub"),
          element_at(col("asg"), (floor(col("pos") / dsub) + 1).cast("int")).as("cluster"),
          (col("pos") % dsub).cast("long").as("dimw"), col("col").as("x"))
        .groupBy(col("sub"), col("cluster"), col("dimw"))
        .agg(avg(col("x")).as("mn"))
        .collect()
      books = (0 until m).map { s =>
        means.filter(_.getLong(0) == s).groupBy(_.getLong(1)).toSeq.sortBy(_._1)
          .map { case (cid, rows) =>
            val c = new Array[Double](dsub)
            rows.foreach(r => c(r.getLong(2).toInt) = round6(r.getDouble(3)))
            (cid, c)
          }
      }
    }
    books
  }

  /** Oracle-facing exploded encoding: (vec_id, sub 0-based, code). The
    * encoding itself is one zero-shuffle projection (m argmin folds over
    * array slices against broadcast-literal codebooks).
    */
  def pqCodes(emb: DataFrame, m: Int = 4, k: Int = 8,
              iters: Int = 1): DataFrame = {
    val books = pqCodebooks(emb, m, k, iters)
    val dsub = books.head.head._2.length
    Similarity.nonDegenerate(emb)
      .select(col("vec_id"), pqAssignArray(m, dsub, books).as("codes"))
      .select(col("vec_id"), posexplode(col("codes")))
      .select(col("vec_id"), col("pos").cast("long").as("sub"),
        col("col").as("code"))
  }

  /** Asymmetric-distance (ADC) PQ top-k: cosine of the RAW query vector
    * against each vector's codebook reconstruction, computed entirely
    * from per-subspace lookup tables — dot = sum_s LUT_dot[s][code_s],
    * |recon|^2 = sum_s LUT_n2[s][code_s] (subspaces are orthogonal
    * coordinate blocks, so norms add). LUTs are m x k driver doubles
    * shipped as literals; the plan is the same zero-shuffle
    * scan -> project -> TakeOrdered as [[Similarity.bruteForceTopK]],
    * with the d-dim dot replaced by m lookups.
    */
  def pqTopK(emb: DataFrame, queryId: Long, k: Int, m: Int = 4,
             kCents: Int = 8, iters: Int = 1): DataFrame = {
    val books = pqCodebooks(emb, m, kCents, iters)
    val dsub = books.head.head._2.length
    val q = AnnStore.vectorOf(emb, queryId)
    Similarity.nonDegenerate(emb)
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), pqAssignArray(m, dsub, books).as("codes"))
      .select(col("vec_id"), adcCosine(col("codes"), books, q).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** The ADC cosine as one codegen'd column over a `codes` array:
    * dot = sum_s LUT_dot[s][code_s], |recon|^2 = sum_s LUT_n2[s][code_s],
    * both LUTs m x k driver doubles shipped as literals (indexed by
    * seed-rank cid; a dropped cluster keeps a 0.0 slot that no emitted
    * code ever references). Shared by [[pqTopK]] and the persisted
    * [[IvfPqStore]]'s probe path. Rounded to 6 dp like every cosine
    * oracle.
    */
  private[analysis] def adcCosine(codes: org.apache.spark.sql.Column,
                                  books: Seq[Seq[(Long, Array[Double])]],
                                  q: Array[Double]): org.apache.spark.sql.Column = {
    val m = books.length
    val dsub = books.head.head._2.length
    require(q.length == m * dsub, s"query dim ${q.length} != ${m * dsub}")
    val slots = (books.flatMap(_.map(_._1)).max + 1).toInt
    val nq = math.sqrt(q.map(x => x * x).sum)
    def lut(f: (Int, Array[Double]) => Double): Seq[Seq[Double]] =
      (0 until m).map { s =>
        val t = Array.fill(slots)(0.0)
        books(s).foreach { case (cid, c) => t(cid.toInt) = f(s, c) }
        t.toSeq
      }
    val dotLit = typedLit(lut((s, c) =>
      (0 until dsub).map(i => c(i) * q(s * dsub + i)).sum))
    val n2Lit = typedLit(lut((_, c) => c.map(x => x * x).sum))
    def lookAt(l: org.apache.spark.sql.Column, s: Int) =
      element_at(element_at(l, s + 1),
        (element_at(codes, s + 1) + 1).cast("int"))
    val dot = (0 until m).map(s => lookAt(dotLit, s)).reduce(_ + _)
    val n2 = (0 until m).map(s => lookAt(n2Lit, s)).reduce(_ + _)
    round(dot / (sqrt(n2) * lit(nq)), 6)
  }
}
