package graft.analysis

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Element-wise vector aggregation as ONE typed partial aggregate — the
  * mean-pooling primitive behind repo/author/cluster-level embeddings
  * (and the k-means update step): buffer = (running element sums, row
  * count), reduce = fold a member in map-side, merge = element-wise add
  * of two buffers. Because the Aggregator partial-aggregates BEFORE the
  * exchange, the shuffle carries ONE d-double buffer per (partition,
  * group) — versus the posexplode formulation's N·d exploded rows
  * (`Clustering.updateStats` keeps that shape as the oracle twin; this
  * is the 10^9-vector path; VectorAggSpec pins the plan has a partial
  * aggregate, not a row explode).
  *
  * Dimension contract: every vector in a group must share the first-seen
  * length — silent truncation/padding would corrupt centroids, so a
  * mismatch throws. Empty vectors are rejected the same way.
  */
object VectorAgg {

  /** (element sums, member count). */
  type Buf = (Array[Double], Long)

  private def addInto(acc: Array[Double], v: Seq[Double]): Array[Double] =
    if (acc.isEmpty) v.toArray
    else {
      require(acc.length == v.length,
        s"VectorAgg: dimension mismatch (${acc.length} vs ${v.length})")
      var i = 0
      while (i < acc.length) { acc(i) += v(i); i += 1 }
      acc
    }

  /** Typed (sum, count) aggregator over (group, vector) rows — the input
    * type matches the grouped dataset element so `.agg` composes with
    * `groupByKey(_._1)` directly.
    */
  class SumCount extends Aggregator[(String, Seq[Double]), Buf, (Seq[Double], Long)] {
    def zero: Buf = (Array.emptyDoubleArray, 0L)
    def reduce(b: Buf, row: (String, Seq[Double])): Buf = {
      val v = row._2
      require(v.nonEmpty, "VectorAgg: empty vector")
      (addInto(b._1, v), b._2 + 1)
    }
    def merge(a: Buf, b: Buf): Buf =
      if (a._1.isEmpty) b
      else if (b._1.isEmpty) a
      else (addInto(a._1, b._1.toSeq), a._2 + b._2)
    def finish(b: Buf): (Seq[Double], Long) = (b._1.toSeq, b._2)
    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[(Seq[Double], Long)] =
      Encoders.product[(Seq[Double], Long)]
  }

  /** Mean-pooled centroid per group: (group, n_vecs, centroid) with the
    * centroid components rounded to `scale` dp (HALF_UP — the oracle
    * convention, so both engines emit identical doubles). Degenerate
    * (empty) embeddings are dropped before grouping.
    */
  def groupCentroids(emb: DataFrame, groupExpr: Column,
                     scale: Int = 6): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val typed = emb
      .filter(size(col("embedding")) > 0)
      .select(groupExpr.cast("string").as("g"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .as[(String, Seq[Double])]
    typed.groupByKey(_._1)
      .agg(new SumCount().toColumn.name("sc"))
      .map { case (g, (sums, n)) =>
        val mean = sums.map(x => BigDecimal(x / n)
          .setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble)
        (g, n, mean)
      }
      .toDF("group", "n_vecs", "centroid")
  }
}
