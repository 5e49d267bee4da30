package graft.tools

/** Minimal N-vs-4N scaling experiment: interleaved bychunk build trials
  * at two core counts with per-trial /proc/stat steal, WITHOUT the bench
  * JSON machinery or the query phase — for A/B-ing JVM/Spark settings
  * (heap size, GC, shuffle partitions) against the scaling-efficiency
  * criterion cheaply.
  *
  *   SPARK_DRIVER_MEM=24g sbt -batch \
  *     "runMain graft.tools.ScalingProbe <sfDir> <factor> <trials> <nSmall>"
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(300)
    val trials = args.lift(2).map(_.toInt).getOrElse(2)
    val small = args.lift(3).map(_.toInt).getOrElse(1)
    val large = small * 4
    val chunkDocs = 30000L

    println(s"[probe] heap=${Runtime.getRuntime.maxMemory() / (1 << 20)} MiB " +
      s"factor=$factor trials=$trials cores=$small/$large")
    // untimed JIT/classload warmup (same as Bench)
    val warm = graft.Bench.buildOnce(large, sfDir, 1, chunkDocs)._1
    def report(tag: String, t: graft.Bench.Trial): Unit =
      println(f"[probe] $tag%-4s wall=${t.sec}%7.2f s steal=${t.steal}%7.2f s clean=${t.clean}")
    val ts = Seq.newBuilder[graft.Bench.Trial]
    val tl = Seq.newBuilder[graft.Bench.Trial]
    (1 to trials).foreach { _ =>
      val a = graft.Bench.buildOnce(small, sfDir, factor, chunkDocs)._1
      report(s"n$small", a); ts += a
      val b = graft.Bench.buildOnce(large, sfDir, factor, chunkDocs)._1
      report(s"n$large", b); tl += b
    }
    val bs = ts.result().minBy(_.sec)
    val bl = tl.result().minBy(_.sec)
    val eff = bs.sec / (4.0 * bl.sec)
    println(f"[probe] best n$small=${bs.sec}%.2f s (clean=${bs.clean}) " +
      f"n$large=${bl.sec}%.2f s (clean=${bl.clean}) efficiency=$eff%.4f")
    val _ = warm
  }
}
