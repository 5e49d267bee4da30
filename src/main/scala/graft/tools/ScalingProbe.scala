package graft.tools

import org.apache.spark.sql.SparkSession
import graft.index.IndexBuilder

/** Minimal N-vs-4N scaling experiment: interleaved bychunk build trials
  * at two parallelism levels with per-trial /proc/stat steal, process-CPU
  * and GC accounting, WITHOUT the bench JSON machinery or the query phase
  * — for A/B-ing measurement models and JVM/Spark settings against the
  * scaling-efficiency criterion cheaply.
  *
  * Modes:
  *  - `local`   — local[N] vs local[4N]: one shared JVM (task threads
  *    scale, but JIT/GC/IO/compression helper threads are shared, so the
  *    N=1 run silently borrows extra cores — see the cpu= column);
  *  - `cluster` — local-cluster[N,1,mem] vs local-cluster[4N,1,mem]:
  *    real separate executor JVMs (own heap, GC, helper threads), the
  *    faithful sandbox analog of the north rule's N vs 4N EXECUTORS.
  *    Needs SPARK_HOME=/opt/spark so the standalone worker can launch
  *    executor processes.
  *
  *   SPARK_HOME=/opt/spark sbt -batch \
  *     "runMain graft.tools.ScalingProbe <sfDir> <factor> <trials> <nSmall> <mode>"
  */
object ScalingProbe {

  private def session(n: Int, mode: String): SparkSession = {
    val localDir = s"/dev/shm/graft-probe-$n"
    new java.io.File(localDir).mkdirs()
    val master =
      if (mode == "cluster") s"local-cluster[$n,1,4096]" else s"local[$n]"
    // A/B knobs for scaling experiments. Defaults MATCH graft.Bench's
    // BUILD sessions (cores*16 shuffle partitions, AQE coalescing off —
    // the CLAUDE.md bench invariant), so a default probe run measures
    // the same configuration the bench records; override the knobs to
    // A/B against alternatives.
    //  SPARK_GRAFT_PROBE_SHUFFLE_MULT — shuffle partitions = n * mult
    //  SPARK_GRAFT_PROBE_COALESCE    — AQE partition coalescing on/off
    //  SPARK_GRAFT_PROBE_IO_CODEC    — spark.io.compression.codec
    //    (shuffle/spill/broadcast payload; lz4 default vs zstd: bychunk's
    //    shuffle bytes == corpus bytes, so codec ratio is a direct lever
    //    on the memory-bandwidth term that bends this VM's N->4N curve)
    //  SPARK_GRAFT_PROBE_PARQUET_CODEC — spark.sql.parquet.compression.codec
    //    (index sink bytes; snappy default vs zstd)
    val shuffleMult = sys.env.getOrElse("SPARK_GRAFT_PROBE_SHUFFLE_MULT", "16").toInt
    val b = SparkSession.builder()
      .master(master)
      .appName(s"graft-probe-$n")
      .config("spark.sql.shuffle.partitions", math.max(n * shuffleMult, 8).toString)
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_COALESCE", "false"))
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_IO_CODEC", "lz4"))
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_PARQUET_CODEC", "snappy"))
      //  SPARK_GRAFT_PROBE_MAX_WRITERS — spark.sql.maxConcurrentOutputFileWriters
      //    (>0 lets the dynamic-partition write keep that many open
      //    writers instead of inserting a per-task SORT on the partition
      //    column; build tasks emit chunk-contiguous rows, so a handful
      //    of writers suffices and the write-side row buffering — the
      //    last full-materialization of the combined rows — disappears)
      .config("spark.sql.maxConcurrentOutputFileWriters",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_MAX_WRITERS", "0"))
      .config("spark.local.dir", localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      // task-side commit (v2): the v1 driver-side rename loop is a serial
      // term that grows with the chunk count (~20 ms/chunk measured)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        sys.env.getOrElse("SPARK_GRAFT_COMMITTER_V", "2"))
    if (mode == "cluster") {
      // executor JVMs need the app classes and the JDK17 module opens
      // (spark-submit injects them for the driver only)
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar"
      ).map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
      b.config("spark.executor.extraClassPath", "/root/repo/target/scala-2.13/classes")
        .config("spark.executor.extraJavaOptions", addOpens)
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def stealSec(): Double = graft.util.Host.stealSec()

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(300)
    val trials = args.lift(2).map(_.toInt).getOrElse(2)
    val small = args.lift(3).map(_.toInt).getOrElse(1)
    val mode = args.lift(4).getOrElse("local")
    val large = small * 4
    val chunkDocs = 30000L

    import scala.jdk.CollectionConverters._
    def gcMillis(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def procCpuSec(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime / 1e9
      case _ => -1.0
    }

    case class T(wall: Double, steal: Double, gc: Double, cpu: Double,
                 spin: Double = -1.0)
    def rmTree(dir: String): Unit = graft.util.Host.rmTree(dir)

    // SPARK_GRAFT_PROBE_STRATEGY — build strategy A/B (bychunk default;
    // "aligned" pairs the zero-exchange build with its chunk-aligned
    // corpus rendering, same docs/blobs — see Bench.replicatedAligned)
    val strategy = sys.env.getOrElse("SPARK_GRAFT_PROBE_STRATEGY", "bychunk")
    def buildIn(spark: SparkSession, tag: String): T = {
      val src =
        if (strategy == "aligned")
          graft.Bench.replicatedAligned(spark, sfDir, factor,
            spark.sparkContext.defaultParallelism * 16)
        else graft.Bench.replicated(spark, sfDir, factor)
      val out = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), s"graft_probe_$tag").toString
      val spin0 = graft.util.Host.spinSec()
      val (s0, g0, c0) = (stealSec(), gcMillis(), procCpuSec())
      val t0 = System.nanoTime()
      IndexBuilder.build(spark, src, out,
        IndexBuilder.BuildConfig(chunkDocs = chunkDocs, strategy = strategy))
      val wall = (System.nanoTime() - t0) / 1e9
      // -1 sentinel (unreadable /proc/stat) must not leak a garbage delta
      val sd = { val s1 = stealSec(); if (s0 < 0 || s1 < 0) -1.0 else s1 - s0 }
      val t = T(wall, sd, (gcMillis() - g0) / 1000.0, procCpuSec() - c0,
        math.min(spin0, graft.util.Host.spinSec()))
      rmTree(out)
      t
    }

    println(s"[probe] mode=$mode heap=${Runtime.getRuntime.maxMemory() / (1 << 20)} MiB " +
      s"factor=$factor trials=$trials n=$small/$large")
    def report(tag: String, t: T): Unit =
      println(f"[probe] $tag%-4s wall=${t.wall}%7.2f s steal=${t.steal}%7.2f s " +
        f"gc=${t.gc}%6.2f s driverCpu=${t.cpu}%7.2f s spin=${t.spin}%6.3f s")

    // one long-lived session per core count: executor JVMs stay warm
    // across the timed trials (JIT amortized, like real long-running
    // executors), warmup build untimed inside each
    def runLevel(n: Int): Seq[T] = {
      val spark = session(n, mode)
      buildIn(spark, s"warm$n")
      val out = (1 to trials).map { _ =>
        val t = buildIn(spark, s"n$n"); report(s"n$n", t); t
      }
      spark.stop()
      out
    }
    // SPARK_GRAFT_PROBE_ONLY_SMALL=1: just the small level (cheap A/B of
    // conf knobs on one core count, no efficiency pairing)
    val ts = runLevel(small)
    if (sys.env.contains("SPARK_GRAFT_PROBE_ONLY_SMALL")) {
      println(f"[probe] best n$small=${ts.minBy(_.wall).wall}%.2f s (only-small mode)")
      return
    }
    val tl = runLevel(large)
    val bs = ts.minBy(_.wall)
    val bl = tl.minBy(_.wall)
    val eff = bs.wall / (4.0 * bl.wall)
    println(f"[probe] best n$small=${bs.wall}%.2f s n$large=${bl.wall}%.2f s " +
      f"efficiency=$eff%.4f")
  }
}
