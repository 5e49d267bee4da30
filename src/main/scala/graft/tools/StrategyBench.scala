package graft.tools

import org.apache.spark.sql.SparkSession
import graft.index.IndexBuilder

/** Interleaved A/B of build strategies at two core counts — strategy
  * comparisons on this steal-prone VM are only meaningful back-to-back
  * (runMain graft.tools.StrategyBench [sfDir] [factor] [rounds]).
  */
object StrategyBench {
  private def stealSec(): Double = graft.util.Host.stealSec()

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(100)
    val rounds = args.lift(2).map(_.toInt).getOrElse(2)

    def session(cores: Int): SparkSession = {
      val localDir = s"/dev/shm/graft-sb-$cores"
      new java.io.File(localDir).mkdirs()
      val s = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"graft-sb-$cores")
        .config("spark.sql.shuffle.partitions", math.max(cores * 4, 8).toString)
        .config("spark.local.dir", localDir)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    def rmTree(dir: String): Unit = graft.util.Host.rmTree(dir)

    def once(cores: Int, strategy: String): (Double, Double) = {
      val spark = session(cores)
      val src = graft.Bench.replicated(spark, sfDir, factor)
      val out = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "graft_sb").toString
      val s0 = stealSec()
      val t0 = System.nanoTime()
      IndexBuilder.build(spark, src, out,
        IndexBuilder.BuildConfig(chunkDocs = 30000, strategy = strategy))
      val dt = (System.nanoTime() - t0) / 1e9
      // -1 sentinel (unreadable /proc/stat) must not leak a garbage delta
      val sd = { val s1 = stealSec(); if (s0 < 0 || s1 < 0) -1.0 else s1 - s0 }
      spark.stop()
      rmTree(out)
      (dt, sd)
    }

    once(4, "grouped") // warmup, untimed
    for (r <- 1 to rounds; cores <- Seq(1, 4); strat <- Seq("grouped", "bychunk")) {
      val (dt, sd) = once(cores, strat)
      println(f"RESULT round=$r cores=$cores strategy=$strat sec=$dt%.2f steal=$sd%.2f")
    }
  }
}
