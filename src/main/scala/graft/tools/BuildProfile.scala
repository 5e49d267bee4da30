package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.{IdDoc, IndexBuilder}

/** Stage-level timing of the index build on the bench corpus shape
  * (sfDir replicated by `factor`), isolating tokenize, the
  * shuffle+sort+encode aggregation, and the full persisted build:
  * `runMain graft.tools.BuildProfile [sfDir] [factor] [cores]`.
  * The deltas locate the throughput budget before any tuning work.
  */
object BuildProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(100)
    val cores = args.lift(2).map(_.toInt).getOrElse(4)
    val localDir = s"/dev/shm/graft-profile-$cores"
    new java.io.File(localDir).mkdirs()
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 16).toString)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      // bench-session parity: task-side commit (v2) — the v1 driver-side
      // rename loop is a serial term the FULL build above never pays
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the bench's own corpus expansion, so the decomposition measures
    // exactly the shape graft.Bench times
    val src = graft.Bench.replicated(spark, sfDir, factor)

    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name%-28s ${dt}%7.2f s")
      dt
    }

    val cfg = IndexBuilder.BuildConfig(chunkDocs = 30000L)
    time("warmup tokenize (cold JIT)") {
      IndexBuilder.tokens(src, cfg).filter($"term" === "zzz").count()
    }
    time("source materialize (no-op)") {
      src.toDF().select(lit(1)).count()
    }
    time("tokenize only") {
      IndexBuilder.tokens(src, cfg).filter($"term" === "zzz").count()
    }
    time("tokenize+shuffle+sort+encode") {
      IndexBuilder.buildPostingsSorted(IndexBuilder.tokens(src, cfg))
        .map(p => p.postingsBlob.length).filter(_ < 0).count()
    }
    time("grouped: tokenize only") {
      IndexBuilder.tokenGroups(src, cfg).filter($"term" === "zzz").count()
    }
    time("grouped: shuffle+sort+encode") {
      IndexBuilder.buildPostingsGrouped(IndexBuilder.tokenGroups(src, cfg))
        .map(p => p.postingsBlob.length).filter(_ < 0).count()
    }
    time("docs table (sha256+meta)") {
      IndexBuilder.buildDocs(src, cfg).filter($"docLength" < 0).count()
    }
    val out = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "graft_profile").toString
    time("FULL build (writes+stats)") {
      IndexBuilder.build(spark, src, out, cfg)
    }

    // phase decomposition of the grouped flow (mirrors build() exactly:
    // a FRESH build commits task-side under STATIC overwrite — dynamic
    // overwrite's driver-side per-partition rename loop is a resume-only
    // cost the full build above never pays, so timing the phases under it
    // would misattribute the throughput budget)
    val out2 = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "graft_profile2").toString
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    time("phase: postings encode+write") {
      IndexBuilder.buildPostingsGrouped(IndexBuilder.tokenGroups(src, cfg))
        .write.mode("overwrite").partitionBy("chunk")
        .parquet(IndexBuilder.postingsDir(out2))
    }
    time("phase: docs build+write") {
      IndexBuilder.buildDocs(src, cfg).repartition(col("chunk"))
        .write.mode("overwrite").partitionBy("chunk")
        .parquet(IndexBuilder.docsDir(out2))
    }
    val postingsR = graft.index.IndexStore.readPostings(spark, out2)
    val docsR = graft.index.IndexStore.readDocs(spark, out2)
    time("phase: stats") {
      IndexBuilder.buildStats(docsR, postingsR, cfg)
        .write.mode("overwrite").parquet(IndexBuilder.statsDir(out2))
    }
    time("phase: lineage aggs+write") {
      val pl = postingsR.toDF().groupBy($"chunk").agg(
        min($"term"), max($"term"), count(lit(1)), sum(length($"postingsBlob")))
      val dl = docsR.toDF().groupBy($"chunk").agg(
        min($"docId"), max($"docId"), count(lit(1)), sum($"docLength"))
      pl.collect(); dl.collect()
    }
    spark.stop()
  }
}
