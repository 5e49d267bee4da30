package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.index._

/** Stage-level profiling of the full index build (temporary tool).
  * Usage: SPARK_GRAFT_CPUS=8 SPARK_GRAFT_BENCH_FACTOR=60 runMain ...
  */
object BuildProfile {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val factor = sys.env.getOrElse("SPARK_GRAFT_BENCH_FACTOR", "60").toInt
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", (cores * 2).toString)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] n$cores $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val t00 = System.nanoTime()
    val base = Corpus.fromDocumentsParquet(spark, "/root/testdata/sf0.1")
    val copies = spark.range(factor).select($"id".as("copy"))
    val src = base.toDF().crossJoin(copies)
      .select(($"docId" + $"copy" * 10000000L).as("docId"),
        $"repo", $"path", concat($"commit", lit("-"), $"copy").as("commit"),
        $"lang", $"content").as[IdDoc]
    val out = java.nio.file.Files.createTempDirectory("prof").toString
    val cfg = IndexBuilder.BuildConfig(chunkDocs = 30000)

    val postings = IndexBuilder.buildPostings(IndexBuilder.tokens(src, cfg), cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val docRows = IndexBuilder.buildDocs(src, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("docs write")(docRows.write.mode(SaveMode.Overwrite).partitionBy("chunk").parquet(IndexBuilder.docsDir(out)))
    timed("postings write")(postings.write.mode(SaveMode.Overwrite).partitionBy("chunk").parquet(IndexBuilder.postingsDir(out)))
    timed("stats") {
      IndexBuilder.buildStats(IndexStore.readDocs(spark, out), IndexStore.readPostings(spark, out), cfg)
        .write.mode(SaveMode.Overwrite).parquet(IndexBuilder.statsDir(out))
    }
    timed("lineage aggregates") {
      val pl = postings.groupBy($"chunk").agg(count(lit(1))).collect()
      val dl = docRows.groupBy($"chunk").agg(count(lit(1))).collect()
      (pl, dl)
    }
    println(f"[profile] n$cores TOTAL                      ${(System.nanoTime() - t00) / 1e9}%8.2f s")
    spark.stop()
  }
}
