package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.engine.{Bm25Engine, SearchEngine}
import graft.index.{IdDoc, IndexBuilder}

/** Benchmark protocol (BASELINE.md):
  *  1. index-build throughput (files/sec) for tokenize -> aggregate ->
  *     compress -> persist, on a deterministically replicated corpus
  *     (factor x the sfDir documents table — big enough to amortize job
  *     overhead so the scaling measurement reflects the pipeline);
  *  2. the same build at two parallelism levels: local[N/4] vs local[N]
  *     with spark.sql.shuffle.partitions scaled alike ->
  *     efficiency = throughput(4N) / (4 * throughput(N));
  *  3. query latency p50/p99 over the frozen reference query set
  *     (FIXTURES.md §7 remapped onto the corpus vocabulary) on the warm
  *     engine, plus BM25/WAND latencies.
  * Prints ONE JSON line.
  */
object Bench {
  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", math.max(cores, 4).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** factor-x deterministic replication: copy i shifts docIds by
    * i * 10^7 and rotates the commit, nothing else — same term
    * distribution, factor-x the rows.
    */
  private def replicated(spark: SparkSession, sfDir: String, factor: Int) = {
    import spark.implicits._
    val base = Corpus.fromDocumentsParquet(spark, sfDir)
    val copies = spark.range(factor).select($"id".as("copy"))
    base.toDF().crossJoin(copies)
      .select(($"docId" + $"copy" * 10000000L).as("docId"),
        $"repo", $"path", concat($"commit", lit("-"), $"copy").as("commit"),
        $"lang", $"content")
      .as[IdDoc]
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def buildOnce(cores: Int, sfDir: String, factor: Int,
                        chunkDocs: Long): (Double, Long, String) = {
    val spark = session(cores)
    val src = replicated(spark, sfDir, factor)
    val out = java.nio.file.Files.createTempDirectory(s"graft_bench_$cores").toString
    val files = src.count()
    val (_, dt) = timed {
      IndexBuilder.build(spark, src, out, IndexBuilder.BuildConfig(chunkDocs = chunkDocs))
    }
    spark.stop()
    (dt, files, out)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val small = math.max(1, cpus / 4)
    val factor = sys.env.getOrElse("SPARK_GRAFT_BENCH_FACTOR", "20").toInt
    val chunkDocs = sys.env.getOrElse("SPARK_GRAFT_CHUNK_DOCS", "30000").toLong
    val totalT0 = System.nanoTime()

    // --- build throughput at N/4 and N cores (same input, same job) ---
    val (dtSmall, files, outSmall) = buildOnce(small, sfDir, factor, chunkDocs)
    val (dtLarge, _, outLarge) = buildOnce(cpus, sfDir, factor, chunkDocs)
    val thrSmall = files / dtSmall
    val thrLarge = files / dtLarge
    val efficiency = thrLarge / ((cpus.toDouble / small) * thrSmall)

    // --- query latency on the warm large-core engine ---
    val spark = session(cpus)
    val engine = new SearchEngine(spark, outLarge, chunkCapacity = chunkDocs)
    val bm25 = new Bm25Engine(spark, outLarge)
    val refQueries = Seq(
      "spark merge sort",            // hidden AND
      "\"sort merge\"",              // phrase
      "spark join \"sort merge\"",   // AND + phrase
      "spark OR dup",                // OR
      "spark AND dup",               // explicit AND
      "(spark OR dup) join",         // nested
      "dup",                         // rare single term
      "spark")                       // common single term
    val bm25Queries = Seq(Seq("spark", "dup"), Seq("spark", "merge", "sort"), Seq("dup"))

    val perQuery = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val samples = scala.collection.mutable.ArrayBuffer.empty[Double]
    refQueries.foreach { q => engine.search(q) } // warmup
    refQueries.foreach { q =>
      val times = (1 to 5).map(_ => timed(engine.search(q))._2)
      samples ++= times
      perQuery(s"ref:$q") = times.sorted.apply(times.size / 2)
    }
    bm25Queries.foreach { t => bm25.searchTerms(t, 30, bm25.Or) }
    bm25Queries.foreach { t =>
      val times = (1 to 5).map(_ => timed(bm25.searchTerms(t, 30, bm25.Or))._2)
      samples ++= times
      perQuery(s"bm25:${t.mkString("+")}") = times.sorted.apply(times.size / 2)
    }
    val sortedS = samples.sorted
    def pct(p: Double) = sortedS(math.min(sortedS.size - 1, (p * sortedS.size).toInt))
    val p50 = pct(0.50)
    val p99 = pct(0.99)
    spark.stop()

    perQuery("build_files_per_sec") = math.rint(thrLarge * 100) / 100
    perQuery("query_p50_sec") = math.rint(p50 * 10000) / 10000
    perQuery("query_p99_sec") = math.rint(p99 * 10000) / 10000
    perQuery("scaling_efficiency") = math.rint(efficiency * 10000) / 10000

    val totalSec = (System.nanoTime() - totalT0) / 1e9
    val qs = perQuery.map { case (k, v) =>
      "\"" + k.replace("\"", "\\\"") + "\":" + f"$v%.4f" }.mkString("{", ",", "}")
    val extra =
      s""""build":{"files":$files,"sec_n${small}":${f"$dtSmall%.2f"},"sec_n${cpus}":${f"$dtLarge%.2f"},""" +
      s""""files_per_sec_n${small}":${f"$thrSmall%.1f"},"files_per_sec_n${cpus}":${f"$thrLarge%.1f"}},""" +
      s""""scaling":{"n_small":$small,"n_large":$cpus,"efficiency":${f"$efficiency%.4f"}},""" +
      s""""query_latency":{"p50_sec":${f"$p50%.4f"},"p99_sec":${f"$p99%.4f"},"samples":${sortedS.size}}"""
    println(s"""{"metric":"index-build files/sec @ local[$cpus] + query p50/p99 + N->4N scaling efficiency","value":${f"$thrLarge%.1f"},"unit":"files/sec","queries":$qs,"sf":"$sfDir",$extra,"total_sec":${f"$totalSec%.1f"}}""")
  }
}
