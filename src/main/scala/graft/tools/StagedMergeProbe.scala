package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.Corpus
import graft.engine.SearchEngine
import graft.index.IndexBuilder

/** Staged-merge engagement probe: build a deliberately chunk-heavy index
  * (small chunkDocs) so the qualifying-chunk count clears
  * GraftConfig.StagedMergeChunks, then A/B the STAGED cross-chunk merge
  * (census + executor prune) against the plain full collect on the same
  * queries — interleaved with per-trial steal, medians over clean
  * trials, and result identity asserted every trial. Evidence that the
  * threshold default is sane: at the chunk count where staging engages,
  * it must not cost more than the collect it replaces.
  *
  *   sbt -batch "runMain graft.tools.StagedMergeProbe <sfDir> [chunkDocs] [trials]"
  */
object StagedMergeProbe {

  private def timed[A](body: => A): (Double, Double, A) = {
    val s0 = graft.util.Host.stealSec()
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, graft.util.Host.stealSec() - s0, r)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val chunkDocs = if (args.length > 1) args(1).toLong else 20L
    val trials = if (args.length > 2) args(2).toInt else 7

    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-staged-merge-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.local.dir", "/dev/shm/graft-stagedprobe")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft_staged_probe").toString
    val ids = Corpus.fromDocumentsParquet(spark, sfDir)
    IndexBuilder.build(spark, ids, dir,
      IndexBuilder.BuildConfig(chunkDocs = chunkDocs))
    val nChunks = graft.index.IndexStore.readStats(spark, dir)
      .select("chunk").distinct().count()
    println(s"index: $nChunks chunks at chunkDocs=$chunkDocs " +
      s"(threshold ${graft.config.GraftConfig.StagedMergeChunks})")

    // both engines on the cogroup plan (no doc broadcast) so the ONLY
    // difference is the merge path
    val staged = new SearchEngine(spark, dir, chunkDocs,
      broadcastDocsLimit = 0L, stagedChunkThreshold = 0)
    val plain = new SearchEngine(spark, dir, chunkDocs,
      broadcastDocsLimit = 0L, stagedChunkThreshold = Int.MaxValue)
    val queries = Seq("spark", "spark merge sort", "(spark OR dup) join")
    val want = queries.map { q => // warm + cross-engine identity
      val a = staged.search(q); val b = plain.search(q)
      require(a == b, s"staged != plain on [$q]")
      require(a.nonEmpty, s"degenerate probe query [$q]")
      q -> a
    }.toMap

    final case class T(wall: Double, steal: Double) {
      def clean: Boolean = steal <= math.max(0.1, 0.05 * wall)
    }
    val sT = collection.mutable.ArrayBuffer[T]()
    val pT = collection.mutable.ArrayBuffer[T]()
    (0 until trials).foreach { t =>
      val q = queries(t % queries.size)
      val order = if (t % 2 == 0) Seq(true, false) else Seq(false, true)
      order.foreach { isStaged =>
        val eng = if (isStaged) staged else plain
        val (w, s, r) = timed(eng.search(q))
        require(r == want(q), // identity vs the warm-up truth, every trial
          s"${if (isStaged) "staged" else "plain"} diverged on [$q]")
        (if (isStaged) sT else pT) += T(w, s)
        println(f"trial=$t q='$q' mode=${if (isStaged) "staged" else "plain "} " +
          f"wall=$w%.3f steal=$s%.3f")
      }
    }
    def med(xs: Seq[Double]) = { val s = xs.sorted; s(s.size / 2) }
    val sm = med(sT.filter(_.clean).map(_.wall).toSeq)
    val pm = med(pT.filter(_.clean).map(_.wall).toSeq)
    println(f"RESULT chunks=$nChunks staged_median=$sm%.3f plain_median=$pm%.3f " +
      f"ratio=${sm / pm}%.2f clean=${sT.count(_.clean)}/${sT.size}+${pT.count(_.clean)}/${pT.size}")
    spark.stop()
  }
}
