package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.Corpus
import graft.engine.{Federation, SearchEngine}
import graft.index.IndexBuilder

/** Latency A/B for the federated scatter: the same per-shard query
  * thunks run SEQUENTIALLY (the pre-round-4 driver loop) vs through
  * [[Federation.scatter]] (concurrent job submission), interleaved
  * per trial with per-trial /proc/stat steal so a steal burst cannot
  * masquerade as a speedup (memory/graft-env-gotchas.md rules: never
  * trust an un-interleaved A/B on this host). Prints per-trial rows and
  * clean-trial medians — the BASELINE.md "concurrent scatter" note.
  *
  *   sbt -batch "runMain graft.tools.FedScatterProbe <sfDir> [shards] [trials]"
  */
object FedScatterProbe {

  private def timed[A](body: => A): (Double, Double, A) = {
    val s0 = graft.util.Host.stealSec()
    val t0 = System.nanoTime()
    val r = body
    val wall = (System.nanoTime() - t0) / 1e9
    (wall, graft.util.Host.stealSec() - s0, r)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val nShards = if (args.length > 1) args(1).toInt else 3
    val trials = if (args.length > 2) args(2).toInt else 9

    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-fed-scatter-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.local.dir", "/dev/shm/graft-fedprobe")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft_fedprobe").toString
    val src = Corpus.fromDocumentsParquet(spark, sfDir).persist()
    val total = src.count()
    val per = (total + nShards - 1) / nShards
    val dirs = (0 until nShards).map { i =>
      val dir = s"$base/shard$i"
      val lo = i * per
      IndexBuilder.build(spark,
        src.filter(d => d.docId >= lo && d.docId < lo + per)
          .map(d => d.copy(docId = d.docId - lo)),
        dir, IndexBuilder.BuildConfig(chunkDocs = 100))
      dir
    }
    val engines = dirs.map(d => new SearchEngine(spark, d, 100))
    val queries = Seq("spark", "spark merge sort", "(spark OR dup) join")

    def tasks(q: String): Seq[() => Int] =
      engines.map(e => () => e.search(q).size)

    // warm every engine + JIT both paths
    queries.foreach { q => tasks(q).map(_()); Federation.scatter(tasks(q)) }

    final case class T(wall: Double, steal: Double) {
      def clean: Boolean = steal <= math.max(0.1, 0.05 * wall)
    }
    val seqT = collection.mutable.ArrayBuffer[T]()
    val parT = collection.mutable.ArrayBuffer[T]()
    (0 until trials).foreach { t =>
      val q = queries(t % queries.size)
      val order = if (t % 2 == 0) Seq("seq", "par") else Seq("par", "seq")
      order.foreach {
        case "seq" =>
          val (w, s, _) = timed(tasks(q).map(_()))
          seqT += T(w, s)
          println(f"trial=$t q='$q' mode=seq wall=$w%.3f steal=$s%.3f")
        case _ =>
          val (w, s, _) = timed(Federation.scatter(tasks(q)))
          parT += T(w, s)
          println(f"trial=$t q='$q' mode=par wall=$w%.3f steal=$s%.3f")
      }
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.size / 2)
    }
    val seqClean = seqT.filter(_.clean).map(_.wall).toSeq
    val parClean = parT.filter(_.clean).map(_.wall).toSeq
    println(f"RESULT shards=$nShards seq_median=${median(seqClean)}%.3f " +
      f"par_median=${median(parClean)}%.3f " +
      f"speedup=${median(seqClean) / median(parClean)}%.2f " +
      f"clean=${seqClean.size}/${seqT.size}+${parClean.size}/${parT.size}")
    src.unpersist()
    spark.stop()
  }
}
