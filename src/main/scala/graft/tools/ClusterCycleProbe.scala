package graft.tools

import org.apache.spark.sql.SparkSession

/** Reproduction probe for sequential local-cluster sessions in one JVM
  * (the graft.Bench scaling phase's lifecycle). Cycles
  * local-cluster[4] -> [1] -> [4] with the bench's executor settings and
  * prints a marker per cycle; a hang on the second cycle reproduces the
  * "requires more resource than any of Workers could have" stall seen in
  * the full-protocol bench run.
  *
  *   sbt -batch "runMain graft.tools.ClusterCycleProbe [execMem]"
  */
object ClusterCycleProbe {
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")

  def main(args: Array[String]): Unit = {
    val mem = args.lift(0).getOrElse("3g")
    def run(n: Int): Unit = {
      val t0 = System.nanoTime()
      val s = SparkSession.builder()
        .master(s"local-cluster[$n,1,4096]")
        .appName(s"cycle-probe-$n")
        .config("spark.executor.memory", mem)
        .config("spark.executor.extraClassPath", "/root/repo/target/scala-2.13/classes")
        .config("spark.executor.extraJavaOptions", addOpens)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      val sum = s.range(0, 1000, 1, n * 2).selectExpr("sum(id)").collect()(0).getLong(0)
      s.stop()
      println(f"[cycle-probe] n=$n mem=$mem sum=$sum ok in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    run(4); run(1); run(4)
    println("[cycle-probe] all cycles OK")
  }
}
