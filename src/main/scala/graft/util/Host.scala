package graft.util

/** Host/scratch utilities shared by the bench and probe mains — ONE home
  * for two subtle snippets that were previously copy-pasted per tool:
  * the /proc/stat steal field index and the delete-children-first walk
  * ordering each live here and nowhere else.
  */
object Host {

  /** Cumulative host CPU-steal (USER_HZ ticks -> seconds) across all
    * vCPUs — field 8 of the aggregate `cpu` line in /proc/stat. Idle
    * vCPUs accrue no steal, so the delta across a trial approximates
    * the CPU-seconds the host denied THIS job (the per-trial
    * cleanliness signal of the bench protocol). -1 when unreadable
    * (non-Linux), which every caller treats as "cleanliness unknown".
    */
  def stealSec(): Double = try {
    scala.io.Source.fromFile("/proc/stat").getLines()
      .find(_.startsWith("cpu "))
      .map(_.trim.split("\\s+")(8).toDouble / 100.0).getOrElse(-1.0)
  } catch { case _: Throwable => -1.0 }

  /** Best-effort recursive delete of LOCAL bench/probe scratch (children
    * before parents; errors swallowed — scratch may be half-created).
    * Index tables go through the Hadoop-FS-aware
    * graft.index.IndexBuilder.deleteTree instead, which also works on
    * non-local URIs.
    */
  def rmTree(dir: String): Unit = try {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  } catch { case _: Throwable => () }
}
