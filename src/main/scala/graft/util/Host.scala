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

  /** CPU-speed probe: wall seconds for a fixed deterministic
    * integer-mix spin (single thread, no memory traffic). The
    * /proc/stat steal meter only sees CPU-seconds the hypervisor
    * DENIED this guest; it is blind to windows where the vCPU runs but
    * slower (SMT/frequency contention from neighbor load) — measured
    * whole cluster-bench SESSIONS read ~15% slow with near-zero steal.
    * A fixed spin makes that visible: its wall time IS the host's
    * current single-thread speed. Three samples, min (the window's
    * least-contended instant — max and mean absorb scheduler blips).
    * The fold result is published through a volatile sink so the JIT
    * cannot elide the loop.
    */
  @volatile private var spinSink: Long = 0L
  def spinSec(): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      var h = 1234567891L
      var i = 0
      while (i < 60000000) {
        h = (h * 6364136223846793005L + 1442695040888963407L) ^ (h >>> 29)
        i += 1
      }
      spinSink = h
      (System.nanoTime() - t0) / 1e9
    }
    once(); // warm the JIT on first use; steady-state cost ~3x ~80 ms
    math.min(once(), once())
  }

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
