package graft.tools

/** Host/process interference counters for the bench harness (VERDICT r10
  * item 1). The r10 driver line flagged a steady-tail ramp class
  * (q07/q16/q119) and a recurring q81 max spike whose existing channels —
  * GC delta, codegen-compile delta, storage high-water, block removals —
  * all read zero. Those channels can only refute JVM-internal mechanisms;
  * none can PROVE a rep was slowed from outside the process. These two
  * can:
  *
  *  - process-CPU vs wall: a rep whose wall time doubles while its
  *    process-CPU stays flat spent the extra time NOT running — it was
  *    descheduled (noisy neighbor, cgroup throttling) or blocked. One
  *    whose CPU scales with wall did real work and needs an internal
  *    hypothesis.
  *  - host-other busy CPU: `/proc/stat` busy jiffies minus our own
  *    process CPU over the same window = CPU burned by OTHER processes.
  *    A spike rep with flat process-CPU and a jump in other-busy is
  *    positively attributed to external interference, not merely
  *    unexplained.
  *
  * Plus two cheap corroborators: steal+irq+softirq time (hypervisor /
  * interrupt pressure — the container itself being starved) and the JIT
  * compiler's cumulative compile time (background C2 threads burn process
  * CPU that is NOT query work; a warm-up rep shows wall ≈ flat CPU ratio
  * but high jit delta).
  *
  * Jiffies are converted at the Linux USER_HZ of 100 (fixed ABI for
  * /proc/stat). All reads are driver-side and O(1); on a non-Linux host
  * the /proc counters read as 0 and only the MXBean channels report. */
object HostStat {

  /** One counter snapshot; diff two of these around a timed window. */
  final case class Snap(procCpuNs: Long, jitMs: Long,
      busyJiffies: Long, stealIrqJiffies: Long,
      selfStimeJiffies: Long = 0L)

  /** Per-window deltas, in seconds (except jitMs). `cpuSysS` is the
    * KERNEL share of `cpuS` (`/proc/self/stat` stime — the r14 q81
    * attribution channel: a rep whose cpu_s multiplies with the extra
    * cycles in stime is paying kernel-side costs — file-op/page-cache
    * contention from a noisy host — not running its own code slower). */
  final case class Delta(cpuS: Double, otherBusyS: Double, stealS: Double,
      jitMs: Long, cpuSysS: Double = 0.0)

  private val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
  private val sunBean: Option[com.sun.management.OperatingSystemMXBean] =
    osBean match {
      case b: com.sun.management.OperatingSystemMXBean => Some(b)
      case _ => None
    }
  private val compBean = Option(java.lang.management.ManagementFactory.getCompilationMXBean)

  /** CPU nanoseconds this JVM process has consumed (all threads, user+sys). */
  def processCpuNs: Long = sunBean.map(_.getProcessCpuTime).getOrElse(0L)

  /** Cumulative JIT compilation milliseconds (HotSpot C1+C2). */
  def jitMillis: Long =
    compBean.filter(_.isCompilationTimeMonitoringSupported)
      .map(_.getTotalCompilationTime).getOrElse(0L)

  /** 1-minute load average (runnable + uninterruptible tasks, kernel EMA).
    * Moves on a ~minute constant, so it contextualizes a RUN, not a rep. */
  def load1: Double = {
    val l = osBean.getSystemLoadAverage
    if (l < 0) 0.0 else l
  }

  /** Parse the aggregate "cpu " line of /proc/stat into
    * (busyJiffies, stealIrqJiffies). busy = user+nice+system+irq+softirq+
    * steal (idle and iowait excluded); stealIrq = irq+softirq+steal. */
  private[graft] def parseProcStat(line: String): (Long, Long) = {
    val f = line.trim.split("\\s+").drop(1).map(s =>
      try s.toLong catch { case _: NumberFormatException => 0L })
    def at(i: Int) = if (i < f.length) f(i) else 0L
    // fields: 0 user, 1 nice, 2 system, 3 idle, 4 iowait, 5 irq,
    //         6 softirq, 7 steal
    val busy = at(0) + at(1) + at(2) + at(5) + at(6) + at(7)
    val stealIrq = at(5) + at(6) + at(7)
    (busy, stealIrq)
  }

  private def readProcStat(): (Long, Long) =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().find(_.startsWith("cpu ")).map(parseProcStat)
        .getOrElse((0L, 0L))
      finally src.close()
    } catch { case _: Throwable => (0L, 0L) }

  /** This process's stime jiffies from /proc/self/stat (field 15; comm
    * may contain spaces/parens, so fields are taken after the LAST ')').
    * 0 on non-Linux. */
  private def readSelfStime(): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/self/stat")
      try {
        val line = src.getLines().next()
        val rest = line.substring(line.lastIndexOf(')') + 2).split(" ")
        rest(12).toLong // field 15 = stime (rest(0) is field 3)
      } finally src.close()
    } catch { case _: Throwable => 0L }

  def snap(): Snap = {
    val (busy, stealIrq) = readProcStat()
    Snap(processCpuNs, jitMillis, busy, stealIrq, readSelfStime())
  }

  /** HOST core count from /proc/stat's per-cpu lines — the capacity the
    * whole-host channels (busy/steal) are measured against. NOT
    * `Runtime.availableProcessors()`: that is cgroup/affinity-aware, so
    * in a cpu-limited container it undercounts the host and re-creates
    * the capacity/channel mismatch the floor-gate fix removed (a
    * 4-cpu-quota process on a 64-core host would judge 64 cores' worth
    * of neighbor noise against a 4-core capacity and classify every
    * session loud). Falls back to availableProcessors when /proc is
    * absent — there the busy channels are zero anyway. */
  def hostCpus: Int =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val n = src.getLines().count(l => l.startsWith("cpu") &&
          l.length > 3 && l(3).isDigit)
        if (n > 0) n else Runtime.getRuntime.availableProcessors()
      } finally src.close()
    } catch { case _: Throwable => Runtime.getRuntime.availableProcessors() }

  /** Deltas between two snapshots. otherBusyS clamps at 0: our own CPU is
    * part of host busy, but the two counters tick on different clocks so a
    * tiny negative residual is measurement noise, not other-process work. */
  def delta(a: Snap, b: Snap): Delta = {
    val cpuS = (b.procCpuNs - a.procCpuNs) / 1e9
    val hostBusyS = (b.busyJiffies - a.busyJiffies) / 100.0
    val stealS = (b.stealIrqJiffies - a.stealIrqJiffies) / 100.0
    val other =
      if (b.busyJiffies == 0L && a.busyJiffies == 0L) 0.0 // no /proc
      else math.max(0.0, hostBusyS - cpuS)
    Delta(cpuS, other, stealS, b.jitMs - a.jitMs,
      (b.selfStimeJiffies - a.selfStimeJiffies) / 100.0)
  }
}
