package graft.tools

import scala.collection.mutable

/** Flight-recorder harness for the bench rep block — the escalation rig
  * for the q81 in-session CPU elevation (driver-observed: reps at 4× the
  * block's cpu_s with every attribution channel flat — gc/storage/
  * broadcast/codegen quiet and jit_ms tiny, i.e. the JVM RUNNING slow
  * code, not compiling it). Counters cannot name that; only a profile
  * can, so armed queries record each rep with JFR and the block dumps
  * the recordings of pathological reps (plus the min rep as a baseline
  * for diffing) next to `bench_detail.json`.
  *
  * Always-on for the armed set by design: the elevation appears on the
  * DRIVER's runs and not reliably on local ones, so the rig must already
  * be armed when the driver's bench flags a rep. JFR's sampling profile
  * costs ~1-2 % on the armed query only; `SPARK_GRAFT_BENCH_JFR=0` opts
  * out, a comma list re-arms other queries.
  *
  * Everything degrades to no-ops when JFR is unavailable (the `jdk.jfr`
  * module is present on every JDK ≥ 11 this project supports, but a
  * stripped runtime must not break the bench). */
object RepProfiler {

  val ArmEnv = "SPARK_GRAFT_BENCH_JFR"

  /** q81 is the standing fallback watch item (six rounds of driver-side
    * recurrence, adjudicated r14); everything else pays zero overhead. */
  private val DefaultArmed = "q81_char_ngram_pairs"

  /** Short keys (Bench.shortKey form) flagged by the NEWEST
    * `BENCH_r*.json` under `dir` — the previous driver round's
    * `p50_flags` + `max_flags`. This is what makes the arming DYNAMIC
    * (VERDICT r14 item 1): a query the driver flagged last round arrives
    * at the next driver bench already recording, so its first recurrence
    * lands with a profile instead of opening another watch cycle.
    * Empty when no round file is present or parseable. */
  def flaggedShortKeys(dir: java.nio.file.Path): Set[String] =
    try {
      import scala.jdk.CollectionConverters._
      val benchRe = "BENCH_r(\\d+)\\.json".r
      val listing = java.nio.file.Files.list(dir)
      val files =
        try listing.iterator().asScala.flatMap { p =>
          p.getFileName.toString match {
            case benchRe(n) => Some((n.toInt, p))
            case _ => None
          }
        }.toSeq
        finally listing.close()
      if (files.isEmpty) Set.empty
      else {
        val text = new String(
          java.nio.file.Files.readAllBytes(files.maxBy(_._1)._2), "UTF-8")
        // the flag maps appear twice (raw "tail" with escaped quotes,
        // driver-"parsed" object) — a tolerant regex over the whole text
        // reads either form and survives parsed:null rounds
        val span = "(?:p50|max)_flags\\\\?\"\\s*:\\s*\\{([^}]*)\\}".r
        val key = "([A-Za-z0-9_]+)\\\\?\"\\s*:".r
        span.findAllMatchIn(text).flatMap(m =>
          key.findAllMatchIn(m.group(1)).map(_.group(1))).toSet
      }
    } catch { case _: Throwable => Set.empty }

  private lazy val armedDir =
    java.nio.file.Paths.get(".").toAbsolutePath.normalize

  private lazy val dynamicArmed: Set[String] = flaggedShortKeys(armedDir)

  /** One-line arming report for the bench log (r15 ADVICE): WHICH short
    * keys are dynamically armed and WHERE the flags were read from — a
    * bench launched outside the repo root shows its degraded q81-only
    * arming instead of silently falling back, and the operator can
    * discount JFR overhead (~1-2 % on armed queries) when
    * re-adjudicating a flagged query that the rig itself is recording. */
  def armingReport(): String = {
    val envConf = sys.env.get(ArmEnv).map(v => s"; env override '$v'").getOrElse("")
    s"[graft-bench] JFR arming: dynamic={${dynamicArmed.toSeq.sorted.mkString(",")}} " +
      s"from BENCH_r*.json under $armedDir; fallback=$DefaultArmed$envConf"
  }

  def armedFor(name: String): Boolean =
    sys.env.get(ArmEnv).map(_.trim) match {
      // set-but-empty (like "0") disarms everything — the pre-r15
      // behavior an operator relies on to run a profiling-free bench
      case Some("0") | Some("") => false
      case Some(conf) => conf.split(',').map(_.trim).filter(_.nonEmpty)
        .exists(p => name == p || name.startsWith(p))
      case None =>
        // default arming: everything the previous driver round flagged,
        // plus the standing q81 fallback
        dynamicArmed.contains(graft.Bench.shortKey(name)) ||
          name.startsWith(DefaultArmed)
    }

  /** A rep qualifies for a dump when it is meaningfully above the block
    * minimum — 1.5× with the same 0.25 s absolute floor the bench's p50
    * flag uses, so scheduler jitter on fast queries never dumps. */
  def dumpWorthy(minV: Double, repV: Double): Boolean =
    repV > minV * 1.5 && repV > minV + 0.25

  /** Start one rep's recording with the `profile` configuration (10 ms
    * execution samples + deopt/compilation/code-cache events); falls
    * back to `default`, then to None. */
  def start(): Option[jdk.jfr.Recording] =
    try {
      val cfg =
        try jdk.jfr.Configuration.getConfiguration("profile")
        catch { case _: Throwable => jdk.jfr.Configuration.getConfiguration("default") }
      val r = new jdk.jfr.Recording(cfg)
      r.setMaxSize(128L * 1024 * 1024)
      r.start()
      Some(r)
    } catch { case _: Throwable => None }

  def stop(r: jdk.jfr.Recording): Unit =
    try r.stop(): Unit catch { case _: Throwable => () }

  def discard(r: jdk.jfr.Recording): Unit =
    try r.close() catch { case _: Throwable => () }

  /** Dump a stopped recording and write the human summary beside it;
    * returns the summary path on success. */
  def dumpWithSummary(r: jdk.jfr.Recording, stem: String): Option[String] =
    try {
      val jfr = java.nio.file.Paths.get(s"$stem.jfr")
      r.dump(jfr)
      r.close()
      val txt = java.nio.file.Paths.get(s"$stem.txt")
      java.nio.file.Files.write(txt, summarize(jfr).getBytes("UTF-8"))
      Some(txt.toString)
    } catch { case _: Throwable => None }

  /** Compact text summary of one recording: sample-dominant leaf frames
    * and collapsed 5-frame stacks (what the CPU actually ran), plus the
    * deopt / compilation / code-cache channels that distinguish
    * running-slow-code from compiling-it. Self-contained (the JFR
    * consumer API), so the artifact is readable without tooling. */
  def summarize(jfr: java.nio.file.Path): String = {
    val leafs = mutable.Map.empty[String, Int].withDefaultValue(0)
    val stacks = mutable.Map.empty[String, Int].withDefaultValue(0)
    val deoptReasons = mutable.Map.empty[String, Int].withDefaultValue(0)
    val compMethods = mutable.Map.empty[String, Long].withDefaultValue(0L)
    var samples = 0
    var deopts = 0
    var codeCacheFull = 0
    var compilations = 0L
    var compMs = 0L
    def fmt(f: jdk.jfr.consumer.RecordedFrame): String = {
      val m = f.getMethod
      if (m == null) "<unknown>"
      else s"${Option(m.getType).map(_.getName).getOrElse("?")}.${m.getName}"
    }
    val rf = new jdk.jfr.consumer.RecordingFile(jfr)
    try while (rf.hasMoreEvents) {
      val e = rf.readEvent()
      e.getEventType.getName match {
        case "jdk.ExecutionSample" | "jdk.NativeMethodSample" =>
          samples += 1
          val st = e.getStackTrace
          if (st != null && !st.getFrames.isEmpty) {
            val fr = st.getFrames
            leafs(fmt(fr.get(0))) += 1
            val depth = math.min(5, fr.size)
            stacks((0 until depth).map(i => fmt(fr.get(i)))
              .mkString(" <- ")) += 1
          }
        case "jdk.Deoptimization" =>
          deopts += 1
          val reason = try e.getString("reason") catch { case _: Throwable => "?" }
          deoptReasons(reason) += 1
        case "jdk.CodeCacheFull" => codeCacheFull += 1
        case "jdk.Compilation" =>
          compilations += 1
          val d = try e.getDuration.toMillis catch { case _: Throwable => 0L }
          compMs += d
          // per-method compile cost (VERDICT r15 item 3): the cold-rep
          // JIT bill needs NAMES to be attributable — the q158 rep-1
          // analysis showed it is Spark's own Catalyst/driver methods
          // crossing C2 thresholds, not generated code, which only the
          // method channel can show
          val cm = try {
            val m = e.getValue("method")
              .asInstanceOf[jdk.jfr.consumer.RecordedMethod]
            if (m == null) "?"
            else s"${Option(m.getType).map(_.getName).getOrElse("?")}.${m.getName}"
          } catch { case _: Throwable => "?" }
          compMethods(cm) += d
        case _ =>
      }
    } finally rf.close()
    val sb = new StringBuilder
    sb ++= s"samples=$samples deopts=$deopts codeCacheFull=$codeCacheFull "
    sb ++= s"compilations=$compilations compile_ms=$compMs\n"
    if (deoptReasons.nonEmpty) {
      sb ++= "deopt reasons:\n"
      deoptReasons.toSeq.sortBy(-_._2).take(10).foreach { case (r, c) =>
        sb ++= f"  $c%6d  $r%n"
      }
    }
    if (compMethods.nonEmpty) {
      sb ++= "top compile consumers (by total compile ms):\n"
      compMethods.toSeq.sortBy { case (m, d) => (-d, m) }.take(10)
        .foreach { case (m, d) => sb ++= f"  $d%6d  $m%n" }
    }
    sb ++= "top leaf frames (by sample):\n"
    leafs.toSeq.sortBy { case (f, c) => (-c, f) }.take(15).foreach { case (f, c) =>
      sb ++= f"  $c%6d  $f%n"
    }
    sb ++= "top stacks (5 frames, by sample):\n"
    stacks.toSeq.sortBy { case (s, c) => (-c, s) }.take(10).foreach { case (s, c) =>
      sb ++= f"  $c%6d  $s%n"
    }
    sb.toString
  }
}
