package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** One timed repetition with its attribution channels: wall seconds,
    * stop-the-world GC delta, storage-memory high-water over the window
    * (20 ms sampler), block-removal count (evictions + the harness's own
    * constant per-rep release baseline), whole-stage-codegen compilation
    * delta, and the round-11 interference channels (graft.tools.HostStat):
    * process-CPU seconds, other-process host-busy seconds, steal+irq
    * seconds and JIT-compile milliseconds over the same window. The
    * decision rule (STRESS.md "Interference attribution"): a flagged rep
    * whose cpu_s stays at the query's baseline while other_busy_s jumps
    * is PROVEN external; one whose cpu_s scales with wall is internal and
    * needs a JVM-side hypothesis. */
  final case class Rep(sec: Double, gcMs: Long, storHiBytes: Long,
      blocksRemoved: Long, codegenCompiles: Long,
      cpuS: Double = 0.0, otherBusyS: Double = 0.0, stealS: Double = 0.0,
      jitMs: Long = 0L, bcastBytesLeft: Long = 0L,
      stages: Long = 0L, shufWriteBytes: Long = 0L, cpuSysS: Double = 0.0,
      jobs: Long = 0L) {
    /** USER cpu seconds of the rep — the host-noise-robust work measure
      * (kernel time rides host fs/scheduler pressure; user time at a
      * constant plan is the code's own cycles). */
    def userS: Double = math.max(0.0, cpuS - cpuSysS)
  }

  /** Driver's tail capture is ~2000 chars (BENCH_r03.json "tail"); the JSON
    * line plus sbt's trailing "[success] ..." line must fit inside it or the
    * driver records parsed:null. Shorten "qNN_long_name" to its "qNN" code
    * (still unique, still traceable to SparkEntry.queries); connector names
    * (src_/snk_) are short enough to keep whole. BenchLineSpec pins the
    * rendered length against the current query set.
    */
  def shortKey(name: String): String = {
    // connector names compress to two letters per segment
    // (src_mongo_find_pushdown -> smofipu) — BenchLineSpec pins that the
    // scheme stays collision-free over the whole catalog
    // 2 chars per segment, 3 for the LAST (the discriminating one:
    // pulsar_reader vs pulsar_record collide at 2)
    def seg(s: String) = {
      val parts = s.split('_')
      (parts.dropRight(1).map(_.take(2)) :+ parts.last.take(3)).mkString
    }
    // "q41_..." → "41", "src_x_y" → "sxy", "snk_x_y" → "kxy": the 161-query
    // round-7 catalog outgrew the q-prefixed key set at centisecond
    // precision inside the ~1900-char window; digits-only can't collide
    // with the letter-leading connector keys
    if (name.matches("^q\\d+_.*")) name.drop(1).takeWhile(_ != '_')
    else if (name.startsWith("src_")) "s" + seg(name.drop(4))
    else if (name.startsWith("snk_")) "k" + seg(name.drop(4))
    else name
  }

  def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

  /** Trim trailing fraction zeros ("10.0"→"10", "0.500"→"0.5") — free
    * characters at every precision rung, shared by the query map and the
    * flag lists so the two can never trim differently. */
  private def trimZeros(s: String): String =
    if (!s.contains('.')) s
    else s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse

  /** Hard ceiling for the rendered line: the driver tail keeps ~2000 chars
    * and sbt appends a ~75-char success line after ours. */
  val MaxLineLength = 1900

  /** How many p50 pathology flags the line carries at most — the driver
    * tail is a fixed window, so the flag list must be bounded by
    * construction (bench_detail.json has every query's full rep data). */
  val MaxP50Flags = 8

  /** A rep set is flagged when p50 is meaningfully above min — the
    * round-7 q81 pathology (reps ramping 1.5 s → 13 s inside one session)
    * was invisible in the min-of-reps headline. The 0.25 s absolute floor
    * keeps sub-second scheduler/GC jitter (measured: ±0.15 s on
    * 0.2 s queries at local[32]) out of the flag list. */
  def p50Flagged(minV: Double, p50V: Double): Boolean =
    p50V > minV * 1.25 + 0.25

  /** The steady-tail reps of a trace: everything AFTER the last
    * floor-setting rep (a rep ≥5 % below every earlier rep — the same
    * materially-new-minimum test the adaptive warm-down uses), padded
    * back to the last 3 reps when shorter. The p50 pathology flag is
    * computed over THIS window: a monotone warm-DOWN ramp (the round-9
    * q59 trace — all nine of its jobs shrink uniformly across ~6
    * invocations while gc/storage/codegen deltas stay flat: tiered JIT
    * of the non-codegen prefix-scan row path) is warm-up, visible in
    * rep 1 via cold_flags and in full in bench_detail.json; a ramp UP
    * (the round-7 q81 leak) sets its floor early, so its slow later
    * reps ARE the steady tail and still flag. `p50_total` stays the
    * full-trace median sum — only the pathology test uses the tail. */
  def steadyTail(ts: Seq[Double]): Seq[Double] = {
    var floor = Double.MaxValue
    var lastSet = 0
    ts.zipWithIndex.foreach { case (t, i) =>
      if (i == 0 || t <= floor * 0.95) { lastSet = i }
      floor = math.min(floor, t)
    }
    val tail = ts.drop(lastSet + 1)
    if (tail.size >= 3) tail else ts.takeRight(math.min(3, ts.size))
  }

  /** A single-rep spike (the round-8 q81 13 s rep: 8.3× p50, invisible to
    * both min and p50) is flagged when the worst run is > 3× p50 — with
    * the same absolute floor so a 0.05 s → 0.2 s scheduler hiccup on a
    * tiny query doesn't flag. */
  def maxFlagged(p50V: Double, maxV: Double): Boolean =
    maxV > p50V * 3 && maxV > p50V + 0.25

  /** The p50 the PATHOLOGY FLAG tests: the steady tail of the trace with
    * externally-attributed reps excluded. The r14 q81 root-cause (six
    * rounds of recurrence, closed by the flight-recorder rig +
    * user/sys split): elevated reps ran the IDENTICAL plan (stages and
    * shuffle bytes constant) with IDENTICAL user CPU — the entire cpu_s
    * multiplication was kernel time (stime) on the same syscalls, i.e.
    * host fs/scheduling pressure billed to the process, which no JVM
    * channel can see and no code change can fix. Any genuinely INTERNAL
    * pathology — more work, an interpreted-path flip, GC/storage-pressure
    * churn — burns USER cpu, so a rep whose wall is elevated while its
    * user cpu stays at the min rep's level (×1.3 + 0.5 s headroom) is
    * PROVEN external and must not flag. bench_detail.json keeps every
    * rep's full channel set (runs/cpu_s/sys_s/stages/shuf_w_mb) for
    * manual re-adjudication; `p50_total` stays the honest full-trace
    * median sum. */
  /** The full external-attribution predicate (r14 flag + the r14 ADVICE
    * strengthening): a flagged rep is PROVEN external only when
    *  (a) its USER cpu stays at the min rep's level (×1.3 + 0.5 s) —
    *      identical own-code work, the extra wall is kernel/host time;
    *  (b) its plan-shape channels MATCH the min rep's — stages exactly
    *      and shuffle bytes within 10 % + 16 MB (a lost exchange reuse
    *      or a plan flip writes more shuffle files and runs more stages
    *      with near-flat user cpu — sys-dominated, and WITHOUT this leg
    *      it would silently auto-exempt);
    *  (c) its GC time didn't blow up (×2 + 0.5 s over the min rep —
    *      storage-pressure churn is internal even when the collector's
    *      cycles land partly in stime).
    * The min rep runs the same query, so at an unchanged plan every
    * channel matches by construction — the r14 q81 root-cause evidence
    * ("stages and shuffle bytes constant") is exactly this predicate. */
  def externalRep(r: Rep, base: Rep): Boolean =
    r.cpuS > 0.0 &&
      r.userS <= base.userS * 1.3 + 0.5 &&
      r.stages == base.stages &&
      r.shufWriteBytes <= base.shufWriteBytes + base.shufWriteBytes / 10 + (16L << 20) &&
      r.gcMs <= base.gcMs * 2 + 500

  def flagP50(reps: Seq[Rep]): Double = {
    val secs = reps.map(_.sec)
    val minV = secs.min
    val base = reps(secs.indexOf(minV))
    // the exclusion needs CPU evidence: on a host without process-CPU
    // counters (cpuS reads 0 everywhere) every elevated rep would look
    // "user-flat" and the flag would silently die — fall back to the
    // pre-r14 wall-clock-only flagging there
    val internal = reps.filterNot { r =>
      p50Flagged(minV, r.sec) && externalRep(r, base)
    }.map(_.sec)
    val tail = steadyTail(if (internal.isEmpty) secs else internal)
    tail.sorted.apply((tail.size - 1) / 2)
  }

  /** The max the SPIKE FLAG tests — same external-attribution exclusion
    * as [[flagP50]], over the steady reps (rep 1 carries known cold
    * costs and stays excluded by the caller convention): a single
    * host-pressure wall spike with flat user cpu must not max-flag.
    * `max_total` stays the honest full-trace worst. */
  def flagMax(reps: Seq[Rep]): Double = {
    val steady = if (reps.size > 1) reps.drop(1) else reps
    val secs = steady.map(_.sec)
    val minV = secs.min
    val base = steady(secs.indexOf(minV))
    val internal = steady.filterNot { r =>
      p50Flagged(minV, r.sec) && externalRep(r, base)
    }.map(_.sec)
    (if (internal.isEmpty) secs else internal).max
  }

  /** Floor for the rep-1/p50 ratio denominator: sub-50 ms queries have
    * ratios dominated by scheduler quantum noise. */
  val ColdP50Floor = 0.05

  /** Rep-1 cold-cost flag (VERDICT r9 item 7): excluding rep 1 from
    * `max_flags` made first-invocation regressions — the class users feel
    * on their first query — invisible. Every query pays a KNOWN cold tax
    * (JIT, connector fixture codegen), so the baseline is the CATALOG's
    * median rep-1/p50 ratio; a query is flagged only when its own rep 1
    * runs > 3× that shared baseline (and ≥ 0.5 s above p50, so a 0.1 s →
    * 0.4 s toy-query wobble can't flag). A codegen blowup or fixture-build
    * creep lands here without re-penalizing normal warm-up. */
  def coldFlagged(rep1: Double, p50V: Double, medianRatio: Double): Boolean =
    rep1 > math.max(p50V, ColdP50Floor) * medianRatio * 3 && rep1 > p50V + 0.5

  /** The catalog-wide median rep-1/p50 ratio (the shared cold-tax
    * baseline), never below 1 so a mostly-warm catalog can't make the
    * threshold stricter than "3× p50 + 0.5 s". */
  def coldMedianRatio(rep1s: Map[String, Double], p50s: Map[String, Double]): Double = {
    val ratios = rep1s.toSeq.flatMap { case (n, r1) =>
      p50s.get(n).map(p => r1 / math.max(p, ColdP50Floor))
    }.sorted
    if (ratios.isEmpty) 1.0 else math.max(1.0, ratios((ratios.size - 1) / 2))
  }

  // ------------------------------------------------------------------
  // floors.json — best-known per-query min (the quiet-window floor)
  // across SESSIONS, per sf dir, with the env stamp of the last
  // improving run. Every within-session comparison drifts with host
  // pressure (the r14 +30 % headline was pure host noise); the BEST min
  // ever observed is the one number noise can only improve, so a query
  // whose session min sits far above its recorded floor on a QUIET host
  // is a regression signal no single noisy session can fake. The file
  // is committed with the repo, so floors accumulate round over round.

  /** Pure floor merge: per query, the smaller of the recorded floor and
    * this session's min (new queries enter at their min). */
  def mergeFloors(prev: Map[String, Double],
      cur: Map[String, Double]): Map[String, Double] =
    (prev.keySet ++ cur.keySet).iterator.map { k =>
      k -> math.min(prev.getOrElse(k, Double.MaxValue),
        cur.getOrElse(k, Double.MaxValue))
    }.toMap

  /** Render the floors file: `{sf: {"_env": {...stamp...}, q: floor}}`,
    * keys sorted for stable diffs. */
  def renderFloors(
      all: Map[String, (Map[String, Double], Map[String, Double])]): String = {
    def obj(entries: Seq[String]) = entries.mkString("{", ", ", "}")
    val sfs = all.toSeq.sortBy(_._1).map { case (sf, (stamp, floors)) =>
      val env = "\"_env\": " + obj(stamp.toSeq.sortBy(_._1).map {
        case (k, v) => s""""$k": ${fmt(v)}"""
      })
      val qs = floors.toSeq.sortBy(_._1).map { case (q, v) =>
        s""""$q": ${fmt(v)}"""
      }
      s""""$sf": ${obj(env +: qs)}"""
    }
    sfs.mkString("{\n", ",\n", "\n}\n")
  }

  /** Parse a floors file (inverse of [[renderFloors]]); tolerant of a
    * missing `_env`. */
  def parseFloors(
      text: String): Map[String, (Map[String, Double], Map[String, Double])] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def nums(fs: List[JField]): Map[String, Double] = fs.collect {
      case (k, JDouble(d)) => k -> d
      case (k, JInt(i)) => k -> i.toDouble
      case (k, JDecimal(d)) => k -> d.toDouble
    }.toMap
    JsonMethods.parse(text) match {
      case JObject(sfs) => sfs.collect { case (sf, JObject(fields)) =>
        val stamp = fields.collectFirst {
          case ("_env", JObject(e)) => nums(e)
        }.getOrElse(Map.empty[String, Double])
        sf -> (stamp, nums(fields.filterNot(_._1 == "_env")))
      }.toMap
      case _ => Map.empty
    }
  }

  /** Load a floors file: Some(empty) when absent, None when present but
    * UNPARSEABLE — the two must stay distinct ([[updateFloors]] treats
    * the former as a fresh start and the latter as a signal to not
    * touch the file: rewriting a corrupt file from "empty" would
    * silently discard every accumulated floor and sf section, r15
    * ADVICE). */
  def loadFloors(
      path: java.nio.file.Path): Option[Map[String, (Map[String, Double], Map[String, Double])]] =
    if (!java.nio.file.Files.exists(path))
      Some(Map.empty)
    else try Some(parseFloors(
      new String(java.nio.file.Files.readAllBytes(path), "UTF-8")))
    catch { case _: Throwable => None }

  /** Merge this session's mins into the floors file at `path` (other sf
    * sections preserved; the env stamp is replaced only when a floor
    * actually improved). Returns true when anything improved. A
    * present-but-unparseable file SKIPS the update loudly instead of
    * rewriting from empty, and the write publishes via temp file +
    * atomic rename so a crash mid-write can't leave a truncated file
    * (both r15 ADVICE). */
  def updateFloors(path: java.nio.file.Path, sf: String,
      mins: Map[String, Double], stamp: Map[String, Double]): Boolean =
    loadFloors(path) match {
      case None =>
        System.err.println(s"[graft-bench] $path exists but is unparseable — " +
          "skipping the floor update (restore it from git before the next run)")
        false
      case Some(all) =>
        val (oldStamp, oldFloors) =
          all.getOrElse(sf, (Map.empty[String, Double], Map.empty[String, Double]))
        // quantize to the RENDERED precision before comparing: a full-precision
        // min fractionally below its own 3-decimal rendering would otherwise
        // read as an improvement on every identical session, churning the
        // stamp while the file re-renders byte-identical floors
        val minsQ = mins.map { case (k, v) => k -> fmt(v).toDouble }
        val merged = mergeFloors(oldFloors, minsQ)
        val improved = merged != oldFloors
        val next = all + (sf -> (if (improved) stamp else oldStamp, merged))
        val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
        java.nio.file.Files.write(tmp, renderFloors(next).getBytes("UTF-8"))
        try java.nio.file.Files.move(tmp, path,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
          java.nio.file.Files.move(tmp, path,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        improved
    }

  /** Floor-regression test (VERDICT r15 item 2): a session min is a
    * regression signal when it exceeds the best-known committed floor by
    * ×`ratio` (default 1.5, `SPARK_GRAFT_FLOOR_RATIO`) — with the same
    * 0.25 s absolute floor the other flags use, so a 0.05 → 0.09 s
    * scheduler wobble on a toy query never flags. */
  def floorRegressed(floor: Double, sessionMin: Double, ratio: Double): Boolean =
    sessionMin > floor * ratio + 0.25

  /** Quiet-env gate for `floor_flags`: floors are quiet-window numbers,
    * so comparing a LOUD session against them only manufactures noise —
    * the field is emitted only when the whole-run external channels are
    * small relative to the run's host-CPU capacity (steal ≤1 %,
    * other-process busy ≤5 %; the r15 driver run — other_s 3 475 of a
    * 2 045 s × 32-cpu run = 5.3 % — classifies LOUD, as it should). On
    * loud hosts the field is omitted entirely rather than emitted empty,
    * so "no flags" is never ambiguous with "couldn't check". */
  def envQuietForFloors(runDelta: graft.tools.HostStat.Delta,
      wallSec: Double, cpus: Int): Boolean = {
    val cap = math.max(wallSec, 1.0) * math.max(cpus, 1)
    runDelta.stealS <= 0.01 * cap + 1.0 &&
      runDelta.otherBusyS <= 0.05 * cap + 5.0
  }

  /** May a detail file with scale marker `markerSf` be rotated/compared
    * by a run at `currentSf`? Files predating the `_sf` marker — and
    * corrupt files the marker can't be read from — default to the
    * CONCRETE "sf0.1" (every committed pre-marker full detail is an
    * sf0.1 run), never to "matches anything": an sf0.001 smoke against a
    * marker-less sf0.1 detail must NOT promote it to previous-round or
    * emit a cross-scale diff. */
  def sfGateAllows(markerSf: Option[String], currentSf: String): Boolean =
    markerSf.getOrElse("sf0.1") == currentSf

  /** Cumulative stop-the-world GC milliseconds across all collectors —
    * per-rep deltas attribute spike reps to GC pauses vs real work. */
  def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
  }

  /** Machine-context fragment for the driver line (VERDICT r10 item 6):
    * pre-run and post-run 1-min loadavg, whole-run process-CPU /
    * other-process-busy / steal seconds, and cumulative JIT seconds — so a
    * cross-round total shift (r9 54.6 s → r10 59.4 s) is adjudicable from
    * the two BENCH lines alone: a slower round with higher other_busy/
    * loadavg is machine drift; one with flat env context is a code
    * regression worth a worktree A/B. ~90 chars, inside the
    * BenchLineSpec-pinned window. */
  def envPart(load1Pre: Double, load1Post: Double,
      runDelta: graft.tools.HostStat.Delta): String = {
    def f1(v: Double) = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    // user_s (utime = cpu_s − sys_s) carried explicitly: the one whole-run
    // number that is host-noise-robust at constant plans (r14's +30 % wall
    // needed a narrative; user-cpu totals settle cross-round drift in one
    // arithmetic comparison — see README "machine drift")
    s""","env":{"load1":[${f1(load1Pre)},${f1(load1Post)}],""" +
      s""""cpu_s":${f1(runDelta.cpuS)},"sys_s":${f1(runDelta.cpuSysS)},""" +
      s""""user_s":${f1(math.max(0.0, runDelta.cpuS - runDelta.cpuSysS))},""" +
      s""""other_s":${f1(runDelta.otherBusyS)},""" +
      s""""steal_s":${f1(runDelta.stealS)},"jit_s":${f1(runDelta.jitMs / 1000.0)}}"""
  }

  def renderLine(results: Map[String, Double], sfDir: String,
      p50s: Map[String, Double] = Map.empty,
      maxs: Map[String, Double] = Map.empty,
      rep1s: Map[String, Double] = Map.empty,
      steadyP50s: Map[String, Double] = Map.empty,
      env: String = "",
      flagMaxs: Map[String, Double] = Map.empty,
      p50UserCpu: Option[Double] = None,
      floorFlags: Option[Map[String, Double]] = None): String = {
    // collision guard: two names compressing to one short key would
    // silently merge bench lines — disambiguate at render time with a
    // stable hash suffix (BenchLineSpec pins the current catalog clean)
    val keys: Map[String, String] = results.keys
      .map(n => n -> shortKey(n)).toSeq
      .groupBy(_._2).valuesIterator.flatMap { g =>
        if (g.size == 1) g
        else g.map { case (n, k) =>
          n -> (k + "_" + java.lang.Integer.toHexString(n.hashCode).take(4))
        }
      }.toMap
    def renderMap(rs: Seq[(String, Double)], f: Double => String,
        display: Double => String = null): String = {
      // zero-drop (catalog-growth headroom): entries that round to "0" at
      // the current precision carry no information the total doesn't —
      // fold them into one "_z" count ("_z" cannot collide: query keys
      // are digits or s/k-prefixed, and "_rest" is the only other
      // synthetic). bench_detail.json keeps every value at full precision.
      // `display` (VERDICT r16 item 7): survivors of the fold may render at
      // a FINER precision than the fold test — the fold bounds the entry
      // count, so whole-second quantization of the listed values bought no
      // length headroom while blinding the driver's per-query comparison
      // (26 of 32 common queries rendered "1" in r16 and every ratio was a
      // 100 %-step artifact); centisecond survivors cost ~3 chars each over
      // a BOUNDED list. BenchLineSpec pins the worst-case length.
      val disp = if (display == null) f else display
      val rendered = rs.map { case (k, v) =>
        (keys.getOrElse(k, k), f(v), disp(v))
      }
      val (zeros0, nonzero0) = rendered.partition(_._2 == "0")
      val zeros = zeros0
      val nonzero = nonzero0.map { case (k, _, d) => (k, d) }
      val entries = nonzero.map { case (k, v) => "\"" + k + "\":" + v } ++
        (if (zeros.isEmpty) Nil else Seq("\"_z\":" + zeros.size))
      val qs = entries.mkString("{", ",", "}")
      // flag values keep centisecond precision at EVERY rung: the lists
      // are bounded (MaxP50Flags), so they never threaten the ceiling,
      // and a flag rendered "0" at integer precision loses the very
      // information it exists to carry
      val ff = (v: Double) =>
        trimZeros("%.2f".formatLocal(java.util.Locale.ROOT, v))
      val total = if (results.nonEmpty) results.values.sum else 0.0
      val sf = sfDir.split('/').last
      // p50 visibility (VERDICT r7 #7): the total plus a BOUNDED list of
      // the worst min->p50 offenders, so within-session degradation shows
      // in BENCH_r{N}.json itself, not only in bench_detail.json
      val p50Part = if (p50s.isEmpty) "" else {
        // the flag tests the STEADY-TAIL p50 (see steadyTail): warm-down
        // ramps are warm-up, not steady-state degradation; p50_total
        // stays the honest full-trace median sum
        def flagV(n: String, p: Double) = steadyP50s.getOrElse(n, p)
        val flags = p50s.toSeq
          .filter { case (n, p) => results.get(n).exists(m => p50Flagged(m, flagV(n, p))) }
          .sortBy { case (n, p) => (-(flagV(n, p) - results(n)), n) }
          .take(MaxP50Flags)
          .map { case (n, p) => "\"" + keys.getOrElse(n, n) + "\":" + ff(flagV(n, p)) }
          .mkString("{", ",", "}")
        // p50_user_cpu: the catalog-wide sum of per-query MEDIAN user-cpu
        // seconds — the host-noise-robust cross-round comparator (wall and
        // total cpu_s ride host pressure; user cpu at constant plans is
        // the code's own work, so round N vs N−1 is plain arithmetic)
        val userPart = p50UserCpu.fold("")(u =>
          s""","p50_user_cpu":${trimZeros("%.1f".formatLocal(java.util.Locale.ROOT, u))}""")
        s""","p50_total":${fmt(p50s.values.sum)}$userPart,"p50_flags":$flags"""
      }
      // spike visibility (VERDICT r8 #8): worst-rep total plus a BOUNDED
      // list of >3×-p50 spike queries, so single-rep pathologies reach the
      // headline artifact instead of hiding in bench_detail.json
      val maxPart = if (maxs.isEmpty) "" else {
        // the flag tests the ATTRIBUTED max (see flagMax): an external
        // wall spike with flat user cpu must not flag; max_total stays
        // the honest full-trace worst
        def mFlag(n: String, m: Double) = flagMaxs.getOrElse(n, m)
        val flags = maxs.toSeq
          .filter { case (n, m) => p50s.get(n).exists(p => maxFlagged(p, mFlag(n, m))) }
          .sortBy { case (n, m) => (-(mFlag(n, m) - p50s(n)), n) }
          .take(MaxP50Flags)
          .map { case (n, m) => "\"" + keys.getOrElse(n, n) + "\":" + ff(mFlag(n, m)) }
          .mkString("{", ",", "}")
        s""","max_total":${fmt(maxs.values.sum)},"max_flags":$flags"""
      }
      // cold-start visibility (VERDICT r9 item 7): rep 1 is excluded from
      // max_flags by design, so first-invocation regressions get their own
      // BOUNDED flag list, keyed on the catalog's shared cold-tax baseline
      val coldPart = if (rep1s.isEmpty || p50s.isEmpty) "" else {
        val mr = coldMedianRatio(rep1s, p50s)
        val flags = rep1s.toSeq
          .filter { case (n, r1) => p50s.get(n).exists(p => coldFlagged(r1, p, mr)) }
          .sortBy { case (n, r1) => (-(r1 - p50s(n)), n) }
          .take(MaxP50Flags)
          .map { case (n, r1) => "\"" + keys.getOrElse(n, n) + "\":" + ff(r1) }
          .mkString("{", ",", "}")
        s""","cold_flags":$flags"""
      }
      // floor-regression visibility (VERDICT r15 item 2): session mins far
      // above the committed best-known floor, emitted ONLY under the
      // quiet-env gate (None = loud host, field omitted — see
      // envQuietForFloors); Some(empty) renders "{}" so a quiet clean run
      // is distinguishable from an unchecked one
      val floorPart = floorFlags.fold("") { flagsMap =>
        val flags = flagsMap.toSeq
          .sortBy { case (n, v) => (-v, n) }
          .take(MaxP50Flags)
          .map { case (n, v) => "\"" + keys.getOrElse(n, n) + "\":" + ff(v) }
          .mkString("{", ",", "}")
        s""","floor_flags":$flags"""
      }
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs$p50Part$maxPart$coldPart$floorPart$env,"sf":"$sf"}"""
    }
    def render(f0: Double => String, d0: Double => String = null): String = {
      // trimmed at every ladder level, so precision degrades later
      val f = (v: Double) => trimZeros(f0(v))
      val d = if (d0 == null) null else (v: Double) => trimZeros(d0(v))
      renderMap(results.toSeq, f, d)
    }
    val centi = (v: Double) => "%.2f".formatLocal(java.util.Locale.ROOT, v)
    // ms precision normally; if the query set ever grows the line past the
    // tail window, degrade the FOLD threshold before losing parseability —
    // survivors keep centisecond display at every rung (see renderMap)
    val line3 = render(fmt)
    if (line3.length <= MaxLineLength) line3
    else {
      val line2 = render(centi)
      if (line2.length <= MaxLineLength) line2
      else {
        val line1 = render(v => "%.1f".formatLocal(java.util.Locale.ROOT, v), centi)
        if (line1.length <= MaxLineLength) line1
        else {
          val line0 = render(v => "%.0f".formatLocal(java.util.Locale.ROOT, v), centi)
          if (line0.length <= MaxLineLength) line0
          else {
            // terminal fallback — bounded at ANY catalog size: keep the
            // slowest queries that fit, fold the remainder into "_rest"
            // (total stays the full sum, so the driver metric is intact)
            val sorted = results.toSeq.sortBy { case (k, v) => (-v, k) }
            var keep = sorted.size
            var out = line0
            while (out.length > MaxLineLength && keep > 1) {
              keep = keep / 2
              val rest = sorted.drop(keep).map(_._2).sum
              out = renderMap(sorted.take(keep) :+ ("_rest" -> rest),
                v => "%.1f".formatLocal(java.util.Locale.ROOT, v))
            }
            out
          }
        }
      }
    }
  }

  /** One query's full rep block: `reps` timed runs plus the bounded
    * adaptive warm-down, with the per-rep lifecycle the round-9/11 leak
    * hunts converged on — settle the heap once up front, then per rep:
    * time the action; record the stop-the-world GC delta, the
    * storage-memory high-water (20 ms sampler), the block-removal count
    * and the codegen-compilation count over the window — so a spike rep
    * arrives with its mechanism attached (GC pause vs storage/eviction
    * churn vs recompilation vs none-of-the-JVM's-business). Then RELEASE
    * the frame's pins (untimed — driver-side unpersist; without it, dead
    * pinned blocks from reps 1..k-1 wait for a driver GC while rep k
    * allocates — the round-8 q145 rep ramp) and DROP the broadcasts the
    * rep created (untimed — `removeBroadcasts` on the created-this-rep
    * id delta; without it, AQE broadcast-join relations — weak-ref'd,
    * freed only by a driver GC that a mostly-empty 12 GiB heap never
    * runs — accumulate across reps: the round-11 q123 flag, +90.5 MB of
    * broadcast blocks per rep with zero removals and zero GC, pushing
    * late reps into storage-pressure CPU). Both are what a real
    * pipeline's driver does between queries (consume, drop references,
    * let GC + ContextCleaner reclaim) — the rep boundary just runs the
    * reclaim deterministically instead of waiting for a GC that the
    * bench heap never needs. The broadcast drops (and the pin releases)
    * surface as block-removal listener events: `blk_rm`'s constant
    * per-rep baseline includes them by design.
    *
    * With `assertDrain` (CI: BenchDrainSpec; the live-pressure variants
    * stay in ScaleStressSpec) the block is a leak CONTRACT, not a flag:
    * after the last rep's cleanup, any broadcast id created during the
    * block that still has live blocks, or any growth in rdd block count
    * over the block's start, throws — turning the q123/q133 leak class
    * from a bench-flag-and-chase into an immediate spec failure. */
  def repBlock(spark: SparkSession,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      sfDir: String, reps: Int,
      removedBlocks: java.util.concurrent.atomic.AtomicLong,
      assertDrain: Boolean = false, name: String = "",
      stagesRun: java.util.concurrent.atomic.AtomicLong =
        new java.util.concurrent.atomic.AtomicLong(0),
      shufWrite: java.util.concurrent.atomic.AtomicLong =
        new java.util.concurrent.atomic.AtomicLong(0),
      jobsRun: java.util.concurrent.atomic.AtomicLong =
        new java.util.concurrent.atomic.AtomicLong(0)): Seq[Rep] = {
    import org.apache.spark.GraftSparkBridge
    // settle the heap before timing: one query's garbage (and its GC
    // debt) must not be billed to the next query's runs
    System.gc()
    val bcQuery0 = GraftSparkBridge.broadcastIds()
    val rdd0 = GraftSparkBridge.blockCensus().get("rdd").map(_._1).getOrElse(0L)
    // flight-recorder rig (graft.tools.RepProfiler): armed queries record
    // every rep; pathological reps (>1.5x block min) dump profile +
    // summary next to bench_detail.json, everything else is discarded
    val profiled = graft.tools.RepProfiler.armedFor(name)
    val recordings =
      scala.collection.mutable.ArrayBuffer.empty[Option[jdk.jfr.Recording]]
    def run(): Rep = {
      GraftSparkBridge.drainListenerBus(spark.sparkContext)
      val gc0 = gcMillis()
      val cg0 = GraftSparkBridge.codegenCompileCount
      val ev0 = removedBlocks.get()
      val st0 = stagesRun.get()
      val sw0 = shufWrite.get()
      val jb0 = jobsRun.get()
      val bc0 = GraftSparkBridge.broadcastIds()
      val host0 = graft.tools.HostStat.snap()
      val storHi = new java.util.concurrent.atomic.AtomicLong(
        GraftSparkBridge.storageMemoryUsed)
      val stopSampler = new java.util.concurrent.atomic.AtomicBoolean(false)
      val sampler = new Thread(() => {
        while (!stopSampler.get()) {
          storHi.getAndAccumulate(GraftSparkBridge.storageMemoryUsed, math.max(_, _))
          try Thread.sleep(20) catch { case _: InterruptedException => stopSampler.set(true) }
        }
      }, "graft-bench-storage-sampler")
      sampler.setDaemon(true)
      sampler.start()
      val rec = if (profiled) graft.tools.RepProfiler.start() else None
      val t0 = System.nanoTime()
      val frame =
        try { val d = fn(spark, sfDir); d.count(); d }
        catch { case _: Throwable => null }
      val sec = (System.nanoTime() - t0) / 1e9
      // stop the recording right at the timed boundary so the profile
      // window matches the wall measurement it explains
      rec.foreach(graft.tools.RepProfiler.stop)
      recordings += rec
      // interference snapshot BEFORE the untimed release below — the
      // window must match the wall measurement it attributes
      val hostD = graft.tools.HostStat.delta(host0, graft.tools.HostStat.snap())
      stopSampler.set(true)
      sampler.join(500)
      storHi.getAndAccumulate(GraftSparkBridge.storageMemoryUsed, math.max(_, _))
      val gcd = gcMillis() - gc0
      if (frame != null) graft.core.GraftSession.release(frame, blocking = true)
      // drop this rep's broadcasts (delta only: broadcasts alive before
      // the rep — fixture/warm-up artifacts — are never touched; nothing
      // outside the rep can hold a this-rep broadcast because every rep
      // re-plans its query from scratch)
      GraftSparkBridge.removeBroadcasts(
        GraftSparkBridge.broadcastIds() -- bc0, blocking = true)
      GraftSparkBridge.drainListenerBus(spark.sparkContext)
      val bcastLeft = GraftSparkBridge.blockCensus()
        .get("broadcast").map(_._2).getOrElse(0L)
      Rep(sec, gcd, storHi.get(),
        removedBlocks.get() - ev0,
        GraftSparkBridge.codegenCompileCount - cg0,
        hostD.cpuS, hostD.otherBusyS, hostD.stealS, hostD.jitMs, bcastLeft,
        stagesRun.get() - st0, shufWrite.get() - sw0, hostD.cpuSysS,
        jobsRun.get() - jb0)
    }
    val times = scala.collection.mutable.ArrayBuffer.fill(reps)(Rep(0.0, 0L, 0L, 0L, 0L))
    times.indices.foreach(i => times(i) = run())
    // adaptive warm-down: if the LAST run still set a materially new
    // minimum (≥5 % below all earlier runs), C2 is still compiling the
    // hot loops — extend (bounded) until the floor stabilizes, so the
    // reported min is steady-state for heavy codegen queries too
    var extra = 0
    while (extra < 4 && times.size > 1 && times.last.sec <= times.init.map(_.sec).min * 0.95) {
      times += run(); extra += 1
    }
    if (profiled) {
      // dump at most the 2 slowest pathological reps plus the min rep as
      // the diff baseline; discard the rest (recordings buffer to the JFR
      // repo, not the heap, but dumps are disk we only spend on evidence)
      val secs = times.map(_.sec)
      val minV = secs.min
      val flaggedIdx = secs.zipWithIndex
        .filter { case (s, _) => graft.tools.RepProfiler.dumpWorthy(minV, s) }
        .sortBy { case (s, _) => -s }.take(2).map(_._2).toSet
      val keepIdx =
        if (flaggedIdx.isEmpty) Set.empty[Int]
        else flaggedIdx + secs.indexOf(minV)
      recordings.zipWithIndex.foreach {
        case (Some(r), i) if keepIdx.contains(i) =>
          val tag = if (flaggedIdx.contains(i)) "slow" else "min"
          graft.tools.RepProfiler.dumpWithSummary(r,
            s"bench_jfr_${shortKey(name)}_rep${i + 1}_$tag")
            .foreach(p => System.err.println(
              f"[graft-bench] $name rep ${i + 1} (${secs(i)}%.3f s vs min " +
                f"$minV%.3f s) profiled -> $p"))
        case (Some(r), _) => graft.tools.RepProfiler.discard(r)
        case _ =>
      }
    }
    if (assertDrain) {
      val leaked = GraftSparkBridge.broadcastIds() -- bcQuery0
      if (leaked.nonEmpty) throw new IllegalStateException(
        s"$name: ${leaked.size} broadcast(s) created during the rep block " +
          s"still have live blocks after cleanup: ${leaked.toSeq.sorted.take(8)}")
      val rdd1 = GraftSparkBridge.blockCensus().get("rdd").map(_._1).getOrElse(0L)
      if (rdd1 > rdd0) throw new IllegalStateException(
        s"$name: rdd block count grew over the rep block ($rdd0 -> $rdd1): " +
          "a pin escaped the per-rep release")
    }
    times.toSeq
  }

  def main(args: Array[String]): Unit = {
    // machine context BEFORE any Spark work: the pre-run loadavg is the
    // "was the machine already busy" signal for cross-round adjudication
    val load1Pre = graft.tools.HostStat.load1
    val runSnap0 = graft.tools.HostStat.snap()
    val wall0 = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // static conf, must be on the builder: see GraftSession.configure
      .config("spark.sql.codegen.cache.maxEntries", "12000")
      // partition-listing metadata cache sized for the FULL catalog's
      // listing set (206 queries × tables + the persisted index dirs,
      // each with ~64-200 `bucket=`/generation partition dirs). At the
      // 250 MB default the cache EVICTS mid-run and the next index read
      // re-lists in a 1-stage job — the q84/q93/q157 per-rep stage/job
      // wobble (19,19,19,20,19,19) both r14 and r15 flagged, plus the
      // "Evicting cached table partition metadata" WARN in the driver
      // tail. A real deployment sizes this cache to its table count for
      // exactly this reason (plan-invariant re-reads).
      .config("spark.sql.hive.filesourcePartitionFileCacheSize", 1073741824L)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // targeted repro loops (the q81 flight-recorder hunt needs dozens of
    // same-session reps of ONE query): SPARK_GRAFT_BENCH_ONLY=<prefix,...>
    // restricts the catalog; unset = the full driver surface
    // a set-but-EMPTY var means unset (a CI var defaulted to "") — it must
    // not silently filter out the whole catalog
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val queries = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.exists(p => n == p || n.startsWith(p)))
    }
    // WHICH queries carry JFR overhead this run, and where the dynamic
    // arming read its flags from (r15 ADVICE: a bench launched outside
    // the repo root silently degrades to the q81-only fallback — make
    // the arming set visible so the operator can discount profiler
    // overhead when re-adjudicating a flagged query)
    System.err.println(graft.tools.RepProfiler.armingReport())
    // warm-up outside the timed loop: parquet reader, codegen, broadcast
    // machinery, function registration — so the first timed query isn't
    // charged for JVM initialization
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // plan (don't execute) every query once: connector queries seed their
    // emulated external systems at plan time — fixture setup, not query work
    queries.foreach { case (_, fn) =>
      try fn(spark, sfDir) catch { case _: Throwable => () }
    }
    // execute the analytic queries once at the smallest SF: same plan shapes
    // → same generated code, so Janino compilation happens here and the
    // timed loop measures operator throughput, not compiler startup.
    // Connector (src_/snk_) queries skip this cross-SF warm (their fixture
    // namespaces are per-sf-dir); their own rep 1 below is their warm-up.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      queries.foreach { case (name, fn) =>
        if (name.startsWith("q"))
          try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    // settle the JIT backlog before timing (STRESS.md round 16): the
    // catalog-wide warm above queues hundreds of C2 compilations of
    // Spark's own driver infrastructure (optimizer rules, SizeEstimator,
    // serialization); without a settle that backlog drains into whichever
    // query the timed loop runs first and bills its rep 1 with
    // catalog-wide compile cost (r15: q158 rep 1 carried 160 CPU-s of
    // jit, of which its own first-sf0.1 burst is only ~40-46 s). Wait —
    // bounded — until the process-wide compile rate drops below 200 ms
    // per 2 s window, so rep 1 measures the query's OWN cold cost.
    locally {
      val jit = java.lang.management.ManagementFactory.getCompilationMXBean
      if (jit != null && jit.isCompilationTimeMonitoringSupported) {
        val deadlineNs = System.nanoTime() + 90L * 1000000000L
        var prev = jit.getTotalCompilationTime
        var settled = false
        while (!settled && System.nanoTime() < deadlineNs) {
          Thread.sleep(2000)
          val cur = jit.getTotalCompilationTime
          settled = cur - prev < 200
          prev = cur
        }
        System.err.println(
          s"[bench] jit settle: ${if (settled) "settled" else "90s deadline"}" +
            s" (totalCompileMs=${jit.getTotalCompilationTime})")
      }
    }
    // EVERY query: 5 runs, report min (steady-state operator cost, not
    // scheduler/GC/first-run-compile noise) AND p50 (what a bencher who
    // didn't pick the best run would see — the two together attribute a
    // 10 % delta to noise vs regression). All seeding and sink writes
    // are one-time (seedOnce) fixture setup at first plan/execution, so
    // repeated runs are read-only and idempotent.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    // eviction visibility (VERDICT r9 item 1): count block-removal events.
    // The harness's own per-rep releases contribute a CONSTANT per-rep
    // baseline; eviction churn (the q81-spike hypothesis) shows as a
    // spike-rep outlier against the query's other reps.
    val removedBlocks = new java.util.concurrent.atomic.AtomicLong(0)
    // plan-shape channels (the r14 q81 attribution): stages run and
    // shuffle bytes written per rep — a rep whose cpu_s multiplies while
    // gc/storage/codegen stay flat is either external (steal/other) or a
    // PLAN-SHAPE change (an exchange materialized instead of reused);
    // these two channels separate the latter from the former
    val stagesRun = new java.util.concurrent.atomic.AtomicLong(0)
    val shufWrite = new java.util.concurrent.atomic.AtomicLong(0)
    // jobs per rep (the q116 attribution channel): a near-serial query —
    // wall ≫ cpu_s/threads — is usually a many-small-jobs profile (driver
    // actions in sequence: stats heads, pin counts, broadcast builds);
    // this channel counts them so the serial bound is readable per rep
    val jobsRun = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onBlockUpdated(e: org.apache.spark.scheduler.SparkListenerBlockUpdated): Unit =
        if (e.blockUpdatedInfo.storageLevel == org.apache.spark.storage.StorageLevel.NONE) {
          removedBlocks.incrementAndGet(): Unit
        }
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stagesRun.incrementAndGet()
        // taskMetrics is null for failed/aborted stages — an NPE here is
        // swallowed by the listener bus and silently undercounts (r14
        // ADVICE); the rep boundary drains the bus before reading, so no
        // post-window event can land in the next rep's delta
        val tm = e.stageInfo.taskMetrics
        if (tm != null) shufWrite.addAndGet(tm.shuffleWriteMetrics.bytesWritten): Unit
      }
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobsRun.incrementAndGet(): Unit
      }
    })
    val allDetail: Map[String, Seq[Rep]] = queries.map { case (name, fn) =>
      // the drain contract runs ON BY DEFAULT (VERDICT r12 item 7): the
      // driver's own bench now enforces the leak class, not only CI
      // (BenchDrainSpec); SPARK_GRAFT_BENCH_ASSERT_DRAIN=0 opts out
      name -> repBlock(spark, fn, sfDir, reps, removedBlocks,
        assertDrain = !sys.env.get("SPARK_GRAFT_BENCH_ASSERT_DRAIN").contains("0"),
        name = name, stagesRun = stagesRun, shufWrite = shufWrite,
        jobsRun = jobsRun)
    }
    val allRuns: Map[String, Seq[Double]] = allDetail.map { case (n, ts) => n -> ts.map(_.sec) }
    val results = allRuns.map { case (n, ts) => n -> ts.min }
    def p50(ts: Seq[Double]): Double = ts.sorted.apply((ts.size - 1) / 2)
    // ONE derivation of the scale key for the build line, the detail
    // marker, the rotation gate and the floors section below — three
    // inline variants of this split were drifting apart
    val sfK = sfDir.split('/').filter(_.nonEmpty).last
    // the q84 index build is a one-time amortized cost (paid during
    // warm-up above) — reported as its own line, never inside q84's time
    val buildLine = graft.queries.Catalog.ivfIndexBuildSeconds
      .get(sfK).map("ivf_build" -> _)
    // per-query min/p50/runs detail — too wide for the driver's ~2000-char
    // stdout tail, so it lands in a file the judge can read directly.
    // The "_sf" marker is the FIRST ENTRY (not part of the mkString start
    // string) so an empty-catalog run still renders valid JSON — a start
    // string ending in ",\n" would leave a dangling comma when the entry
    // seq is empty.
    val detail = (s"""  "_sf": {"sf": "$sfK"}""" +:
      allDetail.toSeq.sortBy(_._1).map { case (n, rs) =>
      val ts = rs.map(_.sec)
      s"""  "$n": {"min": ${fmt(ts.min)}, "p50": ${fmt(p50(ts))}, """ +
        s""""p50_steady": ${fmt(p50(steadyTail(ts)))}, """ +
        s""""max": ${fmt(ts.max)}, """ +
        s""""runs": [${ts.map(fmt).mkString(", ")}], """ +
        s""""gc_ms": [${rs.map(_.gcMs).mkString(", ")}], """ +
        s""""stor_hi_mb": [${rs.map(_.storHiBytes >> 20).mkString(", ")}], """ +
        s""""bcast_mb": [${rs.map(_.bcastBytesLeft >> 20).mkString(", ")}], """ +
        s""""blk_rm": [${rs.map(_.blocksRemoved).mkString(", ")}], """ +
        s""""cg": [${rs.map(_.codegenCompiles).mkString(", ")}], """ +
        s""""cpu_s": [${rs.map(r => fmt(r.cpuS)).mkString(", ")}], """ +
        s""""other_busy_s": [${rs.map(r => fmt(r.otherBusyS)).mkString(", ")}], """ +
        s""""steal_s": [${rs.map(r => fmt(r.stealS)).mkString(", ")}], """ +
        s""""jit_ms": [${rs.map(_.jitMs).mkString(", ")}], """ +
        s""""stages": [${rs.map(_.stages).mkString(", ")}], """ +
        s""""shuf_w_mb": [${rs.map(_.shufWriteBytes >> 20).mkString(", ")}], """ +
        s""""sys_s": [${rs.map(r => fmt(r.cpuSysS)).mkString(", ")}], """ +
        s""""jobs": [${rs.map(_.jobs).mkString(", ")}]}"""
    }).mkString("{\n", ",\n", "\n}")
    // cross-round artifact rotation (VERDICT r15 item 5): on FULL-catalog
    // runs, keep the previous full detail as bench_detail_prev.json and
    // write the BenchDiff report next to it — the round-over-round
    // user-cpu comparison becomes committed measurement state instead of
    // a per-adjudication re-derivation. Targeted repro runs (BENCH_ONLY)
    // overwrite bench_detail.json as before but never rotate the
    // snapshot, and a half-empty detail (an interrupted or targeted run)
    // is not promoted to "previous round".
    val detailPath = java.nio.file.Paths.get("bench_detail.json")
    val prevPath = java.nio.file.Paths.get("bench_detail_prev.json")
    // rotation + diff gate on SCALE as well as fullness: a full-catalog
    // run at a different sf (a local sf0.001 smoke) must neither promote
    // the committed sf0.1 detail to "previous round" nor emit a
    // cross-scale comparison. Files predating the "_sf" marker (and
    // corrupt files sfOf can't read) are treated as sf0.1 — every
    // committed pre-marker full detail IS an sf0.1 run, so the default
    // must be the CONCRETE scale, never "matches anything" (sfGateAllows,
    // BenchLineSpec-pinned). Each file's marker is read once.
    val detailSf = graft.tools.BenchDiff.sfOf(detailPath.toString)
    if (only.isEmpty)
      try {
        if (java.nio.file.Files.exists(detailPath) &&
            sfGateAllows(detailSf, sfK) &&
            graft.tools.BenchDiff.parse(detailPath.toString).size >= queries.size / 2)
          java.nio.file.Files.copy(detailPath, prevPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
      } catch { case _: Throwable => () }
    try java.nio.file.Files.write(detailPath, detail.getBytes("UTF-8")): Unit
    catch { case _: Throwable => () }
    if (only.isEmpty)
      try {
        if (java.nio.file.Files.exists(prevPath) &&
            sfGateAllows(graft.tools.BenchDiff.sfOf(prevPath.toString), sfK))
          java.nio.file.Files.write(java.nio.file.Paths.get("benchdiff.txt"),
            graft.tools.BenchDiff.report(
              graft.tools.BenchDiff.parse(prevPath.toString),
              graft.tools.BenchDiff.parse(detailPath.toString), 15)
              .getBytes("UTF-8")): Unit
      } catch { case _: Throwable => () }
    // scale/skew stress line (10x corpus, hot keys — see StressData): one
    // run per op, printed BEFORE the main metric line so tail truncation
    // can only ever cost the stress line, never the driver-parsed one
    if (sys.env.get("SPARK_GRAFT_STRESS").forall(_ == "1"))
      try println(graft.tools.StressBench.line(spark))
      catch { case e: Throwable => println(s"""{"metric":"stress","error":"${e.getClass.getSimpleName}"}""") }
    // spike detector input: the STEADY-STATE max (reps 2+). Rep 1 carries
    // known cold costs (codegen for connector fixtures, first-run JIT) that
    // would permanently flag; the q81-class pathology this flag exists for
    // (r8: a 13 s rep THREE) is mid-session by definition. bench_detail.json
    // keeps every rep, rep 1 included, so nothing is hidden.
    // best-known floor tracking: merge this session's mins into the
    // committed floors.json (per sf dir, env-stamped) so regressions
    // against the best-ever floor stay visible when every session is noisy
    val load1Post = graft.tools.HostStat.load1
    val runDelta = graft.tools.HostStat.delta(runSnap0, graft.tools.HostStat.snap())
    val wallSec = (System.nanoTime() - wall0) / 1e9
    // floor-regression tripwire (VERDICT r15 item 2): compare this
    // session's mins against the COMMITTED best-known floors BEFORE
    // merging, under the quiet-env gate — a loud host omits the field
    // (floors are quiet-window numbers; comparing a contended session
    // against them only manufactures noise)
    val floorRatio = sys.env.get("SPARK_GRAFT_FLOOR_RATIO")
      .flatMap(_.toDoubleOption).getOrElse(1.5)
    val floorFlags: Option[Map[String, Double]] =
      // capacity = HOST cores, not Spark threads: steal_s/other_busy_s
      // are whole-host /proc/stat channels, so judging them against the
      // (smaller) executor-thread capacity inflates the ratio — on this
      // 32-core host a local[4] run with the host's ~1.5 %-of-4-cpu
      // baseline steal classified LOUD forever and the tripwire never
      // fired (the scaladoc example always did the arithmetic at 32).
      // HostStat.hostCpus, not availableProcessors: the latter is
      // cgroup-aware and would re-create the mismatch inside a
      // cpu-limited container
      if (!envQuietForFloors(runDelta, wallSec, graft.tools.HostStat.hostCpus)) None
      else {
        val prior = loadFloors(java.nio.file.Paths.get("floors.json"))
          .flatMap(_.get(sfK)).map(_._2).getOrElse(Map.empty[String, Double])
        Some((results ++ buildLine).filter { case (n, v) =>
          prior.get(n).exists(f => floorRegressed(f, v, floorRatio))
        })
      }
    try updateFloors(java.nio.file.Paths.get("floors.json"),
      sfK, results ++ buildLine,
      Map("load1_pre" -> load1Pre, "load1_post" -> load1Post,
        "cpu_s" -> runDelta.cpuS, "sys_s" -> runDelta.cpuSysS)): Unit
    catch { case _: Throwable => () }
    println(renderLine(results ++ buildLine, sfDir,
      allRuns.map { case (n, ts) => n -> p50(ts) },
      allRuns.map { case (n, ts) =>
        n -> (if (ts.size > 1) ts.drop(1).max else ts.max) },
      allRuns.map { case (n, ts) => n -> ts.head },
      allDetail.map { case (n, rs) => n -> flagP50(rs) },
      envPart(load1Pre, load1Post, runDelta),
      allDetail.map { case (n, rs) => n -> flagMax(rs) },
      // per-query MEDIAN user-cpu, summed — JIT-SUBTRACTED per rep so the
      // line agrees with BenchDiff's robust axis (r15 ADVICE: HostStat's
      // process CPU bills C2 compiler threads, so a cold block's "user"
      // is mostly compile time; user − jit is the code's own cycles).
      // r15's committed 161.9 s predates the adjustment — recompute its
      // adjusted value from bench_detail_prev.json when comparing.
      Some(allDetail.valuesIterator.map { rs =>
        val us = rs.map(r => math.max(0.0, r.userS - r.jitMs / 1000.0)).sorted
        us((us.size - 1) / 2)
      }.sum),
      floorFlags))
    spark.stop()
  }
}
