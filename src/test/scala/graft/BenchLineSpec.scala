package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses BENCH_r{N}.json from a bounded (~2000-char) tail of the
  * sbt run. Rounds 1-3 recorded parsed:null because the single JSON line,
  * carrying every query's full name, outgrew that window and lost its opening
  * brace. These guards pin the rendered line against the CURRENT query set so
  * adding queries can't silently re-break the bench report.
  */
class BenchLineSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq

  test("short keys stay unique across the whole query set") {
    val keys = names.map(Bench.shortKey)
    assert(keys.distinct.size === keys.size,
      s"colliding bench keys: ${keys.groupBy(identity).filter(_._2.size > 1).keys}")
  }

  test("rendered line fits the driver tail window even at worst-case timings") {
    // every query at a worst-case 4-digit-second timing: the renderer must
    // stay under the ceiling, degrading per-query precision if needed
    val line = Bench.renderLine(names.map(_ -> 9999.999).toMap, "/root/testdata/sf0.1")
    assert(line.length <= Bench.MaxLineLength,
      s"bench line ${line.length} chars — will be truncated")
    // at realistic timings the drop-fastest fallback must not fire and
    // every query must keep at least integer-second precision (the
    // 205-query catalog outgrew sub-second-for-all inside the fixed
    // ~1900-char driver tail window — impossible at any key scheme;
    // bench_detail.json carries full ms precision per query under the
    // FULL query names, and the headline total keeps ms precision)
    // a realistic heavy profile (the r12 shape: mostly sub-second, a
    // second-scale band, a few multi-second heads — total ~2x the real
    // 51 s bench) must render every query without the fallback
    val typical = Bench.renderLine(
      names.zipWithIndex.map { case (n, i) =>
        n -> (if (i % 20 == 0) 4.312 else if (i % 5 == 0) 1.271 else 0.317)
      }.toMap, "/root/testdata/sf0.1")
    assert(!typical.contains("\"_rest\""),
      "realistic timings must not need the drop-fastest fallback")
    assert(typical.length <= Bench.MaxLineLength)
    // the absurd uniform-10s profile (a 34-minute bench) may fold the
    // fastest half into _rest — but stays bounded and parseable
    val absurd = Bench.renderLine(names.map(_ -> 9.999).toMap, "/root/testdata/sf0.1")
    assert(absurd.length <= Bench.MaxLineLength)
    // a typical mixed profile (most queries sub-second): no fallback, and
    // the ms-precision TOTAL is intact even when per-query values degrade
    val mixed = Bench.renderLine(
      names.zipWithIndex.map { case (n, i) => n -> (0.1 + (i % 10) / 10.0) }.toMap,
      "/root/testdata/sf0.1")
    assert(!mixed.contains("\"_rest\""),
      "mixed sub-second profile must not need the drop-fastest fallback")
    assert(mixed.length <= Bench.MaxLineLength)
    assert("\"value\":\\d+\\.\\d".r.findFirstIn(mixed).isDefined,
      "the headline total must keep sub-second precision")
  }

  test("a 300-query catalog renders bounded and parseable — worst-case " +
      "timings AND the realistic mostly-fast profile (zero-drop rung)") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    // ~230 queries was the projected ceiling for the r13 scheme; pin a
    // 300-query synthetic catalog so catalog growth can't re-break the
    // driver line. Worst case (every query at 4-digit seconds, nothing
    // zero-droppable): the slowest-that-fit + _rest terminal keeps the
    // line bounded with the total intact.
    val synth = (1 to 300).map(i => f"q${i + 600}%d_synthetic_name_$i")
    val worst = Bench.renderLine(synth.map(_ -> 9999.999).toMap,
      "/root/testdata/sf0.1")
    assert(worst.length <= Bench.MaxLineLength,
      s"300-query worst-case line is ${worst.length} chars")
    val wj = JsonMethods.parse(worst)
    assert((wj \ "metric") === JString("total"))
    assert(math.abs((wj \ "value").asInstanceOf[JDouble].num -
      synth.map(_ => 9999.999).sum) < 0.01,
      "the total must stay the full sum whatever the fallback folds")
    // realistic 300-query profile (most queries are fast connector
    // fixtures): the zero-drop rung folds sub-precision entries into one
    // "_z" count instead of reaching the _rest fallback
    val realistic = Bench.renderLine(
      synth.zipWithIndex.map { case (n, i) =>
        n -> (if (i % 20 == 0) 4.312 else if (i % 5 == 0) 1.271 else 0.017)
      }.toMap, "/root/testdata/sf0.1")
    assert(realistic.length <= Bench.MaxLineLength)
    assert(!realistic.contains("\"_rest\""),
      "a realistic 300-query profile must keep every slow query's value")
    assert(realistic.contains("\"_z\":"),
      "the fast tail must fold into the _z count")
    val rj = JsonMethods.parse(realistic)
    assert((rj \ "queries" \ "_z") === JInt(240),
      "240 of 300 render as 0 at the settled precision")
  }

  test("zero-fold survivors keep centisecond precision at the folded rungs " +
      "(VERDICT r16 item 7: whole-second quantization blinded PERF)") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    // the r16 driver profile shape: ~40 second-scale queries, the rest a
    // fast tail that folds into _z at the settled rung. The survivors must
    // render at centisecond precision — "1" vs "2" carried no signal and
    // manufactured six phantom 0.5x "regressions" in PERF_r16.
    val profile = names.zipWithIndex.map { case (n, i) =>
      n -> (if (i % 5 == 0) 0.811 + (i % 7) * 0.211 else 0.317)
    }.toMap
    val line = Bench.renderLine(profile, "/root/testdata/sf0.1")
    assert(line.length <= Bench.MaxLineLength)
    assert(line.contains("\"_z\":"), "the fast tail must fold")
    assert(!line.contains("\"_rest\""))
    val j = JsonMethods.parse(line)
    val survivor = names.zipWithIndex.collectFirst {
      case (n, i) if i % 5 == 0 && i % 7 == 3 => n // value 1.444
    }.get
    assert((j \ "queries" \ Bench.shortKey(survivor)) === JDouble(1.44),
      "fold survivors must keep centisecond precision, not whole seconds")
  }

  test("flagP50 excludes externally-attributed reps (flat user cpu) and " +
      "keeps internal ones") {
    def rep(sec: Double, cpu: Double, sys: Double) =
      Bench.Rep(sec, 0L, 0L, 0L, 0L, cpuS = cpu, cpuSysS = sys)
    // the r14 q81 trace shape: user cpu ~3 s on EVERY rep; the elevated
    // reps' extra cpu is all stime → attributed external, flag p50 ≈ min
    val external = Seq(rep(1.3, 12, 9), rep(1.25, 11, 8), rep(7.8, 24, 21),
      rep(4.1, 25, 22), rep(1.31, 12, 9), rep(1.27, 11.5, 8.5))
    val pExt = Bench.flagP50(external)
    assert(!Bench.p50Flagged(1.25, pExt),
      s"kernel-time elevation on identical work must not flag: $pExt")
    // the same wall shape with the extra cpu in USER time (a real
    // internal pathology: an interpreted-path flip, storage-pressure churn)
    val internal = Seq(rep(1.3, 12, 9), rep(1.25, 11, 8), rep(7.8, 24, 9),
      rep(4.1, 25, 8), rep(7.5, 24, 9), rep(7.2, 23, 8.5))
    val pInt = Bench.flagP50(internal)
    assert(Bench.p50Flagged(1.25, pInt),
      s"user-cpu elevation must still flag: $pInt")
    // the max spike flag gets the same attribution: a single external
    // wall spike (user flat) must not max-flag; a user-cpu spike must
    val extSpike = Seq(rep(1.3, 12, 9), rep(1.25, 11, 8), rep(13.0, 24, 21),
      rep(1.31, 12, 9), rep(1.27, 11.5, 8.5))
    assert(!Bench.maxFlagged(1.28, Bench.flagMax(extSpike)),
      s"external spike must not max-flag: ${Bench.flagMax(extSpike)}")
    val intSpike = Seq(rep(1.3, 12, 9), rep(1.25, 11, 8), rep(13.0, 24, 8),
      rep(1.31, 12, 9), rep(1.27, 11.5, 8.5))
    assert(Bench.flagMax(intSpike) == 13.0,
      s"user-cpu spike must keep its max: ${Bench.flagMax(intSpike)}")
    // no CPU counters (cpuS 0 everywhere): both fall back to wall-only
    val noCpu = Seq(rep(1.3, 0, 0), rep(1.25, 0, 0), rep(13.0, 0, 0))
    assert(Bench.flagMax(noCpu) == 13.0)
    assert(Bench.p50Flagged(1.25, Bench.flagP50(noCpu)) ||
      Bench.flagP50(noCpu) >= 1.25)
  }

  test("externalRep demands plan-shape invariance, not just flat user cpu " +
      "(r14 ADVICE): extra stages / shuffle bytes / gc keep flagging") {
    def rep(sec: Double, cpu: Double, sys: Double, stages: Long = 7L,
        shufMb: Long = 6L, gcMs: Long = 40L) =
      Bench.Rep(sec, gcMs, 0L, 0L, 0L, cpuS = cpu, cpuSysS = sys,
        stages = stages, shufWriteBytes = shufMb << 20)
    val base = rep(1.25, 11, 8)
    // the r14 q81 evidence shape: identical stages/shuffle/gc, user flat,
    // extra wall all stime — external
    assert(Bench.externalRep(rep(7.8, 24, 21), base))
    // a LOST EXCHANGE REUSE: sys-dominated (shuffle files are syscalls),
    // user near-flat, but MORE stages and MORE shuffle bytes — internal,
    // the class the user-cpu-only predicate silently dropped
    assert(!Bench.externalRep(rep(7.8, 13, 9.5, stages = 11, shufMb = 48), base))
    // same stages but a shuffle-byte blowup alone (new spill-to-shuffle
    // path) — internal
    assert(!Bench.externalRep(rep(7.8, 13, 9.5, shufMb = 64), base))
    // gc blowup with flat user cpu (collector cycles bill partly to
    // stime) — internal
    assert(!Bench.externalRep(rep(7.8, 13, 9.5, gcMs = 2500), base))
    // and the full flag path: the lost-reuse trace must flag even though
    // every elevated rep is user-flat
    val lostReuse = Seq(base, rep(1.3, 12, 9),
      rep(7.8, 13, 9.5, stages = 11, shufMb = 48),
      rep(7.5, 13, 9.6, stages = 11, shufMb = 48),
      rep(7.6, 13, 9.4, stages = 11, shufMb = 48))
    assert(Bench.p50Flagged(1.25, Bench.flagP50(lostReuse)),
      s"sys-dominated plan-shape regressions must flag: ${Bench.flagP50(lostReuse)}")
    assert(Bench.maxFlagged(1.3, Bench.flagMax(lostReuse)))
    // small shuffle wobble (compression nondeterminism) stays external
    assert(Bench.externalRep(rep(7.8, 24, 21, shufMb = 6), base.copy(shufWriteBytes = 6L << 20)))
  }

  test("floors.json: pure merge keeps the best-known min; file round-trips " +
      "with per-sf env stamps and only improving runs restamp") {
    assert(Bench.mergeFloors(Map("a" -> 1.0, "b" -> 2.0),
      Map("a" -> 0.8, "c" -> 3.0)) === Map("a" -> 0.8, "b" -> 2.0, "c" -> 3.0))
    val f = java.nio.file.Files.createTempFile("graft-floors", ".json")
    java.nio.file.Files.delete(f)
    // first run creates the file and stamps the env (full-precision mins
    // quantize to the rendered 3 decimals)
    assert(Bench.updateFloors(f, "sf0.1",
      Map("q01_x" -> 1.2341234, "q02_y" -> 0.5), Map("load1_pre" -> 3.5)))
    val r1 = Bench.parseFloors(new String(java.nio.file.Files.readAllBytes(f), "UTF-8"))
    assert(r1("sf0.1")._2 === Map("q01_x" -> 1.234, "q02_y" -> 0.5))
    assert(r1("sf0.1")._1("load1_pre") === 3.5)
    // an IDENTICAL session must not read as an improvement (the
    // quantization guard: full-precision min vs 3-decimal stored floor)
    assert(!Bench.updateFloors(f, "sf0.1",
      Map("q01_x" -> 1.2341234, "q02_y" -> 0.5), Map("load1_pre" -> 9.0)))
    // a slower noisy run must NOT move floors or the stamp
    assert(!Bench.updateFloors(f, "sf0.1",
      Map("q01_x" -> 2.0, "q02_y" -> 0.9), Map("load1_pre" -> 28.0)))
    val r2 = Bench.parseFloors(new String(java.nio.file.Files.readAllBytes(f), "UTF-8"))
    assert(r2("sf0.1")._2("q01_x") === 1.234)
    assert(r2("sf0.1")._1("load1_pre") === 3.5, "stamp must survive a non-improving run")
    // a quiet-window improvement moves ONLY the improved query + stamp;
    // another sf's section is independent
    assert(Bench.updateFloors(f, "sf0.1",
      Map("q01_x" -> 1.1, "q02_y" -> 0.9), Map("load1_pre" -> 0.5)))
    assert(Bench.updateFloors(f, "sf0.001", Map("q01_x" -> 0.05), Map.empty))
    val r3 = Bench.parseFloors(new String(java.nio.file.Files.readAllBytes(f), "UTF-8"))
    assert(r3("sf0.1")._2 === Map("q01_x" -> 1.1, "q02_y" -> 0.5))
    assert(r3("sf0.1")._1("load1_pre") === 0.5)
    assert(r3("sf0.001")._2 === Map("q01_x" -> 0.05))
    // the write is atomic (temp + rename): no .tmp debris next to the file
    assert(!java.nio.file.Files.exists(
      f.resolveSibling(f.getFileName.toString + ".tmp")),
      "updateFloors must clean up its temp file")
    // a PRESENT-BUT-CORRUPT file must SKIP the update, not rewrite from
    // empty (r15 ADVICE: treating a truncated file as empty silently
    // discards every accumulated floor and sf section)
    val before = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
    java.nio.file.Files.write(f, (before.dropRight(20) + "garbage").getBytes("UTF-8"))
    val corrupt = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
    assert(!Bench.updateFloors(f, "sf0.1", Map("q01_x" -> 0.01), Map.empty),
      "corrupt floors file must not accept updates")
    assert(new String(java.nio.file.Files.readAllBytes(f), "UTF-8") === corrupt,
      "corrupt floors file must be left byte-identical for manual recovery")
    assert(Bench.loadFloors(f).isEmpty, "loadFloors must report unparseable as None")
    java.nio.file.Files.delete(f)
    assert(Bench.loadFloors(f) === Some(Map.empty),
      "an absent file is a fresh start, not a parse failure")
  }

  test("floor_flags: regression test, quiet-env gate, and line rendering " +
      "(emitted-when-quiet / omitted-when-loud both pinned)") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    // regression predicate: x1.5 over the best floor with the 0.25 s
    // absolute guard (toy-query scheduler wobble never flags)
    assert(Bench.floorRegressed(1.0, 1.8, 1.5))
    assert(!Bench.floorRegressed(1.0, 1.7, 1.5))
    assert(!Bench.floorRegressed(0.05, 0.09, 1.5),
      "sub-floor wobble on a 50 ms query must not flag")
    // quiet-env gate: a genuinely quiet session passes; the r15 driver
    // run's shape (other_s 3475 on a 2045 s x 32-cpu run = 5.3 %) is LOUD
    def delta(steal: Double, other: Double) =
      graft.tools.HostStat.Delta(cpuS = 100.0, otherBusyS = other,
        stealS = steal, jitMs = 0L)
    assert(Bench.envQuietForFloors(delta(0.5, 200.0), 2000.0, 32))
    assert(!Bench.envQuietForFloors(delta(85.4, 3475.4), 2045.0, 32),
      "the r15 driver session must classify loud")
    assert(!Bench.envQuietForFloors(delta(999.6, 200.0), 2000.0, 32),
      "steal-heavy sessions must classify loud")
    // rendering: quiet + regressions -> flags present; quiet + clean ->
    // empty object (distinguishable from unchecked); loud -> field absent
    val withFlags = Bench.renderLine(Map("q01_pricing_summary" -> 1.9), "/x",
      floorFlags = Some(Map("q01_pricing_summary" -> 1.9)))
    val j = JsonMethods.parse(withFlags)
    assert((j \ "floor_flags" \ "01") === JDouble(1.9),
      "a quiet-session floor regression must ride the line")
    val clean = JsonMethods.parse(Bench.renderLine(
      Map("q01_pricing_summary" -> 1.0), "/x", floorFlags = Some(Map.empty)))
    assert((clean \ "floor_flags") === JObject(Nil),
      "a quiet clean run must emit the empty object, not omit the field")
    val loud = Bench.renderLine(Map("q01_pricing_summary" -> 1.0), "/x",
      floorFlags = None)
    assert(!loud.contains("floor_flags"),
      "a loud session must omit the field entirely")
    // bounded: every query flagged at worst-case values still fits
    val worst = Bench.renderLine(
      names.map(_ -> 9999.999).toMap, "/root/testdata/sf0.1",
      names.map(_ -> 9999.999).toMap, names.map(_ -> 99999.999).toMap,
      names.map(_ -> 99999.999).toMap, Map.empty, "", Map.empty, Some(99999.9),
      Some(names.map(_ -> 9999.999).toMap))
    assert(worst.length <= Bench.MaxLineLength,
      s"bench line with floor flags is ${worst.length} chars — will be truncated")
    val wj = JsonMethods.parse(worst)
    assert((wj \ "floor_flags").asInstanceOf[JObject].obj.size === Bench.MaxP50Flags,
      s"floor flag list must cap at ${Bench.MaxP50Flags}")
  }

  test("BenchDiff.report: robust-axis header, plan-move quarantine, and " +
      "constant-plan movers — the committed benchdiff.txt shape") {
    import graft.tools.BenchDiff
    val oldD = Map(
      "q1" -> BenchDiff.Q(userP50 = 2.0, wallP50 = 1.0, stages = 5, jobs = 2),
      "q2" -> BenchDiff.Q(userP50 = 3.0, wallP50 = 1.5, stages = 7, jobs = 3),
      "gone" -> BenchDiff.Q(1.0, 1.0, 1, 1))
    val newD = Map(
      "q1" -> BenchDiff.Q(userP50 = 2.5, wallP50 = 1.2, stages = 5, jobs = 2),
      "q2" -> BenchDiff.Q(userP50 = 5.0, wallP50 = 2.0, stages = 9, jobs = 3),
      "added" -> BenchDiff.Q(1.0, 1.0, 1, 1))
    val r = BenchDiff.report(oldD, newD, 15)
    assert(r.contains("the robust axis"))
    assert(r.contains("common queries: 2"))
    // q2's stage count moved -> quarantined as a plan story, not a mover
    assert(r.contains("plan-shape moved (1)"))
    assert(r.linesIterator.exists(l => l.contains("q2") && l.contains("stages 7->9")))
    assert(r.linesIterator.exists(l => l.contains("q1") && l.contains("2.00 ->   2.50")))
    assert(r.contains("removed: gone") && r.contains("added: added"))
  }

  test("RepProfiler.armingReport names the arming set, the consulted " +
      "directory, and the fallback") {
    val rpt = graft.tools.RepProfiler.armingReport()
    assert(rpt.contains("JFR arming"))
    assert(rpt.contains("q81_char_ngram_pairs"), "the standing fallback must be named")
    assert(rpt.contains(java.nio.file.Paths.get(".").toAbsolutePath.normalize.toString),
      "the directory the dynamic flags were read from must be named")
  }

  test("p50_user_cpu renders in the line and the line still fits with it") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = JsonMethods.parse(Bench.renderLine(
      Map("q01_pricing_summary" -> 1.0), "/x",
      p50s = Map("q01_pricing_summary" -> 1.1), p50UserCpu = Some(432.18)))
    assert((j \ "p50_user_cpu") === JDouble(432.2),
      "the catalog-wide median-user-cpu sum must ride the line at 0.1 s precision")
    val worst = Bench.renderLine(
      names.map(_ -> 9999.999).toMap, "/root/testdata/sf0.1",
      names.map(_ -> 9999.999).toMap, names.map(_ -> 99999.999).toMap,
      names.map(_ -> 99999.999).toMap, Map.empty, "", Map.empty,
      Some(99999.9))
    assert(worst.length <= Bench.MaxLineLength)
  }

  test("RepProfiler: arming rules, dump thresholds, JFR round-trip summary") {
    import graft.tools.RepProfiler
    // thresholds: 1.5x the block min with the 0.25 s absolute floor
    assert(RepProfiler.dumpWorthy(1.0, 1.6))
    assert(!RepProfiler.dumpWorthy(1.0, 1.4))
    assert(!RepProfiler.dumpWorthy(0.05, 0.12),
      "sub-floor jitter on fast queries must not dump")
    // default arming: the q81 standing fallback plus whatever the
    // previous driver round flagged (dynamic — see below); never q22
    assert(RepProfiler.armedFor("q81_char_ngram_pairs"))
    assert(!RepProfiler.armedFor("q22_simhash_pairs"))
    // dynamic arming (VERDICT r14 item 1): the newest BENCH_r*.json's
    // p50_flags/max_flags short keys arm their queries for the NEXT run —
    // both the raw escaped-tail form and the driver-parsed form parse
    val dir = java.nio.file.Files.createTempDirectory("graft-bench-arm")
    java.nio.file.Files.write(dir.resolve("BENCH_r03.json"),
      """{"tail": "...\"p50_flags\":{\"81\":2.0},\"max_flags\":{}...", "parsed": null}"""
        .getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("BENCH_r14.json"),
      ("""{"tail": "...\"p50_flags\":{\"158\":1.66},\"max_flags\":{\"smofipu\":9.1}...",""" +
        """ "parsed": {"p50_flags": {"158": 1.66}, "max_flags": {"smofipu": 9.1}}}""")
        .getBytes("UTF-8"))
    // only the NEWEST round's flags arm (r3's q81 flag is stale history)
    assert(RepProfiler.flaggedShortKeys(dir) === Set("158", "smofipu"))
    java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.delete(p))
    // no bench files at all → empty set, q81 fallback still covers
    val emptyDir = java.nio.file.Files.createTempDirectory("graft-bench-arm2")
    assert(RepProfiler.flaggedShortKeys(emptyDir) === Set.empty[String])
    java.nio.file.Files.delete(emptyDir)
    // the repo's own newest round file (if running from the repo root)
    // must arm what it flagged — the driver's next bench records the
    // recurrence with a profile instead of opening a new watch cycle
    val repoKeys = RepProfiler.flaggedShortKeys(java.nio.file.Paths.get("."))
    repoKeys.foreach { k =>
      val q = SparkEntry.queries.keys.find(n => Bench.shortKey(n) == k)
      q.foreach(n => assert(RepProfiler.armedFor(n),
        s"flagged query $n must be armed by default"))
    }
    // record a short busy window, dump, and summarize — proves the JFR
    // plumbing end-to-end in CI (start may return None on a stripped
    // runtime; the rig must degrade, not break)
    RepProfiler.start() match {
      case None => // no JFR here — the no-op degradation is the contract
      case Some(r) =>
        val stop = System.nanoTime() + 300L * 1000 * 1000
        var x = 0L
        while (System.nanoTime() < stop) { x += java.util.Arrays.hashCode(Array(x)) }
        assert(x != Long.MinValue)
        RepProfiler.stop(r)
        val stem = s"${System.getProperty("java.io.tmpdir")}/graft-jfr-spec-" +
          java.lang.ProcessHandle.current().pid()
        val out = RepProfiler.dumpWithSummary(r, stem)
        assert(out.isDefined, "dump+summary must succeed on a live JVM")
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(out.get)), "UTF-8")
        assert(txt.startsWith("samples=") && txt.contains("top leaf frames"),
          s"summary must carry the sample sections: ${txt.take(80)}")
        Seq(s"$stem.jfr", s"$stem.txt").foreach(p =>
          java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(p)): Unit)
    }
  }

  test("rendered line is valid JSON with the contract fields") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val line = Bench.renderLine(Map("q01_pricing_summary" -> 1.2345, "src_redis_hash" -> 0.5), "/x")
    val j = JsonMethods.parse(line)
    assert((j \ "metric") === JString("total"))
    assert((j \ "unit") === JString("sec"))
    assert((j \ "value") === JDouble(1.735))
    assert((j \ "queries" \ "01") === JDouble(1.234) || (j \ "queries" \ "01") === JDouble(1.235))
    assert((j \ "queries" \ "srehas") === JDouble(0.5))
  }

  test("p50 pathologies surface in the line, bounded, and worst case still fits the tail") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    // a q81-shaped rep set: min hides the ramp, p50 exposes it
    val mins = Map("q81_char_ngram_pairs" -> 1.54, "q28_simhash" -> 0.50)
    val p50s = Map("q81_char_ngram_pairs" -> 8.50, "q28_simhash" -> 0.51)
    val j = JsonMethods.parse(Bench.renderLine(mins, "/x", p50s))
    assert((j \ "p50_total") === JDouble(9.01))
    assert((j \ "p50_flags" \ "81") === JDouble(8.5),
      "the degrading query must be flagged")
    assert((j \ "p50_flags" \ "28") === JNothing,
      "a rep-stable query must NOT be flagged")
    // worst case: every query flagged at 4-digit p50s — the flag list is
    // capped at MaxP50Flags, so the line still fits the driver tail
    val worstMin = names.map(_ -> 9999.999).toMap
    val worstP50 = names.map(_ -> 99999.999).toMap
    val worst = Bench.renderLine(worstMin, "/root/testdata/sf0.1", worstP50)
    assert(worst.length <= Bench.MaxLineLength,
      s"bench line with p50 flags is ${worst.length} chars — will be truncated")
    val wj = JsonMethods.parse(worst)
    val flagged = (wj \ "p50_flags").asInstanceOf[JObject].obj.size
    assert(flagged == Bench.MaxP50Flags, s"flag list must cap at ${Bench.MaxP50Flags}")
  }

  test("single-rep spikes surface as max_flags, bounded, line still fits") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    // the round-8 q81 pathology: one 13 s rep, min AND p50 unremarkable
    val mins = Map("q81_char_ngram_pairs" -> 1.51, "q28_simhash" -> 0.50)
    val p50s = Map("q81_char_ngram_pairs" -> 1.56, "q28_simhash" -> 0.51)
    val maxs = Map("q81_char_ngram_pairs" -> 13.0, "q28_simhash" -> 0.60)
    val j = JsonMethods.parse(Bench.renderLine(mins, "/x", p50s, maxs))
    assert((j \ "max_total") === JDouble(13.6))
    assert((j \ "max_flags" \ "81") === JInt(13),
      "a >3x-p50 spike rep must be flagged (13.0 trims to the integer)")
    assert((j \ "max_flags" \ "28") === JNothing,
      "an unremarkable max must NOT be flagged")
    // sub-second jitter on tiny queries stays below the absolute floor
    assert(!Bench.maxFlagged(0.05, 0.16), "3x on a 50 ms query is jitter, not a spike")
    // worst case: all three maps populated, every query spiking — both
    // flag lists are capped, so the line still fits the driver tail
    val worst = Bench.renderLine(
      names.map(_ -> 9999.999).toMap, "/root/testdata/sf0.1",
      names.map(_ -> 9999.999).toMap, names.map(_ -> 99999.999).toMap)
    assert(worst.length <= Bench.MaxLineLength,
      s"bench line with p50+max flags is ${worst.length} chars — will be truncated")
    val wj = JsonMethods.parse(worst)
    assert((wj \ "max_flags").asInstanceOf[JObject].obj.size == Bench.MaxP50Flags)
  }

  test("p50 flag keys on the steady tail: warm-down ramps pass, ramp-ups still flag") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def p50(ts: Seq[Double]): Double = ts.sorted.apply((ts.size - 1) / 2)
    // the round-9 DRIVER q59 trace: a 9-rep warm-DOWN ramp (every job
    // shrinks uniformly, gc/storage/codegen flat = JIT warm-up). Its
    // steady tail is the post-floor window — no pathology.
    val q59 = Seq(1.56, 1.79, 1.85, 1.90, 1.46, 1.14, 0.72, 0.31, 0.43)
    val t59 = Bench.steadyTail(q59)
    assert(!Bench.p50Flagged(q59.min, p50(t59)),
      s"warm-down steady tail $t59 must not flag")
    assert(Bench.p50Flagged(q59.min, p50(q59)),
      "sanity: the full-trace p50 WOULD have flagged — the tail is what clears it")
    // the round-7 q81 pathology: ramp UP (leak) — floor set early, the
    // slow later reps ARE the steady tail, must still flag
    val rampUp = Seq(1.5, 2.8, 4.9, 7.7, 13.0)
    assert(Bench.p50Flagged(rampUp.min, p50(Bench.steadyTail(rampUp))),
      "ramp-up pathologies must keep flagging through the steady tail")
    // a flat trace's tail is itself — never flags
    val flat = Seq(1.0, 1.02, 0.99, 1.01, 1.0)
    assert(!Bench.p50Flagged(flat.min, p50(Bench.steadyTail(flat))))
    // renderLine plumbs the steady map: q59-shaped passes, ramp-up flags
    val mins = Map("q59_pack_sequences" -> q59.min, "q81_char_ngram_pairs" -> rampUp.min)
    val p50s = Map("q59_pack_sequences" -> p50(q59), "q81_char_ngram_pairs" -> p50(rampUp))
    val steady = Map("q59_pack_sequences" -> p50(Bench.steadyTail(q59)),
      "q81_char_ngram_pairs" -> p50(Bench.steadyTail(rampUp)))
    val j = JsonMethods.parse(Bench.renderLine(mins, "/x", p50s, Map.empty, Map.empty, steady))
    assert((j \ "p50_flags" \ "59") === JNothing, "warm-down must not flag in the line")
    assert((j \ "p50_flags" \ "81") !== JNothing, "ramp-up must flag in the line")
    // p50_total stays the honest full-trace sum
    assert((j \ "p50_total") === JDouble(Bench.fmt(p50s.values.sum).toDouble))
  }

  test("machine context (env) renders bounded, valid, and the line still fits with it") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val env = Bench.envPart(1.23, 31.9,
      graft.tools.HostStat.Delta(cpuS = 1234.5, otherBusyS = 98.7, stealS = 0.42,
        jitMs = 45678))
    assert(env.length < 120, s"env fragment must stay small, was ${env.length}")
    val j = JsonMethods.parse(Bench.renderLine(
      Map("q01_pricing_summary" -> 1.0), "/x", env = env))
    assert((j \ "env" \ "load1") === JArray(List(JDouble(1.2), JDouble(31.9))))
    assert((j \ "env" \ "cpu_s") === JDouble(1234.5))
    assert((j \ "env" \ "other_s") === JDouble(98.7))
    assert((j \ "env" \ "steal_s") === JDouble(0.4))
    assert((j \ "env" \ "jit_s") === JDouble(45.7))
    // worst case with ALL parts present must still fit the driver tail
    val worst = Bench.renderLine(
      names.map(_ -> 9999.999).toMap, "/root/testdata/sf0.1",
      names.map(_ -> 9999.999).toMap, names.map(_ -> 99999.999).toMap,
      names.map(_ -> 99999.999).toMap, Map.empty,
      Bench.envPart(99.9, 99.9,
        graft.tools.HostStat.Delta(99999.9, 99999.9, 9999.9, 99999999L)))
    assert(worst.length <= Bench.MaxLineLength,
      s"bench line with env context is ${worst.length} chars — will be truncated")
  }

  test("HostStat: /proc/stat parse, live counters monotone, delta attributes CPU") {
    import graft.tools.HostStat
    // canonical /proc/stat first line: user nice system idle iowait irq
    // softirq steal — busy excludes idle+iowait; stealIrq = irq+softirq+steal
    val (busy, stealIrq) = HostStat.parseProcStat(
      "cpu  100 20 30 1000 50 5 7 3 0 0")
    assert(busy === 100L + 20 + 30 + 5 + 7 + 3)
    assert(stealIrq === 5L + 7 + 3)
    // short line (some kernels omit trailing fields) must not throw
    assert(HostStat.parseProcStat("cpu 1 2 3 4")._1 === 6L)
    // live: burning CPU must move processCpuNs, and the delta must see it
    val s0 = HostStat.snap()
    val t0 = System.nanoTime()
    var sink = 0L
    while (System.nanoTime() - t0 < 200e6) { sink += 1 }
    assert(sink > 0)
    val d = HostStat.delta(s0, HostStat.snap())
    assert(d.cpuS > 0.05, s"a 200 ms spin must register process CPU, saw ${d.cpuS}")
    assert(d.cpuS < 10.0, "single-thread spin can't exceed wall x threads")
    assert(d.otherBusyS >= 0.0 && d.stealS >= 0.0)
  }

  test("HostStat: an external CPU burner is POSITIVELY attributed to other_busy_s") {
    import graft.tools.HostStat
    // the round-10 q81 residual ("all four channels flat → external
    // interference" was a hypothesis by elimination) — this gate proves the
    // new channel turns it into a measurement: CPU burned by processes
    // OUTSIDE this JVM lands in other_busy_s, not cpu_s
    assume(new java.io.File("/proc/stat").canRead, "Linux /proc required")
    val s0 = HostStat.snap()
    val burners = (1 to 8).map { _ =>
      new ProcessBuilder("timeout", "0.8", "yes")
        .redirectOutput(ProcessBuilder.Redirect.DISCARD)
        .redirectError(ProcessBuilder.Redirect.DISCARD).start()
    }
    burners.foreach(_.waitFor())
    val d = HostStat.delta(s0, HostStat.snap())
    // 8 single-thread burners x 0.8 s ≈ 6.4 s of external CPU; demand only
    // a loose lower bound (scheduler startup, container throttling)
    assert(d.otherBusyS > 1.5,
      s"8 external burners must register in other_busy_s, saw ${d.otherBusyS}")
    assert(d.cpuS < d.otherBusyS,
      "an idle JVM must not absorb the neighbors' CPU into its own channel")
  }

  test("rep-1 cold-cost regressions surface as cold_flags against the catalog baseline") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    // a healthy catalog warms at ~1.5-2x p50 on rep 1; one query's fixture
    // build crept to 9 s — only IT must flag, the normal cold tax must not
    val mins = Map("q59_pack" -> 0.31, "q21_minhash" -> 1.00, "q16_exact" -> 0.40)
    val p50s = Map("q59_pack" -> 0.40, "q21_minhash" -> 1.10, "q16_exact" -> 0.45)
    val rep1 = Map("q59_pack" -> 9.00, "q21_minhash" -> 2.00, "q16_exact" -> 0.80)
    val j = JsonMethods.parse(Bench.renderLine(mins, "/x", p50s, Map.empty, rep1))
    assert((j \ "cold_flags" \ "59") === JInt(9),
      "a rep-1 blowup far above the catalog's cold-tax baseline must flag " +
        "(9.0 trims to the integer)")
    assert((j \ "cold_flags" \ "21") === JNothing,
      "a normal cold rep near the baseline ratio must NOT flag")
    assert((j \ "cold_flags" \ "16") === JNothing)
    // the baseline is the catalog MEDIAN ratio, floored at 1: an all-warm
    // catalog cannot tighten the threshold below 3x p50 + 0.5 s
    assert(Bench.coldMedianRatio(
      Map("a" -> 0.5, "b" -> 0.6), Map("a" -> 1.0, "b" -> 1.0)) === 1.0)
    // absolute floor: a 0.1 s -> 0.4 s toy-query wobble never flags
    assert(!Bench.coldFlagged(0.4, 0.1, 1.0))
    // worst case: all four maps populated — flag lists capped, line fits
    val worst = Bench.renderLine(
      names.map(_ -> 9999.999).toMap, "/root/testdata/sf0.1",
      names.map(_ -> 9999.999).toMap, names.map(_ -> 99999.999).toMap,
      names.map(_ -> 99999.999).toMap)
    assert(worst.length <= Bench.MaxLineLength,
      s"bench line with p50+max+cold flags is ${worst.length} chars — will be truncated")
    val wj = JsonMethods.parse(worst)
    assert((wj \ "cold_flags").asInstanceOf[JObject].obj.size <= Bench.MaxP50Flags)
  }

  test("bench_detail rotation scale gate: _sf marker read both ways, " +
      "marker-less/corrupt files default to sf0.1 — never to matches-anything") {
    // the gate rule itself
    assert(Bench.sfGateAllows(Some("sf0.1"), "sf0.1"))
    assert(!Bench.sfGateAllows(Some("sf0.1"), "sf0.001"),
      "an sf0.001 smoke must not rotate/compare an sf0.1 detail")
    assert(!Bench.sfGateAllows(Some("sf0.001"), "sf0.1"))
    assert(Bench.sfGateAllows(None, "sf0.1"),
      "pre-marker committed details are sf0.1 full runs")
    assert(!Bench.sfGateAllows(None, "sf0.001"),
      "a missing/unreadable marker must default to the CONCRETE sf0.1, " +
        "not match the current run's scale")
    // sfOf over real files: marked, marker-less, corrupt
    def tmp(content: String): String = {
      val p = java.nio.file.Files.createTempFile("graft-sfof", ".json")
      java.nio.file.Files.write(p, content.getBytes("UTF-8"))
      p.toFile.deleteOnExit()
      p.toString
    }
    import graft.tools.BenchDiff
    assert(BenchDiff.sfOf(tmp(
      """{"_sf": {"sf": "sf0.001"}, "q01": {"runs": [1.0]}}""")) ===
      Some("sf0.001"))
    assert(BenchDiff.sfOf(tmp("""{"q01": {"runs": [1.0]}}""")) === None)
    assert(BenchDiff.sfOf(tmp("""{"q01": {"runs""")) === None,
      "a corrupt file reads as no-marker (then defaults to sf0.1 above)")
    // the marker entry must be invisible to the query parse
    assert(!BenchDiff.parse(tmp(
      """{"_sf": {"sf": "sf0.1"}, "q01": {"runs": [1.0], "cpu_s": [1.0]}}"""))
      .contains("_sf"))
  }
}
