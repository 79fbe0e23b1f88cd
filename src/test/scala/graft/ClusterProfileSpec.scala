package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** The at-scale deployment profile (VERDICT r9 item 6): `GraftSession
  * .cluster` turns the "on a real cluster this is overridden" comment
  * into checkable code. The suite asserts every conf LANDS — cluster-
  * sized shuffle partitions, AQE skew-join, the required durable
  * checkpoint dir, and the three swap points (PSL file, transport
  * client, warehouse) — and that the missing-checkpoint misuse fails
  * loudly. Shared-JVM discipline: the suite restores every runtime conf
  * it changes (sbt runs all suites in one forked JVM, so `getOrCreate`
  * returns the shared session). */
class ClusterProfileSpec extends AnyFunSuite {

  test("cluster profile applies the at-scale confs and swap points") {
    // pin UrlKit's once-per-JVM rule init BEFORE touching graft.psl.path,
    // so the property round-trip below cannot change which rules other
    // suites (and this JVM's kernels) run with
    graft.functions.UrlKit.activeRules
    val prevPsl = sys.props.get("graft.psl.path")
    val prevShuffle = SparkSession.getDefaultSession
      .map(_.conf.get("spark.sql.shuffle.partitions"))
    val cp = s"${System.getProperty("java.io.tmpdir")}/graft-cluster-cp-" +
      s"${java.lang.ProcessHandle.current().pid()}"
    val spark = GraftSession.cluster(
      SparkSession.builder().master("local[4]"),
      totalExecutorCores = 256,
      checkpointDir = cp,
      warehouseDir = Some(s"${System.getProperty("java.io.tmpdir")}/graft-cluster-wh"),
      pslPath = Some("/tmp/psl-test-file.dat"),
      transportClient = Some("graft.sources.hub.HubRedisClient"))
    try {
      // shuffle partitions sized from the cluster: 2x total executor cores
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "512")
      // runtime skew handling a local session never exercises
      assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
      assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
      // the REQUIRED durable lineage-truncation point
      assert(spark.sparkContext.getCheckpointDir.exists(_.contains("graft-cluster-cp")),
        s"checkpoint dir not set: ${spark.sparkContext.getCheckpointDir}")
      // swap point 1: transport client, readable where connector call
      // sites build their DSv2 options
      assert(GraftSession.transportClient(spark) ===
        Some("graft.sources.hub.HubRedisClient"))
      // swap point 2: PSL file — surfaced both as a session conf (for
      // executor-side -D wiring) and the JVM property UrlKit reads
      assert(spark.conf.get("graft.psl.path") === "/tmp/psl-test-file.dat")
      assert(sys.props.get("graft.psl.path").contains("/tmp/psl-test-file.dat"))
      // floor: a toy "cluster" still gets a sane minimum width
      val tiny = GraftSession.cluster(
        SparkSession.builder().master("local[4]"),
        totalExecutorCores = 4, checkpointDir = cp)
      assert(tiny.conf.get("spark.sql.shuffle.partitions") === "64")
    } finally {
      prevShuffle.foreach(v => spark.conf.set("spark.sql.shuffle.partitions", v))
      spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
      spark.conf.unset("graft.transport.client")
      spark.conf.unset("graft.psl.path")
      prevPsl match {
        case Some(v) => System.setProperty("graft.psl.path", v): Unit
        case None => System.clearProperty("graft.psl.path"): Unit
      }
    }
  }

  test("missing checkpoint dir fails loudly, naming the consequence") {
    val e = intercept[IllegalArgumentException] {
      GraftSession.cluster(SparkSession.builder().master("local[4]"),
        totalExecutorCores = 64, checkpointDir = "")
    }
    assert(e.getMessage.contains("checkpoint"))
  }

  test("default local profile leaves the transport client unset (MemHub-backed)") {
    val spark = GraftSession.local(4)
    assert(GraftSession.transportClient(spark).isEmpty)
  }

  test("pslPath on a non-local master requires executor-side wiring (ADVICE r10)") {
    // UrlKit reads graft.psl.path once per JVM from ITS OWN system
    // properties — a driver-only property silently diverges executors'
    // registrable_domain/canonical_url from the driver's PSL rules
    GraftSession.requireExecutorPslWiring(isLocal = true,
      executorJavaOptions = "", pslPath = "/x/psl.dat") // local: one JVM, fine
    GraftSession.requireExecutorPslWiring(isLocal = false,
      executorJavaOptions = "-Xmx4g -Dgraft.psl.path=psl.dat",
      pslPath = "/x/psl.dat") // wired via extraJavaOptions: fine
    // wired via defaultJavaOptions: cluster() concatenates both confs
    // into this argument, so a property arriving through either passes
    // (ADVICE r11: deployments using spark.executor.defaultJavaOptions
    // are valid and must not hard-fail)
    GraftSession.requireExecutorPslWiring(isLocal = false,
      executorJavaOptions = " -Dgraft.psl.path=psl.dat -XX:+UseG1GC",
      pslPath = "/x/psl.dat")
    // image-baked delivery (JAVA_TOOL_OPTIONS): invisible in the confs —
    // the documented opt-out asserts it instead of being rejected
    GraftSession.requireExecutorPslWiring(isLocal = false,
      executorJavaOptions = "", pslPath = "/x/psl.dat", assertedWired = true)
    val e = intercept[IllegalArgumentException] {
      GraftSession.requireExecutorPslWiring(isLocal = false,
        executorJavaOptions = "-Xmx4g", pslPath = "/x/psl.dat")
    }
    assert(e.getMessage.contains("extraJavaOptions") &&
      e.getMessage.contains("defaultJavaOptions") &&
      e.getMessage.contains("spark.graft.psl.executorWired") &&
      e.getMessage.contains("--files"),
      s"error must name the exact wiring to add: ${e.getMessage}")
  }

  test("static confs dropped by an existing session are detected (ADVICE r10)") {
    val spark = GraftSession.local(4)
    // the shared session's warehouse is graft-warehouse; asking cluster()
    // for a different one on this JVM CANNOT land — the detector must say so
    val drops = GraftSession.staticConfDrops(spark, Seq(
      "spark.sql.warehouse.dir" -> "/definitely/not/the/current/warehouse",
      "spark.sql.codegen.cache.maxEntries" ->
        spark.conf.get("spark.sql.codegen.cache.maxEntries")))
    assert(drops.map(_._1) == Seq("spark.sql.warehouse.dir"),
      s"only the genuinely dropped conf must be reported: $drops")
    val (_, want, got) = drops.head
    assert(want == "/definitely/not/the/current/warehouse" && got != want)
  }

  test("a warehouse conf that LANDED is not reported as dropped (URI vs raw path)") {
    // SharedState stores spark.sql.warehouse.dir qualified ('file:/x'); a
    // raw-string compare against the caller's '/x' would cry wolf — the
    // exact misdiagnosis the detector exists to prevent
    val spark = GraftSession.local(4)
    val current = spark.conf.get("spark.sql.warehouse.dir")
    // ask for the SAME warehouse, but as a raw local path (scheme stripped,
    // trailing slash added) — must compare equal after qualification
    val raw = current.stripPrefix("file:") + "/"
    val drops = GraftSession.staticConfDrops(spark,
      Seq("spark.sql.warehouse.dir" -> raw))
    assert(drops.isEmpty,
      s"conf landed (got '$current', asked '$raw') yet reported dropped: $drops")
  }
}
