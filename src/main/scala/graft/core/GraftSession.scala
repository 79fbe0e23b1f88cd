package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory for the graft engine.
  *
  * Mirrors the reference's single entry point (a Jet `Pipeline` needs a
  * `HazelcastInstance`; our queries need a `SparkSession`). Defaults follow
  * SURVEY.md §7.1: UTC session time zone, AQE on, shuffle partitions sized to
  * the local core count rather than Spark's default 200 (we run `local[32]`;
  * on a real cluster this is overridden by the deployment).
  */
object GraftSession {

  /** Standard config applied to any builder (idempotent). */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // driver-generated events.parquet carries TIMESTAMP(NANOS) which Spark
      // has no native type for; read as long and convert in Tables.load
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // driver-generated parquet stores isAdjustedToUTC=false micros; read as
      // TIMESTAMP (UTC session) not TIMESTAMP_NTZ so epoch math (unix_micros,
      // window buckets) type-checks — DuckDB extracts the same epoch numbers
      // from the naive values
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      // the 128-column minhash signature aggregate must stay inside
      // whole-stage codegen (default maxFields=100 would silently fall
      // back to interpreted row-based aggregation)
      .config("spark.sql.codegen.maxFields", "256")
      // JVM-wide Janino-compiled class cache: the default 100 entries is
      // smaller than ONE composite value-pin query's unit count (q155
      // compiles ~99), so rep cycles thrash the cache and re-pay compiles
      // mid-session. 4000 was still too small for the full catalog at
      // multi-SF warm + 5 reps — the r15/r16 bench detail shows 12 queries
      // re-compiling in LATE reps (cg>0 after rep 2: eviction churn, not
      // warm-up) — so size for the whole working set with headroom;
      // entries are KB-scale generated classes, tens of MB total
      .config("spark.sql.codegen.cache.maxEntries", "12000")
      // honor KeyGroupedPartitioning reported by our DSv2 scans (one
      // partition per stream/shard → exchange-free groupBy on the key)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")

  /** Local session for tests / bench: one JVM, `cpus` executor threads. */
  def local(cpus: Int = 4, appName: String = "graft"): SparkSession = {
    val spark = configure(
      SparkSession.builder().master(s"local[$cpus]").appName(appName),
      shufflePartitions = math.max(cpus, 4)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)
    installOptimizerRules(spark)
    spark
  }

  /** The at-scale deployment profile — "on a real cluster this is
    * overridden by the deployment", turned from a comment into code. Takes
    * the DEPLOYMENT'S builder (master/executors/memory come from
    * spark-submit or the platform) and applies graft's cluster posture on
    * top of [[configure]]:
    *
    *  - `shuffle.partitions` sized from the cluster (2× total executor
    *    cores — wide enough that AQE coalesces down rather than tasks
    *    queueing up; override per job for known-skewed stages);
    *  - AQE skew-join splitting ON (local[n] never triggers it; a 1000-
    *    executor shuffle with a hot key does);
    *  - a REQUIRED durable checkpoint dir (the CC loop and streaming
    *    queries truncate lineage through it; losing it to a tmpdir is the
    *    classic first-week cluster failure);
    *  - the three deployment swap points as options: the full PSL file
    *    for [[graft.functions.UrlKit]], the transport client class for
    *    the DSv2 connectors (see `sources/hub/Transport.scala` — resolved
    *    per-executor by name), and the warehouse dir for the bucketed
    *    index tables.
    *
    * ClusterProfileSpec asserts every conf lands; README "Deployment"
    * names the swap points. */
  def cluster(
      builder: SparkSession.Builder,
      totalExecutorCores: Int,
      checkpointDir: String,
      warehouseDir: Option[String] = None,
      pslPath: Option[String] = None,
      transportClient: Option[String] = None,
      appName: String = "graft"): SparkSession = {
    require(totalExecutorCores > 0, "totalExecutorCores must be positive")
    require(checkpointDir.nonEmpty,
      "cluster profile requires a durable checkpoint dir (HDFS/S3/GCS " +
        "path) — the CC loop and streaming queries truncate lineage " +
        "through it; a lost tmpdir fails multi-hour runs")
    // static confs (warehouse dir, codegen cache size) only land when NO
    // SparkSession exists yet in this JVM — getOrCreate silently ignores
    // them otherwise (ADVICE r10); detect BEFORE building so the drop
    // can be reported against what the caller asked for
    val preexisting =
      SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val b = configure(builder.appName(appName),
      shufflePartitions = math.max(2 * totalExecutorCores, 64))
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
    warehouseDir.foreach(w => b.config("spark.sql.warehouse.dir", w))
    pslPath.foreach(p => b.config("graft.psl.path", p))
    transportClient.foreach(c => b.config("graft.transport.client", c))
    val spark = b.getOrCreate()
    preexisting.foreach { _ =>
      val drops = staticConfDrops(spark,
        warehouseDir.map("spark.sql.warehouse.dir" -> _).toSeq :+
          ("spark.sql.codegen.cache.maxEntries" -> "12000"))
      if (drops.nonEmpty)
        System.err.println(
          "[graft] cluster(): a SparkSession already existed in this JVM, " +
            "so these STATIC confs were silently ignored by getOrCreate — " +
            drops.map { case (k, want, got) => s"$k wanted=$want actual=$got" }
              .mkString("; ") +
            ". Build the cluster session before any other SparkSession " +
            "(or restart the JVM) for them to land.")
    }
    spark.sparkContext.setCheckpointDir(checkpointDir)
    pslPath.foreach { p =>
      System.setProperty("graft.psl.path", p)
      // the property may arrive via either executor JVM-options conf; an
      // image-baked delivery (JAVA_TOOL_OPTIONS, wrapper scripts) is
      // invisible here — the deployment asserts it with the documented
      // opt-out conf instead of being hard-failed (ADVICE r11)
      val execOpts = Seq("spark.executor.extraJavaOptions",
          "spark.executor.defaultJavaOptions")
        .map(k => spark.sparkContext.getConf.get(k, "")).mkString(" ")
      // the opt-out key is spark.-prefixed: spark-submit silently DROPS
      // --conf keys outside the spark.* namespace ("Ignoring non-Spark
      // config property"), which is exactly the delivery path the
      // opt-out targets; the unprefixed spelling is also accepted for
      // programmatic SparkConf users
      requireExecutorPslWiring(spark.sparkContext.isLocal, execOpts, p,
        assertedWired = Seq("spark.graft.psl.executorWired",
            "graft.psl.executorWired")
          .exists(k => spark.sparkContext.getConf.get(k, "false") == "true"))
    }
    graft.functions.registerAll(spark)
    installOptimizerRules(spark)
    spark
  }

  /** Static confs the caller asked for that the existing session does not
    * carry — getOrCreate cannot apply them post-hoc. Path-valued confs are
    * compared as QUALIFIED paths: SharedState stores
    * `spark.sql.warehouse.dir` as a URI (`file:/data/wh`), so a raw-string
    * compare against the caller's `/data/wh` would report a drop for a
    * conf that actually landed — the exact misdiagnosis this detector
    * exists to prevent. */
  private[graft] def staticConfDrops(spark: SparkSession,
      wanted: Seq[(String, String)]): Seq[(String, String, String)] =
    wanted.flatMap { case (k, want) =>
      val got = spark.conf.getOption(k).getOrElse("")
      def norm(v: String): String =
        if (v.isEmpty) v
        else try {
          val p = new org.apache.hadoop.fs.Path(v)
          val u = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .makeQualified(p).toUri
          // compare components, not the rendered string: a null authority
          // renders 'file:/x' while an empty one renders 'file:///x'
          Option(u.getScheme).getOrElse("") + "//" +
            Option(u.getAuthority).getOrElse("") +
            u.getPath.stripSuffix("/")
        } catch { case _: Throwable => v }
      val same =
        if (k.endsWith(".dir") || k.endsWith(".path")) norm(got) == norm(want)
        else got == want
      if (same) None else Some((k, want, got))
    }

  /** `graft.psl.path` is read ONCE PER JVM by [[graft.functions.UrlKit]]
    * from that JVM's own system properties — a driver-side property never
    * reaches executor JVMs, so on a real cluster the url kernels would
    * silently fall back to the built-in head rules while the driver (and
    * the generated oracle SQL) used the full PSL file: silent
    * registrable_domain/canonical_url divergence (ADVICE r10). Local
    * masters share one JVM (the property IS visible); any other master
    * must ship the property — and the file — to executors explicitly. */
  private[graft] def requireExecutorPslWiring(isLocal: Boolean,
      executorJavaOptions: String, pslPath: String,
      assertedWired: Boolean = false): Unit = {
    if (isLocal || assertedWired) return
    require(executorJavaOptions.contains("-Dgraft.psl.path="),
      s"cluster(pslPath = $pslPath) on a non-local master requires " +
        "executor-side wiring, or executor url kernels silently diverge " +
        "from the driver's PSL rules. Add BOTH: " +
        "--conf spark.executor.extraJavaOptions='-Dgraft.psl.path=<name>' " +
        "(or spark.executor.defaultJavaOptions) " +
        "and ship the file (--files <path>, then <name> is its basename " +
        "in the executor working dir; or bake it into the image at an " +
        "absolute path). A deployment that delivers the property outside " +
        "both confs (image-baked JAVA_TOOL_OPTIONS, a wrapper script) " +
        "asserts it with --conf spark.graft.psl.executorWired=true.")
  }

  /** The transport-client class name configured by [[cluster]] (empty on
    * the default MemHub-backed profile) — connector call sites pass it as
    * the DSv2 `client` option. */
  def transportClient(spark: SparkSession): Option[String] =
    spark.conf.getOption("graft.transport.client").filter(_.nonEmpty)

  /** graft's extra Catalyst rules, installed through experimentalMethods so
    * they apply to externally-built sessions (the driver's) too —
    * idempotent. */
  def installOptimizerRules(spark: SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraOptimizations.contains(graft.plans.SimplifyKernelNullChecks))
      em.extraOptimizations =
        em.extraOptimizations :+ graft.plans.SimplifyKernelNullChecks
  }

  /** Widen a narrow input so per-row kernels use the whole cluster.
    *
    * Expensive row-local kernels (shingling, minhash, explode-heavy
    * similarity joins) inherit the SOURCE's parallelism: a small table that
    * parquet serves as one or two splits runs those kernels — and the
    * shuffle write feeding the next stage — on one or two cores while the
    * rest of the cluster idles. When the source parallelism is below the
    * cluster's, a round-robin repartition of the (still raw, pre-kernel)
    * rows is a cheap shuffle that buys full-width compute; when the source
    * is already wide — any real table at 100 TB has orders of magnitude
    * more splits than cores — this is a no-op and costs nothing. Same
    * spirit as AQE's runtime decisions, applied to leaf parallelism, which
    * AQE (stage-boundary-scoped) cannot fix.
    */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Partition width comes from a logical-plan estimate
    // (GraftSqlBridge.planParallelism), NOT df.rdd: materializing the RDD
    // compiled a second full physical plan per call site (and under AQE
    // could run upstream stages just to count partitions).
    if (org.apache.spark.sql.GraftSqlBridge.planParallelism(df) < target)
      df.repartition(target)
    else df
  }

  /** Pin a small reduced artifact fault-tolerantly AND leak-free: cache
    * the frame's InternalRow RDD (MEMORY_AND_DISK), materialize eagerly,
    * and wrap it back as a DataFrame leaf carrying the measured size and
    * row count as exact Catalyst statistics.
    *
    * This replaces two earlier idioms, each with an operational cliff:
    *
    *  - `localCheckpoint(true)` stored blocks on executors and DISCARDED
    *    lineage — one lost executor mid-job failed a multi-hour run. The
    *    cached RDD here keeps lineage: a lost block recomputes.
    *  - `Dataset.persist` kept lineage but parked the plan in the
    *    session's CacheManager, which holds a STRONG reference until an
    *    explicit `unpersist` — and an operator returning a LAZY result
    *    over its pins has no safe point to call it (the caller's actions
    *    still need the blocks). Every invocation leaked its pins for the
    *    session's life; the round-7 bench measured the consequence (q81
    *    reps ramping 1.5 s → 13 s as evicted-and-rebuilt pins thrashed
    *    storage memory). RDD-level caching is registered with the
    *    ContextCleaner through WEAK references instead: when the caller
    *    drops the frame, the next driver GC frees the blocks — the
    *    GC-managed lifecycle `groupedPrefixScan`/`rankedScan` already use.
    *
    * The wrapped leaf carries exact `Statistics(sizeInBytes, rowCount)`,
    * so joins against the pinned artifact are planned with real numbers
    * (broadcast when small); AQE's runtime re-plan covers the rest. Use
    * only where lineage is one or two stages deep — for iterative loops
    * whose lineage grows per round, use [[reliableCheckpoint]], and
    * release provably-dead loop intermediates eagerly with [[release]]. */
  def pin(df: DataFrame): DataFrame = pinCounted(df)._1

  /** [[pin]] plus the row count its eager materialization already
    * computed — for callers that need the cardinality next (the CC edge
    * ceiling, rebuild's built_rows), so they don't re-run a count job
    * over the blocks the pin just materialized. */
  def pinCounted(df: DataFrame): (DataFrame, Long) = {
    val spark = df.sparkSession
    val rdd = org.apache.spark.sql.GraftSqlBridge.internalRdd(df)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = rdd.count()
    // measured footprint of the materialized blocks (deserialized heap +
    // spilled disk) — an over-estimate of serialized join size, so
    // compile-time broadcast decisions stay conservative
    val size = spark.sparkContext.getRDDStorageInfo
      .find(_.id == rdd.id).map(i => i.memSize + i.diskSize)
      .getOrElse(n * math.max(df.schema.defaultSize.toLong, 1L))
    pinnedIds.add(rdd.id)
    pinScopes.get match {
      case scope :: _ => scope += rdd
      case Nil        => ()
    }
    (org.apache.spark.sql.GraftSqlBridge.cachedDf(spark, rdd, df.schema, size, n), n)
  }

  /** RDD ids graft has pinned (and not yet released). Ids are never reused
    * within a SparkContext, so entries for GC-collected pins are inert —
    * the registry's job is to make [[release]] a safe operation on ANY
    * frame: only leaves graft itself pinned are ever unpersisted, so
    * checkpoints and user RDD-backed frames pass through untouched. */
  private val pinnedIds = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** Innermost-first stack of active [[pinScope]]s on this thread. */
  private val pinScopes =
    new ThreadLocal[List[scala.collection.mutable.ArrayBuffer[org.apache.spark.rdd.RDD[_]]]] {
      override def initialValue: List[scala.collection.mutable.ArrayBuffer[org.apache.spark.rdd.RDD[_]]] = Nil
    }

  /** Register an INTERNALLY persisted RDD (the rankedScan /
    * groupedPrefixScan sorted materializations) with the pin registry and
    * the active [[pinScope]], so the operator-boundary lifecycle covers
    * it: [[release]] can free it through the dependency closure instead
    * of waiting for a driver GC. The round-9 driver bench measured the
    * gap this closes: q133 (two rankedScans per invocation) left 2
    * unregistered cached RDDs per rep, accumulating to 14 before GC —
    * exactly the storage-pressure class behind its max_flags spike. */
  def registerPin(rdd: org.apache.spark.rdd.RDD[_]): Unit = {
    pinnedIds.add(rdd.id): Unit
    pinScopes.get match {
      case scope :: _ => scope += rdd
      case Nil        => ()
    }
  }

  /** Eagerly free every [[pin]]ned artifact a frame references — its plan
    * leaves AND every registered pin in those leaves' RDD dependency
    * closure (rankedScan/groupedPrefixScan materializations sit one
    * `mapPartitions` BELOW the result leaf, so a leaf-only walk left them
    * for the GC; the round-9 q133 rep trace measured the consequence).
    * For (a) loop intermediates that are provably dead (the CC loop) and
    * (b) harness code (bench reps, verify runs) that has just finished the
    * frame's terminal action and KNOWS no further action is coming. Safe on
    * arbitrary frames: only RDDs in the pin registry are unpersisted.
    * Lineage is kept by [[pin]], so a released block referenced by a
    * not-yet-run plan recomputes instead of failing — release is a
    * performance lever, never a correctness hazard. */
  def release(df: DataFrame, blocking: Boolean = false): Unit = {
    val seen = scala.collection.mutable.Set.empty[Int]
    def walk(r: org.apache.spark.rdd.RDD[_]): Unit =
      if (seen.add(r.id)) {
        if (pinnedIds.remove(r.id)) r.unpersist(blocking)
        r.dependencies.foreach(d => walk(d.rdd))
      }
    org.apache.spark.sql.GraftSqlBridge.leafRdds(df).foreach(walk)
  }

  /** Run a composite operator body and eagerly release every pin it
    * created EXCEPT those the returned frame still references.
    *
    * The q145 lesson (round-8 bench `p50_flags`): a composite like
    * clusterAwareSplits pins candidate/shingle/edge frames on the way to a
    * final pinned artifact (the CC labels); once the final pin is
    * materialized the intermediates are dead, but the GC-managed weak-ref
    * free lags allocation in a tight loop, so dead blocks pile into
    * storage pressure and evict live ones. This scope frees them at the
    * exact moment they become dead — the returned frame's [[pin]] leaves
    * (found by plan walk) are kept, everything else pinned inside `body`
    * is unpersisted. Kept pins are propagated to an enclosing scope, so an
    * outer composite can in turn release them when ITS result drops them.
    * Recompute-on-block-loss still works for kept pins: lineage through a
    * released intermediate simply recomputes it. */
  def pinScope(body: => DataFrame): DataFrame = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.rdd.RDD[_]]
    pinScopes.set(buf :: pinScopes.get)
    val result =
      try body
      catch {
        case t: Throwable =>
          // no frame escapes a failed body, so every pin it created is
          // dead RIGHT NOW — release eagerly instead of leaving failing
          // reps to re-create the storage-pressure class this scope
          // exists to prevent
          buf.foreach { r =>
            if (pinnedIds.remove(r.id)) r.unpersist(blocking = false)
          }
          throw t
      }
      finally pinScopes.set(pinScopes.get.tail)
    // keep = the result's plan leaves plus the pins they READ THROUGH:
    // walk each leaf's dependency chain, stopping below the first
    // registered pin. Two shapes, both spec-pinned (PinLifecycleSpec):
    //  - rankedScan shape (ADVICE r10): the registered sorted RDD sits one
    //    dependency BELOW an UNCACHED result leaf — a leaf-only keep-set
    //    unpersisted it at scope exit and the lazy result's first action
    //    re-paid the full sort. The walk keeps it.
    //  - pin-of-pin shape: a leaf that IS a materialized pin already holds
    //    its blocks; pins further up its lineage are recompute insurance
    //    only (lineage survives release) — the walk stops at the pin, so
    //    those stay eagerly freeable dead intermediates.
    val keep = {
      val s = scala.collection.mutable.Set.empty[Int]
      def walk(r: org.apache.spark.rdd.RDD[_]): Unit =
        if (s.add(r.id) && !pinnedIds.contains(r.id))
          r.dependencies.foreach(d => walk(d.rdd))
      org.apache.spark.sql.GraftSqlBridge.leafRdds(result).foreach(walk)
      s
    }
    val (kept, dead) = buf.partition(r => keep(r.id))
    dead.foreach { r =>
      if (pinnedIds.remove(r.id)) r.unpersist(blocking = false)
    }
    pinScopes.get match {
      case parent :: _ => parent ++= kept
      case Nil         => ()
    }
    result
  }

  /** Reliable (replicated-storage) checkpoint for iterative loops.
    *
    * Writes the frame to the session checkpoint directory and truncates
    * lineage against DURABLE storage — unlike `localCheckpoint`, executor
    * loss cannot strand the data, and unlike bare `persist` the lineage
    * chain does not grow across loop rounds. On a cluster, point
    * `spark.checkpoint.dir` (or `SparkContext.setCheckpointDir`) at shared
    * storage (HDFS/S3); when unset we default to a per-app tmp directory so
    * local runs work out of the box. */
  def reliableCheckpoint(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty)
      sc.setCheckpointDir(
        s"${System.getProperty("java.io.tmpdir")}/graft-checkpoint-${sc.applicationId}")
    df.checkpoint(eager = true)
  }

  /** Ensure graft SQL functions and runtime confs are applied to an
    * externally-built session (the driver's Verify/Bench sessions). */
  def prepare(spark: SparkSession): SparkSession = {
    graft.functions.registerAll(spark)
    installOptimizerRules(spark)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.codegen.maxFields", "256")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark
  }
}

/** Test-data table loader (driver-generated parquet, TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // TIMESTAMP(NANOS) columns surface as LongType under nanosAsLong; floor
    // to micros (integral DIV — ns epoch values exceed 2^53, so no doubles).
    // TIMESTAMP_NTZ (a reader configured before the conf above applied) is
    // reinterpreted as a UTC instant — identical micros, ordinary TIMESTAMP.
    df.schema.fields.foldLeft(df) {
      case (d, f) if f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType =>
        d.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case (d, f) if f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
        d.withColumn(f.name, org.apache.spark.sql.functions.col(f.name)
          .cast(org.apache.spark.sql.types.TimestampType))
      case (d, _) => d
    }
  }

  /** Register every table under its bare name as a temp view. */
  def views(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
