package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GenDir, GraftSession}
import graft.operators.ClusterRegistry

/** The persisted dup-cluster registry ([[graft.operators.ClusterRegistry]])
  * — incremental union-find with a relabel log. Gates: seeded base
  * structure, member assignment, the BRIDGE case (a new doc merging two
  * existing clusters relabels the losing representative instead of
  * rewriting its members), chain resolution across several merges,
  * replay idempotence (derivations exclude the epoch's own partitions),
  * and compaction folding the log into member rows with identical read
  * semantics. */
class ClusterRegistrySpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4, "graft-clreg")
  private val pid = java.lang.ProcessHandle.current().pid()
  private var n = 0
  import spark.implicits._

  private def freshPath(): String = {
    n += 1
    s"${System.getProperty("java.io.tmpdir")}/graft-clreg-$pid-$n"
  }

  private def reps(path: String, ids: Seq[Long]): Map[Long, Long] =
    ClusterRegistry.assignFor(ids.toDF("doc_id"), path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("seed + member assignment + implicit singletons") {
    val path = freshPath()
    // base clusters: {1,5}, {2,8}; doc 3 singleton
    ClusterRegistry.seed(spark,
      Seq((1L, 5L), (2L, 8L)).toDF("doc_a", "doc_b"), path)
    assert(reps(path, Seq(1L, 5L, 2L, 8L, 3L)) ==
      Map(1L -> 1L, 5L -> 1L, 2L -> 2L, 8L -> 2L, 3L -> 3L))
    // epoch 0: doc 10 dups 5 → joins cluster 1; doc 11 fresh
    ClusterRegistry.register(spark, path, Seq(10L, 11L),
      Seq((10L, 5L)), "0")
    assert(reps(path, Seq(10L, 11L)) == Map(10L -> 1L, 11L -> 11L))
  }

  test("bridge: a doc merging two clusters relabels the losing rep; chains resolve") {
    val path = freshPath()
    ClusterRegistry.seed(spark,
      Seq((1L, 5L), (2L, 8L)).toDF("doc_a", "doc_b"), path)
    // doc 20 dups BOTH 5 (cluster 1) and 8 (cluster 2): clusters merge,
    // rep 2 relabels to 1; no member row of cluster 2 is rewritten
    ClusterRegistry.register(spark, path, Seq(20L),
      Seq((20L, 5L), (20L, 8L)), "0")
    assert(reps(path, Seq(1L, 5L, 2L, 8L, 20L)) ==
      Map(1L -> 1L, 5L -> 1L, 2L -> 1L, 8L -> 1L, 20L -> 1L),
      "the bridged clusters must read as ONE under the minimum rep")
    // the raw member row of 8 still says rep 2 — resolution is via the log
    val g = GenDir.resolveRequired(spark, path)
    val raw8 = spark.read.parquet(s"$g/assign")
      .filter(org.apache.spark.sql.functions.col("doc_id") === 8L)
      .collect().map(_.getLong(1)).toSet
    assert(raw8 == Set(2L), "bridging must relabel, not rewrite member rows")
    // a second bridge chains: doc 30 dups 8 and a NEW cluster {0,9}
    ClusterRegistry.register(spark, path, Seq(25L, 26L),
      Seq((25L, 26L)), "1") // cluster {25,26}
    ClusterRegistry.register(spark, path, Seq(30L),
      Seq((30L, 8L), (30L, 26L)), "2")
    assert(reps(path, Seq(25L, 26L, 30L, 8L)) ==
      Map(25L -> 1L, 26L -> 1L, 30L -> 1L, 8L -> 1L),
      "chained merges must resolve through the relabel log")
  }

  test("replay: re-registering a batch is derivation- and write-idempotent") {
    val path = freshPath()
    ClusterRegistry.seed(spark, Seq((1L, 5L)).toDF("doc_a", "doc_b"), path)
    ClusterRegistry.register(spark, path, Seq(10L, 11L),
      Seq((10L, 5L), (10L, 11L)), "0")
    val before = reps(path, Seq(1L, 5L, 10L, 11L))
    val g = GenDir.resolveRequired(spark, path)
    val rowsBefore = spark.read.parquet(s"$g/assign").count()
    ClusterRegistry.register(spark, path, Seq(10L, 11L),
      Seq((10L, 5L), (10L, 11L)), "0")
    assert(reps(path, Seq(1L, 5L, 10L, 11L)) == before,
      "a replayed epoch must not change any assignment")
    assert(spark.read.parquet(s"$g/assign").count() == rowsBefore,
      "a replayed epoch must overwrite its own rows, not duplicate them")
  }

  test("replay of a BRIDGING epoch rewrites its relabel rows, not an empty set") {
    // regression: relabelMap's exclusion must use the WRITTEN partition
    // value (`b<id>`). With the bare id the replay read its own prior
    // (2→1) relabel row, derived nothing to relabel, and overwrote the
    // partition with an empty set — permanently splitting the bridged
    // clusters (member 8 still resolves through that log row).
    val path = freshPath()
    ClusterRegistry.seed(spark,
      Seq((1L, 5L), (2L, 8L)).toDF("doc_a", "doc_b"), path)
    ClusterRegistry.register(spark, path, Seq(20L),
      Seq((20L, 5L), (20L, 8L)), "0")
    val ids = Seq(1L, 5L, 2L, 8L, 20L)
    val before = reps(path, ids)
    assert(before.values.toSet == Set(1L), s"bridge must merge: $before")
    val g = GenDir.resolveRequired(spark, path)
    def relabelRows(): Set[(Long, Long)] =
      spark.read.parquet(s"$g/relabel")
        .filter(org.apache.spark.sql.functions.col("batch") === "b0")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val logBefore = relabelRows()
    assert(logBefore == Set((2L, 1L)), s"bridge must log 2→1: $logBefore")
    ClusterRegistry.register(spark, path, Seq(20L),
      Seq((20L, 5L), (20L, 8L)), "0") // replay
    assert(relabelRows() == logBefore,
      "a replayed bridge epoch must rewrite the SAME relabel rows")
    assert(reps(path, ids) == before,
      "a replayed bridge epoch must not change any assignment")
  }

  test("staleness counts the relabel log; compaction folds it and keeps read semantics") {
    val path = freshPath()
    ClusterRegistry.seed(spark,
      Seq((1L, 5L), (2L, 8L), (3L, 9L)).toDF("doc_a", "doc_b"), path)
    // two bridges → two relabel entries in two batches
    ClusterRegistry.register(spark, path, Seq(20L), Seq((20L, 5L), (20L, 8L)), "0")
    ClusterRegistry.register(spark, path, Seq(21L), Seq((21L, 8L), (21L, 9L)), "1")
    val ids = Seq(1L, 5L, 2L, 8L, 3L, 9L, 20L, 21L, 4L)
    val before = reps(path, ids)
    assert(before.values.toSet == Set(1L, 4L),
      s"all three clusters bridged into rep 1 (4 stays singleton): $before")
    val st = ClusterRegistry.staleness(spark, path).head()
    assert(st.getLong(1) == 2L && st.getLong(2) >= 2L,
      s"two bridge relabels must be counted: $st")
    val genBefore = GenDir.resolveRequired(spark, path)
    ClusterRegistry.compact(spark, path)
    assert(GenDir.resolveRequired(spark, path) != genBefore,
      "compaction must publish a new generation")
    assert(reps(path, ids) == before,
      "folding the relabel log must not change any assignment")
    val st2 = ClusterRegistry.staleness(spark, path).head()
    assert(st2.getLong(1) == 0L, s"the folded log must be empty: $st2")
    // the relabeled reps (2, 3) must now be MEMBER rows, not implicit
    // singletons — the fold materializes them
    val g2 = GenDir.resolveRequired(spark, path)
    val folded = spark.read.parquet(s"$g2/assign")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(folded.get(2L).contains(1L) && folded.get(3L).contains(1L),
      s"relabeled reps must become member rows on fold: $folded")
    // registering against the folded registry still works
    ClusterRegistry.register(spark, path, Seq(40L), Seq((40L, 9L)), "2")
    assert(reps(path, Seq(40L)) == Map(40L -> 1L))
  }

  test("within-epoch transitivity") {
    val path = freshPath()
    ClusterRegistry.seed(spark,
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"), path)
    // chain inside ONE batch: 50-51, 51-52 → one cluster, rep 50
    ClusterRegistry.register(spark, path, Seq(50L, 51L, 52L),
      Seq((50L, 51L), (51L, 52L)), "0")
    assert(reps(path, Seq(50L, 51L, 52L)) ==
      Map(50L -> 50L, 51L -> 50L, 52L -> 50L))
  }

  /** Raw on-disk state of the live generation — assign member rows and
    * relabel log rows per batch partition. Path identity is asserted on
    * THIS, not just resolved reps: the distributed fallback must write
    * the same artifact, not merely an equivalent one. */
  private def rawState(path: String): (Set[(Long, Long, String)], Set[(Long, Long, String)]) = {
    val g = GenDir.resolveRequired(spark, path)
    val a = spark.read.parquet(s"$g/assign")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Any]("batch").toString)).toSet
    val r = spark.read.parquet(s"$g/relabel")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Any]("batch").toString)).toSet
    (a, r)
  }

  test("distributed fallback past the edge ceiling writes the identical rows") {
    // the same epoch sequence (seeds, joins, a bridge, a chain, a replay)
    // down both paths: the driver fold (default ceiling) and the
    // connectedComponents pass (ceiling forced to 0 — the
    // Dedup.maxBroadcastIdBytes=0 pattern); raw assign+relabel state and
    // resolved reps must be bit-identical
    val ids = Seq(1L, 5L, 2L, 8L, 3L, 9L, 20L, 21L, 30L, 31L, 4L)
    def run(path: String): Unit = {
      ClusterRegistry.seed(spark,
        Seq((1L, 5L), (2L, 8L), (3L, 9L)).toDF("doc_a", "doc_b"), path)
      // join + bridge in one epoch
      ClusterRegistry.register(spark, path, Seq(20L),
        Seq((20L, 5L), (20L, 8L)), "0")
      // within-batch chain + index edge
      ClusterRegistry.register(spark, path, Seq(30L, 31L),
        Seq((30L, 31L), (31L, 9L)), "1")
      // second bridge through a relabeled rep
      ClusterRegistry.register(spark, path, Seq(21L),
        Seq((21L, 8L), (21L, 3L)), "2")
      // replay of the bridging epoch
      ClusterRegistry.register(spark, path, Seq(20L),
        Seq((20L, 5L), (20L, 8L)), "0")
    }
    val driverPath = freshPath()
    run(driverPath)
    val driverReps = reps(driverPath, ids)
    val driverRaw = rawState(driverPath)
    val distPath = freshPath()
    val saved = ClusterRegistry.MaxEpochEdges
    try {
      ClusterRegistry.MaxEpochEdges = 0
      run(distPath)
    } finally ClusterRegistry.MaxEpochEdges = saved
    assert(reps(distPath, ids) == driverReps,
      "distributed fallback must resolve identical representatives")
    assert(rawState(distPath) == driverRaw,
      "distributed fallback must write the identical assign/relabel rows")
    // and registerEpoch's count-dispatch: DataFrame entry at default
    // ceiling (driver path) also matches
    val epochPath = freshPath()
    ClusterRegistry.seed(spark,
      Seq((1L, 5L), (2L, 8L), (3L, 9L)).toDF("doc_a", "doc_b"), epochPath)
    ClusterRegistry.registerEpoch(spark, epochPath, Seq(20L).toDF("doc_id"),
      Seq((20L, 5L), (20L, 8L)).toDF("doc_a", "doc_b"), "0")
    ClusterRegistry.registerEpoch(spark, epochPath,
      Seq(30L, 31L).toDF("doc_id"),
      Seq((30L, 31L), (31L, 9L)).toDF("doc_a", "doc_b"), "1")
    ClusterRegistry.registerEpoch(spark, epochPath, Seq(21L).toDF("doc_id"),
      Seq((21L, 8L), (21L, 3L)).toDF("doc_a", "doc_b"), "2")
    ClusterRegistry.registerEpoch(spark, epochPath, Seq(20L).toDF("doc_id"),
      Seq((20L, 5L), (20L, 8L)).toDF("doc_a", "doc_b"), "0")
    assert(reps(epochPath, ids) == driverReps)
    assert(rawState(epochPath) == driverRaw)
  }

  private def electedMap(path: String): Map[Long, (Long, Double)] =
    ClusterRegistry.electedReps(spark, path)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

  private def withReps(path: String, ids: Seq[Long]): Map[Long, (Long, Long)] =
    ClusterRegistry.assignWithReps(ids.toDF("doc_id"), path)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("quality-aware election: seed best, bridge merges elections, " +
      "singleton sidecar quality, higher-quality arrival migrates the rep") {
    val path = freshPath()
    // clusters {1,5} (q: 1→2.0, 5→7.0 ⇒ elected 5), {2,8} (2→4.0, 8→3.0 ⇒ 2);
    // 3 a singleton with the HIGHEST quality of all (9.0)
    val qual = Seq((1L, 2.0), (5L, 7.0), (2L, 4.0), (8L, 3.0), (3L, 9.0))
      .toDF("doc_id", "quality")
    ClusterRegistry.seed(spark,
      Seq((1L, 5L), (2L, 8L)).toDF("doc_a", "doc_b"), path, Some(qual))
    assert(electedMap(path) == Map(1L -> (5L, 7.0), 2L -> (2L, 4.0)))
    assert(withReps(path, Seq(1L, 5L, 2L, 8L, 3L)) ==
      Map(1L -> (1L, 5L), 5L -> (1L, 5L), 2L -> (2L, 2L), 8L -> (2L, 2L),
        3L -> (3L, 3L)),
      "cluster_id stays the min-id label; rep_doc is the elected member")
    // epoch 0: doc 20 (q 5.0) bridges clusters 1 and 2 → elected = 5 (7.0)
    ClusterRegistry.register(spark, path, Seq(20L),
      Seq((20L, 5L), (20L, 8L)), "0", Map(20L -> 5.0))
    assert(electedMap(path) == Map(1L -> (5L, 7.0)),
      "merged cluster must elect the best across BOTH merged elections")
    // epoch 1: doc 21 (q 1.0) bridges the merged cluster with SINGLETON 3
    // — 3 was never in a cluster, its quality must come from the sidecar
    ClusterRegistry.register(spark, path, Seq(21L),
      Seq((21L, 20L), (21L, 3L)), "1", Map(21L -> 1.0))
    assert(electedMap(path) == Map(1L -> (3L, 9.0)),
      "a bridged singleton's sidecar quality must stand for election")
    // epoch 2: doc 22 (q 11.0) joins — elected migrates to the arrival
    ClusterRegistry.register(spark, path, Seq(22L),
      Seq((22L, 1L)), "2", Map(22L -> 11.0))
    assert(electedMap(path) == Map(1L -> (22L, 11.0)))
    assert(withReps(path, Seq(1L, 3L, 22L, 40L)) ==
      Map(1L -> (1L, 22L), 3L -> (1L, 22L), 22L -> (1L, 22L),
        40L -> (40L, 40L)))
    // LATE replay of the bridge epoch (epochs have run since): the
    // rewritten rows derive from the CURRENT pre-state, so they need not
    // be byte-identical — but the resolved election must be unchanged,
    // and a second replay must be write-idempotent (byte identity for
    // immediate replays is pinned in the distributed-fallback test)
    val g = GenDir.resolveRequired(spark, path)
    def electRows(b: String): Set[(Long, Long, Double)] =
      spark.read.parquet(s"$g/elect")
        .filter(org.apache.spark.sql.functions.col("batch") === b)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    ClusterRegistry.register(spark, path, Seq(21L),
      Seq((21L, 20L), (21L, 3L)), "1", Map(21L -> 1.0))
    assert(electedMap(path) == Map(1L -> (22L, 11.0)),
      "a late replay must not change the resolved election")
    val e1 = electRows("b1")
    ClusterRegistry.register(spark, path, Seq(21L),
      Seq((21L, 20L), (21L, 3L)), "1", Map(21L -> 1.0))
    assert(electRows("b1") == e1,
      "an immediate re-replay must rewrite the SAME elect rows")
    assert(electedMap(path) == Map(1L -> (22L, 11.0)))
    // compact folds the elect log and preserves the elected rep
    ClusterRegistry.compact(spark, path)
    assert(electedMap(path) == Map(1L -> (22L, 11.0)),
      "compact must preserve elected representatives")
    assert(withReps(path, Seq(5L, 8L)) == Map(5L -> (1L, 22L), 8L -> (1L, 22L)))
    // ties break to the smaller id: 50/51 both q 6.0 → 50
    ClusterRegistry.register(spark, path, Seq(50L, 51L),
      Seq((50L, 51L)), "3", Map(50L -> 6.0, 51L -> 6.0))
    assert(electedMap(path).get(50L).contains((50L, 6.0)))
  }

  test("compact folds the quality sidecar: one data dir, tombstoned batches, " +
      "late sidecar retry is a no-op; staleness surfaces election semantics") {
    import org.apache.spark.sql.functions.{col, max}
    val path = freshPath()
    def sidecarMax(p: String): Map[Long, Double] =
      spark.read.parquet(s"$p/_qual")
        .groupBy(col("doc_id")).agg(max(col("quality")).as("q"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val qual = Seq((1L, 2.0), (5L, 7.0), (2L, 4.0), (8L, 3.0), (3L, 9.0))
      .toDF("doc_id", "quality")
    ClusterRegistry.seed(spark,
      Seq((1L, 5L), (2L, 8L)).toDF("doc_a", "doc_b"), path, Some(qual))
    ClusterRegistry.register(spark, path, Seq(20L),
      Seq((20L, 5L), (20L, 8L)), "0", Map(20L -> 5.0))
    ClusterRegistry.register(spark, path, Seq(21L, 22L),
      Seq((21L, 22L)), "1", Map(21L -> 1.0, 22L -> 2.5))
    val st0 = ClusterRegistry.staleness(spark, path).head()
    assert(st0.getBoolean(4), s"has_quality must read true: $st0")
    assert(st0.getLong(5) == 2L,
      s"the merged cluster and {21,22} hold elections: $st0")
    assert(st0.getLong(6) == 3L,
      s"three sidecar data dirs before the fold (seed, b0, b1): $st0")
    val electBefore = electedMap(path)
    val qualBefore = sidecarMax(path)
    ClusterRegistry.compact(spark, path)
    val st1 = ClusterRegistry.staleness(spark, path).head()
    assert(st1.getLong(6) == 1L,
      s"the fold must leave ONE consolidated sidecar data dir: $st1")
    assert(st1.getBoolean(4) && st1.getLong(5) == 2L,
      s"election surface unchanged across the fold: $st1")
    assert(electedMap(path) == electBefore,
      "resolved elections must be identical across the sidecar fold")
    assert(sidecarMax(path) == qualBefore,
      "per-doc sidecar values must be identical across the fold")
    // late upstream retry of an absorbed epoch: the sidecar write is a
    // no-op (the _FOLDED tombstone gates it) and the dir stays empty
    ClusterRegistry.register(spark, path, Seq(20L),
      Seq((20L, 5L), (20L, 8L)), "0", Map(20L -> 5.0))
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val b0 = new Path(s"$path/_qual/batch=b0")
    assert(fs.listStatus(b0).forall(_.getPath.getName.startsWith("_")),
      "the absorbed batch's sidecar dir must stay an empty tombstone")
    assert(ClusterRegistry.staleness(spark, path).head().getLong(6) == 1L,
      "a late retry must not re-fragment the folded sidecar")
    assert(electedMap(path) == electBefore)
    assert(sidecarMax(path) == qualBefore)
    // a SECOND compact folds the consolidated dir into the next one
    ClusterRegistry.compact(spark, path)
    assert(ClusterRegistry.staleness(spark, path).head().getLong(6) == 1L)
    assert(electedMap(path) == electBefore)
    assert(sidecarMax(path) == qualBefore)
    // a quality-LESS registry reads has_quality false, zero elections
    val plain = freshPath()
    ClusterRegistry.seed(spark, Seq((1L, 5L)).toDF("doc_a", "doc_b"), plain)
    val stp = ClusterRegistry.staleness(spark, plain).head()
    assert(!stp.getBoolean(4) && stp.getLong(5) == 0L && stp.getLong(6) == 0L,
      s"a min-id-fallback registry must be distinguishable: $stp")
  }

  test("quality-aware distributed fallback writes identical elect rows") {
    def run(path: String): Unit = {
      val qual = Seq((1L, 2.0), (5L, 7.0), (2L, 4.0), (8L, 3.0), (3L, 9.0))
        .toDF("doc_id", "quality")
      ClusterRegistry.seed(spark,
        Seq((1L, 5L), (2L, 8L)).toDF("doc_a", "doc_b"), path, Some(qual))
      ClusterRegistry.register(spark, path, Seq(20L),
        Seq((20L, 5L), (20L, 8L)), "0", Map(20L -> 5.0))
      ClusterRegistry.register(spark, path, Seq(21L),
        Seq((21L, 20L), (21L, 3L)), "1", Map(21L -> 1.0))
      ClusterRegistry.register(spark, path, Seq(21L),
        Seq((21L, 20L), (21L, 3L)), "1", Map(21L -> 1.0)) // replay
    }
    def electState(path: String): Set[(Long, Long, Double, String)] = {
      val g = GenDir.resolveRequired(spark, path)
      spark.read.parquet(s"$g/elect")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getAs[Any]("batch").toString)).toSet
    }
    val driverPath = freshPath()
    run(driverPath)
    val distPath = freshPath()
    val saved = ClusterRegistry.MaxEpochEdges
    try {
      ClusterRegistry.MaxEpochEdges = 0
      run(distPath)
    } finally ClusterRegistry.MaxEpochEdges = saved
    assert(electState(distPath) == electState(driverPath),
      "distributed election must write the identical elect rows")
    assert(electedMap(distPath) == electedMap(driverPath))
    assert(withReps(distPath, Seq(1L, 5L, 2L, 8L, 3L, 20L, 21L)) ==
      withReps(driverPath, Seq(1L, 5L, 2L, 8L, 3L, 20L, 21L)))
  }

  test("keep-best election is schedule-invariant and equals batch keep-best-CC") {
    // fixed truth: docs 0..11, quality, and the near-dup pair set;
    // three DIFFERENT ingestion schedules must land on the identical
    // (doc, cluster_id, rep_doc) state — equal to keep-best over batch CC
    val quality = Map(0L -> 3.0, 1L -> 9.0, 2L -> 1.0, 3L -> 5.0, 4L -> 5.0,
      5L -> 2.0, 6L -> 8.0, 7L -> 8.0, 8L -> 4.0, 9L -> 1.0, 10L -> 6.0,
      11L -> 7.0)
    val pairSet = Seq((0L, 4L), (4L, 8L), (1L, 5L), (2L, 3L), (6L, 7L),
      (9L, 10L), (10L, 11L))
    // truth (by hand): clusters {0,4,8} best 4 (5.0>4.0>3.0), {1,5} best 1,
    // {2,3} best 3, {6,7} best 6 (tie 8.0 → min id), {9,10,11} best 11
    val truth = Map(
      0L -> (0L, 4L), 4L -> (0L, 4L), 8L -> (0L, 4L),
      1L -> (1L, 1L), 5L -> (1L, 1L),
      2L -> (2L, 3L), 3L -> (2L, 3L),
      6L -> (6L, 6L), 7L -> (6L, 6L),
      9L -> (9L, 11L), 10L -> (9L, 11L), 11L -> (9L, 11L))
    def arrivesAt(d: Long, epochOf: Long => Int): Int = epochOf(d)
    def build(path: String, epochOf: Long => Int, nEpochs: Int,
        compactAfter: Set[Int]): Unit = {
      val seedDocs = quality.keys.filter(epochOf(_) == 0).toSeq
      val seedPairs = pairSet.filter(p => epochOf(p._1) == 0 && epochOf(p._2) == 0)
      ClusterRegistry.seed(spark, seedPairs.toDF("doc_a", "doc_b"), path,
        Some(seedDocs.map(d => (d, quality(d))).toDF("doc_id", "quality")))
      for (m <- 1 until nEpochs) {
        val batch = quality.keys.filter(epochOf(_) == m).toSeq.sorted
        val edges = pairSet.filter(p =>
          math.max(arrivesAt(p._1, epochOf), math.max(arrivesAt(p._2, epochOf), 0)) == m)
        ClusterRegistry.register(spark, path, batch, edges, s"e$m",
          batch.map(d => d -> quality(d)).toMap)
        if (compactAfter.contains(m)) ClusterRegistry.compact(spark, path)
      }
    }
    val ids = quality.keys.toSeq.sorted
    // schedule A: mod-3 epochs, no compaction
    val pa = freshPath()
    build(pa, d => (d % 3).toInt, 3, Set.empty)
    // schedule B: everything in one epoch after an empty seed
    val pb = freshPath()
    build(pb, d => if (d >= 0) 1 else 0, 2, Set.empty)
    // schedule C: mod-4 epochs, compaction after every epoch
    val pc = freshPath()
    build(pc, d => (d % 4).toInt, 4, Set(1, 2, 3))
    val a = withReps(pa, ids)
    assert(a == truth, s"schedule A must equal batch keep-best-CC: $a")
    assert(withReps(pb, ids) == truth, "schedule B must match")
    assert(withReps(pc, ids) == truth,
      "schedule C (compaction between every epoch) must match")
  }

  test("a hot-cluster epoch past the ceiling dispatches instead of throwing") {
    // one batch doc near-dup to MANY indexed docs — the 100TB hot-template
    // shape that used to throw MaxEpochEdges; with the ceiling forced tiny
    // the epoch must dispatch and produce the right single cluster
    val path = freshPath()
    val base = (0L until 40L).map(i => (1000L + i, 1001L + i))
    ClusterRegistry.seed(spark, base.toDF("doc_a", "doc_b"), path)
    val saved = ClusterRegistry.MaxEpochEdges
    try {
      ClusterRegistry.MaxEpochEdges = 4
      // 41 edges from the hot doc to every member of the base cluster
      ClusterRegistry.register(spark, path, Seq(6000L),
        (1000L to 1040L).map(p => (6000L, p)), "hot")
    } finally ClusterRegistry.MaxEpochEdges = saved
    val got = reps(path, Seq(6000L, 1000L, 1017L, 1040L))
    assert(got == Map(6000L -> 1000L, 1000L -> 1000L,
      1017L -> 1000L, 1040L -> 1000L),
      s"hot epoch must fold into the existing cluster: $got")
  }
}
