package graft

import org.apache.spark.sql.{GraftSqlBridge, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.Dedup

/** Pin lifecycle gate (VERDICT r7 items 1–2).
  *
  * Round 7 measured the q81 bench reps ramping 1.5 s → 13 s inside ONE
  * session: every `GraftSession.pin` (then `Dataset.persist`) parked its
  * blocks in the CacheManager — a STRONG reference the operator could never
  * safely drop, because its result is lazy and the caller's actions still
  * need the blocks — so repeated dedup invocations accumulated cached
  * gram-array frames until storage-memory eviction thrash. `pin` now caches
  * at the RDD level: the ContextCleaner tracks the RDD through weak
  * references and frees its blocks on the first driver GC after the caller
  * drops the frame. This suite pins that lifecycle:
  *
  *  1. the CacheManager NEVER holds an entry (no strong-ref leak is even
  *     possible);
  *  2. after each operator invocation's references die, a GC returns the
  *     block manager to zero cached RDDs — flat across N invocations, the
  *     bound a week-long production session needs.
  */
class PinLifecycleSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(4, "graft-pin")

  /** GC until the block manager reports no cached RDDs (the ContextCleaner
    * acts on a weak-reference queue, so cleanup is async-but-prompt). */
  private def cachedRddsAfterGc(timeoutMs: Long = 30000): Int = {
    val sc = spark.sparkContext
    val t0 = System.currentTimeMillis()
    var n = sc.getRDDStorageInfo.length
    while (n > 0 && System.currentTimeMillis() - t0 < timeoutMs) {
      System.gc()
      Thread.sleep(200)
      n = sc.getRDDStorageInfo.length
    }
    n
  }

  /** One full dedup invocation in its OWN stack frame: when this returns,
    * no live reference to the operator frames (and their pinned RDDs)
    * remains — the GC check in the caller then measures the real
    * post-invocation lifecycle, not this frame's still-live locals. */
  private def oneDedupInvocation(
      docs: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", 3, 64, 16, 0.8)
    // maxLocalEdges = 0 forces the distributed loop (the pin-heavy path)
    val cc = Dedup.connectedComponents(pairs, maxIter = 20, maxLocalEdges = 0L)
    (pairs.count(), cc.count())
  }

  test("repeated minhash + CC invocations: CacheManager stays empty, cached blocks return to zero") {
    val docs = Tables.load(spark, dir, "documents")
    var expected: (Long, Long) = (-1L, -1L)
    (1 to 5).foreach { i =>
      val got = oneDedupInvocation(docs)
      if (i == 1) expected = got
      assert(got == expected, s"invocation $i changed results $got")
      assert(GraftSqlBridge.cacheManagerIsEmpty(spark),
        s"invocation $i parked an entry in the CacheManager — strong-ref leak")
      // the invocation's frames died with its stack frame; the blocks it
      // pinned must be reclaimable by GC alone, EVERY iteration — the
      // flat-across-invocations bound a long-lived session needs
      val left = cachedRddsAfterGc()
      assert(left == 0,
        s"$left cached RDDs still alive after invocation $i + GC — pin leak")
    }
    assert(expected._1 > 0 && expected._2 > 0,
      "fixture must exercise the pinned paths (planted near-dups)")
  }

  private def oneBm25Invocation(docs: org.apache.spark.sql.DataFrame): Long =
    graft.operators.Pipeline.bm25TopK(
      docs.limit(5).select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")),
      docs, "doc_id", "text", "doc_id", "text", k = 3).count()

  test("bm25 invocations release postings blocks the same way") {
    val docs = Tables.load(spark, dir, "documents")
    var expected = -1L
    (1 to 3).foreach { i =>
      val n = oneBm25Invocation(docs)
      if (i == 1) expected = n
      assert(n == expected)
      assert(GraftSqlBridge.cacheManagerIsEmpty(spark))
      assert(cachedRddsAfterGc() == 0, s"bm25 invocation $i leaked cached blocks")
    }
  }

  // ---- round-9 gates: eager release, NO System.gc required ----

  test("pinScope frees dead intermediates eagerly, keeps the result's pins") {
    import org.apache.spark.sql.functions._
    val sc = spark.sparkContext
    assert(sc.getRDDStorageInfo.isEmpty, "dirty storage before scope test")
    val kept = GraftSession.pinScope {
      val dead = GraftSession.pin(spark.range(1000).toDF("a"))
      val live = GraftSession.pin(dead.select((col("a") * 2).as("b")))
      live // `dead` is an intermediate: not a leaf of the returned plan
    }
    // no GC anywhere: the scope itself must have freed the dead pin
    assert(sc.getRDDStorageInfo.length == 1,
      s"expected exactly the kept pin cached, got ${sc.getRDDStorageInfo.length}")
    assert(kept.count() == 1000, "kept pin must stay usable after scope exit")
    GraftSession.release(kept, blocking = true)
    assert(sc.getRDDStorageInfo.isEmpty, "release(kept) must drain storage")
  }

  test("pinScope keeps SUB-LEAF registered pins the result depends on (rankedScan shape)") {
    // ADVICE r10: the keep-set was computed from the result's plan LEAVES
    // only, but registerPin'd materializations (rankedScan's sorted RDD)
    // sit one dependency BELOW the leaf — a leaf-only keep would unpersist
    // them at scope exit, forcing the lazy result's first action to redo
    // the full sort. Reproduce the shape directly: persist+register an
    // internal RDD, return a frame whose leaf is a DERIVED rdd.
    val sc = spark.sparkContext
    assert(cachedRddsAfterGc() == 0, "dirty storage before sub-leaf scope test")
    val result = GraftSession.pinScope {
      val df = spark.range(2000).toDF("a")
      val rdd = GraftSqlBridge.internalRdd(df)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rdd.count()
      GraftSession.registerPin(rdd)
      val derived = rdd.mapPartitions(identity)
      GraftSqlBridge.cachedDf(spark, derived, df.schema, 16000L, 2000L)
    }
    assert(sc.getRDDStorageInfo.exists(_.numCachedPartitions > 0),
      "the sub-leaf registered pin must SURVIVE scope exit — the result's " +
        "first action reads through it")
    assert(result.count() == 2000, "kept result must stay usable")
    GraftSession.release(result, blocking = true)
    assert(sc.getRDDStorageInfo.isEmpty,
      "release(result) must still drain the sub-leaf pin through the closure")
  }

  test("release is pin-gated: checkpointed / non-pinned frames pass through") {
    val ck = GraftSession.reliableCheckpoint(spark.range(100).toDF("a"))
    val before = ck.count()
    GraftSession.release(ck, blocking = true) // must NOT touch the checkpoint
    assert(ck.count() == before, "released checkpoint frame must still read")
  }

  test("N consecutive clusterAwareSplits invocations: storage drains to zero, no System.gc") {
    val docs = Tables.load(spark, dir, "documents")
    val sc = spark.sparkContext
    // drain leftovers from earlier suites so the flat-loop assertion is crisp
    assert(cachedRddsAfterGc() == 0)
    var expected = -1L
    (1 to 4).foreach { i =>
      val f = graft.operators.Pipeline.clusterAwareSplits(
        docs, "doc_id", "text", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      val n = f.count()
      if (i == 1) expected = n
      assert(n == expected, s"invocation $i changed results")
      GraftSession.release(f, blocking = true)
      // the q145 gate: every invocation returns the block manager to zero
      // WITHOUT a driver GC — pinScope freed the minhash/CC intermediates,
      // release freed whatever the returned frame still pinned
      assert(sc.getRDDStorageInfo.isEmpty,
        s"invocation $i left ${sc.getRDDStorageInfo.length} cached RDDs without GC")
    }
  }

  // ---- round-10 gate: closure-release of rankedScan materializations ----

  test("rankedScan-family invocations drain through release, no System.gc (q133 class)") {
    // The round-9 driver bench flagged q133 (max spike) and its RepTimer
    // trace showed WHY: interleaveByWeight runs TWO rankedScans per
    // invocation, each persisting a sorted RDD one mapPartitions BELOW the
    // result's plan leaf — unregistered, invisible to the leaf-only
    // release, accumulating 2 cached RDDs per rep until a driver GC.
    // registerPin + dependency-closure release close that: every
    // invocation must return the block manager to zero with NO GC.
    val docs = Tables.load(spark, dir, "documents")
    val sc = spark.sparkContext
    assert(cachedRddsAfterGc() == 0)
    var expected = -1L
    (1 to 4).foreach { i =>
      val f = graft.operators.Pipeline.interleaveByWeight(
        docs, "doc_id", "source", Seq("src0" -> 3, "src1" -> 2, "src2" -> 1))
      val n = f.count()
      if (i == 1) expected = n
      assert(n == expected, s"invocation $i changed results")
      GraftSession.release(f, blocking = true)
      assert(sc.getRDDStorageInfo.isEmpty,
        s"invocation $i left ${sc.getRDDStorageInfo.length} cached RDDs " +
          "without GC — rankedScan persists must release through the closure")
    }
    // same lifecycle for the grouped prefix scan (q59's stack)
    val p = graft.operators.Pipeline.packSequences(
      docs, "doc_id", "text", "source", 2048)
    p.count()
    GraftSession.release(p, blocking = true)
    assert(sc.getRDDStorageInfo.isEmpty,
      "groupedPrefixScan persist must release through the closure")
  }
}
