package org.apache.spark

/** graft's narrow bridge into `private[spark]` core internals, used by the
  * bench/stress harness to ATTRIBUTE rep-time pathologies instead of
  * guessing (VERDICT r9 item 1): a spike rep with flat GC, flat codegen and
  * a storage high-water at the ceiling is eviction churn; one with a
  * codegen-count delta is a recompilation; one with neither is outside the
  * JVM. Read-only accessors — nothing here mutates engine state. */
object GraftSparkBridge {

  /** Bytes of storage memory in use RIGHT NOW (on-heap + off-heap pools of
    * the unified memory manager). local-mode driver == the only executor,
    * so this is the whole picture the bench needs. */
  def storageMemoryUsed: Long =
    Option(SparkEnv.get).map(_.memoryManager.storageMemoryUsed).getOrElse(0L)

  /** Max storage-pool bytes (the eviction ceiling the high-water is read
    * against). */
  def maxStorageMemory: Long =
    Option(SparkEnv.get).map { e =>
      e.memoryManager.maxOnHeapStorageMemory + e.memoryManager.maxOffHeapStorageMemory
    }.getOrElse(0L)

  /** Cumulative whole-stage-codegen compilations in this JVM (Janino
    * invocations, cache misses only — the generated-class cache front-ends
    * this counter, so a rep that re-plans into an already-seen source is
    * NOT counted). Per-rep deltas expose recompilation storms. */
  def codegenCompileCount: Long =
    org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount

  /** Block until every queued listener event has been delivered — gives
    * per-rep listener-derived counters (eviction counts) exact windows. */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
