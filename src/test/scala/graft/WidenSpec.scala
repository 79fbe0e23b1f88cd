package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Widen gate (VERDICT r9 item 2: stop double-planning in `widen`).
  *
  * `widen`'s old implementation asked `df.rdd.getNumPartitions`, which
  * compiled a FULL physical plan on a separate deserializing
  * QueryExecution at every call site — and under AQE, executing the RDD
  * lineage of a shuffle-bearing frame runs the upstream stages as real
  * Spark jobs just to count partitions. The replacement derives width
  * from the optimized LOGICAL plan (`GraftSqlBridge.planParallelism`).
  * This suite pins:
  *
  *  1. decision correctness — narrow sources are repartitioned to the
  *     cluster width, wide frames pass through as the SAME object (no
  *     exchange added);
  *  2. zero jobs — the widen decision itself submits no Spark job, even
  *     on a frame whose plan contains a shuffle (the case where `.rdd`
  *     under AQE runs stages);
  *  3. estimator fidelity per leaf family — pinned LogicalRDD frames
  *     report exact partitions, file scans land within the split-math
  *     envelope, explicit repartitions report their target.
  */
class WidenSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.local(8, "graft-widen")

  private def jobsDuring[A](body: => A): (A, Int) = {
    val n = new AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { n.incrementAndGet(): Unit }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      // the listener bus is async (and private); the expected count is
      // zero, so a fixed drain window is deterministic enough
      Thread.sleep(500)
      (r, n.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private def docs: DataFrame = spark.read.parquet(s"$dir/documents.parquet")

  test("narrow file scan is widened to cluster width, with zero jobs submitted") {
    val target = spark.sparkContext.defaultParallelism
    val d = docs
    d.schema // resolve the scan (footer read) outside the measured window
    val (widened, jobs) = jobsDuring(GraftSession.widen(d))
    assert(jobs === 0, "the widen decision must not submit a Spark job")
    // sf0.001 documents is a toy file — the estimator must see it as narrow
    assert(widened.queryExecution.logical !== docs.queryExecution.logical,
      "narrow scan must gain a repartition")
    assert(widened.rdd.getNumPartitions === target)
  }

  test("already-wide frame passes through as the same object (no exchange)") {
    val target = spark.sparkContext.defaultParallelism
    val wide = docs.repartition(target * 2)
    val (out, jobs) = jobsDuring(GraftSession.widen(wide))
    assert(jobs === 0)
    assert(out eq wide, "wide input must be returned unchanged")
  }

  test("widen on a shuffle-bearing plan submits zero jobs (the AQE .rdd trap)") {
    val agg = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val (out, jobs) = jobsDuring(GraftSession.widen(agg))
    assert(jobs === 0,
      "counting partitions of an aggregated frame must not run its stages")
    // round 11: the estimate is the AQE-coalesced runtime width (this tiny
    // aggregate coalesces to ~1 partition), so widen now re-widens it —
    // the old df.rdd behavior, recovered without running stages
    assert(!(out eq agg), "an AQE-coalesced narrow aggregate must be re-widened")
    // with coalescing off the estimate is the static shuffle width → no-op
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val (out2, jobs2) = jobsDuring(GraftSession.widen(agg))
      assert(jobs2 === 0 && (out2 eq agg))
    } finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
  }

  test("pinned frames report exact partition counts") {
    val pinned = GraftSession.pin(docs.limit(100).repartition(3))
    try {
      assert(GraftSqlBridge.planParallelism(pinned) === 3)
      val (out, jobs) = jobsDuring(GraftSession.widen(pinned))
      assert(jobs === 0)
      assert(out.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
    } finally GraftSession.release(pinned)
  }

  test("estimator families: repartition target, union sum, local relation") {
    import spark.implicits._
    val d = docs
    assert(GraftSqlBridge.planParallelism(d.repartition(64)) === 64)
    val one = Seq((1L, "a")).toDF("id", "v")
    assert(GraftSqlBridge.planParallelism(one) === 1)
    val u = d.select(col("doc_id")).union(d.select(col("doc_id")))
    val single = GraftSqlBridge.planParallelism(d.select(col("doc_id")))
    assert(GraftSqlBridge.planParallelism(u) === single * 2)
  }

  test("DSv2 connector scans estimate their REAL partition count, and widen re-widens them") {
    // a graft-redis-hash scan is ONE partition by construction
    // (RedisSources FnBatch) — but its catalyst stats default to
    // spark.sql.defaultSizeInBytes, which the old estimator read as
    // "wide" and widen() silently no-op'd on (ADVICE r10)
    val uri = "hub:widen/dsv2-est"
    graft.sources.hub.MemHub.hashPut(s"$uri/h", (0 until 500).iterator.map(i => s"k$i" -> s"v$i"))
    val df = graft.sources.GraftSources.redisHash(spark, uri, "h")
    val (est, jobs) = jobsDuring { GraftSqlBridge.planParallelism(df) }
    assert(jobs === 0, "the DSv2 estimate must not run jobs")
    assert(est === 1, s"single-partition connector scan must estimate 1, got $est")
    val widened = GraftSession.widen(df)
    assert(widened.rdd.getNumPartitions === spark.sparkContext.defaultParallelism,
      "widen must re-widen a narrow connector scan before kernels")
  }

  test("shuffle-landing estimate uses the AQE-coalesced minimum, not raw shuffle.partitions") {
    // a 22-source aggregate output is a few KB: AQE coalesces it to ~1
    // runtime partition, and the estimator must say so — estimating
    // shuffle.partitions made widen() skip AQE-coalesced frames the old
    // df.rdd path re-widened (ADVICE r10)
    val agg = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val est = GraftSqlBridge.planParallelism(agg)
    val width = spark.sessionState.conf.numShufflePartitions
    assert(est < width,
      s"small aggregate must estimate below shuffle.partitions=$width, got $est")
    // with coalescing off the estimate returns to the static width
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try assert(GraftSqlBridge.planParallelism(agg) === width)
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
  }

  test("file-split estimate tracks Spark's actual split count on a real table") {
    // the estimate replays FilePartition.maxSplitBytes over the cached
    // FileIndex stats; on a real scan it must land within 2x of the
    // count Spark itself produces (packing granularity is the only gap)
    val est = GraftSqlBridge.planParallelism(docs)
    val actual = docs.rdd.getNumPartitions
    assert(est >= 1)
    assert(est <= math.max(2 * actual, actual + 2),
      s"estimate $est implausibly high vs actual $actual")
    assert(est >= math.max(actual / 2, 1),
      s"estimate $est implausibly low vs actual $actual")
  }
}
