package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.Similarity

/** The index-backed semantic dedup ([[Similarity.semanticDedupAgainstIndex]],
  * VERDICT r9 item 4): q82's embedding near-dup pair generation in the
  * q71/q93 train-once/serve-delta shape. Gates, mirroring MinhashIndexSpec:
  * pair-for-pair equality with the inline twin, the
  * no-shuffle-above-the-lists-scan plan property (broadcast-gated delta),
  * partition pruning down to the delta's own buckets, and value identity
  * on the shuffle fallback path. */
class SemanticIndexSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec => q +: flatten(q.plan)
    case _ => p +: p.children.flatMap(flatten)
  }

  private lazy val emb = Tables.load(spark, dir, "embeddings")
  private lazy val path = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft-semidx-" +
      s"${java.lang.ProcessHandle.current().pid()}"
    Similarity.buildIvfIndex(emb, p, "vec_id", "embedding")
    p
  }
  // delta: every 11th vector re-ingested under a shifted id — each has a
  // cos-1.0 original in the corpus, so the pair set is non-trivial
  private def delta = emb.filter(col("vec_id") % 11 === 4)
    .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding"))

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("served pairs equal the inline twin bit-for-bit; twins all found") {
    val served = pairs(Similarity.semanticDedupAgainstIndex(
      delta, path, "vec_id", "embedding", threshold = 0.9))
    val inline = pairs(Similarity.semanticDedupPairsWithCodebook(
      delta, emb, path, "vec_id", "embedding", threshold = 0.9))
    assert(served == inline,
      s"served != inline: only-served ${(served -- inline).take(3)}, " +
        s"only-inline ${(inline -- served).take(3)}")
    val n = delta.count()
    val twins = served.count { case (a, b, c) => b - a == 5000000L && c >= 0.999999 }
    assert(twins == n, s"expected $n identical-vector twins, found $twins")
  }

  test("the lists scan never sits under a shuffle, and is partition-pruned to the delta's buckets") {
    val served = Similarity.semanticDedupAgainstIndex(
      delta, path, "vec_id", "embedding", threshold = 0.9)
    served.collect()
    val nodes = flatten(
      served.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan)
    val listScans = nodes.collect {
      case sc: FileSourceScanExec
          if sc.relation.location.rootPaths.exists(_.toString.contains("graft-semidx")) => sc
    }
    assert(listScans.nonEmpty, "expected a parquet scan over the index lists")
    // the 100 TB property: the corpus-scale side streams into the join —
    // a shuffle above it would re-exchange the whole index every delta
    def underShuffle(p: SparkPlan, inShuffle: Boolean): Boolean = p match {
      case sc: FileSourceScanExec if listScans.exists(_ eq sc) => inShuffle
      case ex: ShuffleExchangeLike => ex.children.exists(underShuffle(_, true))
      case a: AdaptiveSparkPlanExec => underShuffle(a.executedPlan, inShuffle)
      case q: QueryStageExec => underShuffle(q.plan, inShuffle)
      case other => other.children.exists(underShuffle(_, inShuffle))
    }
    assert(!underShuffle(served.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan, false),
      "the index lists scan sits under a shuffle exchange — the delta must broadcast")
    // partition pruning: the scan carries a bucket IN-filter, and reads
    // fewer partition dirs than the full index when the delta is narrow
    assert(listScans.exists(_.partitionFilters.nonEmpty),
      "lists scan must carry partition filters (bucket IN (...))")
  }

  test("staleness guards: pre-round-10 meta (no built_rows) and an empty appends dir read as 0") {
    import spark.implicits._
    // ADVICE r10: an index built before built_rows joined the meta schema
    // threw AnalysisException; an appends dir with no batch (failed first
    // append, manual cleanup) broke parquet schema inference
    val p = s"${System.getProperty("java.io.tmpdir")}/graft-semidx-old-" +
      s"${java.lang.ProcessHandle.current().pid()}"
    Similarity.buildIvfIndex(emb.limit(500), p, "vec_id", "embedding")
    val cur = Similarity.ivfCurrent(spark, p)
    // rewrite meta in the OLD shape: no built_rows column
    val oldMeta = spark.read.parquet(s"$cur/meta")
      .select(col("nlist"), col("refine"), col("replicate")).collect()
    Seq((oldMeta.head.getInt(0), oldMeta.head.getInt(1), oldMeta.head.getInt(2)))
      .toDF("nlist", "refine", "replicate")
      .write.mode("overwrite").parquet(s"$cur/meta")
    // and an EXISTING but empty appends dir
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$cur/appends"))
    val st = Similarity.ivfIndexStaleness(spark, p).head()
    assert(st.getLong(0) == 0L && st.getLong(1) == 0L && !st.getBoolean(3),
      s"legacy meta + empty appends must read as zeros, not throw: $st")
  }

  test("oversized delta falls back to a shuffle join with identical pairs") {
    val before = pairs(Similarity.semanticDedupAgainstIndex(
      delta, path, "vec_id", "embedding", threshold = 0.9))
    Similarity.maxBroadcastDeltaBytes = 0L
    // dropping the hint is only visible if Catalyst can't re-add the
    // broadcast on its own at toy scale (the at-scale plan: both sides
    // over threshold -> shuffle join)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val after = Similarity.semanticDedupAgainstIndex(
        delta, path, "vec_id", "embedding", threshold = 0.9)
      assert(pairs(after) == before, "fallback path changed the pair set")
      val nodes = flatten(after.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan)
      assert(nodes.exists(_.isInstanceOf[ShuffleExchangeLike]),
        "ceiling 0 must force the shuffle dispatch")
    } finally {
      Similarity.maxBroadcastDeltaBytes = Similarity.DefaultMaxBroadcastDeltaBytes
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("a crashed rebuild leaves serving untouched, and the next rebuild recovers") {
    // rebuildIvfIndex stages the next GENERATION dir and publishes it
    // with the _COMMITTED sentinel (graft.core.GenDir) — a rebuild that
    // died before its sentinel leaves an UNCOMMITTED generation that
    // serving and staleness (which resolve the highest committed
    // generation) never see, and the next successful publish sweeps
    import spark.implicits._
    val p = s"${System.getProperty("java.io.tmpdir")}/graft-semidx-crash-" +
      s"${java.lang.ProcessHandle.current().pid()}"
    Similarity.buildIvfIndex(emb.limit(600), p, "vec_id", "embedding")
    val liveGen = Similarity.ivfCurrent(spark, p)
    val q = emb.filter(col("vec_id") % 17 === 3)
    def serve() = Similarity.ivfTopKFromIndex(p, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = serve()
    // simulate a crashed rebuild: a half-written staged generation with
    // garbage content and NO commit sentinel
    val debris = graft.core.GenDir.genPath(p, 9)
    Seq((1L, "garbage")).toDF("a", "b")
      .write.mode("overwrite").parquet(s"$debris/lists")
    assert(Similarity.ivfCurrent(spark, p) == liveGen,
      "an uncommitted generation must not resolve as live")
    assert(serve() == before, "debris generations must be invisible to serving")
    val st = Similarity.ivfIndexStaleness(spark, p).head()
    assert(st.getLong(1) == 0L && !st.getBoolean(3),
      s"debris generations must be invisible to staleness: $st")
    Similarity.rebuildIvfIndex(spark, p)
    assert(serve().nonEmpty, "post-recovery rebuild must serve")
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(debris)),
      "the publish must sweep crashed-rebuild debris")
    assert(Similarity.ivfCurrent(spark, p) != liveGen,
      "the rebuild must publish a new live generation")
    assert(fs.exists(new org.apache.hadoop.fs.Path(liveGen)),
      "grace must keep the previous committed generation for in-flight readers")
    val st2 = Similarity.ivfIndexStaleness(spark, p).head()
    assert(st2.getLong(1) == 0L && !st2.getBoolean(3), s"counters must read fresh: $st2")
  }
}
