package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.types.StructType

/** graft's narrow bridge into `private[sql]` Spark internals, used by
  * [[graft.core.GraftSession.pin]]: wrap an already-materialized,
  * RDD-level-cached InternalRow RDD back into a DataFrame (a [[LogicalRDD]]
  * leaf) carrying EXACT statistics (size + row count) so Catalyst plans
  * joins against the pinned artifact with real numbers, not
  * `defaultSizeInBytes`.
  *
  * Why RDD-level caching instead of `Dataset.persist`: `persist` registers
  * the plan in the session's `CacheManager`, which holds a STRONG reference
  * until someone calls `unpersist` — an operator that pins an intermediate
  * and returns a lazy result has no safe point to do that (the caller's
  * actions still need the blocks), so every invocation leaked its pins for
  * the life of the session (measured: the round-7 bench's q81 reps degraded
  * 1.5 s → 13 s as evicted-and-rebuilt pins thrashed storage memory). An
  * RDD `persist` is registered with the `ContextCleaner` through weak
  * references (`SparkContext.persistentRdds` is weak-valued): when the
  * caller drops the frame, the next driver GC frees the blocks — exactly
  * the lifecycle an operator-boundary artifact wants, and the same
  * mechanism `groupedPrefixScan`/`rankedScan` already rely on. */
object GraftSqlBridge {

  /** The analyzed plan's InternalRow RDD with per-row defensive copies
    * (operators reuse row buffers; caching requires ownership). */
  def internalRdd(df: DataFrame): RDD[InternalRow] =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd.map(_.copy())

  /** Wrap a cached InternalRow RDD as a DataFrame leaf with exact stats. */
  def cachedDf(
      spark: SparkSession,
      rdd: RDD[InternalRow],
      schema: StructType,
      sizeInBytes: Long,
      rowCount: Long): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val stats = Statistics(
      sizeInBytes = BigInt(sizeInBytes).max(BigInt(1)),
      rowCount = Some(BigInt(rowCount)))
    val plan = LogicalRDD(DataTypeUtils.toAttributes(schema), rdd)(
      cs, Some(stats), None)
    classic.Dataset.ofRows(cs, plan)
  }

  /** Every [[LogicalRDD]] leaf RDD in a frame's analyzed plan — the set of
    * pinned artifacts the frame still references. [[graft.core.GraftSession]]
    * filters these against its pin registry before unpersisting, so frames
    * whose leaves are NOT graft pins (checkpoints, user RDD frames) are
    * never touched. */
  def leafRdds(df: DataFrame): Seq[RDD[InternalRow]] =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed.collect {
      case l: LogicalRDD => l.rdd.asInstanceOf[RDD[InternalRow]]
    }

  /** Catalyst's optimized-plan size estimate for a frame, driver-side (no
    * job). For frames derived from a [[cachedDf]] pin the leaf carries
    * MEASURED size/rowCount, so the estimate is real data, not
    * `defaultSizeInBytes` guesswork — the broadcast-or-shuffle gates in
    * the dedup verify path decide on it. */
  def sizeEstimate(df: DataFrame): BigInt =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.optimizedPlan.stats.sizeInBytes

  /** True when the session's CacheManager holds no entries — the leak-audit
    * invariant PinLifecycleSpec pins (graft never parks operator artifacts
    * in the CacheManager). */
  def cacheManagerIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty

  /** Estimated output partition count of a frame, derived ENTIRELY from
    * the optimized logical plan — no physical planning, no second
    * `QueryExecution`, no job. This is what [[graft.core.GraftSession.widen]]
    * gates on: the old `df.rdd.getNumPartitions` compiled a full physical
    * plan (on a SEPARATE deserializing QueryExecution) at every widen call
    * site, and under AQE could even run upstream shuffle stages just to
    * count partitions.
    *
    * The estimate walks the plan bottom-up:
    *  - [[LogicalRDD]] leaves (graft pins, checkpoints) report exact RDD
    *    partition counts;
    *  - file-backed relations replay Spark's split math
    *    (`FilePartition.maxSplitBytes`: openCost-padded total, per-core
    *    floor, `files.maxPartitionBytes` ceiling) over the FileIndex's
    *    cached size/count — a 100 TB table estimates hundreds of
    *    thousands of splits and a 2-file toy table estimates ~2, both
    *    without touching the planner;
    *  - explicit repartitions report their target; unions sum; joins take
    *    the wider input (broadcast keeps the streamed side's width, a
    *    shuffle join lands on `shuffle.partitions` which IS the widen
    *    target — either way not narrow when an input is wide);
    *  - shuffle-materializing unaries (Aggregate/Window/global Sort/
    *    Deduplicate) land on `shuffle.partitions`;
    *  - anything else falls back to bytes/`maxPartitionBytes` from
    *    Catalyst stats.
    *
    * Estimation error is deliberately cheap in both directions: a huge
    * file source can only be estimated wide (never re-shuffled by
    * mistake), while a borderline-small frame at worst pays one extra
    * round-robin exchange of a few core-counts of rows. */
  def planParallelism(df: DataFrame): Int = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val cds = df.asInstanceOf[classic.Dataset[Row]]
    val conf = cds.sparkSession.sessionState.conf
    val shufflePartitions = conf.numShufflePartitions
    def clamp(n: BigInt): Int = n.max(1).min(Int.MaxValue).toInt
    def byBytes(sizeInBytes: BigInt): Int =
      clamp(sizeInBytes / BigInt(math.max(conf.filesMaxPartitionBytes, 1L)) + 1)
    def fileSplits(fs: HadoopFsRelation): Int = {
      val openCost = conf.filesOpenCostInBytes
      val nFiles = fs.location.inputFiles.length.toLong
      val total = fs.location.sizeInBytes + nFiles * openCost
      val minParts = conf.filesMinPartitionNum
        .getOrElse(cds.sparkSession.sparkContext.defaultParallelism).toLong
      val bytesPerCore = total / math.max(minParts, 1L)
      val maxSplit = math.max(1L,
        math.min(conf.filesMaxPartitionBytes, math.max(openCost, bytesPerCore)))
      clamp(BigInt((total + maxSplit - 1) / maxSplit))
    }
    // shuffle-landing nodes: with AQE partition coalescing on, the
    // RUNTIME partition count of a small post-shuffle frame is
    // bytes/advisory, not shuffle.partitions — estimating the latter made
    // widen() silently no-op on AQE-coalesced aggregate outputs the old
    // df.rdd path would have re-widened (ADVICE r10)
    def postShuffle(stats: => BigInt): Int =
      if (conf.adaptiveExecutionEnabled && conf.coalesceShufflePartitionsEnabled) {
        val advisory = math.max(
          conf.getConf(org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES), 1L)
        clamp((stats / BigInt(advisory) + 1).min(BigInt(shufflePartitions)))
      } else shufflePartitions
    def est(p: LogicalPlan): Int = p match {
      case l: LogicalRDD => l.rdd.getNumPartitions
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation => fileSplits(fs)
          case _ => byBytes(lr.stats.sizeInBytes)
        }
      // DSv2 scans: catalyst stats default to spark.sql.defaultSizeInBytes
      // (huge) when the source reports nothing, which estimated every
      // connector scan as wide and made widen() a no-op on genuinely
      // narrow ones (ADVICE r10). graft's own scans know their partition
      // list without running anything; foreign scans fall back to their
      // reported statistics, then to catalyst stats (conservatively wide).
      case d: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        d.scan match {
          case s: graft.sources.Dsv2.BatchScan =>
            math.max(1, s.toBatch.planInputPartitions().length)
          case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
            val st = s.estimateStatistics()
            if (st.sizeInBytes.isPresent) byBytes(BigInt(st.sizeInBytes.getAsLong))
            else byBytes(d.stats.sizeInBytes)
          case _ => byBytes(d.stats.sizeInBytes)
        }
      case _: LocalRelation => 1
      case r: Range =>
        r.numSlices.getOrElse(cds.sparkSession.sparkContext.defaultParallelism)
      case r: Repartition =>
        if (r.shuffle) r.numPartitions else math.min(est(r.child), r.numPartitions)
      case r: RepartitionByExpression =>
        r.optNumPartitions.getOrElse(shufflePartitions)
      case u: Union => u.children.map(est).sum
      case j: Join => j.children.map(est).max
      case a @ (_: Aggregate | _: Window | _: Deduplicate) => postShuffle(a.stats.sizeInBytes)
      case s: Sort if s.global => postShuffle(s.stats.sizeInBytes)
      case leaf: LeafNode => byBytes(leaf.stats.sizeInBytes)
      case other if other.children.nonEmpty => other.children.map(est).max
      case other => byBytes(other.stats.sizeInBytes)
    }
    est(cds.queryExecution.optimizedPlan)
  }
}
