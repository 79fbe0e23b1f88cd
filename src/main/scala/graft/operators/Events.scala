package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral event analytics (batch): gap-based sessionization, funnels,
  * cohort retention. All counts are integer-exact so results replay
  * bit-identically in any engine.
  *
  * Each operator is one or two window/aggregate passes partitioned by
  * user — the shuffle key is the user id, state per key is a handful of
  * counters, and nothing is quadratic in events-per-user. The streaming
  * face of sessionization (unbounded input, keyed timeout state) is
  * [[graft.streaming.Sessionize]]; this is the batch replay with identical
  * gap semantics.
  */
object Events {

  /** Session ids per event: a session breaks after `gapMs` of inactivity.
    * Classic islands: flag = "gap from previous event > gapMs", session
    * index = running sum of flags — two window passes over one shuffle
    * (both windows share the (user, time) sort). Event-time order is fully
    * keyed by (ts, idCol) so duplicate timestamps cannot make the result
    * order-dependent. */
  def withSessionIds(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      gapMs: Long): DataFrame = {
    val order = Window.partitionBy(col(userCol)).orderBy(col("__us"), col(idCol))
    df.withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__new",
        when(col("__us") - lag(col("__us"), 1).over(order) > gapMs * 1000L
          || lag(col("__us"), 1).over(order).isNull, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__us", "__new")
  }

  /** Per-user event-type transition matrix (the Markov-chain view of
    * user journeys): counts of (prev_type → type) over each user's
    * fully-keyed (ts, id) event order, first events excluded.
    *
    * Scale-safe by construction — NO per-user window, so a bot-scale key
    * (the stress corpus's 120 k-event user; at 100 TB, orders more) never
    * sorts on one task. The [[graft.streaming.Sessionize.sessionsBatchScalable]]
    * device, applied to adjacency: range-partition the events by
    * (user, ts, id) so the global order runs across partition indexes,
    * count adjacent-pair transitions LOCALLY per partition into a
    * (types × types) map — bounded by the type vocabulary, never by the
    * event count — and resolve only the partition-boundary adjacencies
    * (2 tuples per partition, never rows) on the driver. One wide
    * shuffle, one tiny collect; identical output to the per-user lag
    * window ([[transitionCountsWindow]], the stress spec's independent
    * value proof). */
  def transitionCounts(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val tyType = df.schema(typeCol).dataType
    val evs = df.select(col(userCol).as("u"), unix_micros(col(tsCol)).as("us"),
        col(idCol).as("rid"), col(typeCol).as("ty"))
      .repartitionByRange(col("u"), col("us"), col("rid"))
      .sortWithinPartitions(col("u"), col("us"), col("rid"))
    // GC-managed RDD cache (the groupedPrefixScan lifecycle): both passes
    // see identical partitions, lineage kept, blocks freed when this frame
    // goes out of scope
    val rdd = evs.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // registered for closure-release (see GraftSession.registerPin)
    graft.core.GraftSession.registerPin(rdd)
    // pass 1: each non-empty partition's edge rows — (idx, firstUser,
    // firstType, lastUser, lastType); ≤ 1 tuple per partition
    val edges = rdd.mapPartitionsWithIndex { (i, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val first = it.next()
        var last = first
        while (it.hasNext) last = it.next()
        Iterator.single((i, first.get(0), first.get(3), last.get(0), last.get(3)))
      }
    }.collect().sortBy(_._1)
    // driver: the adjacency ACROSS each consecutive non-empty partition
    // pair — a transition iff the user continues (null prev excluded,
    // matching the window formulation's lag-isNotNull filter)
    val boundary = scala.collection.mutable.HashMap.empty[(Any, Any), Long]
    edges.sliding(2).foreach {
      case Array((_, _, _, lu, lt), (_, fu, ft, _, _)) if lu == fu && lt != null =>
        boundary((lt, ft)) = boundary.getOrElse((lt, ft), 0L) + 1L
      case _ => ()
    }
    // pass 2: partition-local adjacent transitions, pre-aggregated into a
    // per-partition (types × types) map — the partial that crosses the
    // final exchange is vocabulary-sized, not event-sized
    val local = rdd.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[(Any, Any), Long]
      var prevU: Any = null; var prevTy: Any = null; var has = false
      it.foreach { r =>
        val u = r.get(0); val ty = r.get(3)
        if (has && prevU == u && prevTy != null)
          m((prevTy, ty)) = m.getOrElse((prevTy, ty), 0L) + 1L
        prevU = u; prevTy = ty; has = true
      }
      m.iterator.map { case ((p, n), c) => Row(p, n, c) }
    }
    val schema = StructType(Seq(
      StructField("prev_type", tyType), StructField("next_type", tyType),
      StructField("n", LongType, nullable = false)))
    val boundaryRows = spark.sparkContext.parallelize(
      boundary.toSeq.map { case ((p, n), c) => Row(p, n, c) }, 1)
    spark.createDataFrame(local.union(boundaryRows), schema)
      .groupBy(col("prev_type"), col("next_type"))
      .agg(sum(col("n")).as("n"))
  }

  /** Reference formulation of [[transitionCounts]] — one lag window
    * partitioned by raw user, so a hot key concentrates one task. Kept as
    * the independent value proof in ScaleStressSpec (identical output);
    * production code should use [[transitionCounts]]. */
  private[graft] def transitionCountsWindow(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String): DataFrame = {
    val order = Window.partitionBy(col(userCol)).orderBy(col("__us"), col(idCol))
    df.withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__prev", lag(col(typeCol), 1).over(order))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Rate-anomaly detection: per key, each `windowMs` tumbling window's
    * event count is z-scored against that key's own window distribution
    * (population moments from EXACT integer Σx/Σx² — counts are
    * integral, so the sums are bit-exact in any engine — then a fixed
    * order of divisions/sqrt every engine rounds identically). Two tiny
    * aggregates: (key, window) counts, then per-key moments broadcast
    * back — nothing scales with the event count except the first
    * map-side-combined count. Returns every window with |z| ≥
    * `zThreshold`. */
  def windowAnomalies(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      windowMs: Long,
      zThreshold: Double): DataFrame = {
    require(windowMs > 0, "windowMs must be positive")
    // bin id in PURE int64 floor division — `(a - pmod(a, w)) DIV w` floors
    // for negative (pre-1970) epochs too, exactly like the oracle's `//`;
    // Column./ would round-trip through doubles and truncate instead
    val wb = expr(
      s"(unix_millis(`$tsCol`) - pmod(unix_millis(`$tsCol`), ${windowMs}L)) " +
        s"DIV ${windowMs}L")
    val wc = df
      .groupBy(col(keyCol).as("key"), wb.as("wb"))
      .agg(count(lit(1)).as("c"))
    val stats = wc.groupBy(col("key"))
      .agg(count(lit(1)).as("n_w"), sum(col("c")).as("s1"),
        sum(col("c") * col("c")).as("s2"))
      .filter(col("n_w") > 1)
      .select(col("key"),
        (col("s1").cast("double") / col("n_w").cast("double")).as("mean"),
        sqrt((col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") /
            col("n_w").cast("double")) / col("n_w").cast("double")).as("std"))
    wc.join(broadcast(stats), "key")
      .filter(col("std") > 0.0)
      .withColumn("z", (col("c").cast("double") - col("mean")) / col("std"))
      .filter(abs(col("z")) >= zThreshold)
      .select(col("key"), col("wb"), col("c"), col("z"))
  }

  /** Per-user session/event counts under gap-based sessionization. */
  def sessionCounts(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      gapMs: Long): DataFrame =
    withSessionIds(df, userCol, tsCol, idCol, gapMs)
      .groupBy(col(userCol))
      .agg(max(col("session_idx")).as("n_sessions"), count(lit(1)).as("n_events"))

  /** Ordered funnel: per user, the earliest time of each step; a user
    * converts through step k if every prefix step's first occurrence is
    * strictly increasing in time. One aggregate over (user), one pass —
    * never a self-join per step. Returns a single row of per-step user
    * counts. */
  def funnelCounts(
      df: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val aggs = steps.map(s =>
      min(when(col(typeCol) === s, unix_micros(col(tsCol)))).as(s"__t_$s"))
    val mins = df.groupBy(col(userCol)).agg(aggs.head, aggs.tail: _*)
    def through(k: Int) = {
      val present = (0 to k).map(i => col(s"__t_${steps(i)}").isNotNull).reduce(_ && _)
      val ordered = (1 to k)
        .map(i => col(s"__t_${steps(i - 1)}") < col(s"__t_${steps(i)}"))
        .foldLeft(lit(true))(_ && _)
      present && ordered
    }
    val counts = steps.indices.map(k =>
      sum(when(through(k), 1L).otherwise(0L)).as(s"n_${steps(k)}"))
    mins.agg(counts.head, counts.tail: _*)
  }

  /** Cohort retention: users bucketed by the month of their first event
    * (the cohort), then distinct active users per (cohort, activity month).
    * Months are emitted as epoch-ms of the month start — date parts only,
    * never raw timestamps (parquet ns vs µs parity). */
  def cohortRetention(
      df: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val monthMs = unix_millis(date_trunc("month", col(tsCol)))
    val active = df.select(col(userCol).as("u"), monthMs.as("activity_month_ms")).distinct()
    val cohort = active.groupBy(col("u")).agg(min(col("activity_month_ms")).as("cohort_month_ms"))
    active.join(cohort, "u")
      .groupBy(col("cohort_month_ms"), col("activity_month_ms"))
      .agg(count(lit(1)).as("n_users"))
  }
}
