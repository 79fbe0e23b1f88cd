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
    * fully-keyed (ts, id) event order, first events excluded. One lag
    * window sharing the per-user sort, then a tiny (types × types)
    * aggregate. A pathological single-user burst concentrates ONE
    * window partition — at bot scale feed the range-partitioned
    * sessionizer's layout first (the q44 note). */
  def transitionCounts(
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
    val wc = df
      .groupBy(col(keyCol).as("key"),
        (unix_millis(col(tsCol)).cast("long") / windowMs).cast("long").as("wb"))
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
