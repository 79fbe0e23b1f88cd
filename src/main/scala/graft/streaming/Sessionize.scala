package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream sessionization with custom keyed state
  * (`flatMapGroupsWithState` — the Structured Streaming surface for the
  * state the reference keeps in Jet processors/snapshots).
  *
  * A session closes when no event arrives for `gapMs` (event time). Closed
  * sessions are emitted append-mode; open sessions ride in the state store
  * and are checkpointed like any other stream state.
  */
object Sessionize {

  /** `ts` (the watermarked TimestampType column) must flow into the stateful
    * operator's input for EventTimeTimeout to bind. */
  final case class Event(userId: Long, tsMs: Long, ts: java.sql.Timestamp)
  final case class SessionState(startMs: Long, lastMs: Long, n: Long)
  final case class Session(userId: Long, startMs: Long, endMs: Long, nEvents: Long)

  /** df: (user_id long, ts timestamp). Output: closed sessions. */
  def sessions(df: DataFrame, gapMs: Long): Dataset[Session] = {
    val spark = df.sparkSession
    import spark.implicits._
    val events = df
      .withWatermark("ts", s"$gapMs milliseconds")
      .select(col("user_id").cast("long").as("userId"),
        unix_millis(col("ts")).as("tsMs"), col("ts"))
      .as[Event]

    events.groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evs, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.startMs, s.lastMs, s.n))
          } else {
            val sorted = evs.toSeq.sortBy(_.tsMs)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.tsMs - s.lastMs <= gapMs =>
                  cur = Some(SessionState(s.startMs, math.max(s.lastMs, e.tsMs), s.n + 1))
                case Some(s) =>
                  closed ::= Session(userId, s.startMs, s.lastMs, s.n)
                  cur = Some(SessionState(e.tsMs, e.tsMs, 1))
                case None =>
                  cur = Some(SessionState(e.tsMs, e.tsMs, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Scale-safe batch sessionization: identical output to
    * [[sessionsBatch]] with NO per-user window — a bot-scale key never
    * sorts on one task. Range-partition the events by (user, ts) so the
    * global order runs across partition indexes, compute gap-islands
    * locally per partition, and resolve only the EDGE islands (first/last
    * per partition — ≤ 2·partitions tuples, never rows) on the driver,
    * where sessions spanning partition boundaries chain-merge. Interior
    * islands are final where they are: one wide shuffle, one tiny
    * collect, no key ever concentrated. The two passes see identical
    * partitions via the same lineage-preserving persist
    * [[graft.operators.Pipeline]]'s prefix scans use. */
  def sessionsBatchScalable(df: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val evs = df.select(col("user_id").cast("long").as("userId"),
      unix_millis(col("ts")).as("tsMs"))
      .repartitionByRange(col("userId"), col("tsMs"))
      .sortWithinPartitions(col("userId"), col("tsMs"))
    val rdd = evs.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // registered for closure-release (see GraftSession.registerPin)
    graft.core.GraftSession.registerPin(rdd)
    // island = (user, startMs, endMs, n) over the partition-local run
    final case class Isl(user: Long, start: Long, end: Long, n: Long)
    def islands(it: Iterator[Row]): Iterator[Isl] = new Iterator[Isl] {
      private val rows = it.buffered
      def hasNext: Boolean = rows.hasNext
      def next(): Isl = {
        val h = rows.head
        var (u, s, e, n) = (h.getLong(0), h.getLong(1), h.getLong(1), 0L)
        while (rows.hasNext && rows.head.getLong(0) == u &&
            rows.head.getLong(1) - e <= gapMs) {
          e = rows.next().getLong(1); n += 1
        }
        Isl(u, s, e, n)
      }
    }
    // pass 1: edge islands only — first, last, and the island count
    val edges: Array[(Int, Isl, Isl, Long)] = rdd
      .mapPartitionsWithIndex { (i, it) =>
        val isl = islands(it)
        if (!isl.hasNext) Iterator.empty
        else {
          val first = isl.next()
          var last = first
          var count = 1L
          while (isl.hasNext) { last = isl.next(); count += 1 }
          Iterator.single((i, first, last, count))
        }
      }.collect().sortBy(_._1)
    // driver: chain-merge edge islands across consecutive partitions.
    // A chain stays open while the next partition's FIRST island continues
    // it (same user, gap <= gapMs); a partition whose single island merges
    // is consumed whole (sessions spanning 3+ partitions).
    val sessions = scala.collection.mutable.ArrayBuffer.empty[Isl]
    var open: Option[Isl] = None
    edges.foreach { case (_, first, last, count) =>
      val merged = open match {
        case Some(o) if o.user == first.user && first.start - o.end <= gapMs =>
          Some(Isl(o.user, o.start, math.max(o.end, first.end), o.n + first.n))
        case Some(o) =>
          sessions += o
          None
        case None => None
      }
      if (count == 1L) {
        open = merged.orElse(Some(first))
      } else {
        merged match {
          case Some(m) => sessions += m
          case None => sessions += first
        }
        open = Some(last)
      }
    }
    open.foreach(sessions += _)
    // pass 2: interior islands are final — skip each partition's first
    // and last (both resolved driver-side above)
    val interior = rdd.mapPartitionsWithIndex { (_, it) =>
      val isl = islands(it)
      if (!isl.hasNext) Iterator.empty
      else {
        val buf = isl.buffered
        var prev = buf.next() // first: skip
        new Iterator[Isl] {
          def hasNext: Boolean = buf.hasNext
          def next(): Isl = { val cur = buf.next(); val out = prev; prev = cur; out }
        }.drop(1) // after dropping 1 the emitted stream excludes the first
      }
    }
    val schema = StructType(Seq(
      StructField("userId", LongType, nullable = false),
      StructField("startMs", LongType, nullable = false),
      StructField("endMs", LongType, nullable = false),
      StructField("nEvents", LongType, nullable = false)))
    val interiorRows = interior.map(i => Row(i.user, i.start, i.end, i.n))
    val edgeRows = spark.sparkContext
      .parallelize(sessions.toSeq.map(i => Row(i.user, i.start, i.end, i.n)),
        math.max(1, math.min(32, sessions.size)))
    spark.createDataFrame(interiorRows.union(edgeRows), schema)
  }

  /** Batch reference semantics for the same sessionization (lag + cumsum). */
  def sessionsBatch(df: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("userId")).orderBy(col("tsMs"), col("rid"))
    val evs = df.select(col("user_id").cast("long").as("userId"),
      unix_millis(col("ts")).as("tsMs"), monotonically_increasing_id().as("rid"))
    evs
      .withColumn("gap", col("tsMs") - lag(col("tsMs"), 1).over(w))
      .withColumn("newSess", when(col("gap").isNull || col("gap") > gapMs, 1).otherwise(0))
      .withColumn("sessId", sum(col("newSess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("userId"), col("sessId"))
      .agg(min(col("tsMs")).as("startMs"), max(col("tsMs")).as("endMs"),
        count(lit(1)).as("nEvents"))
      .drop("sessId")
  }
}
