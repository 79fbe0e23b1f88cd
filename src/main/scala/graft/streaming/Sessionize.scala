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
