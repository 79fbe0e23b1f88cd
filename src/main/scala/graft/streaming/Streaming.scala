package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Timestamp policies (SURVEY.md §2.4): the reference's
  * `withNativeTimestamps / withIngestionTimestamps / withoutTimestamps /
  * addTimestamps(fn, lag)` quartet re-expressed on event-time columns +
  * watermarks. `lag` maps to the watermark delay (both bound how far
  * out-of-order an event may arrive). */
object Timestamps {

  /** Source-provided event time + allowed lag (withNativeTimestamps(lag)). */
  def withNativeTimestamps(df: DataFrame, eventTimeCol: String, lagMs: Long): DataFrame =
    df.withWatermark(eventTimeCol, s"$lagMs milliseconds")

  /** Processing-time stamping (withIngestionTimestamps). */
  def withIngestionTimestamps(df: DataFrame, asCol: String = "ingest_time"): DataFrame =
    df.withColumn(asCol, current_timestamp())

  /** Derive event time from a column expression (addTimestamps(fn, lag)). */
  def addTimestamps(df: DataFrame, fn: Column, lagMs: Long,
      asCol: String = "event_time"): DataFrame =
    df.withColumn(asCol, fn).withWatermark(asCol, s"$lagMs milliseconds")

  /** No event-time semantics (withoutTimestamps). */
  def withoutTimestamps(df: DataFrame): DataFrame = df
}

/** The reference's per-executor service pattern (`ServiceFactory` +
  * `mapUsingService`, HashingSupport.java:42-48, SURVEY.md §1.3): a
  * non-serializable helper created lazily once per partition, streamed
  * through iterator-to-iterator (no per-row setup, safe at any partition
  * count). */
object ServiceMap {

  def mapUsingService[S, T, U: Encoder](ds: Dataset[T], create: () => S)(
      f: (S, T) => U): Dataset[U] =
    ds.mapPartitions { it =>
      val service = create() // once per partition, on the executor
      it.map(f(service, _))
    }

  def flatMapUsingService[S, T, U: Encoder](ds: Dataset[T], create: () => S)(
      f: (S, T) => IterableOnce[U]): Dataset[U] =
    ds.mapPartitions { it =>
      val service = create()
      it.flatMap(f(service, _))
    }
}

/** Rolling (running) aggregate — the reference's `rollingAggregate`
  * (HyperLogLogTest.java:84): a streaming global/keyed aggregate emitting
  * the updated value each micro-batch (output mode `update`). */
/** Streaming exact deduplication with BOUNDED state: the dedup state for a
  * key lives only until the event-time watermark passes it, so an infinite
  * stream never accumulates infinite state (the 100 TB requirement — a
  * plain `dropDuplicates` on a stream keys state forever). A duplicate
  * arriving within the delay is dropped; the same key re-appearing after
  * the watermark moved past its state is treated as new. */
object StreamDedup {
  def dedupWithinWatermark(
      df: DataFrame,
      eventTimeCol: String,
      delay: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
}

object Rolling {
  def rollingAggregate(df: DataFrame, aggs: Column*): DataFrame = df.agg(aggs.head, aggs.tail: _*)
  def rollingAggregateByKey(df: DataFrame, keys: Seq[String], aggs: Column*): DataFrame =
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
}
