package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

import graft.sources.hub.MemHub

/** JMS-style queue sink with exactly-once semantics — the second half of
  * the reference's xa-test surface
  * (`xa-test/.../JmsXaTest.java:52-96` validates that a JMS broker keeps a
  * PREPARED XA transaction's messages across disconnect, invisible to
  * consumers, until a later connection commits them).
  *
  * Same construction as [[JdbcSink]], queue-shaped:
  *
  *  - '''stage''' (XA `prepare`): each task writes its partition's
  *    messages into a staged store keyed (epoch, partition), order
  *    preserved, replace-on-restage — durable, invisible to queue
  *    consumers, survives disconnect;
  *  - '''commit''' (XA `commit`): the broker appends the epoch's staged
  *    messages to the queue ATOMICALLY and exactly once per transaction
  *    id ([[MemHub.publishPrepared]] — the one primitive the reference
  *    also delegates to the broker); a replay of a committed (query,
  *    epoch) is a no-op, so recovery never duplicates;
  *  - '''abort''' (XA `rollback`): staged messages are dropped unseen.
  *
  * Messages are TextMessage-shaped: a single `payload` string column.
  * Queue order is deterministic: partition-major, row-order-minor. */
object JmsSink {

  private def stageUri(uri: String, queue: String, epochId: Long, part: Int): String =
    s"$uri/$queue.stage.$epochId.$part"

  private def stagePrefix(uri: String, queue: String, epochId: Long): String =
    s"$uri/$queue.stage.$epochId."

  /** Plain transacted publish (at-least-once under task retries): one
    * "session" per partition, messages appended in partition row order. */
  def jmsPublish(df: DataFrame, uri: String, queue: String): Unit =
    df.select("payload").foreachPartition { (rows: Iterator[Row]) =>
      MemHub.publish(uri, queue,
        rows.map(r => ("", Map.empty[String, String], 0L, r.getString(0).getBytes("UTF-8"))))
    }

  /** Phase 1 (XA `prepare`): stage `df`'s messages for `epochId`. Each
    * partition replaces (never appends to) its staged slot, so retried
    * task attempts are idempotent; staged messages are invisible to queue
    * consumers until commit and survive disconnect. */
  def stageEpoch(df: DataFrame, uri: String, queue: String, epochId: Long): Unit =
    df.select("payload").foreachPartition { (rows: Iterator[Row]) =>
      val part = Option(org.apache.spark.TaskContext.get())
        .map(_.partitionId()).getOrElse(0)
      val st = stageUri(uri, queue, epochId, part)
      MemHub.hashDrop(st) // re-stage replaces, never duplicates
      MemHub.hashPut(st, rows.zipWithIndex.map { case (r, i) =>
        f"$i%09d" -> r.getString(0)
      })
    }

  /** Phase 2 (XA `commit`): atomically append the epoch's staged messages
    * to the queue, exactly once per (queryId, epochId) transaction —
    * replays return false and publish nothing. */
  def commitEpoch(uri: String, queue: String, queryId: String, epochId: Long): Boolean =
    MemHub.publishPrepared(uri, queue, s"$queryId-$epochId",
      stagePrefix(uri, queue, epochId))

  /** XA `rollback` analog: drop the epoch's staged messages unseen. */
  def abortEpoch(uri: String, queue: String, epochId: Long): Unit =
    MemHub.hashKeys(stagePrefix(uri, queue, epochId)).foreach(MemHub.hashDrop)

  /** Exactly-once epoch write = stage + commit; replays are no-ops. */
  def writeEpochExactlyOnce(
      df: DataFrame, uri: String, queue: String, queryId: String, epochId: Long): Boolean = {
    stageEpoch(df, uri, queue, epochId)
    commitEpoch(uri, queue, queryId, epochId)
  }

  /** `writeStream.foreachBatch` adapter: exactly-once per micro-batch. */
  def foreachBatchExactlyOnce(
      uri: String, queue: String, queryId: String): (DataFrame, Long) => Unit =
    (df, batchId) => { writeEpochExactlyOnce(df, uri, queue, queryId, batchId); () }
}
