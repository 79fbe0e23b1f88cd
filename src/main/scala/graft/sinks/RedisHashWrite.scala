package graft.sinks

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}

import graft.sources.hub.{Clients, RedisClient}

/** DSv2 write path for the Redis-hash connector (K3 as a first-class
  * `SupportsWrite` table, the "polished" tier of SURVEY.md §1.3).
  *
  * Two-phase commit: each task writes to a private staging hash
  * (`<target>.stage.<task>.<attempt>` — the temp-directory pattern of
  * Spark's file sinks), the driver's `commit(messages)` promotes exactly
  * the staged hashes of *successful* task attempts, `abort` drops them.
  * Failed/speculative attempts never pollute the target, and the promote
  * is server-side — no data flows through the driver.
  *
  * Streaming: same staging keyed by epoch; an epoch already promoted is
  * skipped on replay (idempotent re-commit ⇒ exactly-once sink effect,
  * the observable guarantee of the reference's snapshot-aligned flush).
  */
object RedisHashWrite {
  /** committed epoch high-water per (queryId, target) — the "transaction
    * log" a real store would keep (e.g. a Redis key per query). */
  private val committedEpochs = new ConcurrentHashMap[String, java.lang.Long]()

  def committed(key: String, epochId: Long): Boolean =
    Option(committedEpochs.get(key)).exists(_ >= epochId)
  def markCommitted(key: String, epochId: Long): Unit =
    committedEpochs.merge(key, java.lang.Long.valueOf(epochId),
      (a, b) => java.lang.Long.valueOf(math.max(a, b)))

  final case class StagedMessage(stageUri: String) extends WriterCommitMessage

  final class HashDataWriter(target: String, stageUri: String, clientName: String)
    extends DataWriter[InternalRow] {
    // transport seam: resolved per task from the captured class name
    private def client = Clients.byName[RedisClient](clientName)
    private val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    override def write(record: InternalRow): Unit =
      buf += ((record.getUTF8String(0).toString,
        if (record.isNullAt(1)) null else record.getUTF8String(1).toString))
    override def commit(): WriterCommitMessage = {
      client.hashPut(stageUri, buf.iterator) // flush at the task barrier
      StagedMessage(stageUri)
    }
    override def abort(): Unit = client.hashDrop(stageUri)
    override def close(): Unit = ()
  }

  final case class Factory(target: String, prefix: String, clientName: String)
    extends DataWriterFactory with StreamingDataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      new HashDataWriter(target, s"$target.stage.$prefix.$partitionId.$taskId", clientName)
    override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
      new HashDataWriter(target, s"$target.stage.$prefix.$epochId.$partitionId.$taskId", clientName)
  }

  final class HashBatchWrite(target: String,
      clientName: String = graft.sources.redis.RedisSources.DefaultClient) extends BatchWrite {
    private def client = Clients.byName[RedisClient](clientName)
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      Factory(target, "batch", clientName)
    override def commit(messages: Array[WriterCommitMessage]): Unit =
      messages.foreach {
        case StagedMessage(stage) => client.hashPromote(stage, target)
        case _ =>
      }
    override def abort(messages: Array[WriterCommitMessage]): Unit =
      messages.foreach {
        case StagedMessage(stage) => client.hashDrop(stage)
        case _ =>
      }
  }

  final class HashStreamingWrite(target: String, queryId: String,
      clientName: String = graft.sources.redis.RedisSources.DefaultClient) extends StreamingWrite {
    private def client = Clients.byName[RedisClient](clientName)
    private def logKey = s"$queryId/$target"
    override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
      Factory(target, queryId, clientName)
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
      if (committed(logKey, epochId)) {
        // epoch replayed after restart — drop stages, effects already applied
        messages.foreach { case StagedMessage(s) => client.hashDrop(s); case _ => }
      } else {
        messages.foreach { case StagedMessage(s) => client.hashPromote(s, target); case _ => }
        markCommitted(logKey, epochId)
      }
    }
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      messages.foreach { case StagedMessage(s) => client.hashDrop(s); case _ => }
  }
}
