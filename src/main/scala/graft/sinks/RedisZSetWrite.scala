package graft.sinks

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}

import graft.sources.hub.{Clients, RedisClient}

/** DSv2 write path for the Redis sorted-set connector (K4 as a first-class
  * `SupportsWrite` table) — same two-phase staging protocol as
  * [[RedisHashWrite]]: tasks ZADD into private staging sets, the driver
  * promotes only successful attempts' stages (server-side merge), aborts
  * drop them; streaming commits are epoch-idempotent (a replayed epoch's
  * stages are dropped, not re-promoted). Rows are (score double,
  * value string) in the table's schema order. */
object RedisZSetWrite {

  final case class StagedMessage(stageUri: String) extends WriterCommitMessage

  final class ZSetDataWriter(stageUri: String, clientName: String)
    extends DataWriter[InternalRow] {
    // transport seam: resolved per task from the captured class name
    private def client = Clients.byName[RedisClient](clientName)
    private val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    override def write(record: InternalRow): Unit =
      buf += ((record.getUTF8String(1).toString, record.getDouble(0)))
    override def commit(): WriterCommitMessage = {
      client.zadd(stageUri, buf.iterator) // flush at the task barrier
      StagedMessage(stageUri)
    }
    override def abort(): Unit = client.zsetDrop(stageUri)
    override def close(): Unit = ()
  }

  final case class Factory(target: String, prefix: String, clientName: String)
    extends DataWriterFactory with StreamingDataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      new ZSetDataWriter(s"$target.stage.$prefix.$partitionId.$taskId", clientName)
    override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
      new ZSetDataWriter(s"$target.stage.$prefix.$epochId.$partitionId.$taskId", clientName)
  }

  final class ZSetBatchWrite(target: String,
      clientName: String = graft.sources.redis.RedisSources.DefaultClient) extends BatchWrite {
    private def client = Clients.byName[RedisClient](clientName)
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      Factory(target, "batch", clientName)
    override def commit(messages: Array[WriterCommitMessage]): Unit =
      messages.foreach {
        case StagedMessage(stage) => client.zsetPromote(stage, target)
        case _ =>
      }
    override def abort(messages: Array[WriterCommitMessage]): Unit =
      messages.foreach {
        case StagedMessage(stage) => client.zsetDrop(stage)
        case _ =>
      }
  }

  final class ZSetStreamingWrite(target: String, queryId: String,
      clientName: String = graft.sources.redis.RedisSources.DefaultClient) extends StreamingWrite {
    private def client = Clients.byName[RedisClient](clientName)
    private def logKey = s"$queryId/$target"
    override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
      Factory(target, queryId, clientName)
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
      if (RedisHashWrite.committed(logKey, epochId)) {
        messages.foreach { case StagedMessage(s) => client.zsetDrop(s); case _ => }
      } else {
        messages.foreach { case StagedMessage(s) => client.zsetPromote(s, target); case _ => }
        RedisHashWrite.markCommitted(logKey, epochId)
      }
    }
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      messages.foreach { case StagedMessage(s) => client.zsetDrop(s); case _ => }
  }
}
