package graft.sinks

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}

import graft.sources.hub.MemHub

/** DSv2 write path for the Redis sorted-set connector (K4 as a first-class
  * `SupportsWrite` table) — same two-phase staging protocol as
  * [[RedisHashWrite]]: tasks ZADD into private staging sets, the driver
  * promotes only successful attempts' stages (server-side merge), aborts
  * drop them; streaming commits are epoch-idempotent (a replayed epoch's
  * stages are dropped, not re-promoted). Rows are (score double,
  * value string) in the table's schema order. */
object RedisZSetWrite {

  final case class StagedMessage(stageUri: String) extends WriterCommitMessage

  final class ZSetDataWriter(stageUri: String) extends DataWriter[InternalRow] {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    override def write(record: InternalRow): Unit =
      buf += ((record.getUTF8String(1).toString, record.getDouble(0)))
    override def commit(): WriterCommitMessage = {
      MemHub.zadd(stageUri, buf.iterator) // flush at the task barrier
      StagedMessage(stageUri)
    }
    override def abort(): Unit = MemHub.zsetDrop(stageUri)
    override def close(): Unit = ()
  }

  final case class Factory(target: String, prefix: String)
    extends DataWriterFactory with StreamingDataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      new ZSetDataWriter(s"$target.stage.$prefix.$partitionId.$taskId")
    override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
      new ZSetDataWriter(s"$target.stage.$prefix.$epochId.$partitionId.$taskId")
  }

  final class ZSetBatchWrite(target: String) extends BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      Factory(target, "batch")
    override def commit(messages: Array[WriterCommitMessage]): Unit =
      messages.foreach {
        case StagedMessage(stage) => MemHub.zsetPromote(stage, target)
        case _ =>
      }
    override def abort(messages: Array[WriterCommitMessage]): Unit =
      messages.foreach {
        case StagedMessage(stage) => MemHub.zsetDrop(stage)
        case _ =>
      }
  }

  final class ZSetStreamingWrite(target: String, queryId: String) extends StreamingWrite {
    private def logKey = s"$queryId/$target"
    override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
      Factory(target, queryId)
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
      if (RedisHashWrite.committed(logKey, epochId)) {
        messages.foreach { case StagedMessage(s) => MemHub.zsetDrop(s); case _ => }
      } else {
        messages.foreach { case StagedMessage(s) => MemHub.zsetPromote(s, target); case _ => }
        RedisHashWrite.markCommitted(logKey, epochId)
      }
    }
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      messages.foreach { case StagedMessage(s) => MemHub.zsetDrop(s); case _ => }
  }
}
