package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.unsafe.types.UTF8String

/** Shared DSv2 plumbing for the graft connectors. */
object Dsv2 {

  def utf8(s: String): UTF8String = if (s == null) null else UTF8String.fromString(s)

  def stringMap(m: Map[String, String]): ArrayBasedMapData = {
    val ks = m.keys.toArray[Any].map(k => utf8(k.asInstanceOf[String]): Any)
    val vs = m.values.toArray[Any].map(v => utf8(v.asInstanceOf[String]): Any)
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
  }

  def doubleMap(m: Map[String, Double]): ArrayBasedMapData = {
    val ks = m.keys.toArray[Any].map(k => utf8(k.asInstanceOf[String]): Any)
    val vs = m.values.toArray[Any]
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
  }

  def row(values: Any*): InternalRow = new GenericInternalRow(values.toArray)

  def msToMicros(ms: Long): Long = math.multiplyExact(ms, 1000L)

  /** PartitionReader over a pre-materialized iterator. */
  final class IterReader(it: Iterator[InternalRow]) extends PartitionReader[InternalRow] {
    private var cur: InternalRow = _
    override def next(): Boolean = { if (it.hasNext) { cur = it.next(); true } else false }
    override def get(): InternalRow = cur
    override def close(): Unit = ()
  }

  /** A Batch producing one partition per element of `parts`; `readFn` runs on
    * the executor. `tag` doubles as the partition key ([[HasPartitionKey]])
    * so scans whose partitioning IS the tag (one partition per stream/
    * shard) can report `KeyGroupedPartitioning` and downstream
    * groupBy/join on that column runs exchange-free (storage-partitioned).
    * Scans that don't report a partitioning are unaffected. */
  final case class FnPartition(idx: Int, tag: String, from: Long, to: Long)
      extends InputPartition with HasPartitionKey {
    override def partitionKey(): InternalRow = row(utf8(tag))
  }

  final class FnBatch(parts: Seq[FnPartition],
      readFn: FnPartition => Iterator[InternalRow]) extends Batch with Serializable {
    override def planInputPartitions(): Array[InputPartition] = parts.toArray
    override def createReaderFactory(): PartitionReaderFactory = new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new IterReader(readFn(p.asInstanceOf[FnPartition]))
    }
  }

  /** Scan that is its own Batch. */
  abstract class BatchScan extends Scan {
    override def toBatch: Batch = batch
    def batch: Batch
  }

  /** Serializable reader factory: `readFn` must capture only serializable
    * state (strings, primitives) — never the enclosing Table/Stream. */
  final case class FnReaderFactory(
      readFn: FnPartition => Iterator[InternalRow]) extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] =
      new IterReader(readFn(p.asInstanceOf[FnPartition]))
  }

  // ------------------------------------------------------- streaming offsets

  /** Offset = per-partition high-water sequence, JSON `{"name":seq,...}`.
    * The serialized form is what lands in the checkpoint dir — the analog of
    * the reference's snapshotted offset maps (RedisSources.java:613-662,
    * AbstractKafkaConnectSource.java:101-107). */
  final case class MapOffset(m: Map[String, Long]) extends Offset {
    override def json(): String =
      m.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + MapOffset.esc(k) + "\":" + v }
        .mkString("{", ",", "}")
  }

  /** Shared micro-batch stream over per-partition monotone sequence logs.
    *
    * - offsets: [[MapOffset]] per partition name (checkpointed);
    * - admission control: `maxPerTrigger` caps rows admitted per micro-batch
    *   (the reference's bounded-queue backpressure, SURVEY.md §4.1 — XREAD
    *   count, batchReceive size, fill caps), spread across partitions;
    * - Trigger.AvailableNow: target pinned at query start, batches respect
    *   the rate limit until the target is reached.
    */
  abstract class SeqLogMicroBatchStream(
      names: Seq[String],
      maxPerTrigger: Option[Long]) extends MicroBatchStream with SupportsTriggerAvailableNow {

    /** current high-water sequence for a partition (inclusive), -1 if empty. */
    def currentMax(name: String): Long
    def factory: PartitionReaderFactory
    /** called when Spark commits an epoch (ack hook). */
    def onCommit(end: MapOffset): Unit = ()
    /** Lower bound on the next read's exclusive `from` for a partition —
      * lets a transport declare a range it will never (re)deliver: an MQTT
      * clean-session resubscribe skips everything published while the
      * client was disconnected. Default: no floor. */
    def readFloor(name: String): Long = -1L

    /** The partition-name set for the NEXT micro-batch — overridable for
      * transports whose subscription is a PATTERN (MQTT wildcard filters):
      * a topic that first publishes after the stream started joins here
      * and backfills from -1 (every message on it post-dates the
      * subscription). Offsets key by name, so late joiners compose with
      * checkpoints: an absent key reads as -1. Default: the fixed set. */
    def currentNames: Seq[String] = names

    private var availableNowTarget: Option[Map[String, Long]] = None
    private def maxNow(): Map[String, Long] =
      currentNames.map(n => n -> currentMax(n)).toMap

    override def prepareForTriggerAvailableNow(): Unit =
      availableNowTarget = Some(maxNow())

    override def getDefaultReadLimit: ReadLimit =
      maxPerTrigger.map(m => ReadLimit.maxRows(m)).getOrElse(ReadLimit.allAvailable())

    override def initialOffset(): Offset = MapOffset(names.map(_ -> -1L).toMap)
    override def deserializeOffset(json: String): Offset = MapOffset.parse(json)
    override def latestOffset(): Offset =
      throw new UnsupportedOperationException("latestOffset(Offset, ReadLimit)")

    override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
      val s = start.asInstanceOf[MapOffset].m
      val target = availableNowTarget.getOrElse(maxNow())
      limit match {
        case mr: ReadMaxRows =>
          // greedy per-partition admission up to the row budget (keyed by
          // the TARGET's names, so pattern-matched late joiners admit too).
          // Names in the START offset but absent from the current target
          // (a real broker's listing hiccup, a deleted/recreated topic)
          // keep their committed sequence — dropping them would restart
          // the topic at -1 on reappearance and redeliver everything.
          var budget = mr.maxRows()
          val out = target.keys.toSeq.sorted.map { n =>
            val from = s.getOrElse(n, -1L)
            val avail = math.max(0L, target.getOrElse(n, -1L) - from)
            val take = math.min(avail, budget)
            budget -= take
            n -> (from + take)
          }.toMap
          MapOffset(s ++ out)
        case _ =>
          // union of committed and current names; an end sequence never
          // regresses below the committed one (a transiently-empty topic
          // reporting -1 must not rewind the checkpoint)
          MapOffset((s.keySet ++ target.keySet).iterator.map { n =>
            n -> math.max(target.getOrElse(n, -1L), s.getOrElse(n, -1L))
          }.toMap)
      }
    }
    override def reportLatestOffset(): Offset = MapOffset(maxNow())

    override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
      val s = start.asInstanceOf[MapOffset].m
      val e = end.asInstanceOf[MapOffset].m
      // plan from the END offset's name set: it was produced by
      // latestOffset over currentNames, so late pattern joiners get a
      // partition while checkpoint-restored fixed names stay stable
      e.keys.toSeq.sorted.zipWithIndex.map { case (n, i) =>
        val from = math.max(s.getOrElse(n, -1L), readFloor(n))
        FnPartition(i, n, from, math.max(e.getOrElse(n, -1L), from)): InputPartition
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = factory
    override def commit(end: Offset): Unit = onCommit(end.asInstanceOf[MapOffset])
    override def stop(): Unit = ()
  }

  object MapOffset {
    private def esc(s: String): String =
      s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    private val Entry = """"((?:[^"\\]|\\.)*)"\s*:\s*(-?\d+)""".r
    private def unesc(s: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'u' => sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
            case x   => sb.append(x); i += 2
          }
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
    def parse(json: String): MapOffset =
      MapOffset(Entry.findAllMatchIn(json).map(m => unesc(m.group(1)) -> m.group(2).toLong).toMap)
  }
}
