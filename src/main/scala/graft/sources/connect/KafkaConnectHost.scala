package graft.sources.connect

import java.util.{Collections, Properties}

import scala.jdk.CollectionConverters._

import org.apache.kafka.connect.connector.ConnectorContext
import org.apache.kafka.connect.data.{Schema => KSchema, Struct}
import org.apache.kafka.connect.source.{SourceConnector, SourceRecord, SourceTask, SourceTaskContext}
import org.apache.kafka.connect.storage.OffsetStorageReader
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.hub.MemHub

/** Hosts a REAL Kafka Connect `SourceConnector` by class name — the
  * reference's hosting loop (KafkaConnectSources.java:59-83,
  * impl/AbstractKafkaConnectSource.java:36-148) re-expressed against the
  * vendored binary-compatible Connect API: instantiate the connector via
  * `connector.class`, drive connector/task lifecycle, serve restored
  * offsets through an [[OffsetStorageReader]], and track each record's
  * (sourcePartition → sourceOffset) exactly as the reference snapshots it.
  *
  * Records land in MemHub topic logs keyed by sourcePartition (the
  * production path would be any DSv2 sink); values are encoded to JSON by
  * the record's own Connect `Schema` and decoded to TYPED columns via
  * [[ConnectSchemas.toStructType]] — the Schema→StructType converter the
  * `SourceTaskLike` no-dependency path lacks. */
object KafkaConnectHost {

  /** One hosting run's snapshot — the reference's createSnapshot(): where
    * each source partition left off, serve-able back through
    * [[OffsetStorageReader]] on restart. */
  final case class Snapshot(offsets: Map[Map[String, _], Map[String, _]])

  private class HostConnectorContext extends ConnectorContext {
    override def requestTaskReconfiguration(): Unit = ()
    override def raiseError(e: Exception): Unit = throw e
  }

  private class HostOffsetReader(restored: Map[Map[String, _], Map[String, _]])
      extends OffsetStorageReader {
    override def offset[T](partition: java.util.Map[String, T]): java.util.Map[String, Object] = {
      val key: Map[String, _] = partition.asScala.toMap
      restored.get(key) match {
        case Some(m) =>
          val out = new java.util.HashMap[String, Object]()
          m.foreach { case (k, v) => out.put(k, v.asInstanceOf[Object]) }
          out
        case None => null
      }
    }
    override def offsets[T](partitions: java.util.Collection[java.util.Map[String, T]])
        : java.util.Map[java.util.Map[String, T], java.util.Map[String, Object]] = {
      val out = new java.util.HashMap[java.util.Map[String, T], java.util.Map[String, Object]]()
      partitions.asScala.foreach(p => out.put(p, offset(p)))
      out
    }
  }

  /** Instantiate + run a connector to exhaustion (or `maxRecords`, the
    * crash-simulation hook), publishing each record's schema-encoded JSON
    * value to `uri`'s topic log under its JSON-encoded sourcePartition.
    * Returns the partitions seen, the value schema observed, and the
    * snapshot of (sourcePartition → sourceOffset) — restart by passing
    * that snapshot back as `restored`. */
  def run(
      uri: String,
      props: Map[String, String],
      restored: Map[Map[String, _], Map[String, _]] = Map.empty,
      maxRecords: Long = Long.MaxValue): (Seq[String], Option[StructType], Snapshot) = {
    val connectorClass = props.getOrElse("connector.class",
      throw new IllegalArgumentException("connector.class property is required"))
    val cls = Thread.currentThread().getContextClassLoader.loadClass(connectorClass)
    val connector = cls.getConstructor().newInstance().asInstanceOf[SourceConnector]
    connector.initialize(new HostConnectorContext)
    connector.start(props.asJava)
    val taskConfig = connector.taskConfigs(1).get(0)
    val task = connector.taskClass().getConstructor().newInstance().asInstanceOf[SourceTask]
    val offsets = scala.collection.mutable.LinkedHashMap[Map[String, _], Map[String, _]]() ++ restored
    val seenPartitions = scala.collection.mutable.SortedSet.empty[String]
    var valueType: Option[StructType] = None
    try {
      task.initialize(new SourceTaskContext {
        override def configs(): java.util.Map[String, String] = taskConfig
        override def offsetStorageReader(): OffsetStorageReader = new HostOffsetReader(restored)
      })
      task.start(taskConfig)
      var produced = 0L
      var batch = task.poll()
      while (batch != null && !batch.isEmpty && produced < maxRecords) {
        val records = batch.asScala.take(
          math.min(Int.MaxValue.toLong, maxRecords - produced).toInt)
        records.groupBy(r => partitionKey(r)).foreach { case (pk, recs) =>
          seenPartitions += pk
          MemHub.publish(uri, pk, recs.iterator.map { r =>
            val ts = Option(r.timestamp()).map(_.toLong).getOrElse(0L)
            ("", Map.empty[String, String], ts,
              ConnectSchemas.toJson(r.valueSchema(), r.value()).getBytes("UTF-8"))
          })
        }
        records.foreach { r =>
          if (valueType.isEmpty && r.valueSchema() != null)
            valueType = Some(ConnectSchemas.toStructType(r.valueSchema()))
          offsets(Option(r.sourcePartition()).map(_.asScala.toMap).getOrElse(Map.empty)) =
            Option(r.sourceOffset()).map(_.asScala.toMap).getOrElse(Map.empty)
          task.commitRecord(r)
        }
        produced += records.size
        task.commit()
        batch = if (produced < maxRecords) task.poll() else null
      }
    } finally {
      try task.stop()
      finally connector.stop()
    }
    (seenPartitions.toSeq, valueType, Snapshot(offsets.toMap))
  }

  /** Deterministic MemHub log key for a record: its sourcePartition as
    * key-sorted JSON (the reference keys its snapshot map the same way). */
  private def partitionKey(r: SourceRecord): String = {
    val sp = Option(r.sourcePartition()).map(_.asScala.toMap).getOrElse(Map.empty)
    sp.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString("p[", ",", "]")
  }

  /** Host the connector (first call seeds the hub; driven by caller) and
    * read the records back as TYPED columns per the connector's own
    * Connect schema. */
  def readTyped(
      spark: SparkSession,
      uri: String,
      partitions: Seq[String],
      valueType: StructType): DataFrame = {
    val raw = spark.read.format("graft-topic")
      .option("profile", "connect").option("uri", uri)
      .option("topics", partitions.mkString(",")).load()
    raw.select(from_json(col("valueJson"), valueType).as("v"))
      .select(col("v.*"))
  }
}
