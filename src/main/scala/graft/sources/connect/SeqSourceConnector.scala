package graft.sources.connect

import java.util.{Collections, List => JList, Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.kafka.connect.connector.Task
import org.apache.kafka.connect.data.{Schema, SchemaBuilder, Struct}
import org.apache.kafka.connect.source.{SourceConnector, SourceRecord, SourceTask}

/** A REAL `SourceConnector` (Connect API types end to end) — the stand-in
  * for an off-the-shelf connector jar, playing the role the reference's
  * random-int test connector plays
  * (KafkaConnectRandomIntIntegrationTest.java:40-43) but deterministic:
  * emits n typed Struct rows {i: int64, sq: int64, lab: string} in
  * batches of 100, with sourceOffset {"pos": i}. On (re)start the task
  * consults the host's [[org.apache.kafka.connect.storage.OffsetStorageReader]]
  * and RESUMES after the stored position — the reference's
  * snapshot/restore contract. */
class SeqSourceConnector extends SourceConnector {
  private var props: JMap[String, String] = Collections.emptyMap()
  override def start(props: JMap[String, String]): Unit = this.props = props
  override def taskClass(): Class[_ <: Task] = classOf[SeqSourceTask]
  override def taskConfigs(maxTasks: Int): JList[JMap[String, String]] =
    Collections.singletonList(props)
  override def stop(): Unit = ()
  override def version(): String = "1"
}

object SeqSourceTask {
  val ValueSchema: Schema = SchemaBuilder.struct().name("graft.Seq")
    .field("i", Schema.INT64_SCHEMA)
    .field("sq", Schema.INT64_SCHEMA)
    .field("lab", Schema.STRING_SCHEMA)
    .build()
  val Partition: JMap[String, String] = Collections.singletonMap("src", "seq")
}

class SeqSourceTask extends SourceTask {
  private var n = 0L
  private var pos = 0L
  override def version(): String = "1"

  override def start(props: JMap[String, String]): Unit = {
    n = props.get("n").toLong
    // the Connect restore contract: ask the hosting runtime where this
    // source partition left off and resume AFTER it
    val stored = Option(context)
      .flatMap(c => Option(c.offsetStorageReader()))
      .flatMap(r => Option(r.offset(SeqSourceTask.Partition)))
    pos = stored.map(_.get("pos").toString.toLong + 1L).getOrElse(0L)
  }

  override def poll(): JList[SourceRecord] = {
    if (pos >= n) return Collections.emptyList()
    val batch = (pos until math.min(pos + 100, n)).map { i =>
      val v = new Struct(SeqSourceTask.ValueSchema)
        .put("i", java.lang.Long.valueOf(i))
        .put("sq", java.lang.Long.valueOf(i * i))
        .put("lab", s"v${i % 7}")
      new SourceRecord(
        SeqSourceTask.Partition,
        Collections.singletonMap("pos", java.lang.Long.valueOf(i)),
        "seq", null, null, null, SeqSourceTask.ValueSchema, v,
        java.lang.Long.valueOf(i))
    }
    pos += batch.size
    batch.asJava
  }

  override def stop(): Unit = ()
}
