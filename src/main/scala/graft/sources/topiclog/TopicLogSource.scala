package graft.sources.topiclog

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.Dsv2
import graft.sources.Dsv2.{FnBatch, FnPartition, MapOffset}
import graft.sources.hub.{Clients, MemHub, TopicLogClient}

/** Message-bus connectors over the shared topic log: MQTT (S10), Pulsar
  * consumer/reader (S11-S12), HTTP listener (S13), Twitter (S14-S15),
  * Kafka Connect adapter (S9). One provider, one `profile` per system —
  * each profile carries that system's row shape and delivery semantics.
  * Every profile follows the reference's universal source pattern —
  * client-callback → bounded buffer → fill (SURVEY.md §3.2) — collapsed
  * onto the log; the per-topic sequence is the offset the reference
  * snapshots (MessageId for Pulsar `PulsarReaderBuilder.java:193-199`,
  * sourceOffset map for Connect `AbstractKafkaConnectSource.java:101-107`).
  *
  * Profiles and schemas:
  *  - mqtt:    topic string, payload binary                     (MqttSourceBuilder.java:137-141)
  *  - pulsar:  key string, value binary, properties map, eventTime timestamp, messageId long
  *             (PulsarSinkBuilder.java:193-211 extractors, PulsarConsumerBuilder.java:180-188 ts)
  *  - http:    payload string                                    (HttpListenerSourceBuilder.java:237-246)
  *  - twitter: json string, timestamp_ms long                    (TwitterSources.java:245-262)
  *  - connect: sourcePartition string, sourceOffset long, timestamp timestamp, valueJson string
  *             (KafkaConnectSources.java:59-83)
  *
  * MQTT/HTTP/Twitter are non-replayable in the reference (at-least-once,
  * `MqttSources.java:47-52`); the log emulation makes them replayable here,
  * which only strengthens the delivery guarantee — semantics documented per
  * profile in GraftSources.
  */
object TopicProfiles {
  val schemas: Map[String, StructType] = Map(
    "mqtt" -> StructType(Seq(
      StructField("topic", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false))),
    "pulsar" -> StructType(Seq(
      StructField("key", StringType, nullable = true),
      StructField("value", BinaryType, nullable = false),
      StructField("properties", MapType(StringType, StringType), nullable = false),
      StructField("eventTime", TimestampType, nullable = false),
      StructField("messageId", LongType, nullable = false))),
    "http" -> StructType(Seq(
      StructField("payload", StringType, nullable = false))),
    "twitter" -> StructType(Seq(
      StructField("json", StringType, nullable = false),
      StructField("timestamp_ms", LongType, nullable = false))),
    "connect" -> StructType(Seq(
      StructField("sourcePartition", StringType, nullable = false),
      StructField("sourceOffset", LongType, nullable = false),
      StructField("timestamp", TimestampType, nullable = false),
      StructField("valueJson", StringType, nullable = false))))

  /** The Pulsar `Schema<M>` analog (PulsarSources.java:84-92 takes a
    * schema supplier and hands the pipeline TYPED messages): a `schema`
    * scan option decodes the payload with Pulsar's primitive encodings —
    * big-endian fixed-width numerics, UTF-8 strings, 1-byte booleans —
    * and retypes the `value` column accordingly. `json` decodes to the
    * JSON text; GraftSources applies the caller's DDL via from_json. */
  val pulsarCodecs: Map[String, org.apache.spark.sql.types.DataType] = Map(
    "bytes" -> BinaryType, "string" -> StringType, "json" -> StringType,
    "int32" -> IntegerType, "int64" -> LongType,
    "float" -> FloatType, "double" -> DoubleType, "bool" -> BooleanType)

  def schemaFor(profile: String, codec: String): StructType = profile match {
    case "pulsar" if RecordCodec.isRecord(codec) =>
      // binary named-record schema (Schema.AVRO analog): value is a typed
      // struct per the READER DDL, resolved against the writer schema
      StructType(schemas("pulsar").map(f =>
        if (f.name == "value") f.copy(dataType = RecordCodec.parse(codec).reader) else f))
    case "pulsar" if codec != "bytes" =>
      val vt = pulsarCodecs.getOrElse(codec, throw new IllegalArgumentException(
        s"unknown pulsar schema '$codec' (supported: ${pulsarCodecs.keys.toSeq.sorted.mkString(", ")}, record:<ddl>[@writer:<ddl>])"))
      StructType(schemas("pulsar").map(f =>
        if (f.name == "value") f.copy(dataType = vt) else f))
    case p => schemas(p)
  }

  private def decodeValue(codec: String, payload: Array[Byte]): Any = codec match {
    case c if RecordCodec.isRecord(c) =>
      RecordCodec.decodeToCatalyst(payload, RecordCodec.parse(c))
    case "bytes" => payload
    case "string" | "json" => Dsv2.utf8(new String(payload, "UTF-8"))
    case "int32" => java.nio.ByteBuffer.wrap(payload).getInt
    case "int64" => java.nio.ByteBuffer.wrap(payload).getLong
    case "float" => java.nio.ByteBuffer.wrap(payload).getFloat
    case "double" => java.nio.ByteBuffer.wrap(payload).getDouble
    case "bool" => payload.nonEmpty && payload(0) != 0
  }

  def toRow(profile: String, topic: String, m: MemHub.Msg,
      codec: String = "bytes"): InternalRow = profile match {
    case "mqtt" => Dsv2.row(Dsv2.utf8(topic), m.payload)
    case "pulsar" => Dsv2.row(Dsv2.utf8(m.key), decodeValue(codec, m.payload),
      Dsv2.stringMap(m.props), Dsv2.msToMicros(m.eventTimeMs), m.seq)
    case "http" => Dsv2.row(Dsv2.utf8(new String(m.payload, "UTF-8")))
    case "twitter" => Dsv2.row(Dsv2.utf8(new String(m.payload, "UTF-8")), m.eventTimeMs)
    case "connect" => Dsv2.row(Dsv2.utf8(topic), m.seq, Dsv2.msToMicros(m.eventTimeMs),
      Dsv2.utf8(new String(m.payload, "UTF-8")))
    case other => throw new IllegalArgumentException(s"unknown profile $other")
  }

  /** Twitter endpoint-supplier analog (the reference's source takes any
    * `StreamingEndpoint`, `twitter/.../TwitterSources.java:85-110` —
    * filter/sample/firehose from com.twitter.hbc): the endpoint decides
    * SERVER-side what the stream delivers, so it's applied here at the
    * broker boundary, before rows reach Spark.
    *  - `firehose` (default): everything;
    *  - `sample`: the deterministic 1 % slice (eventTime ‰100 == 0 — the
    *    decorated-timestamp analog of Twitter's server-random sample);
    *  - `filter` + `track` terms: case-insensitive keyword match on the
    *    payload, hbc `StatusesFilterEndpoint.trackTerms` semantics. */
  def endpointPredicate(endpoint: String, track: Seq[String]): MemHub.Msg => Boolean =
    endpoint match {
      case "firehose" | "" => _ => true
      case "sample" => m => m.eventTimeMs % 100 == 0
      case "filter" =>
        val terms = track.map(_.toLowerCase)
        require(terms.nonEmpty, "filter endpoint needs track terms")
        m => {
          val p = new String(m.payload, "UTF-8").toLowerCase
          terms.exists(p.contains)
        }
      case other => throw new IllegalArgumentException(
        s"unknown endpoint '$other' (supported: firehose, sample, filter)")
    }

  def rows(profile: String, uri: String, topic: String, after: Long, until: Long,
      codec: String = "bytes", endpoint: String = "firehose",
      track: Seq[String] = Nil,
      clientName: String = TopicLog.DefaultClient): Iterator[InternalRow] = {
    val pred = endpointPredicate(endpoint, track)
    Clients.byName[TopicLogClient](clientName)
      .poll(uri, topic, after).iterator.filter(_.seq <= until)
      .filter(pred)
      .map(toRow(profile, topic, _, codec))
  }

  /** Standalone serializable factory (must not capture the stream/table). */
  final case class Factory(profile: String, uri: String, codec: String = "bytes",
      endpoint: String = "firehose", track: Seq[String] = Nil,
      clientName: String = TopicLog.DefaultClient)
      extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val fp = p.asInstanceOf[FnPartition]
      new Dsv2.IterReader(
        rows(profile, uri, fp.tag, fp.from, fp.to, codec, endpoint, track, clientName))
    }
  }
}

object TopicLog {
  /** Transport seam default (see [[graft.sources.hub.Clients]]):
    * `option("client", fqn)` swaps a real broker [[TopicLogClient]] in. */
  val DefaultClient = "graft.sources.hub.HubTopicLogClient"
}

/** MQTT 3.1.1 §4.7 topic-filter matching (the reference's source accepts
  * wildcard topics — MqttSources.java:76/93, Paho subscribe semantics):
  * `+` matches exactly one level, `#` (last level only) matches the
  * parent and every level below it, and filters STARTING with a wildcard
  * never match `$`-prefixed topics. */
object MqttTopicFilter {
  def isWildcard(filter: String): Boolean =
    filter.contains('+') || filter.contains('#')

  def matches(filter: String, topic: String): Boolean = {
    val fl = filter.split("/", -1)
    val tl = topic.split("/", -1)
    if (topic.startsWith("$") && (fl(0) == "+" || fl(0) == "#")) return false
    def go(i: Int, j: Int): Boolean =
      if (i == fl.length) j == tl.length
      else fl(i) match {
        case "#" => i == fl.length - 1 // matches the parent and all below
        case "+" => j < tl.length && go(i + 1, j + 1)
        case lit => j < tl.length && tl(j) == lit && go(i + 1, j + 1)
      }
    go(0, 0)
  }
}

class TopicLogProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-topic"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TopicProfiles.schemaFor(options.get("profile"),
      Option(options.get("schema")).getOrElse("bytes"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TopicLogTable(new CaseInsensitiveStringMap(properties))
}

class TopicLogTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  private val uri = options.get("uri")
  private val profile = options.get("profile")
  /** Per-topic subscription QoS (Subscription.java:85-127): a topic entry
    * is `name` or `name:qos` with qos ∈ {0,1,2}. QoS 0 is a NON-DURABLE
    * subscription — at-most-once: a stream starts at the live tail (no
    * backfill of messages published before the subscription), mirroring
    * an MQTT broker dropping QoS0 for a disconnected client. QoS 1/2
    * subscriptions are durable: streams replay from the committed offset
    * (the log transport makes redelivery exactly-once downstream). */
  private val topicQos: Map[String, Int] = options.get("topics").split(",").toSeq.map {
    case s if s.contains(":") =>
      val Array(n, q) = s.split(":", 2)
      require(Set("0", "1", "2").contains(q), s"bad qos in topic entry '$s'")
      n -> q.toInt
    case s => s -> 1
  }.toMap
  private val topicNames = topicQos.keys.toSeq.sorted

  /** MQTT wildcard subscription (MqttSources.java:76/93 — "the topics may
    * include wildcards"): `+`/`#` entries are FILTERS, expanded against
    * the broker's topic tree at every batch/epoch, so a topic that first
    * publishes after the stream started joins the next micro-batch and
    * backfills from the subscription point (offset -1 — every message on
    * it post-dates the subscribe). Non-MQTT profiles treat topic names
    * literally (Pulsar patterns are a different surface). */
  private val hasWildcardFilters =
    profile == "mqtt" && topicNames.exists(MqttTopicFilter.isWildcard)
  if (hasWildcardFilters)
    topicNames.filter(MqttTopicFilter.isWildcard).foreach { f =>
      val ls = f.split("/", -1)
      ls.zipWithIndex.foreach { case (l, i) =>
        require(!l.contains('#') || (l == "#" && i == ls.length - 1),
          s"invalid MQTT topic filter '$f': '#' must be the final level")
        require(!l.contains('+') || l == "+",
          s"invalid MQTT topic filter '$f': '+' must occupy a whole level")
      }
    }

  /** Subscription QoS for a (possibly filter-matched) topic — overlapping
    * subscriptions grant the MAX matching QoS (MQTT 3.1.1 §3.8.4), so a
    * literal `dev/a:0` entry under a durable `dev/#:2` filter still gets
    * the wildcard's QoS-2 delivery. */
  private def qosFor(topic: String): Int = {
    val qs = topicQos.get(topic).toSeq ++ topicQos.collect {
      case (f, q) if MqttTopicFilter.isWildcard(f) &&
        MqttTopicFilter.matches(f, topic) => q
    }
    if (qs.nonEmpty) qs.max else 1
  }

  /** The concrete topic set this subscription covers right now. */
  private def resolveTopics(): Seq[String] =
    if (!hasWildcardFilters) topicNames
    else {
      val (filters, literals) = topicNames.partition(MqttTopicFilter.isWildcard)
      (literals ++ client.topicNames(uri)
        .filter(t => filters.exists(MqttTopicFilter.matches(_, t))))
        .distinct.sorted
    }

  /** Pulsar-consumer semantics: ack up to the committed offset after each
    * epoch (PulsarConsumerBuilder.java:142-221 async ack). */
  private val ackAs = Option(options.get("ackAs"))

  /** MQTT connection/session knobs (AbstractMqttBuilder.java:38-39,
    * 108-130): `autoReconnect` — on a broker drop the client reconnects
    * and resubscribes instead of failing the stream; `keepSession`
    * (cleanSession=false) — the broker retains the durable subscription
    * across the drop, so QoS 1/2 messages published while disconnected
    * are REDELIVERED after the resubscribe. A clean session (default)
    * retains nothing: the resubscribe starts at the live tail and the
    * disconnect-window backlog is lost; QoS 0 backlog is dropped even
    * under a kept session (non-durable delivery, MQTT spec). */
  private val clientId = Option(options.get("clientId")).getOrElse("graft-client")
  private val autoReconnect =
    Option(options.get("autoReconnect")).exists(_.toBoolean)
  private val keepSession =
    Option(options.get("keepSession")).exists(_.toBoolean)
  /** batchReceive/fill-cap analog (PulsarConsumerBuilder.java:89-96 etc.). */
  private val maxPerTrigger = Option(options.get("maxPerTrigger")).map(_.toLong)

  /** Broker credentials (secured-broker analog): user/password options,
    * validated against the namespace at scan construction — missing or
    * wrong credentials fail at job start with the reference's
    * "Not authorized to connect" (SecuredMqttSourceTest.java:56-92). */
  private val auth: Option[(String, String)] =
    (Option(options.get("user")), Option(options.get("password"))) match {
      case (Some(u), Some(p)) => Some((u, p))
      case _ => None
    }

  /** Client TLS stores (the ssl:// broker options): any of
    * sslKeystore/sslTruststore present makes this a TLS connect;
    * validated with a real handshake at scan construction. */
  private val clientTls: Option[graft.sources.hub.TlsGate.ClientTls] = {
    val ks = Option(options.get("sslKeystore"))
    val ts = Option(options.get("sslTruststore"))
    if (ks.isEmpty && ts.isEmpty) None
    else Some(graft.sources.hub.TlsGate.ClientTls(
      ks, Option(options.get("sslPassword")).getOrElse(""), ts))
  }

  /** Pulsar Schema<M> analog: typed payload decode (see
    * [[TopicProfiles.pulsarCodecs]]). */
  private val codec = Option(options.get("schema")).getOrElse("bytes")

  /** Twitter endpoint-supplier analog (see
    * [[TopicProfiles.endpointPredicate]]): which slice the broker
    * delivers. */
  private val endpoint = Option(options.get("endpoint")).getOrElse("firehose")
  private val track: Seq[String] =
    Option(options.get("track")).map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)

  override def name(): String = s"topic-log($profile:$uri)"
  override def schema(): StructType = TopicProfiles.schemaFor(profile, codec)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  private val clientName =
    Option(options.get("client")).getOrElse(TopicLog.DefaultClient)
  private def client = Clients.byName[TopicLogClient](clientName)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    client.checkTopicAuth(uri, auth)
    client.checkTopicTls(uri, clientTls)
    () => new Scan {
      override def readSchema(): StructType = TopicProfiles.schemaFor(profile, codec)
      override def description(): String = name()

      override def toBatch: Batch = {
        val (u, pr, cd, ep, tr, cn) = (uri, profile, codec, endpoint, track, clientName)
        val parts = resolveTopics().zipWithIndex.map { case (t, i) =>
          FnPartition(i, t, -1, client.topicMaxSeq(u, t))
        }
        new FnBatch(parts,
          p => TopicProfiles.rows(pr, u, p.tag, p.from, p.to, cd, ep, tr, cn))
      }

      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
        val (u, pr, ack, cd) = (uri, profile, ackAs, codec)
        val (ep, tr) = (endpoint, track)
        val cn = clientName
        def cl = Clients.byName[TopicLogClient](cn)
        val (cid, autoRec, keepSess) = (clientId, autoReconnect, keepSession)
        new Dsv2.SeqLogMicroBatchStream(topicNames, maxPerTrigger) {
          // wildcard subscriptions re-expand against the broker's topic
          // tree each epoch: late-appearing matches join with offset -1
          override def currentNames: Seq[String] = resolveTopics()
          // resubscribe floors after a reconnect: a clean session skips
          // the whole disconnect window; a kept session skips only QoS 0
          // (non-durable) topics — QoS 1/2 backlog redelivers from the
          // committed offset as the durable subscription promises
          private val floors = new scala.collection.concurrent.TrieMap[String, Long]()
          private def pollGate(): Unit =
            if (pr == "mqtt" && cl.mqttPollGate(u, cid, autoRec)) {
              currentNames.foreach { n =>
                if (!keepSess || qosFor(n) == 0)
                  floors.put(n, cl.topicMaxSeq(u, n)): Unit
              }
            }
          override def readFloor(name: String): Long =
            floors.getOrElse(name, -1L)
          override def currentMax(name: String): Long = {
            pollGate()
            cl.topicMaxSeq(u, name)
          }
          override def factory: PartitionReaderFactory =
            TopicProfiles.Factory(pr, u, cd, ep, tr, cn)
          // QoS0 topics subscribe at the live tail (non-durable); no
          // backfill of pre-subscription messages
          override def initialOffset(): Offset =
            Dsv2.MapOffset(currentNames.map { n =>
              n -> (if (qosFor(n) == 0) cl.topicMaxSeq(u, n) else -1L)
            }.toMap)
          override def onCommit(end: Dsv2.MapOffset): Unit =
            ack.foreach { consumer =>
              end.m.foreach { case (t, seq) => cl.ack(s"$consumer/$t", seq) }
            }
        }
      }
    }
  }
}
