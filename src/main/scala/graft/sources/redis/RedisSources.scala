package graft.sources.redis

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.Dsv2
import graft.sources.Dsv2.{FnBatch, FnPartition, MapOffset}
import graft.sources.hub.{Clients, RedisClient}

/** Redis-family connectors (SURVEY.md §2.1 S6-S8, reference
  * `redis/src/main/java/com/hazelcast/jet/contrib/redis/RedisSources.java`).
  *
  * - `graft-redis-hash`  — HGETALL batch scan (S6, RedisSources.java:100-183):
  *   struct<key,value>, single partition (a hash lives on one server).
  * - `graft-redis-zset`  — ZRANGEBYSCORE batch scan (S7, :186-256): the
  *   [from,to] score range is a server-side predicate; Catalyst score
  *   filters are pushed down (SupportsPushDownFilters) and further narrow it.
  * - `graft-redis-stream`— XREAD scan + micro-batch stream (S8, :273-395):
  *   one input partition per Redis stream (the analog of the reference's
  *   stream→member round-robin, :693-708), per-stream offsets snapshotted
  *   into the checkpoint (analog of :613-662).
  */
object RedisSources {
  /** Default transport: the MemHub-backed client; `option("client", fqn)`
    * swaps a real-network implementation of [[RedisClient]] in without
    * touching any DSv2 code (TransportSeamSpec). */
  val DefaultClient = "graft.sources.hub.HubRedisClient"
  def clientName(options: CaseInsensitiveStringMap): String =
    Option(options.get("client")).getOrElse(DefaultClient)
}

object RedisHash {
  val schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = true)))

  /** The `RedisCodec<K,V>` escape hatch (RedisSources.java:162-168): the
    * reference lets callers swap the string codec for a byte-level one;
    * here `option("codec", "binary")` maps key/value to BinaryType
    * (UTF-8 bytes at the client boundary). Default codec is string. */
  val binarySchema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = false),
    StructField("value", BinaryType, nullable = true)))

  def schemaFor(options: CaseInsensitiveStringMap): StructType =
    Option(options.get("codec")).getOrElse("string") match {
      case "string" => schema
      case "binary" => binarySchema
      case other => throw new IllegalArgumentException(
        s"unknown redis codec '$other' (string | binary)")
    }
}

class RedisHashProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-redis-hash"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RedisHash.schemaFor(options)
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RedisHashTable(new CaseInsensitiveStringMap(properties))
}

class RedisHashTable(options: CaseInsensitiveStringMap) extends Table
  with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  private val uri = options.get("uri")
  private val hash = options.get("hash")
  private val binary = Option(options.get("codec")).contains("binary")
  // transport seam: the table captures only the client's class NAME;
  // executors resolve their own instance (Clients.byName)
  private val clientName = RedisSources.clientName(options)
  override def name(): String = s"redis-hash($uri/$hash)"
  override def schema(): StructType = RedisHash.schemaFor(options)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.ACCEPT_ANY_SCHEMA)

  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val target = s"$uri/$hash"
    val queryId = info.queryId()
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toBatch =
            new graft.sinks.RedisHashWrite.HashBatchWrite(target, clientName)
          override def toStreaming =
            new graft.sinks.RedisHashWrite.HashStreamingWrite(target, queryId, clientName)
        }
    }
  }
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    () => new Dsv2.BatchScan {
      override def readSchema(): StructType = RedisHash.schemaFor(options)
      override def description(): String = name()
      override def batch: Batch = {
        val (u, h, bin, cn) = (uri, hash, binary, clientName)
        new FnBatch(Seq(FnPartition(0, h, 0, 0)), _ =>
          Clients.byName[RedisClient](cn).hashGetAll(s"$u/$h")
            .toSeq.sortBy(_._1).iterator.map { case (k, v) =>
              if (bin) Dsv2.row(k.getBytes("UTF-8"),
                if (v == null) null else v.getBytes("UTF-8"))
              else Dsv2.row(Dsv2.utf8(k), Dsv2.utf8(v))
            })
      }
    }
}

object RedisZSet {
  val schema: StructType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("value", StringType, nullable = false)))
}

class RedisZSetProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-redis-zset"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = RedisZSet.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RedisZSetTable(new CaseInsensitiveStringMap(properties))
}

class RedisZSetTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead
  with org.apache.spark.sql.connector.catalog.SupportsWrite {
  private val uri = options.get("uri")
  private val key = options.get("key")
  private val clientName = RedisSources.clientName(options)
  private val optFrom = Option(options.get("from")).map(_.toDouble).getOrElse(Double.NegativeInfinity)
  private val optTo = Option(options.get("to")).map(_.toDouble).getOrElse(Double.PositiveInfinity)
  override def name(): String = s"redis-zset($uri/$key)"
  override def schema(): StructType = RedisZSet.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.ACCEPT_ANY_SCHEMA)

  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val target = s"$uri/$key"
    val queryId = info.queryId()
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toBatch =
            new graft.sinks.RedisZSetWrite.ZSetBatchWrite(target, clientName)
          override def toStreaming =
            new graft.sinks.RedisZSetWrite.ZSetStreamingWrite(target, queryId, clientName)
        }
    }
  }

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters
      with SupportsPushDownLimit with SupportsPushDownTopN {
      private var from = optFrom
      private var to = optTo
      private var pushed = Array.empty[Filter]
      private var limit: Option[Int] = None
      private var descending = false

      // ZRANGEBYSCORE ... LIMIT analog: the store returns score-ordered
      // members, so ORDER BY score [DESC] LIMIT n is served entirely
      // server-side. The scan is a single partition (a sorted set lives on
      // one server), so the pushed ordering is GLOBAL and Spark drops its
      // Sort+Limit completely (isPartiallyPushed = false).
      override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
      override def pushTopN(
          orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
          l: Int): Boolean = {
        if (orders.length != 1) return false
        orders(0).expression() match {
          case fr: org.apache.spark.sql.connector.expressions.NamedReference
              if fr.fieldNames().length == 1 && fr.fieldNames()(0) == "score" =>
            descending = orders(0).direction() ==
              org.apache.spark.sql.connector.expressions.SortDirection.DESCENDING
            limit = Some(l)
            true
          case _ => false
        }
      }
      override def isPartiallyPushed(): Boolean = false

      // ZRANGEBYSCORE is an inclusive server-side range: consume >=/<=/= on
      // score exactly; leave anything else (and strict bounds) to Spark.
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        val (accepted, residual) = filters.partition {
          case GreaterThanOrEqual("score", _: java.lang.Number) => true
          case LessThanOrEqual("score", _: java.lang.Number) => true
          case EqualTo("score", _: java.lang.Number) => true
          case _ => false
        }
        accepted.foreach {
          case GreaterThanOrEqual(_, v: java.lang.Number) => from = math.max(from, v.doubleValue())
          case LessThanOrEqual(_, v: java.lang.Number) => to = math.min(to, v.doubleValue())
          case EqualTo(_, v: java.lang.Number) =>
            from = math.max(from, v.doubleValue()); to = math.min(to, v.doubleValue())
          case _ =>
        }
        pushed = accepted
        residual
      }
      override def pushedFilters(): Array[Filter] = pushed

      override def build(): Scan = new Dsv2.BatchScan {
        override def readSchema(): StructType = RedisZSet.schema
        override def description(): String =
          s"redis-zset($uri/$key) range=[$from,$to]" +
            limit.map(l => s" topN=$l ${if (descending) "DESC" else "ASC"}").getOrElse("")
        override def batch: Batch = {
          val (u, k, f, t, lim, desc, cn) = (uri, key, from, to, limit, descending, clientName)
          new FnBatch(Seq(FnPartition(0, k, 0, 0)), _ => {
            // (member, score), score-asc — via the seam-resolved transport
            val ranged = Clients.byName[RedisClient](cn).zrangeByScore(s"$u/$k", f, t)
            val ordered = if (desc) ranged.reverse else ranged
            val limited = lim.map(ordered.take).getOrElse(ordered)
            limited.iterator.map { case (m, s) => Dsv2.row(s, Dsv2.utf8(m)) }
          })
        }
      }
    }
}

object RedisStream {
  val schema: StructType = StructType(Seq(
    StructField("stream", StringType, nullable = false),
    StructField("id", StringType, nullable = false),
    StructField("body", MapType(StringType, StringType), nullable = false)))

  def readRows(uri: String, stream: String, after: Long, until: Long,
      clientName: String): Iterator[InternalRow] =
    Clients.byName[RedisClient](clientName).xread(uri, stream, after).iterator
      .filter(_._1 <= until)
      .map { case (id, body) =>
        Dsv2.row(Dsv2.utf8(stream), Dsv2.utf8(s"0-$id"), Dsv2.stringMap(body))
      }

  /** Standalone serializable factory (must not capture the stream/table). */
  final case class Factory(uri: String, clientName: String) extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val fp = p.asInstanceOf[FnPartition]
      new Dsv2.IterReader(readRows(uri, fp.tag, fp.from, fp.to, clientName))
    }
  }
}

class RedisStreamProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-redis-stream"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = RedisStream.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RedisStreamTable(new CaseInsensitiveStringMap(properties))
}

class RedisStreamTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  private val uri = options.get("uri")
  private val streamNames = options.get("streams").split(",").toSeq.sorted
  private val clientName = RedisSources.clientName(options)
  /** XREAD COUNT analog (RedisSources.java:522-523): rows per micro-batch. */
  private val maxPerTrigger = Option(options.get("maxPerTrigger")).map(_.toLong)
  override def name(): String = s"redis-stream($uri)"
  override def schema(): StructType = RedisStream.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan with SupportsReportPartitioning {
      override def readSchema(): StructType = RedisStream.schema
      override def description(): String = name()

      // one input partition per Redis stream, keyed by the stream name
      // (FnPartition.partitionKey): downstream groupBy/join on `stream`
      // needs no exchange — the storage partitioning IS the clustering
      override def outputPartitioning()
          : org.apache.spark.sql.connector.read.partitioning.Partitioning =
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions.identity("stream")),
          streamNames.length)

      override def toBatch: Batch = {
        val (u, cn) = (uri, clientName)
        val parts = streamNames.zipWithIndex.map { case (s, i) =>
          FnPartition(i, s, -1, Clients.byName[RedisClient](cn).xlen(u, s) - 1)
        }
        new FnBatch(parts, p => RedisStream.readRows(u, p.tag, p.from, p.to, cn))
      }

      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
        val (u, cn) = (uri, clientName)
        new Dsv2.SeqLogMicroBatchStream(streamNames, maxPerTrigger) {
          override def currentMax(name: String): Long =
            Clients.byName[RedisClient](cn).xlen(u, name) - 1
          override def factory: PartitionReaderFactory = RedisStream.Factory(u, cn)
        }
      }
    }
}
