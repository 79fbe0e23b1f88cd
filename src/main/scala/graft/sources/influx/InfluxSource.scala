package graft.sources.influx

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.Dsv2
import graft.sources.Dsv2.{FnBatch, FnPartition}
import graft.sources.hub.{Clients, InfluxClient}

/** Time-series connector (SURVEY.md §2.1 S1-S2, reference
  * `influxdb/src/main/java/com/hazelcast/jet/contrib/influxdb/InfluxDbSources.java:79-136`).
  *
  * The reference pushes an InfluxQL string verbatim to the server and maps
  * each series row via `(name, tags, columns, values) → T`. Here the query
  * is the (measurement, fromMs, toMs) triple pushed to the store, and rows
  * surface as `struct<time: timestamp, tags: map<string,string>,
  * fields: map<string,double>>` — the measurement-projection shape
  * (`MeasurementProjection.java:29-39`). The POJO path (S2) is
  * `.as[T]` over a flattening select (see GraftSources.influxTyped).
  */
object InfluxSource {
  val schema: StructType = StructType(Seq(
    StructField("time", TimestampType, nullable = false),
    StructField("tags", MapType(StringType, StringType), nullable = false),
    StructField("fields", MapType(StringType, DoubleType), nullable = false)))
}

class InfluxProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-influx"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = InfluxSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new InfluxTable(new CaseInsensitiveStringMap(properties))
}

class InfluxTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  private val uri = options.get("uri")
  // transport seam: option("client", fqn) swaps a real InfluxClient in
  private val clientName =
    Option(options.get("client")).getOrElse("graft.sources.hub.HubInfluxClient")
  /** InfluxQL verbatim passthrough (InfluxDbSources.java:79-136): when
    * `query` is set the string goes to the SERVER untouched — the scan
    * neither parses nor narrows it (no time pushdown: the query already
    * says everything), it only prunes columns client-side. */
  private val query = Option(options.get("query"))
  private val measurement = Option(options.get("measurement")).getOrElse("")
  private val fromMs = Option(options.get("fromMs")).map(_.toLong).getOrElse(Long.MinValue)
  private val toMs = Option(options.get("toMs")).map(_.toLong).getOrElse(Long.MaxValue)
  require(query.isDefined || measurement.nonEmpty,
    "influx scan needs either a measurement or a verbatim query")
  override def name(): String =
    query.map(q => s"influx($uri, ql)").getOrElse(s"influx($uri/$measurement)")
  override def schema(): StructType = InfluxSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with org.apache.spark.sql.connector.read.SupportsPushDownFilters
      with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
      private var from = fromMs
      private var to = toMs
      private var pushed = Array.empty[org.apache.spark.sql.sources.Filter]
      private var required: StructType = InfluxSource.schema

      // the InfluxQL `WHERE time ...` clause analog: time comparisons narrow
      // the server-side range. Bounds are applied at MILLIsecond floor
      // (conservative — may admit boundary rows) and every filter is ALSO
      // returned as residual, so Spark re-applies exact semantics; the
      // pushdown only shrinks what the server ships.
      override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
          : Array[org.apache.spark.sql.sources.Filter] = {
        import org.apache.spark.sql.sources._
        if (query.isDefined) return filters // verbatim mode: the query IS the predicate
        def ms(v: Any): Option[Long] = v match {
          case t: java.sql.Timestamp => Some(t.getTime)
          case t: java.time.Instant => Some(t.toEpochMilli)
          case _ => None
        }
        val consumed = filters.filter {
          case GreaterThanOrEqual("time", v) =>
            ms(v).exists { m => from = math.max(from, m); true }
          case GreaterThan("time", v) =>
            ms(v).exists { m => from = math.max(from, m); true }
          case LessThanOrEqual("time", v) =>
            ms(v).exists { m => to = math.min(to, m); true }
          case LessThan("time", v) =>
            ms(v).exists { m => to = math.min(to, m); true }
          case EqualTo("time", v) =>
            ms(v).exists { m => from = math.max(from, m); to = math.min(to, m); true }
          case _ => false
        }
        pushed = consumed
        filters // all residual: exact predicate re-checked above the scan
      }
      override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed

      // the measurement-projection analog: untouched tag/field maps are
      // never shipped
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      override def build(): Scan = new Dsv2.BatchScan {
        override def readSchema(): StructType = required
        override def description(): String =
          s"influx($uri/$measurement) time=[$from,$to] cols=${required.fieldNames.mkString(",")}"
        override def batch: Batch = {
          val (u, m, f, t, rs, ql, cn) = (uri, measurement, from, to, required, query, clientName)
          new FnBatch(Seq(FnPartition(0, m, f, t)), p => {
            val rows = ql match {
              case Some(q) => Clients.byName[InfluxClient](cn).influxQuery(u, q) // verbatim
              case None => Clients.byName[InfluxClient](cn).queryRange(u, m, p.from, p.to)
            }
            rows.iterator.map { case (ms, tags, fields) =>
              Dsv2.row(rs.fieldNames.toIndexedSeq.map {
                case "time" => Dsv2.msToMicros(ms)
                case "tags" => Dsv2.stringMap(tags)
                case "fields" => Dsv2.doubleMap(fields)
              }: _*)
            }
          })
        }
      }
    }
}
