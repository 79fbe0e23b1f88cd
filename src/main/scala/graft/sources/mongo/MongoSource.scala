package graft.sources.mongo

import java.util
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

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
import graft.sources.hub.{Clients, MongoClient}

/** Document-store connector (SURVEY.md §2.1 S3-S5, reference
  * `mongodb/src/main/java/com/hazelcast/jet/contrib/mongodb/`).
  *
  * Batch (S3, MongoDBSources.java:80-96): `find(filter, projection)` over
  * JSON documents. The user schema (`.schema(...)`) defines the typed row;
  * a `filter` option carries a predicate document (`{"val":{"$gte":10}}`,
  * the reference's user-facing shape) and Catalyst comparison filters on
  * top-level fields are additionally pushed down
  * (`SupportsPushDownFilters`), as is column pruning
  * (`SupportsPushDownRequiredColumns`) — the analog of
  * `.projection(doc)` (MongoDBSources.java:93).
  *
  * CDC (S4/S5, MongoDBSourceBuilder.java:265-270, 791-860): the change log
  * as a stream; the offset is the change sequence (resume-token analog,
  * :853-859), snapshotted in the Spark checkpoint. `startAt` option mirrors
  * `startAtOperationTime`.
  */
object MongoJson {
  private val mapper = new ObjectMapper()

  def parse(doc: String): JsonNode = mapper.readTree(doc)

  private def cmpTo(n: JsonNode, v: JsonNode): Int =
    if (n.isNumber && v.isNumber) java.lang.Double.compare(n.asDouble(), v.asDouble())
    else n.asText().compareTo(v.asText())

  /** predicate doc: {"field": {"$gte": v}} — $eq/$gt/$gte/$lt/$lte/$ne/$in */
  final case class Pred(field: String, op: String, value: JsonNode) {
    def eval(doc: JsonNode): Boolean = {
      val n = doc.get(field)
      if (n == null || n.isNull) return false
      if (op == "$in") {
        val it = value.elements()
        while (it.hasNext) if (cmpTo(n, it.next()) == 0) return true
        return false
      }
      val cmp: Int = cmpTo(n, value)
      op match {
        case "$eq" => cmp == 0
        case "$ne" => cmp != 0
        case "$gt" => cmp > 0
        case "$gte" => cmp >= 0
        case "$lt" => cmp < 0
        case "$lte" => cmp <= 0
        case "$exists" => true // field presence already established above
        case _ => true
      }
    }
  }

  def parseFilter(filterJson: String): Seq[Pred] = {
    if (filterJson == null || filterJson.isEmpty) return Seq.empty
    val root = mapper.readTree(filterJson)
    val it = root.properties().iterator()
    val preds = Seq.newBuilder[Pred]
    while (it.hasNext) {
      val e = it.next()
      val v = e.getValue
      if (v.isObject) {
        val oit = v.properties().iterator()
        while (oit.hasNext) {
          val oe = oit.next()
          preds += Pred(e.getKey, oe.getKey, oe.getValue)
        }
      } else preds += Pred(e.getKey, "$eq", v)
    }
    preds.result()
  }

  def catalystToPred(f: Filter): Option[Pred] = {
    def lit(v: Any): JsonNode = v match {
      case n: java.lang.Number => mapper.getNodeFactory.numberNode(new java.math.BigDecimal(n.toString))
      case s => mapper.getNodeFactory.textNode(String.valueOf(s))
    }
    f match {
      case EqualTo(a, v) if !a.contains(".") => Some(Pred(a, "$eq", lit(v)))
      case GreaterThan(a, v) if !a.contains(".") => Some(Pred(a, "$gt", lit(v)))
      case GreaterThanOrEqual(a, v) if !a.contains(".") => Some(Pred(a, "$gte", lit(v)))
      case LessThan(a, v) if !a.contains(".") => Some(Pred(a, "$lt", lit(v)))
      case LessThanOrEqual(a, v) if !a.contains(".") => Some(Pred(a, "$lte", lit(v)))
      // IsNotNull → {$exists}: Pred.eval already rejects missing/null fields,
      // and consuming it lets Catalyst prune filter-only columns from the scan
      case IsNotNull(a) if !a.contains(".") =>
        Some(Pred(a, "$exists", mapper.getNodeFactory.booleanNode(true)))
      case _ => None
    }
  }

  /** DSv2 `Predicate` (the V2Filters surface) → find() predicate. Handles
    * the comparison family over a single top-level field and a literal —
    * including the flipped literal-op-field form — plus IS_NOT_NULL. */
  def v2ToPred(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate): Option[Pred] = {
    import org.apache.spark.sql.connector.expressions.{
      Expression => VExpr, Literal => VLit, NamedReference}
    def fieldOf(e: VExpr): Option[String] = e match {
      case f: NamedReference if f.fieldNames.length == 1 => Some(f.fieldNames.head)
      case _ => None
    }
    def litOf(e: VExpr): Option[JsonNode] = e match {
      // V2 literals carry Catalyst-INTERNAL values: Decimal is not a
      // java.lang.Number and UTF8String not a String — map both explicitly
      case l: VLit[_] => Some(l.value match {
        case d: org.apache.spark.sql.types.Decimal =>
          mapper.getNodeFactory.numberNode(d.toJavaBigDecimal)
        case n: java.lang.Number =>
          mapper.getNodeFactory.numberNode(new java.math.BigDecimal(n.toString))
        case v => mapper.getNodeFactory.textNode(String.valueOf(v))
      })
      case _ => None
    }
    val mongoOp = Map("=" -> "$eq", ">" -> "$gt", ">=" -> "$gte",
      "<" -> "$lt", "<=" -> "$lte")
    val flipOp = Map("$gt" -> "$lt", "$gte" -> "$lte",
      "$lt" -> "$gt", "$lte" -> "$gte").withDefault(identity)
    val ch = p.children()
    p.name() match {
      case "IS_NOT_NULL" if ch.length == 1 =>
        fieldOf(ch(0)).map(f =>
          Pred(f, "$exists", mapper.getNodeFactory.booleanNode(true)))
      case op if mongoOp.contains(op) && ch.length == 2 =>
        ((fieldOf(ch(0)), litOf(ch(1))) match {
          case (Some(f), Some(v)) => Some(Pred(f, mongoOp(op), v))
          case _ => None
        }).orElse((fieldOf(ch(1)), litOf(ch(0))) match {
          case (Some(f), Some(v)) => Some(Pred(f, flipOp(mongoOp(op)), v))
          case _ => None
        })
      case _ => None
    }
  }

  /** Runtime In(...) filter → {"field": {"$in": [...]}} predicate. */
  def inPred(field: String, values: Array[Any]): Pred = {
    val arr = mapper.getNodeFactory.arrayNode()
    values.foreach {
      case d: org.apache.spark.sql.types.Decimal => arr.add(d.toJavaBigDecimal)
      case n: java.lang.Number => arr.add(new java.math.BigDecimal(n.toString))
      case v => arr.add(String.valueOf(v))
    }
    Pred(field, "$in", arr)
  }

  /** Runtime V2 predicate → $in/$eq predicate. Spark's runtime filtering
    * (DPP analog) delivers the broadcast build side's keys as IN(col,
    * lit...) / =(col, lit) on the native V2 surface. */
  def v2RuntimePred(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate): Option[Pred] = {
    import org.apache.spark.sql.connector.expressions.{
      Expression => VExpr, Literal => VLit, NamedReference}
    def fieldOf(e: VExpr): Option[String] = e match {
      case f: NamedReference if f.fieldNames.length == 1 => Some(f.fieldNames.head)
      case _ => None
    }
    def rawOf(e: VExpr): Option[Any] = e match {
      case l: VLit[_] => Some(l.value)
      case _ => None
    }
    val ch = p.children()
    p.name() match {
      case "IN" if ch.length >= 2 =>
        for {
          f <- fieldOf(ch(0))
          vs <- { val raw = ch.drop(1).map(rawOf)
                  if (raw.forall(_.isDefined)) Some(raw.map(_.get)) else None }
        } yield inPred(f, vs.asInstanceOf[Array[Any]])
      case "=" if ch.length == 2 =>
        for { f <- fieldOf(ch(0)); v <- rawOf(ch(1)) } yield inPred(f, Array(v))
      case _ => None
    }
  }

  /** Server-side sort comparator for a pushed TopN: same field comparison
    * semantics as [[Pred.eval]] (numeric as double, else text). Documents
    * missing the field sort per the pushed null ordering. */
  def docComparator(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder])
      : Option[java.util.Comparator[JsonNode]] = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, NullOrdering}
    val keys = orders.map { o =>
      o.expression() match {
        case f: NamedReference if f.fieldNames.length == 1 =>
          Some((f.fieldNames.head,
            o.direction() == SortDirection.ASCENDING,
            o.nullOrdering() == NullOrdering.NULLS_FIRST))
        case _ => None
      }
    }
    if (keys.exists(_.isEmpty)) return None
    val ks = keys.flatten
    // Serializable: the comparator rides inside the partition-reader closure
    Some(new java.util.Comparator[JsonNode] with java.io.Serializable {
      override def compare(a: JsonNode, b: JsonNode): Int = {
        ks.foreach { case (field, asc, nullsFirst) =>
          val (na, nb) = (a.get(field), b.get(field))
          val aNull = na == null || na.isNull
          val bNull = nb == null || nb.isNull
          val c =
            if (aNull && bNull) 0
            else if (aNull) { if (nullsFirst) -1 else 1 }
            else if (bNull) { if (nullsFirst) 1 else -1 }
            else { val r = cmpTo(na, nb); if (asc) r else -r }
          if (c != 0) return c
        }
        0
      }
    })
  }

  /** Flat JSON document → InternalRow under `schema`. */
  def toRow(doc: JsonNode, schema: StructType): InternalRow = {
    val vals = schema.fields.map { f =>
      val n = doc.get(f.name)
      if (n == null || n.isNull) null
      else f.dataType match {
        case IntegerType => n.asInt()
        case LongType => n.asLong()
        case DoubleType => n.asDouble()
        case BooleanType => n.asBoolean()
        case StringType => Dsv2.utf8(if (n.isTextual) n.asText() else n.toString)
        case TimestampType => Dsv2.msToMicros(n.asLong())
        case other => throw new IllegalArgumentException(s"unsupported field type $other")
      }
    }
    Dsv2.row(vals.toIndexedSeq: _*)
  }
}

/** Test observability: documents emitted by find() scans after all
  * (planning-time AND runtime) predicates. */
object MongoSources {
  /** Transport seam default (see [[graft.sources.hub.Clients]]):
    * `option("client", fqn)` swaps a real [[MongoClient]] in. */
  val DefaultClient = "graft.sources.hub.HubMongoClient"
  def clientName(options: CaseInsensitiveStringMap): String =
    Option(options.get("client")).getOrElse(DefaultClient)
}

object MongoScanStats {
  val emitted = new java.util.concurrent.atomic.AtomicLong(0)
}

class MongoProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-mongo"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Seq(StructField("doc", StringType))) // raw passthrough when no user schema
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MongoTable(schema, new CaseInsensitiveStringMap(properties))
}

class MongoTable(userSchema: StructType, options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {
  private val uri = options.get("uri")
  private val clientName = MongoSources.clientName(options)
  private val filterJson = Option(options.get("filter")).getOrElse("")
  override def name(): String = s"mongo($uri)"
  override def schema(): StructType = userSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
      with SupportsPushDownAggregates
      with org.apache.spark.sql.connector.read.SupportsPushDownLimit
      with org.apache.spark.sql.connector.read.SupportsPushDownTopN
      with org.apache.spark.sql.connector.read.SupportsPushDownV2Filters {
      private var required: StructType = userSchema
      private var pushed = Array.empty[Filter]
      private var pushedV2 =
        Array.empty[org.apache.spark.sql.connector.expressions.filter.Predicate]
      private var preds = MongoJson.parseFilter(filterJson)
      private var countPushed = false
      private var limit = -1

      // V2 predicate surface — Spark prefers this over the V1 pushFilters
      // path when both are present; both feed the same find() predicate
      // list, so the scan narrows identically either way.
      override def pushPredicates(
          predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
          : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] = {
        val converted = predicates.map(p => p -> MongoJson.v2ToPred(p))
        pushedV2 = converted.collect { case (p, Some(_)) => p }
        preds = preds ++ converted.collect { case (_, Some(pr)) => pr }
        converted.collect { case (p, None) => p }
      }
      override def pushedPredicates()
          : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] = pushedV2

      // find().limit(n) analog: the cursor stops after n matching docs.
      // The scan is a single partition, so the store-side limit IS the
      // global limit — complete pushdown, Spark's own Limit node drops.
      override def pushLimit(l: Int): Boolean = { limit = l; true }
      override def isPartiallyPushed(): Boolean = false

      // find().sort(doc).limit(n) analog — ORDER BY ... LIMIT n served by
      // the store. Single partition ⇒ the store-side order is the global
      // order: complete pushdown (isPartiallyPushed=false above covers
      // both this and the plain limit), so Spark's Sort AND
      // TakeOrderedAndProject both drop out of the plan.
      private var topOrders =
        Array.empty[org.apache.spark.sql.connector.expressions.SortOrder]
      override def pushTopN(
          orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
          l: Int): Boolean =
        MongoJson.docComparator(orders) match {
          case Some(_) => topOrders = orders; limit = l; true
          case None => false
        }

      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        val converted = filters.map(f => f -> MongoJson.catalystToPred(f))
        pushed = converted.collect { case (f, Some(_)) => f }
        preds = preds ++ converted.collect { case (_, Some(p)) => p }
        converted.collect { case (f, None) => f }
      }
      override def pushedFilters(): Array[Filter] = pushed
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      // COUNT(*) (with whatever predicates were already pushed) is answered
      // server-side — the `countDocuments(filter)` analog. Complete
      // pushdown: no documents cross the wire at all.
      private def isCountStar(
          agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
        agg.groupByExpressions().isEmpty && agg.aggregateExpressions().length == 1 &&
          agg.aggregateExpressions()(0)
            .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]
      override def supportCompletePushDown(
          agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
        isCountStar(agg)
      override def pushAggregation(
          agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
        if (isCountStar(agg)) { countPushed = true; true } else false
      }

      override def build(): Scan = new Dsv2.BatchScan
        with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
        // runtime (join-time) filters — the DSv2 analog of dynamic
        // partition pruning: when this scan sits under a broadcast join,
        // Spark hands us the build side's key set as IN(...) at execution
        // start and the find() narrows before any document is emitted.
        // Implemented on the NATIVE V2 predicate surface (the V1
        // SupportsRuntimeFiltering interface is itself a compatibility
        // shim that converts these very predicates).
        private var runtime: Seq[MongoJson.Pred] = Seq.empty
        private var runtimeDesc = ""
        override def filterAttributes()
            : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
          required.fieldNames.map(org.apache.spark.sql.connector.expressions.Expressions.column)
        override def filter(
            predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
            : Unit = {
          val converted = predicates.flatMap(MongoJson.v2RuntimePred)
          runtime = converted.toSeq
          runtimeDesc = converted.map(p => s"${p.field} ${p.op}").mkString(",")
        }
        override def readSchema(): StructType =
          if (countPushed)
            StructType(Seq(StructField("count", LongType, nullable = false)))
          else required
        override def description(): String =
          s"mongo($uri) preds=${preds.map(p => s"${p.field}${p.op}").mkString(",")} " +
            (if (countPushed) "agg=count(*)"
             else s"cols=${required.fieldNames.mkString(",")}") +
            (if (topOrders.nonEmpty)
               s" sort=${topOrders.map(_.toString).mkString(",")} limit=$limit"
             else if (limit >= 0) s" limit=$limit" else "")
        override def batch: Batch = {
          val (u, ps, rs, cnt, lim) = (uri, preds ++ runtime, required, countPushed, limit)
          val cn = clientName
          val cmp = if (topOrders.isEmpty) None else MongoJson.docComparator(topOrders)
          val isRaw = rs.length == 1 && rs.head.name == "doc"
          new FnBatch(Seq(FnPartition(0, "find", 0, 0)), _ =>
            if (cnt) {
              val n = Clients.byName[MongoClient](cn).find(u).iterator
                .count(docStr => ps.forall(_.eval(MongoJson.parse(docStr))))
              Iterator.single(Dsv2.row(n.toLong))
            } else {
              val parsed = Clients.byName[MongoClient](cn).find(u).iterator
                .map(s => (s, MongoJson.parse(s)))
                .filter { case (_, doc) => ps.forall(_.eval(doc)) }
              // pushed TopN: the store sorts matching docs and the cursor
              // emits only the first `lim` — a real server would keep a
              // bounded heap; the emitted counter observes exactly `lim`
              val selected = cmp match {
                case Some(c) =>
                  val ord = Ordering.comparatorToOrdering(c).on[(String, JsonNode)](_._2)
                  val it = parsed.toArray.sorted(ord).iterator
                  if (lim >= 0) it.take(lim) else it
                case None =>
                  if (lim >= 0) parsed.take(lim) else parsed
              }
              selected.map { case (docStr, doc) =>
                MongoScanStats.emitted.incrementAndGet()
                if (isRaw) Dsv2.row(Dsv2.utf8(docStr)) else MongoJson.toRow(doc, rs)
              }
            })
        }
      }
    }
}

/** CDC over the document store's change log. */
object MongoCdc {
  val schema: StructType = StructType(Seq(
    StructField("operationType", StringType, nullable = false),
    StructField("clusterTime", TimestampType, nullable = false),
    StructField("resumeToken", StringType, nullable = false),
    StructField("fullDocument", StringType, nullable = true)))

  def rows(uri: String, after: Long, until: Long,
      clientName: String = MongoSources.DefaultClient): Iterator[InternalRow] =
    Clients.byName[MongoClient](clientName).oplogRange(uri, after, until).iterator.map {
      case (seq, op, doc, ctMs) =>
        Dsv2.row(Dsv2.utf8(op), Dsv2.msToMicros(ctMs), Dsv2.utf8(seq.toString), Dsv2.utf8(doc))
    }

  /** Standalone serializable factory (must not capture the stream/table). */
  final case class Factory(uri: String,
      clientName: String = MongoSources.DefaultClient) extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val fp = p.asInstanceOf[FnPartition]
      new Dsv2.IterReader(rows(uri, fp.from, fp.to, clientName))
    }
  }
}

class MongoCdcProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-mongo-cdc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = MongoCdc.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MongoCdcTable(new CaseInsensitiveStringMap(properties))
}

class MongoCdcTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  private val uri = options.get("uri")
  private val clientName = MongoSources.clientName(options)
  private val startAt = Option(options.get("startAt")).map(_.toLong).getOrElse(-1L)
  /** cursor batch-size analog (MongoDBSourceBuilder.java:57). */
  private val maxPerTrigger = Option(options.get("maxPerTrigger")).map(_.toLong)
  override def name(): String = s"mongo-cdc($uri)"
  override def schema(): StructType = MongoCdc.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = MongoCdc.schema
      override def description(): String = name()
      override def toBatch: Batch = {
        val (u, s, cn) = (uri, startAt, clientName)
        // split the change-log range into parallel slices (the log is
        // ordered and dense, so equal seq ranges are balanced)
        val hi = Clients.byName[MongoClient](cn).oplogLen(u) - 1
        val n = math.max(1, math.min(8, ((hi - s) / 4096) + 1)).toInt
        val step = math.max(1L, (hi - s + n - 1) / n)
        // partition i covers the half-open seq range (s + i*step, s + (i+1)*step]
        val parts = (0 until n).map { i =>
          FnPartition(i, "cdc", s + i * step, math.min(hi, s + (i + 1) * step))
        }.filter(p => p.from < p.to || p.idx == 0)
        new FnBatch(parts, p => MongoCdc.rows(u, p.from, p.to, cn))
      }
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
        val (u, s0, cn) = (uri, startAt, clientName)
        new Dsv2.SeqLogMicroBatchStream(Seq("cdc"), maxPerTrigger) {
          override def currentMax(name: String): Long =
            Clients.byName[MongoClient](cn).oplogLen(u) - 1
          override def factory: PartitionReaderFactory = MongoCdc.Factory(u, cn)
          override def initialOffset(): Offset = MapOffset(Map("cdc" -> s0))
        }
      }
    }
}
