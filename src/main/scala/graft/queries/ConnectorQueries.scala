package graft.queries

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.functions.token_count
import graft.sinks.GraftSinks
import graft.sources.{GraftSources, SourceTaskLike}
import graft.sources.hub.MemHub

/** Connector operators (SURVEY.md §2.1/§2.2) as driver-checkable queries.
  *
  * Each query seeds the hub transport from a parquet table (deterministic
  * order), drives the real DSv2 source/sink path — scan, pushdown, input
  * partitions, or the sink receive/flush lifecycle — and produces output the
  * DuckDB oracle reproduces from the same parquet.
  */
object ConnectorQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val seeded = TrieMap.empty[String, Boolean]
  private def seedOnce(key: String)(f: => Unit): Unit =
    seeded.getOrElseUpdate(key, { f; true })

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  // ------------------------------------------------------------------ sources

  private def seedCustomerHash(s: SparkSession, dir: String): String = {
    val uri = s"hub:$dir/src_redis_hash"
    seedOnce(uri) {
      val rows = t(s, dir, "customer").select("c_custkey", "c_name").collect()
      MemHub.hashPut(s"$uri/cust",
        rows.sortBy(_.getLong(0)).iterator.map(r => r.getLong(0).toString -> r.getString(1)))
    }
    uri
  }

  private val srcRedisHash = QueryDef(
    "src_redis_hash",
    (s, dir) => {
      val uri = seedCustomerHash(s, dir)
      GraftSources.redisHash(s, uri, "cust")
        .select(col("key").cast("long").as("c_custkey"), col("value").as("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("SELECT c_custkey, c_name FROM customer ORDER BY c_custkey"))

  /** S6 with the binary RedisCodec (RedisSources.java:162-168): the same
    * hash scan surfaces BinaryType key/value; the query decodes the key
    * and reports the value's byte length — both DuckDB-replicable. */
  private val srcRedisBinary = QueryDef(
    "src_redis_codec_binary",
    (s, dir) => {
      val uri = seedCustomerHash(s, dir)
      GraftSources.redisHash(s, uri, "cust", codec = "binary")
        .select(decode(col("key"), "UTF-8").cast("long").as("c_custkey"),
          length(col("value")).as("name_bytes"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, CAST(octet_length(encode(c_name)) AS INTEGER) AS name_bytes
      FROM customer ORDER BY c_custkey"""))

  private val srcRedisZset = QueryDef(
    "src_redis_zset_pushdown",
    (s, dir) => {
      val uri = s"hub:$dir/src_redis_zset"
      seedOnce(uri) {
        val rows = t(s, dir, "customer").select("c_custkey", "c_acctbal").collect()
        MemHub.zadd(s"$uri/bal",
          rows.sortBy(_.getLong(0)).iterator.map(r => r.getLong(0).toString -> r.getDouble(1)))
      }
      // no from/to options: the score range reaches the store via Catalyst
      // filter pushdown (SupportsPushDownFilters → ZRANGEBYSCORE)
      GraftSources.redisSortedSet(s, uri, "bal")
        .filter(col("score") >= 0.0 && col("score") <= 5000.0)
        .select(col("value").cast("long").as("c_custkey"), col("score").as("c_acctbal"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_acctbal FROM customer
      WHERE c_acctbal BETWEEN 0 AND 5000 ORDER BY c_custkey"""))

  private val srcRedisStream = QueryDef(
    "src_redis_stream",
    (s, dir) => {
      val uri = s"hub:$dir/src_redis_stream"
      seedOnce(uri) {
        val rows = t(s, dir, "events").select("event_id", "event_type", "user_id").collect()
        rows.groupBy(_.getString(1)).toSeq.sortBy(_._1).foreach { case (et, rs) =>
          MemHub.xadd(uri, et, rs.sortBy(_.getLong(0)).iterator.map(r =>
            Map("event_id" -> r.getLong(0).toString, "user_id" -> r.getLong(2).toString)))
        }
      }
      val streams = Seq("click", "view", "purchase", "signup", "error")
      GraftSources.redisStreamBatch(s, uri, streams)
        .groupBy(col("stream"))
        .agg(count(lit(1)).as("n"),
          sum(col("body").getItem("user_id").cast("long")).as("user_sum"))
        .orderBy(col("stream"))
    },
    Some("""SELECT event_type AS stream, COUNT(*) AS n,
        CAST(SUM(user_id) AS BIGINT) AS user_sum
      FROM events GROUP BY event_type ORDER BY event_type"""))

  private val mongoOrderSchema = StructType(Seq(
    StructField("k", LongType), StructField("c", LongType),
    StructField("p", DoubleType), StructField("st", StringType)))

  private def seedMongoOrders(s: SparkSession, dir: String, uri: String): Unit =
    seedOnce(uri) {
      val rows = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus").collect()
      MemHub.insertMany(uri, rows.sortBy(_.getLong(0)).iterator.map { r =>
        s"""{"k":${r.getLong(0)},"c":${r.getLong(1)},"p":${r.getDouble(2)},"st":"${esc(r.getString(3))}"}"""
      })
    }

  private val srcMongoFind = QueryDef(
    "src_mongo_find_pushdown",
    (s, dir) => {
      val uri = s"hub:$dir/mongo_orders"
      seedMongoOrders(s, dir, uri)
      // filter reaches the store via Catalyst pushdown; column pruning drops st
      GraftSources.mongoBatch(s, uri, mongoOrderSchema)
        .filter(col("p") >= 100000.0 && col("st") === "O")
        .select(col("k"), col("c"), col("p"))
        .orderBy(col("k"))
    },
    Some("""SELECT o_orderkey AS k, o_custkey AS c, o_totalprice AS p
      FROM orders WHERE o_totalprice >= 100000 AND o_orderstatus = 'O'
      ORDER BY k"""))

  /** ORDER BY ... LIMIT served entirely by the store (SupportsPushDownTopN):
    * find().sort(doc).limit(n) — Spark's Sort and TakeOrderedAndProject both
    * drop out of the plan (single partition ⇒ store order is global order). */
  private val srcMongoTopN = QueryDef(
    "src_mongo_topn",
    (s, dir) => {
      val uri = s"hub:$dir/mongo_orders"
      seedMongoOrders(s, dir, uri)
      GraftSources.mongoBatch(s, uri, mongoOrderSchema)
        .filter(col("st") === "O")
        .select(col("k"), col("c"), col("p"))
        .orderBy(col("p").desc, col("k"))
        .limit(25)
    },
    Some("""SELECT o_orderkey AS k, o_custkey AS c, o_totalprice AS p
      FROM orders WHERE o_orderstatus = 'O'
      ORDER BY p DESC, k LIMIT 25"""))

  private val srcMongoCdc = QueryDef(
    "src_mongo_cdc",
    (s, dir) => {
      val uri = s"hub:$dir/mongo_orders"
      seedMongoOrders(s, dir, uri)
      GraftSources.mongoCdcBatch(s, uri)
        .agg(count(lit(1)).as("n_changes"),
          sum(get_json_object(col("fullDocument"), "$.k").cast("long")).as("k_sum"),
          count(when(col("operationType") === "insert", 1)).as("n_inserts"))
    },
    Some("""SELECT COUNT(*) AS n_changes, CAST(SUM(o_orderkey) AS BIGINT) AS k_sum,
      COUNT(*) AS n_inserts FROM orders"""))

  private def seedInfluxEvents(s: SparkSession, dir: String): String = {
    val uri = s"hub:$dir/src_influx"
    seedOnce(uri) {
      val rows = t(s, dir, "events")
        .select(col("event_id"), unix_millis(col("ts")).as("ms"), col("event_type"), col("value"))
        .collect()
      MemHub.writePoints(uri, "events", rows.sortBy(_.getLong(0)).iterator.map { r =>
        (r.getLong(1), Map("type" -> r.getString(2)), Map("value" -> r.getDouble(3)))
      })
    }
    uri
  }

  private val srcInflux = QueryDef(
    "src_influx_range",
    (s, dir) => {
      val uri = seedInfluxEvents(s, dir)
      // 2024-01-05T00:00Z .. 2024-01-15T00:00Z, inclusive server-side range
      GraftSources.influx(s, uri, "events", 1704412800000L, 1705276800000L)
        .groupBy(col("tags").getItem("type").as("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("fields").getItem("value").cast("decimal(18,6)")).cast("double").as("value_sum"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
      FROM events
      WHERE epoch_ms(ts) >= 1704412800000 AND epoch_ms(ts) <= 1705276800000
      GROUP BY event_type ORDER BY event_type"""))

  /** S1 via the InfluxQL verbatim passthrough: the WHERE time range lives
    * in the query STRING (served by the emulated server untouched), not in
    * scan options — same rows as src_influx_range, through the other API. */
  private val srcInfluxQL = QueryDef(
    "src_influx_query",
    (s, dir) => {
      val uri = seedInfluxEvents(s, dir)
      GraftSources.influxQL(s, uri,
        "SELECT * FROM events WHERE time >= 1704412800000ms AND time <= 1705276800000ms")
        .groupBy(col("tags").getItem("type").as("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("fields").getItem("value").cast("decimal(18,6)")).cast("double").as("value_sum"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
      FROM events
      WHERE epoch_ms(ts) >= 1704412800000 AND epoch_ms(ts) <= 1705276800000
      GROUP BY event_type ORDER BY event_type"""))

  private val srcMqtt = QueryDef(
    "src_mqtt_topics",
    (s, dir) => {
      val uri = s"hub:$dir/src_mqtt"
      seedOnce(uri) {
        val rows = t(s, dir, "documents").select("doc_id", "lang", "text").collect()
        rows.groupBy(_.getString(1)).toSeq.sortBy(_._1).foreach { case (lang, rs) =>
          MemHub.publish(uri, lang, rs.sortBy(_.getLong(0)).iterator.map(r =>
            ("", Map.empty[String, String], 0L, r.getString(2).getBytes("UTF-8"))))
        }
      }
      GraftSources.mqttBatch(s, uri, Seq("de", "en", "es", "fr", "zh"))
        .select(col("topic"), decode(col("payload"), "UTF-8").as("text"))
        .groupBy(col("topic"))
        .agg(count(lit(1)).as("n"), sum(length(col("text"))).cast("long").as("chars"))
        .orderBy(col("topic"))
    },
    Some("""SELECT lang AS topic, COUNT(*) AS n, CAST(SUM(length(text)) AS BIGINT) AS chars
      FROM documents GROUP BY lang ORDER BY lang"""))

  /** S10 wildcard subscription (MqttSources.java:76/93 — "the topics may
    * include wildcards"): messages land on a nested per-language topic
    * tree; one `docs/+/text` filter subscribes to every language level,
    * and the `sensors/raw` sibling outside the filter must NOT match. */
  private val srcMqttWildcard = QueryDef(
    "src_mqtt_wildcard",
    (s, dir) => {
      val uri = s"hub:$dir/src_mqtt_wild"
      seedOnce(uri) {
        val rows = t(s, dir, "documents").select("doc_id", "lang", "text").collect()
        rows.groupBy(_.getString(1)).toSeq.sortBy(_._1).foreach { case (lang, rs) =>
          MemHub.publish(uri, s"docs/$lang/text", rs.sortBy(_.getLong(0)).iterator.map(r =>
            ("", Map.empty[String, String], 0L, r.getString(2).getBytes("UTF-8"))))
        }
        MemHub.publish(uri, "sensors/raw",
          Iterator(("", Map.empty[String, String], 0L, "noise".getBytes("UTF-8"))))
      }
      GraftSources.mqttBatch(s, uri, Seq("docs/+/text"))
        .select(col("topic"), decode(col("payload"), "UTF-8").as("text"))
        .groupBy(col("topic"))
        .agg(count(lit(1)).as("n"), sum(length(col("text"))).cast("long").as("chars"))
        .orderBy(col("topic"))
    },
    Some("""SELECT 'docs/' || lang || '/text' AS topic, COUNT(*) AS n,
        CAST(SUM(length(text)) AS BIGINT) AS chars
      FROM documents GROUP BY lang ORDER BY topic"""))

  private val srcPulsar = QueryDef(
    "src_pulsar_reader",
    (s, dir) => {
      val uri = s"hub:$dir/src_pulsar"
      seedOnce(uri) {
        val rows = t(s, dir, "documents").select("doc_id", "text", "source").collect()
        MemHub.publish(uri, "docs", rows.sortBy(_.getLong(0)).iterator.map { r =>
          (r.getLong(0).toString, Map("src" -> r.getString(2)), r.getLong(0),
            r.getString(1).getBytes("UTF-8"))
        })
      }
      GraftSources.pulsarReaderBatch(s, uri, "docs")
        .select(col("key").cast("long").as("doc_id"),
          token_count(decode(col("value"), "UTF-8")).as("n_tokens"),
          col("properties").getItem("src").as("src"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
        source AS src
      FROM documents ORDER BY doc_id"""))

  /** S11/S12 typed messages — the Pulsar `Schema<M>` analog
    * (PulsarSources.java:84-92): one topic carries INT64 payloads in
    * Pulsar's big-endian primitive encoding, decoded AT THE SCAN to a
    * long `value`; a second carries Schema.JSON structs typed by DDL.
    * Joining them proves both decoders end-to-end against the orders
    * table. */
  private val srcPulsarTyped = QueryDef(
    "src_pulsar_typed",
    (s, dir) => {
      val uri = s"hub:$dir/src_pulsar_typed"
      seedOnce(uri) {
        val rows = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice").cast("double"))
          .orderBy(col("o_orderkey")).limit(500).collect()
        MemHub.publish(uri, "keys-int64", rows.iterator.map { r =>
          val bb = java.nio.ByteBuffer.allocate(8).putLong(r.getLong(0))
          ("", Map.empty[String, String], r.getLong(0), bb.array())
        })
        MemHub.publish(uri, "orders-json", rows.iterator.map { r =>
          ("", Map.empty[String, String], r.getLong(0),
            s"""{"ok":${r.getLong(0)},"total":${r.getDouble(1)}}""".getBytes("UTF-8"))
        })
      }
      val keys = GraftSources.pulsarReaderBatch(s, uri, "keys-int64",
        schema = Some("int64")).select(col("value").as("o_orderkey"))
      val docs = GraftSources.pulsarReaderBatch(s, uri, "orders-json",
          schema = Some("json:ok BIGINT, total DOUBLE"))
        .select(col("value.ok").as("o_orderkey"), col("value.total").as("o_totalprice"))
      keys.join(docs, Seq("o_orderkey")).orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
      FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 500) x
      ORDER BY o_orderkey"""))

  /** S11/S12 rich schema — the Pulsar `Schema.AVRO` analog (the
    * reference's `Schema<M>` supplier is fully pluggable,
    * PulsarSources.java:84-92): a topic carries binary named-record
    * payloads produced under a WRITER schema, and the consumer reads them
    * with a DIFFERENT reader schema — reordered fields, a writer-only
    * field skipped, a reader-only field resolved to null — through
    * [[graft.sources.topiclog.RecordCodec]]'s Avro-style name-matched
    * resolution, decoded at the scan into a typed struct. A row subset
    * also carries a null field through the wire format. */
  private val srcPulsarRecord = QueryDef(
    "src_pulsar_record",
    (s, dir) => {
      val uri = s"hub:$dir/src_pulsar_record"
      val writer = StructType.fromDDL(
        "ok BIGINT, total DOUBLE, comment STRING, legacy INT")
      seedOnce(uri) {
        val rows = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice").cast("double"))
          .orderBy(col("o_orderkey")).limit(500).collect()
        MemHub.publish(uri, "orders-rec", rows.iterator.map { r =>
          val ok = r.getLong(0)
          val total: Any = if (ok % 7 == 0) null else r.getDouble(1)
          ("", Map.empty[String, String], ok,
            graft.sources.topiclog.RecordCodec.encode(
              Seq(ok, total, s"order $ok", 1), writer))
        })
      }
      GraftSources.pulsarReaderBatch(s, uri, "orders-rec",
          schema = Some("record:total DOUBLE, ok BIGINT, priority STRING" +
            "@writer:ok BIGINT, total DOUBLE, comment STRING, legacy INT"))
        .select(col("value.ok").as("ok"), col("value.total").as("total"),
          col("value.priority").as("priority"))
        .orderBy(col("ok"))
    },
    Some("""SELECT o_orderkey AS ok,
        CASE WHEN o_orderkey % 7 = 0 THEN NULL
             ELSE CAST(o_totalprice AS DOUBLE) END AS total,
        CAST(NULL AS VARCHAR) AS priority
      FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 500) x
      ORDER BY ok"""))

  /** S11 — Pulsar shared-subscription consumer (PulsarConsumerBuilder.java:125-221):
    * two consumers on ONE subscription each own a share of the topic's
    * partitions; the union of their epoch-committed reads must equal the
    * published contents (acks land after commit — proven by StreamingSpec's
    * ack-lag test; proven here value-level by the DuckDB oracle). */
  private val srcPulsarConsumer = QueryDef(
    "src_pulsar_consumer",
    (s, dir) => {
      val uri = s"hub:$dir/src_pulsar_consumer"
      seedOnce(uri) {
        val rows = t(s, dir, "documents").select("doc_id", "text").collect()
        rows.groupBy(_.getLong(0) % 2).toSeq.sortBy(_._1).foreach { case (p, rs) =>
          MemHub.publish(uri, s"docs-p$p", rs.sortBy(_.getLong(0)).iterator.map { r =>
            (r.getLong(0).toString, Map.empty[String, String], r.getLong(0),
              r.getString(1).getBytes("UTF-8"))
          })
        }
        // one consumer per owned partition share, same shared subscription;
        // each drains via the real micro-batch path (epoch commit → ack)
        Seq(0L, 1L).foreach { p =>
          val q = GraftSources.pulsarConsumer(s, uri, Seq(s"docs-p$p"), "shared")
            .select(col("key"), decode(col("value"), "UTF-8").as("value"))
            .writeStream
            .option("checkpointLocation",
              java.nio.file.Files.createTempDirectory("graft-pc").toString)
            .foreachBatch { (b: DataFrame, _: Long) =>
              GraftSinks.redisHash(b, uri, "consumed")
            }
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
      }
      GraftSources.redisHash(s, uri, "consumed")
        .select(col("key").cast("long").as("doc_id"), col("value").as("text"))
        .orderBy(col("doc_id"))
    },
    Some("SELECT doc_id, text FROM documents ORDER BY doc_id"))

  private def seedHttpParts(s: SparkSession, dir: String): String = {
    val uri = s"hub:$dir/src_http"
    seedOnce(uri) {
      val rows = t(s, dir, "part").select("p_partkey", "p_name").collect()
      MemHub.publish(uri, "http", rows.sortBy(_.getLong(0)).iterator.map { r =>
        ("", Map.empty[String, String], 0L,
          s"""{"id":${r.getLong(0)},"name":"${esc(r.getString(1))}"}""".getBytes("UTF-8"))
      })
    }
    uri
  }

  private val srcHttp = QueryDef(
    "src_http_listener",
    (s, dir) => {
      val uri = seedHttpParts(s, dir)
      val beanSchema = StructType(Seq(
        StructField("id", LongType), StructField("name", StringType)))
      GraftSources.httpListenerBatch(s, uri)
        .select(from_json(col("payload"), beanSchema).as("bean"))
        .select(col("bean.id").as("id"), upper(col("bean.name")).as("name_u"))
        .orderBy(col("id"))
    },
    Some("SELECT p_partkey AS id, upper(p_name) AS name_u FROM part ORDER BY id"))

  /** S13 typed-bean path (missing #3 in VERDICT r6): the same listener
    * payloads decoded through [[GraftSources.httpListenerBatchAs]] — the
    * product-encoder analog of the reference's
    * `HttpListenerSourceBuilder.type(Class<T>)` POJO mapping — into
    * `Dataset[HttpPartBean]`, then aggregated declaratively. */
  private val srcHttpTyped = QueryDef(
    "src_http_typed",
    (s, dir) => {
      val uri = seedHttpParts(s, dir)
      GraftSources.httpListenerBatchAs[HttpPartBean](s, uri)(
          org.apache.spark.sql.Encoders.product[HttpPartBean])
        .select(col("id"), length(col("name")).as("name_len"))
        .orderBy(col("id"))
    },
    Some("""SELECT p_partkey AS id, CAST(length(p_name) AS INTEGER) AS name_len
      FROM part ORDER BY id"""))

  private val srcTwitter = QueryDef(
    "src_twitter_stream",
    (s, dir) => {
      val uri = s"hub:$dir/src_twitter"
      seedOnce(uri) {
        val rows = t(s, dir, "documents").select("doc_id", "text").collect()
        MemHub.publish(uri, "tweets", rows.sortBy(_.getLong(0)).iterator.map { r =>
          val ts = 1704067200000L + r.getLong(0)
          ("", Map.empty[String, String], ts,
            s"""{"id":${r.getLong(0)},"text":"${esc(r.getString(1))}","timestamp_ms":"$ts"}"""
              .getBytes("UTF-8"))
        })
      }
      GraftSources.twitterStreamBatch(s, uri)
        .select(get_json_object(col("json"), "$.id").cast("long").as("id"),
          col("timestamp_ms").as("ts_ms"),
          length(get_json_object(col("json"), "$.text")).as("tlen"))
        .orderBy(col("id"))
    },
    Some("""SELECT doc_id AS id, 1704067200000 + doc_id AS ts_ms,
        CAST(length(text) AS INTEGER) AS tlen
      FROM documents ORDER BY id"""))

  /** S14 endpoint generality (missing #4 in VERDICT r6): the reference
    * source takes ANY `StreamingEndpoint` (TwitterSources.java:85-110);
    * here the same seeded stream is consumed through the `sample` endpoint
    * (deterministic 1 % slice) and the `filter` endpoint (track-term
    * keyword match), both applied broker-side — a union the DuckDB oracle
    * reproduces from the documents table. */
  private val srcTwitterEndpoints = QueryDef(
    "src_twitter_endpoints",
    (s, dir) => {
      val uri = s"hub:$dir/src_twitter"
      // reuse src_twitter_stream's seeding (same uri/topic, seedOnce-keyed;
      // seeding runs eagerly inside the builder)
      srcTwitter.fn(s, dir)
      val sample = GraftSources.twitterStreamBatch(s, uri, endpoint = "sample")
        .select(get_json_object(col("json"), "$.id").cast("long").as("id"),
          lit("sample").as("endpoint"))
      val tracked = GraftSources.twitterStreamBatch(s, uri,
          endpoint = "filter", track = Seq("vector", "quantile"))
        .select(get_json_object(col("json"), "$.id").cast("long").as("id"),
          lit("filter").as("endpoint"))
      sample.unionByName(tracked).orderBy(col("endpoint"), col("id"))
    },
    Some("""SELECT id, endpoint FROM (
        SELECT doc_id AS id, 'sample' AS endpoint FROM documents
          WHERE (1704067200000 + doc_id) % 100 = 0
        UNION ALL
        SELECT doc_id AS id, 'filter' AS endpoint FROM documents
          WHERE contains(lower(text), 'vector') OR contains(lower(text), 'quantile')
      ) x ORDER BY endpoint, id"""))

  private val srcTwitterSearch = QueryDef(
    "src_twitter_search",
    (s, dir) => {
      val uri = s"hub:$dir/src_twsearch"
      seedOnce(uri) {
        // the "search API" side: server-filtered result pages for a query
        val rows = t(s, dir, "documents").select("doc_id", "text").collect()
          .filter(_.getString(1).contains("query"))
        MemHub.publish(uri, "search/query", rows.sortBy(_.getLong(0)).iterator.map { r =>
          ("", Map.empty[String, String], r.getLong(0),
            s"""{"id":${r.getLong(0)}}""".getBytes("UTF-8"))
        })
      }
      GraftSources.twitterSearch(s, uri, "query")
        .select(get_json_object(col("json"), "$.id").cast("long").as("id"))
        .orderBy(col("id"))
    },
    Some("""SELECT doc_id AS id FROM documents
      WHERE contains(text, 'query') ORDER BY id"""))

  private val srcConnect = QueryDef(
    "src_kafka_connect",
    (s, dir) => {
      val uri = s"hub:$dir/src_connect"
      seedOnce(uri) {
        GraftSources.kafkaConnect(s, uri, classOf[RangeSourceTask].getName,
          Map("n" -> "1000", "partitions" -> "2"))
      }
      s.read.format("graft-topic").option("profile", "connect").option("uri", uri)
        .option("topics", "p0,p1").load()
        .select(get_json_object(col("valueJson"), "$.i").cast("long").as("i"))
        .agg(count(lit(1)).as("n"), sum(col("i")).as("i_sum"))
    },
    Some("SELECT COUNT(*) AS n, CAST(SUM(i) AS BIGINT) AS i_sum FROM range(0, 1000) t(i)"))

  /** S9 with the REAL Connect API: a genuine `SourceConnector` hosted by
    * class name (reflection, the reference's loading path), values carried
    * with their Connect `Schema` and decoded to typed Spark columns via the
    * Schema→StructType converter. The DISTINCT guards exactly-once across
    * the crash/restore replay the spec exercises on the same hub. */
  private val srcConnectApi = QueryDef(
    "src_kafka_connect_api",
    (s, dir) => {
      val uri = s"hub:$dir/src_connect_api"
      seedOnce(uri) {
        graft.sources.connect.KafkaConnectHost.run(uri,
          Map("connector.class" -> classOf[graft.sources.connect.SeqSourceConnector].getName,
            "name" -> "seq", "n" -> "1000"))
      }
      graft.sources.connect.KafkaConnectHost.readTyped(s, uri, Seq("p[src=seq]"),
          graft.sources.connect.ConnectSchemas.toStructType(
            graft.sources.connect.SeqSourceTask.ValueSchema))
        .distinct()
        .orderBy(col("i"))
    },
    Some("""SELECT i, i * i AS sq, 'v' || CAST(i % 7 AS VARCHAR) AS lab
      FROM range(0, 1000) t(i) ORDER BY i"""))

  // -------------------------------------------------------------------- sinks

  private val snkRedisHash = QueryDef(
    "snk_redis_hash",
    (s, dir) => {
      val uri = s"hub:$dir/snk_redis_hash"
      seedOnce(uri) {
        GraftSinks.redisHash(
          t(s, dir, "customer").select(col("c_custkey").cast("string").as("key"),
            col("c_name").as("value")),
          uri, "cust")
      }
      GraftSources.redisHash(s, uri, "cust")
        .select(col("key").cast("long").as("c_custkey"), col("value").as("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("SELECT c_custkey, c_name FROM customer ORDER BY c_custkey"))

  private val snkRedisHashDsv2 = QueryDef(
    "snk_redis_hash_dsv2",
    (s, dir) => {
      val uri = s"hub:$dir/snk_redis_hash_dsv2"
      seedOnce(uri) {
        // full DSv2 write path: staging writers + driver-side promote commit
        t(s, dir, "supplier")
          .select(col("s_suppkey").cast("string").as("key"), col("s_name").as("value"))
          .write.format("graft-redis-hash").option("uri", uri).option("hash", "sup")
          .mode("append").save()
      }
      GraftSources.redisHash(s, uri, "sup")
        .select(col("key").cast("long").as("s_suppkey"), col("value").as("s_name"))
        .orderBy(col("s_suppkey"))
    },
    Some("SELECT s_suppkey, s_name FROM supplier ORDER BY s_suppkey"))

  private val snkRedisZsetDsv2 = QueryDef(
    "snk_redis_zset_dsv2",
    (s, dir) => {
      val uri = s"hub:$dir/snk_redis_zset_dsv2"
      seedOnce(uri) {
        // full DSv2 write path: staged ZADDs + driver-side promote commit
        t(s, dir, "supplier")
          .select(col("s_acctbal").as("score"), col("s_suppkey").cast("string").as("value"))
          .write.format("graft-redis-zset").option("uri", uri).option("key", "bal")
          .mode("append").save()
      }
      GraftSources.redisSortedSet(s, uri, "bal")
        .select(col("value").cast("long").as("s_suppkey"), col("score").as("s_acctbal"))
        .orderBy(col("s_suppkey"))
    },
    Some("SELECT s_suppkey, s_acctbal FROM supplier ORDER BY s_suppkey"))

  private val snkRedisZset = QueryDef(
    "snk_redis_zset",
    (s, dir) => {
      val uri = s"hub:$dir/snk_redis_zset"
      seedOnce(uri) {
        GraftSinks.redisZSet(
          t(s, dir, "supplier").select(col("s_suppkey").cast("string").as("value"),
            col("s_acctbal").as("score")),
          uri, "bal")
      }
      GraftSources.redisSortedSet(s, uri, "bal")
        .select(col("value").cast("long").as("s_suppkey"), col("score").as("s_acctbal"))
        .orderBy(col("s_suppkey"))
    },
    Some("SELECT s_suppkey, s_acctbal FROM supplier ORDER BY s_suppkey"))

  /** K5 — Redis stream XADD sink (RedisSinks.java:269-349): write every event
    * as a stream entry keyed by event type, then prove the round-trip via the
    * S8 stream scan — value-level against the parquet oracle. */
  private val snkRedisXadd = QueryDef(
    "snk_redis_xadd",
    (s, dir) => {
      val uri = s"hub:$dir/snk_redis_xadd"
      seedOnce(uri) {
        GraftSinks.redisXAdd(
          t(s, dir, "events")
            .select(col("event_type").as("stream"),
              map(lit("event_id"), col("event_id").cast("string"),
                lit("user_id"), col("user_id").cast("string")).as("body")),
          uri)
      }
      GraftSources.redisStreamBatch(s, uri, Seq("click", "error", "purchase", "signup", "view"))
        .select(col("stream"),
          col("body").getItem("event_id").cast("long").as("event_id"),
          col("body").getItem("user_id").cast("long").as("user_id"))
        .orderBy(col("stream"), col("event_id"))
    },
    Some("""SELECT event_type AS stream, event_id, user_id
      FROM events ORDER BY stream, event_id"""))

  private val snkMongoInsert = QueryDef(
    "snk_mongo_insert",
    (s, dir) => {
      val uri = s"hub:$dir/snk_mongo"
      seedOnce(uri) {
        GraftSinks.mongoInsertMany(
          t(s, dir, "part").select(concat(lit("{\"id\":"), col("p_partkey"),
            lit(",\"rp\":"), col("p_retailprice"), lit("}")).as("doc")),
          uri, ordered = true, batchSize = 256)
      }
      GraftSources.mongoBatch(s, uri, StructType(Seq(
        StructField("id", LongType), StructField("rp", DoubleType))))
        .agg(count(lit(1)).as("n"),
          sum(col("rp").cast("decimal(18,2)")).cast("double").as("rp_sum"))
    },
    Some("""SELECT COUNT(*) AS n,
      CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS rp_sum FROM part"""))

  private val snkPulsar = QueryDef(
    "snk_pulsar_produce",
    (s, dir) => {
      val uri = s"hub:$dir/snk_pulsar"
      seedOnce(uri) {
        GraftSinks.pulsarProduce(
          t(s, dir, "nation").select(col("n_nationkey").cast("string").as("key"),
            encode(col("n_name"), "UTF-8").as("value"),
            map(lit("rk"), col("n_regionkey").cast("string")).as("properties"),
            col("n_nationkey").cast("long").as("eventTimeMs")),
          uri, "nations")
      }
      GraftSources.pulsarReaderBatch(s, uri, "nations")
        .select(col("key").cast("int").as("n_nationkey"),
          decode(col("value"), "UTF-8").as("n_name"),
          col("properties").getItem("rk").cast("int").as("n_regionkey"))
        .orderBy(col("n_nationkey"))
    },
    Some("SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"))

  private val snkInflux = QueryDef(
    "snk_influx_points",
    (s, dir) => {
      val uri = s"hub:$dir/snk_influx"
      seedOnce(uri) {
        GraftSinks.influxWrite(
          t(s, dir, "events").select(unix_millis(col("ts")).as("timeMs"),
            map(lit("type"), col("event_type")).as("tags"),
            map(lit("value"), col("value")).as("fields")),
          uri, "events")
      }
      GraftSources.influx(s, uri, "events")
        .groupBy(unix_millis(date_trunc("hour", col("time"))).as("hour_ms"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("hour_ms"))
    },
    Some("""SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, COUNT(*) AS n
      FROM events GROUP BY 1 ORDER BY 1"""))

  private val snkMqtt = QueryDef(
    "snk_mqtt_publish",
    (s, dir) => {
      val uri = s"hub:$dir/snk_mqtt"
      seedOnce(uri) {
        GraftSinks.mqttPublish(
          t(s, dir, "region").select(lit("regions").as("topic"),
            encode(col("r_name"), "UTF-8").as("payload")),
          uri, maxAttempts = 3)
      }
      GraftSources.mqttBatch(s, uri, Seq("regions"))
        .select(decode(col("payload"), "UTF-8").as("r_name"))
        .orderBy(col("r_name"))
    },
    Some("SELECT r_name FROM region ORDER BY r_name"))

  private val snkWs = QueryDef(
    "snk_ws_broadcast",
    (s, dir) => {
      val uri = s"hub:$dir/snk_ws"
      seedOnce(uri) {
        GraftSinks.wsBroadcast(
          t(s, dir, "orders").select(col("o_orderkey").cast("string").as("payload"))
            .orderBy(col("o_orderkey").cast("long")),
          uri, accumulateLimit = 100)
      }
      s.read.format("graft-topic").option("profile", "http").option("uri", uri)
        .option("topics", "ws").load()
        .select(col("payload").cast("long").as("o_orderkey"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey FROM (
        SELECT o_orderkey FROM orders ORDER BY o_orderkey DESC LIMIT 100) x
      ORDER BY o_orderkey"""))

  /** JDBC exactly-once sink — the xa-test analog (reference
    * `xa-test/.../JdbcXaTest.java:53-99` proves prepared-transaction
    * survival; here the staged-epoch + ledger construction provides the
    * same guarantee, see [[graft.sinks.JdbcSink]]). Supplier rows land
    * through two staged+promoted epochs against embedded Derby (a REAL
    * transactional JDBC engine — nothing mocked), with epoch 1 first
    * crash-staged then recovered, epoch 0 replayed (ledger-skipped), and a
    * doomed epoch staged then aborted. Any duplicate, loss, or abort leak
    * breaks the count/sum/name aggregates the DuckDB oracle pins. Read
    * back through Spark's own JDBC source. */
  private val snkJdbc = QueryDef(
    "snk_jdbc",
    (s, dir) => {
      import graft.sinks.JdbcSink
      val dbPath = s"${System.getProperty("java.io.tmpdir")}/graft-derby/" +
        dir.replaceAll("[^a-zA-Z0-9]", "_") + "/snk_jdbc"
      val url = s"jdbc:derby:$dbPath;create=true"
      seedOnce(url) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(new java.io.File(dbPath))
        val sup = t(s, dir, "supplier").select(
          col("s_suppkey"), col("s_name"), col("s_acctbal"))
        val e0 = sup.filter(col("s_suppkey") % 2 === 0)
        val e1 = sup.filter(col("s_suppkey") % 2 === 1)
        JdbcSink.writeEpochExactlyOnce(e0, url, "sup", "snk_jdbc", 0L)
        // crash before promote on epoch 1, then the restarted attempt
        // re-stages (idempotent) and promotes
        JdbcSink.stageEpoch(e1, url, "sup", 1L)
        JdbcSink.writeEpochExactlyOnce(e1, url, "sup", "snk_jdbc", 1L)
        // recovery replay of epoch 0 — ledger-skipped, no duplicates
        JdbcSink.writeEpochExactlyOnce(e0, url, "sup", "snk_jdbc", 0L)
        // doomed epoch: staged, then rolled back — must not leak
        JdbcSink.stageEpoch(
          e0.withColumn("s_acctbal", col("s_acctbal") + 1e6), url, "sup", 2L)
        JdbcSink.abortEpoch(url, "sup", 2L)
      }
      JdbcSink.readTable(s, url, "sup").agg(
        count(lit(1)).as("n"),
        sum(col("s_acctbal").cast("decimal(18,2)")).cast("double").as("bal_sum"),
        min(col("s_name")).as("name_min"),
        max(col("s_name")).as("name_max"))
    },
    Some("""SELECT COUNT(*) AS n,
      CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum,
      MIN(s_name) AS name_min, MAX(s_name) AS name_max FROM supplier"""))

  /** JMS exactly-once queue sink — the JmsXaTest analog (reference
    * `xa-test/.../JmsXaTest.java:52-96`; see [[graft.sinks.JmsSink]]).
    * Nation rows land through two staged+committed epochs, with epoch 1
    * crash-staged then recovered, epoch 0 replayed (txn-registry no-op),
    * and a doomed epoch staged then rolled back unseen. The queue read-back
    * pins exact content AND no duplicates/losses via the DuckDB oracle. */
  private val snkJms = QueryDef(
    "snk_jms",
    (s, dir) => {
      import graft.sinks.JmsSink
      val uri = s"hub:$dir/snk_jms"
      seedOnce(uri) {
        val nat = t(s, dir, "nation").select(
          concat(col("n_nationkey").cast("string"), lit("|"), col("n_name")).as("payload"),
          col("n_nationkey"))
        val e0 = nat.filter(col("n_nationkey") % 2 === 0).select("payload")
        val e1 = nat.filter(col("n_nationkey") % 2 === 1).select("payload")
        JmsSink.writeEpochExactlyOnce(e0, uri, "nations", "snk_jms", 0L)
        // crash before commit on epoch 1, then the restarted attempt
        // re-stages (replace, not append) and commits
        JmsSink.stageEpoch(e1, uri, "nations", 1L)
        JmsSink.writeEpochExactlyOnce(e1, uri, "nations", "snk_jms", 1L)
        // recovery replay of epoch 0 — txn registry makes it a no-op
        JmsSink.writeEpochExactlyOnce(e0, uri, "nations", "snk_jms", 0L)
        // doomed epoch: staged, then rolled back — consumers never see it
        JmsSink.stageEpoch(e0.withColumn("payload", concat(col("payload"), lit("-DOOMED"))),
          uri, "nations", 2L)
        JmsSink.abortEpoch(uri, "nations", 2L)
      }
      GraftSources.pulsarReaderBatch(s, uri, "nations")
        .select(decode(col("value"), "UTF-8").as("p"))
        .select(split(col("p"), "\\|").getItem(0).cast("int").as("n_nationkey"),
          split(col("p"), "\\|").getItem(1).as("n_name"))
        .orderBy(col("n_nationkey"))
    },
    Some("SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey"))

  /** JDBC source with predicate pushdown: the warehouse table written by
    * the exactly-once sink reads back through Spark's JDBC source with
    * the filter pushed to the database (the plan's scan carries the
    * predicate — asserted in JdbcSinkSpec), closing the JDBC loop:
    * curated data lands transactionally and serves queries. */
  private val srcJdbc = QueryDef(
    "src_jdbc_pushdown",
    (s, dir) => {
      import graft.sinks.JdbcSink
      val dbPath = s"${System.getProperty("java.io.tmpdir")}/graft-derby/" +
        dir.replaceAll("[^a-zA-Z0-9]", "_") + "/src_jdbc"
      val url = s"jdbc:derby:$dbPath;create=true"
      seedOnce(url) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(new java.io.File(dbPath))
        JdbcSink.writeEpochExactlyOnce(
          t(s, dir, "customer").select(
            col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment")),
          url, "cust", "src_jdbc", 0L)
      }
      JdbcSink.readTable(s, url, "cust")
        .filter(col("c_acctbal") > 1000.0 && col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").cast("long").as("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_acctbal FROM customer
      WHERE c_acctbal > 1000.0 AND c_mktsegment = 'BUILDING'
      ORDER BY c_custkey"""))

  val all: Seq[QueryDef] = Seq(
    srcRedisHash, srcRedisBinary, srcRedisZset, srcRedisStream, srcMongoFind, srcMongoTopN,
    srcMongoCdc, srcInflux, srcInfluxQL, srcMqtt, srcMqttWildcard, srcPulsar, srcPulsarTyped,
    srcPulsarRecord, srcPulsarConsumer, srcHttp, srcHttpTyped,
    srcTwitter, srcTwitterEndpoints, srcTwitterSearch, srcConnect, srcConnectApi,
    snkRedisHash, snkRedisHashDsv2, snkRedisZset, snkRedisZsetDsv2, snkRedisXadd,
    snkMongoInsert, snkPulsar, snkInflux, snkMqtt, snkWs, snkJdbc, snkJms, srcJdbc)
}

/** The typed HTTP bean (the reference's POJO class analog,
  * HttpListenerSourceBuilder.java:241-246). */
final case class HttpPartBean(id: Long, name: String)

/** Deterministic stand-in for a hosted third-party connector task (the
  * reference tests use a random-int connector,
  * `KafkaConnectRandomIntIntegrationTest.java:40-43`). Emits {"i": k} for
  * k in [0, n), round-robined over `partitions` source partitions. */
class RangeSourceTask extends SourceTaskLike {
  private var n = 0L
  private var parts = 1
  private var emitted = 0L
  override def start(props: Map[String, String]): Unit = {
    n = props("n").toLong
    parts = props.getOrElse("partitions", "1").toInt
  }
  override def poll(): Seq[(String, Long, String)] = {
    if (emitted >= n) return Seq.empty
    val batch = (emitted until math.min(emitted + 100, n)).map { i =>
      (s"p${i % parts}", i, s"""{"i":$i}""")
    }
    emitted += batch.size
    batch
  }
  override def stop(): Unit = ()
}
