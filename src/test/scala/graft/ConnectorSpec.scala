package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.sinks.GraftSinks
import graft.sources.GraftSources
import graft.sources.hub.MemHub

case class Cpu(time: java.sql.Timestamp, host: String, load: Double)

/** Protocol-matrix behaviors from the reference's connector tests
  * (SURVEY.md §5): malformed-payload rejection, accumulate-buffer variants,
  * explicit range options, raw document passthrough, POJO mapping. */
class ConnectorSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  test("http listener: malformed JSON rejected, good payloads mapped (HttpListenerSourceTest bad-JSON→400 analog)") {
    val uri = "hub:test/http-bad"
    MemHub.publish(uri, "http", Iterator(
      ("", Map.empty[String, String], 0L, """{"id":1,"name":"ok"}""".getBytes("UTF-8")),
      ("", Map.empty[String, String], 0L, """not-json at all""".getBytes("UTF-8")),
      ("", Map.empty[String, String], 0L, """{"id":2,"name":"also ok"}""".getBytes("UTF-8"))))
    val schema = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val beans = GraftSources.httpListenerBatch(spark, uri)
      .select(from_json(col("payload"), schema).as("b"))
    // the bad payload parses to an all-null struct — the 400-reject analog
    assert(beans.filter(col("b.id").isNull).count() == 1)
    assert(beans.filter(col("b.id").isNotNull).select("b.id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("ws broadcast accumulate matrix: cap smaller/larger than the stream (HttpListenerSinkTest.java:103-195 analog)") {
    def run(uri: String, cap: Int): Seq[Long] = {
      GraftSinks.wsBroadcast(
        spark.range(1, 51).select(col("id").cast("string").as("payload")).orderBy(col("id")),
        uri, accumulateLimit = cap)
      MemHub.poll(uri, "ws", -1).map(m => new String(m.payload, "UTF-8").toLong)
    }
    // cap < items → drop-oldest keeps the newest 10
    assert(run("hub:test/ws-small", 10) == (41L to 50L))
    // cap >= items → everything retained
    assert(run("hub:test/ws-big", 1000) == (1L to 50L))
  }

  test("zset explicit from/to options (reference S7 API shape) compose with pushdown") {
    val uri = "hub:test/zset-opts"
    MemHub.zadd(s"$uri/z", (0 until 100).iterator.map(i => s"m$i" -> i.toDouble))
    // options narrow to [20, 80]; Catalyst filter narrows further to [50, 80]
    val df = GraftSources.redisSortedSet(spark, uri, "z", from = Some(20.0), to = Some(80.0))
      .filter(col("score") >= 50.0)
    assert(df.count() == 31)
    assert(df.agg(min("score"), max("score")).head() ==
      org.apache.spark.sql.Row(50.0, 80.0))
  }

  test("mongo raw passthrough without user schema (dynamic-schema fallback)") {
    val uri = "hub:test/mongo-raw"
    MemHub.insertMany(uri, Iterator("""{"a":1}""", """{"a":2,"b":"x"}"""))
    val df = spark.read.format("graft-mongo").option("uri", uri).load()
    assert(df.columns.toSeq == Seq("doc"))
    assert(df.count() == 2)
  }

  test("influx POJO path: flatten + as[T] (InfluxDbSources POJO mapping analog)") {
    val uri = "hub:test/influx-pojo"
    MemHub.writePoints(uri, "cpu", Iterator(
      (1000L, Map("host" -> "h1"), Map("load" -> 0.5)),
      (2000L, Map("host" -> "h2"), Map("load" -> 0.9))))
    val ds = GraftSources.influxFlat(
      GraftSources.influx(spark, uri, "cpu"), Seq("host"), Seq("load"))
      .as[Cpu]
    val rows = ds.collect().sortBy(_.host)
    assert(rows.map(_.host).toSeq == Seq("h1", "h2"))
    assert(rows.map(_.load).toSeq == Seq(0.5, 0.9))
    assert(rows.head.time.getTime == 1000L)
  }

  test("real Connect API: crash mid-stream, offset restore resumes exactly-once") {
    import graft.sources.connect.{ConnectSchemas, KafkaConnectHost, SeqSourceConnector, SeqSourceTask}
    val uri = "hub:test/connect-api-restore"
    val props = Map(
      "connector.class" -> classOf[SeqSourceConnector].getName,
      "name" -> "seq", "n" -> "1000")
    // crash after 400 records — the host returns its snapshot (the
    // reference's createSnapshotFn: sourcePartition -> sourceOffset)
    val (_, _, snap) = KafkaConnectHost.run(uri, props, maxRecords = 400)
    assert(snap.offsets.nonEmpty)
    assert(snap.offsets(Map("src" -> "seq"))("pos") == 399L)
    // restart with the snapshot restored: the task consults the
    // OffsetStorageReader and resumes AFTER pos=399 — no replay, no gap
    val (parts, vt, snap2) = KafkaConnectHost.run(uri, props, restored = snap.offsets)
    assert(snap2.offsets(Map("src" -> "seq"))("pos") == 999L)
    val df = KafkaConnectHost.readTyped(spark, uri, parts,
      ConnectSchemas.toStructType(SeqSourceTask.ValueSchema))
    // typed columns straight from the connector's Connect Schema
    // (from_json forces nullable, so compare names and types)
    assert(df.schema.map(f => (f.name, f.dataType)) ==
      Seq(("i", LongType), ("sq", LongType), ("lab", StringType)))
    // exactly-once: 1000 distinct rows, sums match the closed form
    val agg = df.agg(count(lit(1)), countDistinct(col("i")), sum(col("i"))).head()
    assert(agg.getLong(0) == 1000L && agg.getLong(1) == 1000L)
    assert(agg.getLong(2) == 999L * 1000L / 2)
  }

  test("Connect Schema -> StructType: full type matrix round-trips typed") {
    import org.apache.kafka.connect.data.{Schema => KSchema, SchemaBuilder, Struct}
    import graft.sources.connect.ConnectSchemas
    val inner = SchemaBuilder.struct().field("s", KSchema.STRING_SCHEMA).build()
    val schema = SchemaBuilder.struct()
      .field("i8", KSchema.INT8_SCHEMA)
      .field("i16", KSchema.INT16_SCHEMA)
      .field("i32", KSchema.INT32_SCHEMA)
      .field("i64", KSchema.INT64_SCHEMA)
      .field("f32", KSchema.FLOAT32_SCHEMA)
      .field("f64", KSchema.FLOAT64_SCHEMA)
      .field("b", KSchema.BOOLEAN_SCHEMA)
      .field("str", KSchema.OPTIONAL_STRING_SCHEMA)
      .field("bin", KSchema.BYTES_SCHEMA)
      .field("arr", SchemaBuilder.array(KSchema.INT32_SCHEMA).build())
      .field("m", SchemaBuilder.map(KSchema.STRING_SCHEMA, KSchema.INT64_SCHEMA).build())
      .field("nest", inner)
      .build()
    val st = ConnectSchemas.toStructType(schema)
    assert(st("i8").dataType == ByteType && st("i16").dataType == ShortType)
    assert(st("i32").dataType == IntegerType && st("i64").dataType == LongType)
    assert(st("f32").dataType == FloatType && st("f64").dataType == DoubleType)
    assert(st("b").dataType == BooleanType && st("bin").dataType == BinaryType)
    assert(st("str").nullable && !st("i8").nullable)
    assert(st("arr").dataType == ArrayType(IntegerType, containsNull = false))
    assert(st("m").dataType == MapType(StringType, LongType, valueContainsNull = false))
    assert(st("nest").dataType.isInstanceOf[StructType])
    val v = new Struct(schema)
      .put("i8", java.lang.Byte.valueOf(7.toByte))
      .put("i16", java.lang.Short.valueOf(300.toShort))
      .put("i32", java.lang.Integer.valueOf(70000))
      .put("i64", java.lang.Long.valueOf(1L << 40))
      .put("f32", java.lang.Float.valueOf(1.5f))
      .put("f64", java.lang.Double.valueOf(2.25))
      .put("b", java.lang.Boolean.TRUE)
      .put("str", "he said \"hi\"\n")
      .put("bin", Array[Byte](1, 2, 3))
      .put("arr", java.util.Arrays.asList(1, 2, 3))
      .put("m", java.util.Collections.singletonMap("k", java.lang.Long.valueOf(9L)))
      .put("nest", new Struct(inner).put("s", "x"))
    val json = ConnectSchemas.toJson(schema, v)
    val row = spark.read.schema(st).json(Seq(json).toDS()).head()
    assert(row.getByte(0) == 7 && row.getShort(1) == 300 && row.getInt(2) == 70000)
    assert(row.getLong(3) == (1L << 40) && row.getFloat(4) == 1.5f && row.getDouble(5) == 2.25)
    assert(row.getBoolean(6) && row.getString(7) == "he said \"hi\"\n")
    assert(row.getAs[Array[Byte]](8).toSeq == Seq[Byte](1, 2, 3))
    assert(row.getSeq[Int](9) == Seq(1, 2, 3))
    assert(row.getMap[String, Long](10) == Map("k" -> 9L))
    assert(row.getStruct(11).getString(0) == "x")
  }

  test("pulsar Schema<M> analog: primitive codecs decode at the scan, typed") {
    import java.nio.ByteBuffer
    val uri = "hub:test/pulsar-typed-matrix"
    def pub(topic: String, payloads: Seq[Array[Byte]]): Unit =
      MemHub.publish(uri, topic, payloads.iterator.map(b =>
        ("", Map.empty[String, String], 0L, b)))
    pub("t-i32", Seq(ByteBuffer.allocate(4).putInt(-7).array()))
    pub("t-f", Seq(ByteBuffer.allocate(4).putFloat(1.5f).array()))
    pub("t-d", Seq(ByteBuffer.allocate(8).putDouble(2.25).array()))
    pub("t-b", Seq(Array[Byte](1), Array[Byte](0)))
    pub("t-s", Seq("héllo".getBytes("UTF-8")))
    def read(t: String, s: String) =
      GraftSources.pulsarReaderBatch(spark, uri, t, schema = Some(s)).select("value")
    assert(read("t-i32", "int32").schema.head.dataType == IntegerType)
    assert(read("t-i32", "int32").as[Int].head() == -7)
    assert(read("t-f", "float").as[Float].head() == 1.5f)
    assert(read("t-d", "double").as[Double].head() == 2.25)
    assert(read("t-b", "bool").as[Boolean].collect().toSeq == Seq(true, false))
    assert(read("t-s", "string").as[String].head() == "héllo")
    val e = intercept[Exception] { read("t-s", "utf16").collect() }
    assert(e.getMessage.contains("unknown pulsar schema"))
  }

  test("influxQuery passthrough rejects non-time predicates (real-server contract)") {
    val uri = "hub:test/influx-reject"
    MemHub.writePoints(uri, "cpu", Iterator(
      (1000L, Map("type" -> "a"), Map("load" -> 0.5)),
      (2000L, Map("type" -> "b"), Map("load" -> 0.9))))
    // pure time-range WHERE still works
    assert(MemHub.influxQuery(uri,
      "SELECT * FROM cpu WHERE time >= 1500ms AND time <= 3000ms").size == 1)
    // a non-time predicate must be rejected, never silently dropped
    // (dropping it would return EXTRA rows vs what a real server computes)
    val e = intercept[IllegalArgumentException] {
      MemHub.influxQuery(uri,
        "SELECT * FROM cpu WHERE type = 'a' AND time >= 500ms")
    }
    assert(e.getMessage.contains("non-time predicate"))
    intercept[IllegalArgumentException] {
      MemHub.influxQuery(uri, "SELECT * FROM cpu WHERE time >= 500ms OR time <= 100ms")
    }: Unit
  }

  test("DSv2 batch write: two-phase staging commit, no stage leakage") {
    val uri = "hub:test/dsv2-write"
    spark.range(0, 1000)
      .select(col("id").cast("string").as("key"), concat(lit("v"), col("id")).as("value"))
      .repartition(8)
      .write.format("graft-redis-hash").option("uri", uri).option("hash", "h")
      .mode("append").save()
    val got = MemHub.hashGetAll(s"$uri/h")
    assert(got.size == 1000 && got("42") == "v42")
  }

  test("DSv2 batch write abort: failed job leaves the target untouched, stages dropped") {
    // the XA prepared-transaction-survival check of the reference
    // (xa-test module), restated for the two-phase staged commit: a task
    // failure mid-write must neither corrupt committed data nor leak
    // staged state
    import spark.implicits._
    val uri = "hub:test/dsv2-abort"
    Seq(("k0", "v0")).toDF("key", "value")
      .write.format("graft-redis-hash").option("uri", uri).option("hash", "h")
      .mode("append").save()
    val failing = spark.range(0, 100, 1, 4)
      .select(col("id").cast("string").as("key"),
        when(col("id") === 57, raise_error(lit("induced task failure")))
          .otherwise(concat(lit("v"), col("id"))).as("value"))
    intercept[Exception] {
      failing.write.format("graft-redis-hash").option("uri", uri).option("hash", "h")
        .mode("append").save()
    }
    assert(MemHub.hashGetAll(s"$uri/h") === Map("k0" -> "v0"),
      "committed content must survive a failed write job unchanged")
    assert(MemHub.hashKeys(s"$uri/h.stage").isEmpty,
      "staged hashes must be dropped on abort")
  }

  test("DSv2 streaming write: epoch-idempotent commit (exactly-once sink)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val uri = "hub:test/dsv2-stream-write"
    val input = MemoryStream[Long](spark)
    val q = input.toDF()
      .select(col("value").cast("string").as("key"), lit("x").as("value"))
      .writeStream.format("graft-redis-hash")
      .option("uri", uri).option("hash", "h")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-w").toString)
      .outputMode("append").start()
    input.addData(1L to 500L: _*)
    q.processAllAvailable()
    input.addData(501L to 700L: _*)
    q.processAllAvailable()
    q.stop()
    val got = MemHub.hashGetAll(s"$uri/h")
    assert(got.size == 700, s"expected 700 keys, got ${got.size}")
  }

  test("DSv2 zset write: staged ZADD promote, batch and streaming epoch-idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val uri = "hub:test/dsv2-zset-write"
    spark.range(0, 200)
      .select(col("id").cast("double").as("score"), concat(lit("m"), col("id")).as("value"))
      .repartition(4)
      .write.format("graft-redis-zset").option("uri", uri).option("key", "z")
      .mode("append").save()
    val got = MemHub.zrangeByScore(s"$uri/z", 0, 199)
    assert(got.size == 200 && got.head == ("m0", 0.0))

    val suri = "hub:test/dsv2-zset-stream"
    val input = MemoryStream[Long](spark)
    val q = input.toDF()
      .select(col("value").cast("double").as("score"),
        concat(lit("m"), col("value")).as("value"))
      .writeStream.format("graft-redis-zset")
      .option("uri", suri).option("key", "z")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-zw").toString)
      .outputMode("append").start()
    input.addData(1L to 300L: _*)
    q.processAllAvailable()
    input.addData(301L to 400L: _*)
    q.processAllAvailable()
    q.stop()
    assert(MemHub.zrangeByScore(s"$suri/z", 0, 1e9).size == 400)
  }

  test("embedded HTTP listener: real POSTs land in the source; wrong method rejected") {
    import graft.sources.http.HttpEndpoint
    val uri = "hub:test/http-live"
    val (server, port) = HttpEndpoint.startListener(uri)
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      (1 to 5).foreach { i =>
        val resp = client.send(
          java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"http://127.0.0.1:$port/"))
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(s"""{"id":$i}"""))
            .build(),
          java.net.http.HttpResponse.BodyHandlers.discarding())
        assert(resp.statusCode() == 200)
      }
      val bad = client.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"http://127.0.0.1:$port/"))
          .GET().build(),
        java.net.http.HttpResponse.BodyHandlers.discarding())
      assert(bad.statusCode() == 405, "non-POST must be rejected")
      val ids = GraftSources.httpListenerBatch(spark, uri)
        .select(get_json_object(col("payload"), "$.id").cast("int").as("id"))
        .as[Int].collect().sorted.toSeq
      assert(ids == (1 to 5))
    } finally server.stop(0)
  }

  test("embedded SSE broadcast: sink buffer served as text/event-stream") {
    import graft.sources.http.HttpEndpoint
    val uri = "hub:test/sse-live"
    GraftSinks.wsBroadcast(
      spark.range(1, 6).select(col("id").cast("string").as("payload")).orderBy(col("id")),
      uri, accumulateLimit = 3)
    val (server, port) = HttpEndpoint.startBroadcast(uri)
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val resp = client.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"http://127.0.0.1:$port/events"))
          .GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200)
      assert(resp.headers().firstValue("Content-Type").orElse("") == "text/event-stream")
      // drop-oldest cap 3 → only 3,4,5 remain
      assert(resp.body() == "data: 3\n\ndata: 4\n\ndata: 5\n\n")
    } finally server.stop(0)
  }

  test("SSE sink address advertisement: clients discover the elected server by job id " +
      "(HttpListenerSinks.java:113-131 analog)") {
    import graft.sources.http.HttpEndpoint
    val uri = "hub:test/sse-advertise"
    val jobId = "job-sse-advertise-1"
    GraftSinks.wsBroadcast(
      spark.range(1, 4).select(col("id").cast("string").as("payload")).orderBy(col("id")),
      uri, accumulateLimit = 10)
    // ephemeral port: the CALLER never learns it — discovery is the point
    val (server, _) = HttpEndpoint.startBroadcast(uri, port = 0, jobId = Some(jobId))
    try {
      val addr = MemHub.sinkAddress(jobId)
      // the advertised host is the REACHABLE bind host (not a literal
      // 'localhost'): loopback here; advertiseHost overrides on a cluster
      assert(addr.matches("http://127\\.0\\.0\\.1:\\d+/events"),
        s"bad advertised address: $addr")
      val resp = java.net.http.HttpClient.newHttpClient().send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(addr)).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200)
      assert(resp.body() == "data: 1\n\ndata: 2\n\ndata: 3\n\n")
      // first advertisement wins (the reference reads ringbuffer slot 0):
      // a second server electing under the same job must not re-point clients
      MemHub.advertiseSinkAddress(jobId, "http://localhost:1/events")
      assert(MemHub.sinkAddress(jobId) == addr)
    } finally server.stop(0)
    // unknown job: the retrieve times out like the reference's bounded read
    intercept[java.util.concurrent.TimeoutException] {
      MemHub.sinkAddress("job-that-never-elected", timeoutMs = 50L)
    }
  }

  test("mqtt publish retry: succeeds within maxAttempts (SinkContext.java:61-104 analog)") {
    val uri = "hub:test/mqtt-retry"
    GraftSinks.mqttPublish(
      spark.range(0, 10).select(lit("t").as("topic"),
        encode(col("id").cast("string"), "UTF-8").as("payload")),
      uri, maxAttempts = 3)
    assert(MemHub.topicLen(uri, "t") == 10)
  }

  test("RecordCodec: all types + nulls round-trip bit-exactly") {
    import graft.sources.topiclog.RecordCodec
    val schema = StructType.fromDDL(
      "i INT, l BIGINT, f FLOAT, d DOUBLE, b BOOLEAN, s STRING, raw BINARY")
    val vals = Seq(Int.MinValue, Long.MaxValue, 1.5f, math.Pi, true,
      "héllo \u0000world", Array[Byte](0, -1, 127))
    val spec = RecordCodec.parse("record:" + schema.toDDL)
    val row = RecordCodec.decodeToCatalyst(RecordCodec.encode(vals, schema), spec)
    assert(row.getInt(0) == Int.MinValue)
    assert(row.getLong(1) == Long.MaxValue)
    assert(row.getFloat(2) == 1.5f)
    assert(java.lang.Double.doubleToRawLongBits(row.getDouble(3)) ==
      java.lang.Double.doubleToRawLongBits(math.Pi))
    assert(row.getBoolean(4))
    assert(row.getUTF8String(5).toString == "héllo \u0000world")
    assert(row.getBinary(6).toSeq == Seq[Byte](0, -1, 127))
    // nulls in every slot survive the marker bytes
    val nulls = RecordCodec.decodeToCatalyst(
      RecordCodec.encode(Seq(null, null, null, null, null, null, null), schema), spec)
    (0 until 7).foreach(i => assert(nulls.isNullAt(i)))
  }

  test("RecordCodec: writer/reader resolution — reorder, skip writer-only, null reader-only") {
    import graft.sources.topiclog.RecordCodec
    val writer = StructType.fromDDL("a BIGINT, junk STRING, x DOUBLE")
    val spec = RecordCodec.parse("record:x DOUBLE, missing INT, a BIGINT@writer:" + writer.toDDL)
    val row = RecordCodec.decodeToCatalyst(
      RecordCodec.encode(Seq(42L, "dropme", 2.5), writer), spec)
    assert(row.getDouble(0) == 2.5)
    assert(row.isNullAt(1), "reader-only field resolves to null")
    assert(row.getLong(2) == 42L)
    // name-matched with a different TYPE must be rejected loudly
    val e = intercept[IllegalArgumentException] {
      RecordCodec.parse("record:a DOUBLE@writer:a BIGINT")
    }
    assert(e.getMessage.contains("a"))
  }

  test("pulsar record schema decodes at the scan into a typed struct") {
    import graft.sources.topiclog.RecordCodec
    val uri = s"hub:/tmp/connspec-record-${System.nanoTime}"
    val writer = StructType.fromDDL("id BIGINT, name STRING, score DOUBLE")
    MemHub.publish(uri, "recs", (1L to 5L).iterator.map { i =>
      ("", Map.empty[String, String], i,
        RecordCodec.encode(Seq(i, s"n$i", i * 0.5), writer))
    })
    val got = GraftSources.pulsarReaderBatch(spark, uri, "recs",
        schema = Some("record:score DOUBLE, id BIGINT@writer:" + writer.toDDL))
      .select(col("value.id"), col("value.score")).orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == (1L to 5L).map(i => (i, i * 0.5)))
  }

  test("httpListenerAs[T]: product-encoder bean decoding, FAILFAST on malformed payloads") {
    import graft.queries.HttpPartBean
    val uri = s"hub:/tmp/connspec-httpbean-${System.nanoTime}"
    MemHub.publish(uri, "http", (1L to 3L).iterator.map { i =>
      ("", Map.empty[String, String], 0L, s"""{"id":$i,"name":"part$i"}""".getBytes("UTF-8"))
    })
    val ds = GraftSources.httpListenerBatchAs[HttpPartBean](spark, uri)
    // a genuinely typed Dataset: compile-time field access works
    val got = ds.collect().sortBy(_.id)
    assert(got.toSeq == (1L to 3L).map(i => HttpPartBean(i, s"part$i")))
    // the reference's bean mapper throws on malformed payloads; so do we
    MemHub.publish(uri, "http", Iterator(
      ("", Map.empty[String, String], 0L, "not json".getBytes("UTF-8"))))
    val e = intercept[org.apache.spark.SparkException] {
      GraftSources.httpListenerBatchAs[HttpPartBean](spark, uri).collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed") ||
      Option(e.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }

  test("property: RecordCodec round-trips random schemas/values with random reader projections") {
    import graft.sources.topiclog.RecordCodec
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val fieldGen = for {
      n <- Gen.choose(0, 8)
      name <- Gen.const(s"f$n") // names drawn from a small pool => overlaps
      tpe <- Gen.oneOf("INT", "BIGINT", "FLOAT", "DOUBLE", "BOOLEAN", "STRING", "BINARY")
    } yield (name, tpe)
    def valueFor(tpe: String, rnd: scala.util.Random): Any = tpe match {
      case _ if rnd.nextInt(5) == 0 => null
      case "INT" => rnd.nextInt()
      case "BIGINT" => rnd.nextLong()
      case "FLOAT" => rnd.nextFloat()
      case "DOUBLE" => rnd.nextDouble()
      case "BOOLEAN" => rnd.nextBoolean()
      case "STRING" => rnd.alphanumeric.take(rnd.nextInt(12)).mkString + "\u00e9\u0000"
      case "BINARY" => Array.fill(rnd.nextInt(8))(rnd.nextInt().toByte)
    }
    val caseGen = for {
      wfs <- Gen.listOfN(6, fieldGen).map(_.distinctBy(_._1)).suchThat(_.nonEmpty)
      rsub <- Gen.someOf(wfs)
      extra <- Gen.oneOf(Seq.empty[(String, String)], Seq(("fx", "BIGINT")))
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (wfs, scala.util.Random.shuffle(rsub.toList ++ extra), seed)
    val prop = Prop.forAll(caseGen) { case (wfs, rfs, seed) =>
      val writer = org.apache.spark.sql.types.StructType.fromDDL(
        wfs.map { case (n, t) => s"$n $t" }.mkString(", "))
      val readerDdl = if (rfs.isEmpty) "fempty INT" else rfs.map { case (n, t) => s"$n $t" }.mkString(", ")
      val rnd = new scala.util.Random(seed)
      val vals = wfs.map { case (_, t) => valueFor(t, rnd) }
      val spec = RecordCodec.parse(s"record:$readerDdl@writer:${writer.toDDL}")
      val row = RecordCodec.decodeToCatalyst(RecordCodec.encode(vals, writer), spec)
      val byName = wfs.map(_._1).zip(vals).toMap
      spec.reader.fields.zipWithIndex.forall { case (f, i) =>
        byName.get(f.name) match {
          case None | Some(null) => row.isNullAt(i)
          case Some(v) => f.dataType.typeName match {
            case "binary" => row.getBinary(i).toSeq == v.asInstanceOf[Array[Byte]].toSeq
            case "string" => row.getUTF8String(i).toString == v.toString
            case "float" => java.lang.Float.floatToRawIntBits(row.getFloat(i)) ==
              java.lang.Float.floatToRawIntBits(v.asInstanceOf[Float])
            case "double" => java.lang.Double.doubleToRawLongBits(row.getDouble(i)) ==
              java.lang.Double.doubleToRawLongBits(v.asInstanceOf[Double])
            case "integer" => row.getInt(i) == v.asInstanceOf[Int]
            case "long" => row.getLong(i) == v.asInstanceOf[Long]
            case "boolean" => row.getBoolean(i) == v.asInstanceOf[Boolean]
          }
        }
      }
    }
    val res = check(Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }
}
