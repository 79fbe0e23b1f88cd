package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.sinks.GraftSinks
import graft.sources.GraftSources
import graft.sources.hub.MemHub

/** The MQTT QoS delivery matrix (Subscription.java:85-127,
  * MqttSinkBuilder.java:128-141): per-level semantics on the publish side
  * against an injected flaky broker, and per-topic subscription QoS on
  * the source side (QoS0 = non-durable, live-tail subscription). */
class MqttQosSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)

  private def payloadDf(n: Int) = spark.range(0, n).coalesce(1)
    .select(lit("t").as("topic"), encode(col("id").cast("string"), "UTF-8").as("payload"))

  test("QoS 0 at-most-once: a refused publish is dropped, never retried") {
    val uri = "hub:test/qos0"
    MemHub.failNextPublishes(uri, refuse = 1)
    GraftSinks.mqttPublish(payloadDf(5), uri, maxAttempts = 3, qos = 0)
    assert(MemHub.topicLen(uri, "t") == 0, "QoS0 drops on failure")
    GraftSinks.mqttPublish(payloadDf(5), uri, maxAttempts = 3, qos = 0)
    assert(MemHub.topicLen(uri, "t") == 5, "healthy broker delivers")
  }

  test("QoS 1 at-least-once: refusals retry to success; a lost ack duplicates") {
    val uri = "hub:test/qos1-refuse"
    MemHub.failNextPublishes(uri, refuse = 2)
    GraftSinks.mqttPublish(payloadDf(5), uri, maxAttempts = 3, qos = 1)
    assert(MemHub.topicLen(uri, "t") == 5, "retries get the batch through")
    val uri2 = "hub:test/qos1-lostack"
    MemHub.failNextPublishes(uri2, loseAck = 1)
    GraftSinks.mqttPublish(payloadDf(5), uri2, maxAttempts = 3, qos = 1)
    assert(MemHub.topicLen(uri2, "t") == 10,
      "QoS1's documented hazard: the retry after a lost ack is a duplicate")
  }

  test("QoS 2 exactly-once: lost-ack retries dedup on the packet id; distinct calls don't") {
    val uri = "hub:test/qos2"
    MemHub.failNextPublishes(uri, loseAck = 1)
    GraftSinks.mqttPublish(payloadDf(5), uri, maxAttempts = 3, qos = 2)
    assert(MemHub.topicLen(uri, "t") == 5,
      "the broker-side packet registry absorbs the post-lost-ack retry")
    // a NEW sink call is a new packet id — dedup must not swallow it
    GraftSinks.mqttPublish(payloadDf(5), uri, maxAttempts = 3, qos = 2)
    assert(MemHub.topicLen(uri, "t") == 10)
  }

  test("streaming QoS 2: a replayed (partition, epoch) publishes idempotently") {
    val w = GraftSinks.mqttPublishWriter("hub:test/qos2-stream", qos = 2)
    def epoch(id: Long): Unit = {
      w.open(0, id)
      w.process(org.apache.spark.sql.Row("t", "x".getBytes("UTF-8")))
      w.close(null)
    }
    epoch(7); epoch(7) // failure-recovery replay of the same epoch
    assert(MemHub.topicLen("hub:test/qos2-stream", "t") == 1)
    epoch(8)
    assert(MemHub.topicLen("hub:test/qos2-stream", "t") == 2)
  }

  test("secured broker: missing or wrong credentials fail at connect, correct ones serve (SecuredMqttSourceTest analog)") {
    val uri = "hub:test/mqtt-secured"
    MemHub.secureTopics(uri, "user", "s3cret")
    MemHub.publish(uri, "t", Iterator(("", Map.empty[String, String], 0L,
      "hello".getBytes("UTF-8"))))
    // no credentials -> connect-time failure, before any data moves
    val e1 = intercept[SecurityException] {
      GraftSources.mqttBatch(spark, uri, Seq("t")).count()
    }
    assert(e1.getMessage.contains("Not authorized to connect"))
    // wrong password -> same failure
    val e2 = intercept[SecurityException] {
      GraftSources.mqttBatch(spark, uri, Seq("t"),
        auth = Some(("user", "wrongPassword"))).count()
    }
    assert(e2.getMessage.contains("Not authorized to connect"))
    // correct credentials -> normal service
    assert(GraftSources.mqttBatch(spark, uri, Seq("t"),
      auth = Some(("user", "s3cret"))).count() == 1)
    // publish side honors the same broker auth
    intercept[SecurityException] {
      GraftSinks.mqttPublish(payloadDf(1).withColumn("topic", lit("t")), uri)
    }
    GraftSinks.mqttPublish(payloadDf(1).withColumn("topic", lit("t")), uri,
      auth = Some(("user", "s3cret")))
    assert(MemHub.topicLen(uri, "t") == 2)
  }

  test("subscription QoS: a qos0 topic subscribes at the live tail, qos1 replays the backlog") {
    val uri = "hub:test/qos-sub"
    def pub(t: String, n: Int): Unit =
      MemHub.publish(uri, t, (0 until n).iterator.map(i =>
        ("", Map.empty[String, String], i.toLong, Array[Byte](1))))
    pub("a", 5); pub("b", 5) // backlog BEFORE the subscription exists
    val cp = Files.createTempDirectory("graft-qos-ckpt").toString
    def drain(): Map[String, Long] = {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      val q = GraftSources.mqtt(spark, uri, Seq("a:0", "b:1"))
        .writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.groupBy(col("topic")).count().collect().foreach { r =>
            counts(r.getString(0)) = counts.getOrElse(r.getString(0), 0L) + r.getLong(1)
          }
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      counts.toMap
    }
    val first = drain()
    assert(first.getOrElse("a", 0L) == 0, "QoS0: no backfill of pre-subscription messages")
    assert(first.getOrElse("b", 0L) == 5, "QoS1: durable subscription replays the backlog")
    pub("a", 3); pub("b", 3)
    val second = drain()
    assert(second.getOrElse("a", 0L) == 3, "QoS0 delivers what arrives while subscribed")
    assert(second.getOrElse("b", 0L) == 3, "QoS1 resumes from the committed offset")
  }

  /** The reconnect/keepSession choreography (AbstractMqttBuilder.java:
    * 108-130): broker drop mid-subscription, then — per the matrix — the
    * stream fails, or reconnects + resubscribes with/without the durable
    * session's QoS 1/2 backlog redelivery. */
  private def drainMqtt(uri: String, cp: String, topics: Seq[String],
      clientId: String, autoReconnect: Boolean, keepSession: Boolean): Map[String, Long] = {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    val q = GraftSources.mqtt(spark, uri, topics,
        clientId = clientId, autoReconnect = autoReconnect, keepSession = keepSession)
      .writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.groupBy(col("topic")).count().collect().foreach { r =>
          counts(r.getString(0)) = counts.getOrElse(r.getString(0), 0L) + r.getLong(1)
        }
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    counts.toMap
  }

  test("wildcard filters: + one level, # subtree incl. parent, $-topics excluded, batch + filter matcher") {
    import graft.sources.topiclog.MqttTopicFilter._
    // the matcher itself, against MQTT 3.1.1 §4.7's examples
    assert(matches("home/+/temp", "home/kitchen/temp"))
    assert(!matches("home/+/temp", "home/kitchen/oven/temp"), "+ is exactly one level")
    assert(!matches("home/+/temp", "home/temp"))
    assert(matches("sport/#", "sport"), "# matches the parent level")
    assert(matches("sport/#", "sport/tennis/player1/score"))
    assert(!matches("sport/#", "sports"))
    assert(matches("#", "any/topic/at/all"))
    assert(!matches("#", "$SYS/broker/load"), "wildcard-leading filters skip $-topics")
    assert(!matches("+/monitor", "$SYS/monitor"))
    assert(matches("$SYS/#", "$SYS/broker/load"), "an explicit $-prefix filter does match")
    // batch subscribe through the source: the filter expands against the
    // broker's topic tree
    val uri = "hub:test/wild-batch"
    def pub(t: String, n: Int): Unit =
      MemHub.publish(uri, t, (0 until n).iterator.map(i =>
        ("", Map.empty[String, String], i.toLong, Array[Byte](1))))
    pub("home/kitchen/temp", 2); pub("home/cellar/temp", 3)
    pub("home/kitchen/humidity", 4); pub("garden/temp", 5)
    val got = GraftSources.mqttBatch(spark, uri, Seq("home/+/temp"))
      .groupBy(col("topic")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("home/kitchen/temp" -> 2L, "home/cellar/temp" -> 3L),
      s"wildcard expansion: $got")
    val sub = GraftSources.mqttBatch(spark, uri, Seq("home/#")).count()
    assert(sub == 2 + 3 + 4, "# subtree covers kitchen+cellar+humidity")
  }

  test("wildcard matcher fuzz: equals a spec-literal implementation on random filter/topic pairs") {
    import graft.sources.topiclog.MqttTopicFilter
    // slow reference written directly from MQTT 3.1.1 §4.7's level-list
    // description, sharing no code with the matcher under test
    def spec(filter: String, topic: String): Boolean = {
      val fl = filter.split("/", -1).toList
      val tl = topic.split("/", -1).toList
      if (topic.startsWith("$") && (fl.head == "+" || fl.head == "#")) false
      else {
        def walk(f: List[String], t: List[String]): Boolean = (f, t) match {
          case (Nil, Nil) => true
          case ("#" :: Nil, _) => true
          case ("+" :: fr, _ :: tr) => walk(fr, tr)
          case (l :: fr, x :: tr) if l == x => walk(fr, tr)
          case _ => false
        }
        walk(fl, tl)
      }
    }
    val levels = Seq("a", "bb", "+", "#", "$SYS", "temp", "", "x")
    val rnd = new scala.util.Random(20260814)
    var checked = 0
    (0 until 8000).foreach { _ =>
      val f = (0 until 1 + rnd.nextInt(4)).map(_ => levels(rnd.nextInt(levels.length))).mkString("/")
      val t = (0 until 1 + rnd.nextInt(4)).map(_ => levels(rnd.nextInt(levels.length))).mkString("/")
      // only well-formed filters are comparable (malformed ones are
      // rejected at subscribe — covered by the validation test)
      val wellFormed = f.split("/", -1).zipWithIndex.forall { case (l, i) =>
        (!l.contains('#') || (l == "#" && i == f.split("/", -1).length - 1)) &&
          (!l.contains('+') || l == "+")
      }
      if (wellFormed && !t.contains('+') && !t.contains('#')) {
        checked += 1
        assert(MqttTopicFilter.matches(f, t) == spec(f, t),
          s"matcher divergence: filter='$f' topic='$t'")
      }
    }
    assert(checked > 2000, s"fuzz must exercise a healthy sample (got $checked)")
  }

  test("wildcard filters: a topic that first publishes mid-stream joins the next epoch") {
    val uri = "hub:test/wild-stream"
    def pub(t: String, n: Int): Unit =
      MemHub.publish(uri, t, (0 until n).iterator.map(i =>
        ("", Map.empty[String, String], i.toLong, Array[Byte](1))))
    pub("dev/a/metrics", 2)
    val cp = Files.createTempDirectory("graft-wild-ckpt").toString
    def drain(): Map[String, Long] = {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      val q = GraftSources.mqtt(spark, uri, Seq("dev/+/metrics"))
        .writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.groupBy(col("topic")).count().collect().foreach { r =>
            counts(r.getString(0)) = counts.getOrElse(r.getString(0), 0L) + r.getLong(1)
          }
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      counts.toMap
    }
    assert(drain() == Map("dev/a/metrics" -> 2L))
    // a NEW matching topic appears after the subscription started: the
    // next drain must deliver its full history (all of it post-dates the
    // subscribe), while the old topic resumes from the committed offset
    pub("dev/b/metrics", 4); pub("dev/a/metrics", 1); pub("other/x", 9)
    val second = drain()
    assert(second == Map("dev/a/metrics" -> 1L, "dev/b/metrics" -> 4L),
      s"late-appearing wildcard match must join: $second")
  }

  test("overlapping subscriptions: a literal qos0 topic under a durable wildcard gets the MAX QoS") {
    val uri = "hub:test/wild-overlap"
    def pub(t: String, n: Int): Unit =
      MemHub.publish(uri, t, (0 until n).iterator.map(i =>
        ("", Map.empty[String, String], i.toLong, Array[Byte](1))))
    pub("dev/a", 4) // backlog BEFORE subscribe
    val cp = Files.createTempDirectory("graft-overlap-ckpt").toString
    val counts = scala.collection.mutable.Map.empty[String, Long]
    val q = GraftSources.mqtt(spark, uri, Seq("dev/a:0", "dev/#:2"))
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.groupBy(col("topic")).count().collect().foreach { r =>
          counts(r.getString(0)) = counts.getOrElse(r.getString(0), 0L) + r.getLong(1)
        }
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // MQTT 3.1.1 para 3.8.4: overlapping subscriptions deliver at the MAX
    // granted QoS — the durable dev/# subscription replays dev/a's
    // backlog even though the literal entry asked for qos0
    assert(counts.getOrElse("dev/a", 0L) == 4,
      s"literal-under-wildcard must inherit the durable QoS: $counts")
  }

  test("hub topic registry: nested namespaces never leak topics into each other") {
    MemHub.publish("hub:nest-x", "t1",
      Iterator(("", Map.empty[String, String], 0L, Array[Byte](1))))
    MemHub.publish("hub:nest-x/y", "t2",
      Iterator(("", Map.empty[String, String], 0L, Array[Byte](1))))
    assert(MemHub.topicNames("hub:nest-x") == Seq("t1"),
      "a prefix-sharing uri's topics must not appear as phantom nested topics")
    assert(MemHub.topicNames("hub:nest-x/y") == Seq("t2"))
  }

  test("wildcard validation: malformed filters and wildcard PUBLISH topics are rejected") {
    val uri = "hub:test/wild-reject"
    MemHub.publish(uri, "a/b", Iterator(("", Map.empty[String, String], 0L, Array[Byte](1))))
    intercept[IllegalArgumentException] {
      GraftSources.mqttBatch(spark, uri, Seq("a/#/b")).count() // '#' not last
    }
    intercept[IllegalArgumentException] {
      GraftSources.mqttBatch(spark, uri, Seq("a/b+/c")).count() // '+' not a whole level
    }
    // sink side: PUBLISH topic must not contain wildcards (§3.3.2.1)
    val bad = spark.range(0, 1).select(lit("a/+").as("topic"),
      encode(col("id").cast("string"), "UTF-8").as("payload"))
    val e = intercept[Exception] { GraftSinks.mqttPublish(bad, uri, qos = 1) }
    assert(e.getMessage != null)
  }

  test("reconnect matrix: kept session redelivers the QoS1/2 disconnect backlog, QoS0 never") {
    val uri = "hub:test/reconnect-keep"
    def pub(t: String, n: Int): Unit =
      MemHub.publish(uri, t, (0 until n).iterator.map(i =>
        ("", Map.empty[String, String], i.toLong, Array[Byte](1))))
    pub("q1", 4); pub("q2", 4); pub("q0", 4)
    val cp = Files.createTempDirectory("graft-reconnect-keep").toString
    val topics = Seq("q1:1", "q2:2", "q0:0")
    val first = drainMqtt(uri, cp, topics, "keeper", autoReconnect = true, keepSession = true)
    assert(first.getOrElse("q1", 0L) == 4 && first.getOrElse("q2", 0L) == 4 &&
      first.getOrElse("q0", 0L) == 0, s"pre-drop baseline wrong: $first")

    // broker drop, then a backlog published WHILE the client is gone
    MemHub.dropMqttClient(uri, "keeper")
    pub("q1", 3); pub("q2", 2); pub("q0", 5)
    val second = drainMqtt(uri, cp, topics, "keeper", autoReconnect = true, keepSession = true)
    assert(second.getOrElse("q1", 0L) == 3,
      s"kept session must redeliver the QoS1 backlog: $second")
    assert(second.getOrElse("q2", 0L) == 2,
      s"kept session must redeliver the QoS2 backlog: $second")
    assert(second.getOrElse("q0", 0L) == 0,
      s"QoS0 backlog is non-durable even under a kept session: $second")

    // post-reconnect publishes flow on every topic
    pub("q1", 1); pub("q0", 2)
    val third = drainMqtt(uri, cp, topics, "keeper", autoReconnect = true, keepSession = true)
    assert(third.getOrElse("q1", 0L) == 1 && third.getOrElse("q0", 0L) == 2,
      s"post-reconnect delivery wrong: $third")
  }

  test("reconnect matrix: clean session drops the whole disconnect window on resubscribe") {
    val uri = "hub:test/reconnect-clean"
    def pub(t: String, n: Int): Unit =
      MemHub.publish(uri, t, (0 until n).iterator.map(i =>
        ("", Map.empty[String, String], i.toLong, Array[Byte](1))))
    pub("q1", 4)
    val cp = Files.createTempDirectory("graft-reconnect-clean").toString
    val first = drainMqtt(uri, cp, Seq("q1:1"), "cleaner",
      autoReconnect = true, keepSession = false)
    assert(first.getOrElse("q1", 0L) == 4, s"baseline wrong: $first")

    MemHub.dropMqttClient(uri, "cleaner")
    pub("q1", 3) // published while disconnected — lost to a clean session
    val second = drainMqtt(uri, cp, Seq("q1:1"), "cleaner",
      autoReconnect = true, keepSession = false)
    assert(second.getOrElse("q1", 0L) == 0,
      s"clean session must NOT redeliver the disconnect window: $second")

    pub("q1", 2) // published after the resubscribe — delivered
    val third = drainMqtt(uri, cp, Seq("q1:1"), "cleaner",
      autoReconnect = true, keepSession = false)
    assert(third.getOrElse("q1", 0L) == 2, s"post-resubscribe delivery wrong: $third")
  }

  test("reconnect matrix: without autoReconnect a broker drop fails the stream") {
    val uri = "hub:test/reconnect-off"
    MemHub.publish(uri, "t", Iterator(("", Map.empty[String, String], 0L, Array[Byte](1))))
    val cp = Files.createTempDirectory("graft-reconnect-off").toString
    val first = drainMqtt(uri, cp, Seq("t:1"), "fragile",
      autoReconnect = false, keepSession = false)
    assert(first.getOrElse("t", 0L) == 1)
    MemHub.dropMqttClient(uri, "fragile")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainMqtt(uri, cp, Seq("t:1"), "fragile",
        autoReconnect = false, keepSession = false)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => String.valueOf(c.getMessage).contains("Connection lost")),
      s"expected the Paho-style connection-lost failure, got: $e")
  }
}
