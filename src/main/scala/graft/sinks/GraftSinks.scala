package graft.sinks

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}

import graft.sources.hub.MemHub

/** Sink surface (SURVEY.md §2.2 K1-K8).
  *
  * Two shapes, mirroring the reference's receive/flush/destroy contract
  * (SURVEY.md §1.1 `Sink<T>`):
  *  - batch: `foreachPartition` writers — one client per partition, bulk
  *    flush at partition end (the `foreachBatch` idiom for streaming);
  *  - streaming: [[BufferedForeachWriter]] — `open` = connect, `process` =
  *    receive, `close` = flush/destroy, exactly the reference lifecycle
  *    (`InfluxDbSinks.java:44-64`, `MongoDBSinkBuilder.java:123-188`).
  *
  * Transport is [[MemHub]] (zero-egress container); on a cluster each
  * writer opens the real client in `open`/partition head instead.
  */
object GraftSinks {

  /** K3 — Redis hash sink: buffered HMSET per partition
    * (RedisSinks.java:64-151 double-buffered pipeline). Cols: key, value. */
  def redisHash(df: DataFrame, uri: String, hash: String): Unit =
    df.select("key", "value").foreachPartition { (rows: Iterator[Row]) =>
      MemHub.hashPut(s"$uri/$hash", rows.map(r => r.getString(0) -> r.getString(1)))
    }

  /** K4 — Redis sorted-set sink: ZADD (RedisSinks.java:165-254). Cols: value, score. */
  def redisZSet(df: DataFrame, uri: String, key: String): Unit =
    df.select("value", "score").foreachPartition { (rows: Iterator[Row]) =>
      MemHub.zadd(s"$uri/$key", rows.map(r => r.getString(0) -> r.getDouble(1)))
    }

  /** K5 — Redis stream sink: XADD (RedisSinks.java:269-349). Cols: stream, body(map). */
  def redisXAdd(df: DataFrame, uri: String): Unit =
    df.select("stream", "body").foreachPartition { (rows: Iterator[Row]) =>
      rows.toSeq.groupBy(_.getString(0)).toSeq.sortBy(_._1).foreach { case (s, rs) =>
        MemHub.xadd(uri, s, rs.iterator.map(_.getMap[String, String](1).toMap))
      }
    }

  /** K2 — document insertMany sink with `ordered` option
    * (MongoDBSinkBuilder.java:123-188): accumulate `batchSize` docs, flush. */
  def mongoInsertMany(df: DataFrame, uri: String, ordered: Boolean = true,
      batchSize: Int = 1024): Unit =
    df.select("doc").foreachPartition { (rows: Iterator[Row]) =>
      rows.grouped(batchSize).foreach { chunk =>
        MemHub.insertMany(uri, chunk.iterator.map(_.getString(0)), ordered)
      }
    }

  /** K1 — time-series point sink (InfluxDbSinks.java:44-64): client-side
    * batching, flush per partition. Cols: timeMs, tags(map), fields(map). */
  def influxWrite(df: DataFrame, uri: String, measurement: String): Unit =
    df.select("timeMs", "tags", "fields").foreachPartition { (rows: Iterator[Row]) =>
      MemHub.writePoints(uri, measurement, rows.map { r =>
        (r.getLong(0), r.getMap[String, String](1).toMap, r.getMap[String, Double](2).toMap)
      })
    }

  /** K6 — MQTT publish sink with retry strategy and per-call QoS
    * (MqttSinkBuilder.java:128-141, SinkContext.java:61-104,
    * Subscription.java:85-127 delivery levels):
    *  - QoS 0, at-most-once: one attempt, a failed publish is dropped;
    *  - QoS 1, at-least-once: retried up to maxAttempts — a lost ack
    *    makes the retry a DUPLICATE (the documented QoS1 hazard);
    *  - QoS 2, exactly-once: retried, but the broker dedups on a packet
    *    id stable across retries AND task re-executions (partition id —
    *    the epoch-idempotent pairing), so lost acks can't duplicate.
    * Cols: topic, payload(binary). */
  def mqttPublish(df: DataFrame, uri: String, maxAttempts: Int = 3,
      qos: Int = 1, auth: Option[(String, String)] = None,
      tls: Option[graft.sources.hub.TlsGate.ClientTls] = None): Unit = {
    require(qos >= 0 && qos <= 2, s"qos must be 0, 1 or 2 (got $qos)")
    // secured-broker connect check, driver-side fail-fast (the reference
    // fails the job at connect, not per message)
    MemHub.checkTopicAuth(uri, auth)
    MemHub.checkTopicTls(uri, tls)
    // packet-id scope: unique per sink CALL (driver-minted), stable across
    // in-task retries and task re-executions of that call — so QoS2 dedup
    // never swallows a later, legitimate publish of the same rows
    val callId = java.util.UUID.randomUUID().toString.take(8)
    df.select("topic", "payload").foreachPartition { (rows: Iterator[Row]) =>
      val partId = Option(org.apache.spark.TaskContext.get())
        .map(_.partitionId()).getOrElse(0)
      rows.toSeq.groupBy(_.getString(0)).toSeq.sortBy(_._1).foreach { case (t, rs) =>
        // PUBLISH topic names must not contain wildcards (MQTT 3.1.1
        // §3.3.2.1; the reference's sink contract, MqttSinkBuilder.java:50)
        require(!t.contains('+') && !t.contains('#'),
          s"MQTT publish topic '$t' must not contain wildcard characters")
        def send(): Unit = {
          val msgs = rs.iterator.map { r =>
            ("", Map.empty[String, String], 0L, r.getAs[Array[Byte]](1))
          }
          if (qos == 2) MemHub.publishOnce(uri, t, s"$callId-p$partId", msgs)
          else MemHub.publish(uri, t, msgs)
        }
        if (qos == 0) {
          try send() catch { case _: RuntimeException => () } // dropped
        } else {
          var attempt = 0
          var done = false
          while (!done && attempt < maxAttempts) {
            attempt += 1
            try { send(); done = true }
            catch { case _: RuntimeException if attempt < maxAttempts => }
          }
        }
      }
    }
  }

  /** Streaming K6 shape: epoch-aware QoS2 — the packet id is (client,
    * partition, epoch), so a replayed epoch after failure recovery
    * re-publishes idempotently (MQTT's session-scoped packet ids:
    * `clientId` distinguishes concurrent writers on one broker). */
  def mqttPublishWriter(uri: String, qos: Int = 2,
      clientId: String = "graft"): ForeachWriter[Row] = {
    require(qos >= 0 && qos <= 2, s"qos must be 0, 1 or 2 (got $qos)")
    new ForeachWriter[Row] {
      @transient private var buf: scala.collection.mutable.ArrayBuffer[Row] = _
      private var packet: String = _
      override def open(partitionId: Long, epochId: Long): Boolean = {
        buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        packet = s"$clientId-p$partitionId-e$epochId"
        true
      }
      override def process(value: Row): Unit = buf += value
      override def close(errorOrNull: Throwable): Unit =
        if (errorOrNull == null && buf != null)
          buf.toSeq.groupBy(_.getString(0)).toSeq.sortBy(_._1).foreach { case (t, rs) =>
            require(!t.contains('+') && !t.contains('#'),
              s"MQTT publish topic '$t' must not contain wildcard characters")
            val msgs = rs.iterator.map(r =>
              ("", Map.empty[String, String], 0L, r.getAs[Array[Byte]](1)))
            if (qos == 2) MemHub.publishOnce(uri, t, s"$packet-$t", msgs)
            else MemHub.publish(uri, t, msgs)
          }
    }
  }

  /** K7 — Pulsar producer sink (PulsarSinkBuilder.java:144-225): key /
    * properties / eventTime extractors are column selections.
    * Cols: key, value(binary), properties(map), eventTimeMs. */
  def pulsarProduce(df: DataFrame, uri: String, topic: String): Unit =
    df.select("key", "value", "properties", "eventTimeMs")
      .foreachPartition { (rows: Iterator[Row]) =>
        MemHub.publish(uri, topic, rows.map { r =>
          (r.getString(0), r.getMap[String, String](2).toMap, r.getLong(3),
            r.getAs[Array[Byte]](1))
        })
      }

  /** K8 — WS/SSE broadcast sink (HttpListenerSinkBuilder.java:231-263):
    * single writer (forceTotalParallelismOne analog = coalesce(1)),
    * accumulate-up-to-N drop-oldest buffer while no client is connected.
    * Both protocol legs serve this buffer:
    * [[graft.sources.http.WsEndpoint.startWebsocket]] (RFC 6455 upgrade +
    * text frames, `buildWebsocket`) and
    * [[graft.sources.http.HttpEndpoint.startBroadcast]]
    * (`text/event-stream`, `buildServerSent`). Cols: payload(string). */
  def wsBroadcast(df: DataFrame, uri: String, accumulateLimit: Int): Unit = {
    df.select("payload").coalesce(1).foreachPartition { (rows: Iterator[Row]) =>
      MemHub.publish(uri, "ws", rows.map(r =>
        ("", Map.empty[String, String], 0L, r.getString(0).getBytes("UTF-8"))))
      MemHub.trimTopic(uri, "ws", accumulateLimit)
    }
  }

  /** Streaming sink shape: receive per row, flush at epoch close — pair with
    * `writeStream.foreach(...)`. */
  final class BufferedForeachWriter(flushFn: Seq[Row] => Unit)
    extends ForeachWriter[Row] {
    @transient private var buf: scala.collection.mutable.ArrayBuffer[Row] = _
    override def open(partitionId: Long, epochId: Long): Boolean = {
      buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      true
    }
    override def process(value: Row): Unit = buf += value
    override def close(errorOrNull: Throwable): Unit =
      if (errorOrNull == null && buf != null) flushFn(buf.toSeq)
  }

  /** Streaming Redis-stream writer (K5 streaming shape). Cols: stream, body. */
  def redisXAddWriter(uri: String): ForeachWriter[Row] =
    new BufferedForeachWriter(rows =>
      rows.groupBy(_.getString(0)).toSeq.sortBy(_._1).foreach { case (s, rs) =>
        MemHub.xadd(uri, s, rs.iterator.map(_.getMap[String, String](1).toMap))
      })

  /** Streaming document writer (K2 streaming shape). Col: doc. */
  def mongoInsertWriter(uri: String): ForeachWriter[Row] =
    new BufferedForeachWriter(rows =>
      MemHub.insertMany(uri, rows.iterator.map(_.getString(0))))

  /** Streaming broadcast writer (K8 streaming shape — the reference sink
    * IS a streaming processor, `writeBufferedP`): each epoch's payloads
    * publish into the accumulate buffer at epoch close, drop-oldest cap
    * applied, so connected WS/SSE clients see new items live. Col:
    * payload(string). */
  def wsBroadcastWriter(uri: String, accumulateLimit: Int): ForeachWriter[Row] =
    new BufferedForeachWriter(rows => {
      MemHub.publish(uri, "ws", rows.iterator.map(r =>
        ("", Map.empty[String, String], 0L, r.getString(0).getBytes("UTF-8"))))
      MemHub.trimTopic(uri, "ws", accumulateLimit)
    })
}
