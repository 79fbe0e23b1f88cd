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

  /** K6 — MQTT publish sink with retry strategy (MqttSinkBuilder.java:128-141,
    * SinkContext.java:61-104). Cols: topic, payload(binary). */
  def mqttPublish(df: DataFrame, uri: String, maxAttempts: Int = 3): Unit =
    df.select("topic", "payload").foreachPartition { (rows: Iterator[Row]) =>
      rows.toSeq.groupBy(_.getString(0)).toSeq.sortBy(_._1).foreach { case (t, rs) =>
        var attempt = 0
        var done = false
        while (!done && attempt < maxAttempts) {
          attempt += 1
          try {
            MemHub.publish(uri, t, rs.iterator.map { r =>
              ("", Map.empty[String, String], 0L, r.getAs[Array[Byte]](1))
            })
            done = true
          } catch { case _: RuntimeException if attempt < maxAttempts => }
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
    * Cols: payload(string). */
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
}
