package graft.sources.hub

import java.util.concurrent.ConcurrentHashMap
import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** In-process "external world" the connectors talk to.
  *
  * The container is zero-egress — there is no live Redis/Mongo/Influx/MQTT/
  * Pulsar broker to connect to — so each connector's *transport* is this
  * hub while everything Spark-side (DSv2 tables, scan pushdown, input
  * partitions, micro-batch offsets, sink receive/flush lifecycle) is the
  * real production code path. On a cluster, swap the hub client for the
  * network client; the DSv2 classes do not change (they only see the
  * small client traits defined by each connector).
  *
  * Stores are keyed by `uri` (namespace) so concurrent queries/tests never
  * collide. All appends are synchronized and reads snapshot — readers on
  * executor threads (local mode shares the JVM) see immutable copies.
  */
object MemHub {

  // ---- Redis-shaped stores -------------------------------------------------

  /** hash: field -> value (HGETALL source, HMSET sink). */
  private val hashes = new ConcurrentHashMap[String, TrieMap[String, String]]()

  /** sorted set: member -> score (ZRANGEBYSCORE source, ZADD sink). */
  private val zsets = new ConcurrentHashMap[String, TrieMap[String, Double]]()

  /** stream: append log of (id, body) (XREAD source, XADD sink). */
  private val streams = new ConcurrentHashMap[String, ArrayBuffer[(Long, Map[String, String])]]()

  // ---- document store (Mongo-shaped): collection of JSON docs + oplog -----

  private val collections = new ConcurrentHashMap[String, ArrayBuffer[String]]()

  /** change log entries: (seq, operationType, fullDocument, clusterTimeMs). */
  private val oplogs = new ConcurrentHashMap[String, ArrayBuffer[(Long, String, String, Long)]]()

  // ---- time-series store (Influx-shaped) ----------------------------------

  /** measurement points: (timeMs, tags, fields). */
  private val series = new ConcurrentHashMap[String, ArrayBuffer[(Long, Map[String, String], Map[String, Double])]]()

  // ---- topic log (MQTT/Pulsar/HTTP/Twitter/Kafka-Connect-shaped) ----------

  /** message: (seq, key, props, eventTimeMs, payload). */
  final case class Msg(seq: Long, key: String, props: Map[String, String],
      eventTimeMs: Long, payload: Array[Byte])

  private val topics = new ConcurrentHashMap[String, ArrayBuffer[Msg]]()

  /** Monotone per-topic sequence — independent of buffer length so trims
    * (drop-oldest caps) never reuse a seq. */
  private val topicSeq = new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  /** per-consumer acknowledged sequence (Pulsar ack-after-commit analog). */
  private val acks = new ConcurrentHashMap[String, java.lang.Long]()

  private def buf[T](m: ConcurrentHashMap[String, ArrayBuffer[T]], k: String): ArrayBuffer[T] =
    m.computeIfAbsent(k, _ => new ArrayBuffer[T]())

  // ---- hash ----------------------------------------------------------------

  def hashPut(uri: String, kvs: Iterator[(String, String)]): Unit = {
    val h = hashes.computeIfAbsent(uri, _ => TrieMap.empty)
    kvs.foreach { case (k, v) => h.put(k, v) }
  }
  def hashGetAll(uri: String): Map[String, String] =
    Option(hashes.get(uri)).map(_.toMap).getOrElse(Map.empty)

  /** Two-phase write support: merge a staged hash into the target, drop it. */
  def hashPromote(stageUri: String, targetUri: String): Unit = {
    val staged = hashGetAll(stageUri)
    hashPut(targetUri, staged.iterator)
    hashes.remove(stageUri)
  }
  def hashDrop(uri: String): Unit = hashes.remove(uri)

  /** KEYS <prefix>* analog — lets specs prove staged hashes are dropped
    * on both the commit and abort paths. */
  def hashKeys(prefix: String): Seq[String] =
    hashes.keySet.asScala.filter(_.startsWith(prefix)).toSeq

  // ---- zset ----------------------------------------------------------------

  def zadd(uri: String, svs: Iterator[(String, Double)]): Unit = {
    val z = zsets.computeIfAbsent(uri, _ => TrieMap.empty)
    svs.foreach { case (m, s) => z.put(m, s) }
  }
  /** Two-phase write support: merge a staged zset into the target, drop it. */
  def zsetPromote(stageUri: String, targetUri: String): Unit = {
    val staged = Option(zsets.get(stageUri)).map(_.toMap).getOrElse(Map.empty)
    zadd(targetUri, staged.iterator)
    zsets.remove(stageUri)
  }
  def zsetDrop(uri: String): Unit = zsets.remove(uri)

  /** ZRANGEBYSCORE [from, to] inclusive — the server-side range predicate. */
  def zrangeByScore(uri: String, from: Double, to: Double): Seq[(String, Double)] =
    Option(zsets.get(uri)).map(_.iterator.filter { case (_, s) => s >= from && s <= to }
      .toSeq.sortBy { case (m, s) => (s, m) }).getOrElse(Seq.empty)

  // ---- stream ----------------------------------------------------------------

  def xadd(uri: String, stream: String, bodies: Iterator[Map[String, String]]): Unit = {
    val b = buf(streams, s"$uri/$stream")
    b.synchronized { bodies.foreach(body => b += ((b.length.toLong, body))) }
  }
  /** XREAD from exclusive offset. */
  def xread(uri: String, stream: String, afterId: Long, count: Int = Int.MaxValue): Seq[(Long, Map[String, String])] = {
    val b = buf(streams, s"$uri/$stream")
    b.synchronized { b.iterator.filter(_._1 > afterId).take(count).toVector }
  }
  def xlen(uri: String, stream: String): Long = {
    val b = buf(streams, s"$uri/$stream")
    b.synchronized { b.length.toLong }
  }

  // ---- documents -------------------------------------------------------------

  def insertMany(uri: String, docs: Iterator[String], ordered: Boolean = true): Unit = {
    val c = buf(collections, uri)
    val o = buf(oplogs, uri)
    val now = 0L // deterministic cluster time base; callers may append real ts in doc
    c.synchronized {
      docs.foreach { d =>
        c += d
        o.synchronized { o += ((o.length.toLong, "insert", d, now + o.length)) }
      }
    }
  }
  /** Replace the i-th live document (update/replace op): the collection
    * mutates in place and the change lands in the oplog as a "replace"
    * entry carrying the NEW full document — the reference change stream's
    * fullDocument-lookup shape (MongoDBSourceBuilder FullDocument.UPDATE_LOOKUP). */
  def replaceAt(uri: String, i: Int, doc: String): Unit = {
    val c = buf(collections, uri)
    val o = buf(oplogs, uri)
    c.synchronized {
      require(i >= 0 && i < c.length && c(i) != null, s"no live document at $i")
      c(i) = doc
      o.synchronized { o += ((o.length.toLong, "replace", doc, o.length.toLong)) }
    }
  }

  /** Delete the i-th live document: a tombstone in the collection (indices
    * stay stable, like _id-keyed storage) and a "delete" oplog entry
    * carrying the last-seen document. */
  def deleteAt(uri: String, i: Int): Unit = {
    val c = buf(collections, uri)
    val o = buf(oplogs, uri)
    c.synchronized {
      require(i >= 0 && i < c.length && c(i) != null, s"no live document at $i")
      val old = c(i)
      c(i) = null
      o.synchronized { o += ((o.length.toLong, "delete", old, o.length.toLong)) }
    }
  }

  /** Live (non-tombstoned) documents. */
  def find(uri: String): Seq[String] = {
    val c = buf(collections, uri)
    c.synchronized { c.iterator.filter(_ != null).toVector }
  }
  def oplog(uri: String, afterSeq: Long): Seq[(Long, String, String, Long)] = {
    val o = buf(oplogs, uri)
    o.synchronized { o.iterator.filter(_._1 > afterSeq).toVector }
  }
  /** Range read [afterSeq+1, until] — seq == index (the oplog never trims),
    * so this is an O(slice) copy, not a scan. */
  def oplogRange(uri: String, afterSeq: Long, until: Long): Seq[(Long, String, String, Long)] = {
    val o = buf(oplogs, uri)
    o.synchronized {
      val lo = math.max(afterSeq + 1, 0L).toInt
      val hi = math.min(until, o.length - 1L).toInt
      if (lo > hi) Vector.empty else o.slice(lo, hi + 1).toVector
    }
  }
  def oplogLen(uri: String): Long = {
    val o = buf(oplogs, uri)
    o.synchronized { o.length.toLong }
  }

  // ---- series ----------------------------------------------------------------

  def writePoints(uri: String, measurement: String,
      pts: Iterator[(Long, Map[String, String], Map[String, Double])]): Unit = {
    val b = buf(series, s"$uri/$measurement")
    b.synchronized { pts.foreach(b += _) }
  }
  def queryRange(uri: String, measurement: String, fromMs: Long, toMs: Long):
      Seq[(Long, Map[String, String], Map[String, Double])] = {
    val b = buf(series, s"$uri/$measurement")
    b.synchronized { b.iterator.filter(p => p._1 >= fromMs && p._1 <= toMs).toVector }
  }

  /** The SERVER side of the InfluxQL verbatim-query passthrough
    * (InfluxDbSources.java:79-136 ships the string untouched; the server
    * parses it). This emulated server evaluates the projection/range/limit
    * shape the reference exercises:
    * `SELECT * FROM <m> [WHERE time >= Xms [AND time <= Yms]] [LIMIT n]`.
    * Anything else is rejected the way a real server rejects bad InfluxQL. */
  def influxQuery(uri: String, q: String):
      Seq[(Long, Map[String, String], Map[String, Double])] = {
    val re = """(?is)\s*SELECT\s+\*\s+FROM\s+"?([\w.]+)"?(?:\s+WHERE\s+(.+?))?(?:\s+LIMIT\s+(\d+))?\s*""".r
    q match {
      case re(m, where, limit) =>
        var from = Long.MinValue
        var to = Long.MaxValue
        Option(where).foreach { w =>
          val cond = """(?i)time\s*(>=|<=|>|<)\s*(\d+)ms""".r
          val ms = cond.findAllMatchIn(w).toSeq
          require(ms.nonEmpty, s"unsupported InfluxQL WHERE clause: $w")
          // reject like a real server, not just "find the time bounds":
          // after removing the time conditions only AND connectors may
          // remain, else a non-time predicate would be silently dropped
          // (returning EXTRA rows for e.g. `type='a' AND time >= 5ms`)
          val residual = cond.replaceAllIn(w, " ")
            .replaceAll("(?i)\\bAND\\b", " ").trim
          require(residual.isEmpty,
            s"unsupported InfluxQL WHERE clause (non-time predicate): $w")
          ms.foreach { c =>
            val v = c.group(2).toLong
            c.group(1) match {
              case ">=" => from = math.max(from, v)
              case ">" => from = math.max(from, v + 1)
              case "<=" => to = math.min(to, v)
              case "<" => to = math.min(to, v - 1)
            }
          }
        }
        val rows = queryRange(uri, m, from, to)
        Option(limit).map(l => rows.take(l.toInt)).getOrElse(rows)
      case _ => throw new IllegalArgumentException(s"unsupported InfluxQL: $q")
    }
  }

  // ---- topics ----------------------------------------------------------------

  /** Injected broker flakiness for sink retry/QoS specs: `refuse` throws
    * BEFORE appending (connection refused); `loseAck` appends the batch
    * then throws (the ack was lost — the at-least-once duplicate case). */
  private val refusals = new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()
  private val lostAcks = new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()
  def failNextPublishes(uri: String, refuse: Int = 0, loseAck: Int = 0): Unit = {
    if (refuse > 0) refusals.put(uri, new java.util.concurrent.atomic.AtomicInteger(refuse))
    if (loseAck > 0) lostAcks.put(uri, new java.util.concurrent.atomic.AtomicInteger(loseAck))
  }
  private def takeInjection(m: ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger],
      uri: String): Boolean = {
    val c = m.get(uri)
    c != null && c.getAndDecrement() > 0
  }

  /** QoS2 packet registry: a (uri/topic/packetId) batch appends at most once. */
  private val packets = new ConcurrentHashMap[String, java.lang.Boolean]()

  // ---- WS/SSE sink address advertisement ----------------------------------

  /** The elected listener-server address per job id — the reference
    * advertises it through a job-keyed Ringbuffer and clients read slot 0
    * (HttpListenerSinks.java:113-131, first advertisement wins); here the
    * hub IS the cluster-shared state, so a one-slot putIfAbsent map gives
    * the same semantics. */
  private val sinkAddrs = new ConcurrentHashMap[String, String]()

  def advertiseSinkAddress(jobId: String, addr: String): Unit =
    sinkAddrs.putIfAbsent(jobId, addr): Unit

  /** Blocking read with the reference's retrieve timeout: the sink server
    * is elected on SOME member after the job starts, so clients poll the
    * slot instead of racing the election. */
  def sinkAddress(jobId: String, timeoutMs: Long = 5000L): String = {
    val t0 = System.currentTimeMillis()
    var a = sinkAddrs.get(jobId)
    while (a == null && System.currentTimeMillis() - t0 < timeoutMs) {
      Thread.sleep(20)
      a = sinkAddrs.get(jobId)
    }
    if (a == null)
      throw new java.util.concurrent.TimeoutException(
        s"no sink address advertised for job $jobId within ${timeoutMs}ms")
    a
  }

  // ---- MQTT connection/session state (autoReconnect / keepSession) --------

  /** Dropped-connection flags per uri/clientId — the broker-side state a
    * network partition or broker restart leaves behind
    * (AbstractMqttBuilder.java:108-130: `autoReconnect()` toggles Paho's
    * automatic reconnect, `keepSession()` toggles cleanSession=false). */
  private val mqttConn = new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicBoolean]()

  private def conn(uri: String, clientId: String) =
    mqttConn.computeIfAbsent(s"$uri/$clientId",
      _ => new java.util.concurrent.atomic.AtomicBoolean(false))

  /** Broker-side connection drop: every subsequent poll by this client
    * observes it (specs inject this mid-stream). */
  def dropMqttClient(uri: String, clientId: String): Unit =
    conn(uri, clientId).set(true)

  /** Client poll-time liveness gate. Returns true iff the client just
    * RECONNECTED (a drop was observed and autoReconnect is on) — the
    * caller then resubscribes and applies its session semantics. Without
    * autoReconnect a dropped connection is terminal: the poll throws the
    * "Connection lost" the reference's Paho client surfaces. */
  def mqttPollGate(uri: String, clientId: String, autoReconnect: Boolean): Boolean = {
    val c = conn(uri, clientId)
    if (!c.get()) false
    else if (!autoReconnect)
      throw new java.io.IOException(s"Connection lost: $uri (client $clientId)")
    else c.compareAndSet(true, false) // reconnect exactly once per drop
  }

  /** Broker credentials per uri namespace (the secured-Mosquitto analog:
    * SecuredMqttSourceTest's username/password broker). An unsecured
    * namespace accepts any client. */
  private val topicAuth = new ConcurrentHashMap[String, (String, String)]()
  def secureTopics(uri: String, user: String, password: String): Unit =
    topicAuth.put(uri, (user, password))
  /** Throws the reference's connect-time failure on missing/wrong
    * credentials ("Not authorized to connect",
    * SecuredMqttSourceTest.java:56-92). */
  def checkTopicAuth(uri: String, auth: Option[(String, String)]): Unit =
    Option(topicAuth.get(uri)).foreach { expected =>
      if (!auth.contains(expected))
        throw new SecurityException(s"Not authorized to connect: $uri")
    }

  /** TLS-secured namespaces (the `ssl://` broker URL — the reference's
    * TLS Mosquitto container). A registered namespace demands a real JSSE
    * handshake from every connect; see [[TlsGate]]. */
  private val topicTls =
    new ConcurrentHashMap[String, graft.sources.http.HttpEndpoint.TlsConfig]()
  def secureTlsTopics(uri: String,
      server: graft.sources.http.HttpEndpoint.TlsConfig): Unit =
    topicTls.put(uri, server): Unit
  /** Connect-time TLS gate: no client TLS against an ssl:// namespace is
    * the tcp://-against-ssl-port failure; otherwise the full handshake
    * runs and throws its genuine `SSLHandshakeException` on an untrusted
    * broker cert or a missing client cert under mutual auth. */
  def checkTopicTls(uri: String, client: Option[TlsGate.ClientTls]): Unit =
    Option(topicTls.get(uri)).foreach { server =>
      val c = client.getOrElse(throw new javax.net.ssl.SSLException(
        s"broker at $uri requires TLS (ssl://) but the client connected without it"))
      TlsGate.handshake(server, c)
    }

  /** Per-namespace topic registry: the `uri`/`topic` boundary is LOST in
    * the flat `"$uri/$topic"` store keys (both halves may contain '/'),
    * so wildcard expansion must NOT prefix-scan those keys — uris
    * "hub:x" and "hub:x/y" would leak topics into each other. The
    * registry records the split explicitly at publish time. */
  private val topicReg = new ConcurrentHashMap[String, java.util.Set[String]]()

  private def append(uri: String, topic: String,
      msgs: Iterator[(String, Map[String, String], Long, Array[Byte])]): Unit = {
    val b = buf(topics, s"$uri/$topic")
    val seq = topicSeq.computeIfAbsent(s"$uri/$topic",
      _ => new java.util.concurrent.atomic.AtomicLong(0L))
    topicReg.computeIfAbsent(uri, _ => ConcurrentHashMap.newKeySet[String]())
      .add(topic): Unit
    b.synchronized {
      msgs.foreach { case (k, props, et, payload) =>
        b += Msg(seq.getAndIncrement(), k, props, et, payload)
      }
    }
  }

  def publish(uri: String, topic: String,
      msgs: Iterator[(String, Map[String, String], Long, Array[Byte])]): Unit = {
    if (takeInjection(refusals, uri)) throw new RuntimeException("injected: connection refused")
    append(uri, topic, msgs)
    if (takeInjection(lostAcks, uri)) throw new RuntimeException("injected: publish ack lost")
  }

  /** Exactly-once publish (MQTT QoS2 PUBREC analog): the broker records
    * the packet id in the same critical section as the append, so a
    * retried duplicate — e.g. after a lost ack — is ignored. */
  def publishOnce(uri: String, topic: String, packetId: String,
      msgs: Iterator[(String, Map[String, String], Long, Array[Byte])]): Unit = {
    if (takeInjection(refusals, uri)) throw new RuntimeException("injected: connection refused")
    val key = s"$uri/$topic/$packetId"
    val b = buf(topics, s"$uri/$topic")
    b.synchronized {
      if (packets.putIfAbsent(key, java.lang.Boolean.TRUE) == null)
        append(uri, topic, msgs)
    }
    if (takeInjection(lostAcks, uri)) throw new RuntimeException("injected: publish ack lost")
  }
  /** Broker-side XA-commit analog (the primitive JmsXaTest.java:52-96
    * checks a real broker for): atomically append a PREPARED (staged)
    * message set to the topic, exactly once per `txnId` — the txn registry
    * write and the appends share one critical section, so a crash-replayed
    * commit of the same transaction publishes nothing, and consumers never
    * observe a partial commit. Staged slots are read in (partition, index)
    * order and dropped either way. Returns true iff this call published. */
  def publishPrepared(uri: String, topic: String, txnId: String,
      stagePrefix: String): Boolean = {
    val key = s"$uri/$topic/txn/$txnId"
    val b = buf(topics, s"$uri/$topic")
    b.synchronized {
      val first = packets.putIfAbsent(key, java.lang.Boolean.TRUE) == null
      val stages = hashKeys(stagePrefix)
        .sortBy(s => s.stripPrefix(stagePrefix).toInt)
      if (first) stages.foreach { st =>
        val staged = hashGetAll(st).toSeq.sortBy(_._1)
        append(uri, topic, staged.iterator.map { case (_, v) =>
          ("", Map.empty[String, String], 0L, v.getBytes("UTF-8"))
        })
      }
      stages.foreach(hashDrop)
      first
    }
  }

  def poll(uri: String, topic: String, afterSeq: Long, max: Int = Int.MaxValue): Seq[Msg] = {
    val b = buf(topics, s"$uri/$topic")
    b.synchronized { b.iterator.filter(_.seq > afterSeq).take(max).toVector }
  }
  /** All topic names known under a namespace — the broker's topic tree,
    * as far as a subscriber can observe it (topics exist once published
    * to). Drives MQTT wildcard-filter expansion. Reads the explicit
    * per-uri registry, never a prefix scan of the flat store keys (which
    * would leak topics between nested uris like "hub:x" / "hub:x/y"). */
  def topicNames(uri: String): Seq[String] =
    Option(topicReg.get(uri))
      .map(_.asScala.toSeq.sorted)
      .getOrElse(Seq.empty)
  def topicLen(uri: String, topic: String): Long = {
    val b = buf(topics, s"$uri/$topic")
    b.synchronized { b.length.toLong }
  }
  /** High-water mark: max assigned seq (survives trimTopic), -1 if empty. */
  def topicMaxSeq(uri: String, topic: String): Long = {
    val b = buf(topics, s"$uri/$topic")
    b.synchronized { if (b.isEmpty) -1L else b.last.seq }
  }
  /** Drop-oldest cap (WS/SSE sink accumulate buffer, HttpListenerSinkContext.java:128-152). */
  def trimTopic(uri: String, topic: String, cap: Int): Unit = {
    val b = buf(topics, s"$uri/$topic")
    b.synchronized { if (b.length > cap) b.remove(0, b.length - cap) }
  }

  def ack(consumer: String, seq: Long): Unit =
    acks.merge(consumer, java.lang.Long.valueOf(seq),
      (a, b) => java.lang.Long.valueOf(math.max(a, b)))
  def acked(consumer: String): Long = Option(acks.get(consumer)).map(_.longValue()).getOrElse(-1L)

  /** Test/bench hygiene: drop every store under a namespace prefix. */
  def clear(prefix: String): Unit = {
    def sweep(m: ConcurrentHashMap[String, _]): Unit =
      m.keySet().asScala.filter(_.startsWith(prefix)).foreach(m.remove)
    sweep(hashes); sweep(zsets); sweep(streams); sweep(collections)
    sweep(oplogs); sweep(series); sweep(topics); sweep(acks)
    sweep(refusals); sweep(lostAcks); sweep(packets); sweep(mqttConn)
    sweep(sinkAddrs)
    // The topic registry and sequence counters are keyed by uri (resp.
    // "$uri/$topic") and must die with the namespace too: a stale registry
    // entry makes wildcard expansion plan partitions for topics whose
    // buffers are gone, and a stale counter makes a re-seeded fixture
    // start mid-sequence.
    sweep(topicReg); sweep(topicSeq)
  }
}
