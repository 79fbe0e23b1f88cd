package graft.sources.http

import java.io.{BufferedInputStream, InputStream, OutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket, SocketTimeoutException}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

import javax.net.ssl.SSLServerSocket

import graft.sources.hub.MemHub

/** RFC 6455 WebSocket server leg of the K8 broadcast sink — the protocol
  * the reference serves beside SSE (`HttpListenerSinkBuilder.buildWebsocket`,
  * `HttpListenerSinkBuilder.java:231-263`; protocol matrix
  * `HttpListenerSinkTest.java:103-473`). Zero dependencies: the upgrade
  * handshake and framing are small enough to speak directly over a
  * `ServerSocket` (TLS via `SSLServerSocket` from the shared
  * [[HttpEndpoint.sslContext]], mutual auth included).
  *
  * Contract (mirrors the reference's Undertow handler,
  * `HttpListenerSinkContext.java:164-183`):
  *  - a connecting client completes the 101 upgrade and immediately
  *    receives the current drop-oldest accumulate buffer as text frames
  *    (`messageBuffer.drain` on connect);
  *  - items published after that stream live to every connected peer;
  *  - client `ping` gets `pong`, client `close` gets a close reply;
  *  - a non-WebSocket request on the socket gets `400 Bad Request`
  *    (wrong-client-protocol row of the matrix).
  *
  * The server polls the hub topic for new messages between client-frame
  * reads (50 ms cadence) — the single-process analog of the reference's
  * receive-thread push; on a cluster the hub client swaps for the real
  * shared buffer (MemHub.scala:14-16) and the socket loop is unchanged.
  */
object WsEndpoint {

  /** RFC 6455 §1.3 handshake GUID. */
  private val WsGuid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  private[http] def acceptKey(clientKey: String): String =
    Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1")
        .digest((clientKey + WsGuid).getBytes(UTF_8)))

  final case class WsServer(port: Int, private[http] val stopFlag: AtomicBoolean,
      private[http] val server: ServerSocket,
      private[http] val clients: ConcurrentHashMap[Socket, java.lang.Boolean]) {
    def stop(): Unit = {
      stopFlag.set(true)
      try server.close() catch { case _: Throwable => () }
      clients.keySet.forEach(s => try s.close() catch { case _: Throwable => () })
    }
  }

  /** Start the WebSocket broadcast server for a sink topic.
    *
    * @param uri           hub uri the `wsBroadcast` sink publishes into
    * @param port          0 = ephemeral
    * @param tls           serve `wss://` (mutual auth honored)
    * @param jobId         opt into the address-advertisement contract
    * @param bindHost      interface to bind (default loopback; "0.0.0.0"
    *                      for all interfaces on a real deployment)
    * @param advertiseHost host to ADVERTISE to clients — must be the
    *                      elected member's reachable name, which the
    *                      bind address alone cannot tell when binding
    *                      all interfaces (defaults: the bind host, or
    *                      the local address when bound to 0.0.0.0)
    */
  def startWebsocket(uri: String, port: Int = 0,
      tls: Option[HttpEndpoint.TlsConfig] = None,
      jobId: Option[String] = None,
      bindHost: String = "127.0.0.1",
      advertiseHost: Option[String] = None,
      path: String = "/"): WsServer = {
    val server: ServerSocket = tls match {
      case None => new ServerSocket()
      case Some(cfg) =>
        val ctx = HttpEndpoint.sslContext(
          Some(cfg.keystorePath), cfg.password, cfg.truststorePath)
        val s = ctx.getServerSocketFactory.createServerSocket()
          .asInstanceOf[SSLServerSocket]
        s.setNeedClientAuth(cfg.needClientAuth)
        s
    }
    server.bind(new InetSocketAddress(bindHost, port))
    val bound = server.getLocalPort
    val stop = new AtomicBoolean(false)
    val clients = new ConcurrentHashMap[Socket, java.lang.Boolean]()
    val acceptor = new Thread(() => {
      while (!stop.get()) {
        try {
          val sock = server.accept()
          clients.put(sock, java.lang.Boolean.TRUE)
          val t = new Thread(() => {
            try serveClient(sock, uri, path)
            finally { clients.remove(sock); try sock.close() catch { case _: Throwable => () } }
          }, s"graft-ws-client-$bound")
          t.setDaemon(true)
          t.start()
        } catch { case _: Throwable => () /* closed on stop */ }
      }
    }, s"graft-ws-accept-$bound")
    acceptor.setDaemon(true)
    acceptor.start()
    jobId.foreach { id =>
      val scheme = if (tls.isDefined) "wss" else "ws"
      val host = advertiseHost.getOrElse(
        if (bindHost == "0.0.0.0")
          java.net.InetAddress.getLocalHost.getHostAddress
        else bindHost)
      MemHub.advertiseSinkAddress(id, s"$scheme://$host:$bound$path")
    }
    WsServer(bound, stop, server, clients)
  }

  // ---- per-connection protocol ------------------------------------------

  /** Ceiling for a client frame's declared payload (the sink is one-way:
    * data frames are ignored and control frames are ≤ 125 bytes by the
    * RFC, so anything near this is abuse) — declared-length allocation
    * without it lets one cheap 10-byte header demand a 2 GB buffer. */
  private val MaxClientFrameBytes = 1 << 20

  /** Ceiling for the upgrade-request head — bounds a garbage-streaming
    * client that never sends the terminating CRLFCRLF. */
  private val MaxRequestHeadBytes = 16 << 10

  /** How long a fully-read frame may take to arrive once its first byte
    * landed, and how long the upgrade handshake may take — slow-network
    * tolerance, not the live-poll cadence. */
  private val FrameReadTimeoutMs = 10000

  private def serveClient(sock: Socket, uri: String, path: String): Unit = {
    // a client that connects and never speaks must not pin this thread
    // forever, and the head read is size-bounded (slowloris guard)
    sock.setSoTimeout(FrameReadTimeoutMs)
    val in = new BufferedInputStream(sock.getInputStream)
    val out = sock.getOutputStream
    val head = readRequestHead(in)
    val lines = head.split("\r\n").toSeq
    val request = lines.headOption.getOrElse("")
    val headers = lines.drop(1).flatMap { l =>
      val i = l.indexOf(':')
      if (i < 0) None else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
    }.toMap
    val isGet = request.startsWith("GET ")
    val reqPath = request.split(' ').lift(1).getOrElse("")
    val upgrade = headers.get("upgrade").exists(_.equalsIgnoreCase("websocket"))
    val key = headers.get("sec-websocket-key")
    if (!isGet || reqPath != path || !upgrade || key.isEmpty) {
      // wrong-client-protocol row of the reference matrix
      out.write(("HTTP/1.1 400 Bad Request\r\nConnection: close\r\n" +
        "Content-Length: 0\r\n\r\n").getBytes(UTF_8))
      out.flush()
      return
    }
    out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: ${acceptKey(key.get)}\r\n\r\n").getBytes(UTF_8))
    out.flush()
    // accumulate-then-drain: the buffered snapshot first …
    var lastSeq = -1L
    MemHub.poll(uri, "ws", -1L).foreach { m =>
      writeFrame(out, 0x1, m.payload)
      lastSeq = m.seq
    }
    // … then live items, interleaved with client control frames. The
    // 50 ms timeout applies ONLY to the frame's FIRST byte (the poll
    // cadence); once a frame starts, the rest reads under the long
    // timeout — a timeout mid-frame must never be treated as "no data"
    // or the parser desynchronizes on the frame's remaining bytes.
    var open = true
    while (open && !sock.isClosed) {
      // ONLY the first byte's timeout means "no frame in flight — poll":
      // once a frame has started, any exception (including a stall past
      // the frame timeout) fails the connection rather than risking a
      // desynchronized re-parse of mid-frame bytes as a fresh header.
      val b0 =
        try { sock.setSoTimeout(50); in.read() }
        catch { case _: SocketTimeoutException => Int.MinValue }
      if (b0 == Int.MinValue) {
        try MemHub.poll(uri, "ws", lastSeq).foreach { m =>
          writeFrame(out, 0x1, m.payload)
          lastSeq = m.seq
        } catch { case _: Throwable => open = false }
      } else if (b0 < 0) open = false
      else {
        try {
          sock.setSoTimeout(FrameReadTimeoutMs)
          readFrame(in, b0) match {
            case Some((0x8, payload)) => // close: echo and finish
              writeFrame(out, 0x8, payload)
              open = false
            case Some((0x9, payload)) => writeFrame(out, 0xA, payload) // ping→pong
            case Some(_) => () // sink is one-way; ignore data frames
            case None => open = false // EOF
          }
        } catch { case _: Throwable => open = false }
      }
    }
  }

  private def readRequestHead(in: InputStream): String = {
    val sb = new StringBuilder
    var prev4 = 0
    var c = in.read()
    while (c >= 0 && sb.length < MaxRequestHeadBytes) {
      sb.append(c.toChar)
      prev4 = ((prev4 << 8) | c) & 0xFFFFFFFF
      if (prev4 == 0x0D0A0D0A) return sb.toString
      c = in.read()
    }
    sb.toString
  }

  /** One server frame: FIN set, no mask (RFC 6455 §5.1: server frames are
    * never masked). */
  private[http] def writeFrame(out: OutputStream, opcode: Int, payload: Array[Byte]): Unit =
    out.synchronized {
      out.write(0x80 | (opcode & 0xF))
      val n = payload.length
      if (n < 126) out.write(n)
      else if (n <= 0xFFFF) { out.write(126); out.write(n >> 8); out.write(n & 0xFF) }
      else {
        out.write(127)
        var i = 7
        while (i >= 0) { out.write(((n.toLong >> (8 * i)) & 0xFF).toInt); i -= 1 }
      }
      out.write(payload)
      out.flush()
    }

  /** One client frame (first byte pre-read by the caller's polled read) →
    * (opcode, unmasked payload); None on EOF. Client frames MUST be
    * masked (§5.1) — unmasked data fails the connection — and the
    * declared length is capped BEFORE allocation (a 10-byte header must
    * not be able to demand a 2 GB buffer). */
  private[http] def readFrame(in: InputStream, b0: Int): Option[(Int, Array[Byte])] = {
    if (b0 < 0) return None
    val opcode = b0 & 0xF
    val b1 = in.read()
    if (b1 < 0) return None
    val masked = (b1 & 0x80) != 0
    var len: Long = b1 & 0x7F
    if (len == 126) len = (readByte(in) << 8) | readByte(in)
    else if (len == 127) {
      len = 0
      var i = 0
      while (i < 8) { len = (len << 8) | readByte(in); i += 1 }
    }
    require(masked, "client frames must be masked (RFC 6455 §5.1)")
    require(len >= 0 && len <= MaxClientFrameBytes,
      s"client frame of $len bytes exceeds the $MaxClientFrameBytes ceiling")
    val mask = Array.fill(4)(readByte(in).toByte)
    val payload = new Array[Byte](len.toInt)
    var off = 0
    while (off < len) {
      val r = in.read(payload, off, len.toInt - off)
      if (r < 0) return None
      off += r
    }
    var i = 0
    while (i < payload.length) {
      payload(i) = (payload(i) ^ mask(i % 4)).toByte
      i += 1
    }
    Some((opcode, payload))
  }

  private def readByte(in: InputStream): Long = {
    val b = in.read()
    if (b < 0) throw new java.io.EOFException("ws frame truncated")
    b.toLong
  }
}
