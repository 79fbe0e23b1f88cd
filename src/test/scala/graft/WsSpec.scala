package graft

import java.io.{BufferedInputStream, InputStream, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.sinks.GraftSinks
import graft.sources.hub.MemHub
import graft.sources.http.{HttpEndpoint, WsEndpoint}

/** K8's WebSocket protocol leg (VERDICT r8 "what's missing" #1): a REAL
  * RFC 6455 round-trip against [[WsEndpoint]] — handshake, accumulate-
  * then-drain of the drop-oldest buffer, live push, ping/pong, close,
  * the wrong-protocol 400, the TLS variant, and address advertisement —
  * mirroring the reference's protocol matrix
  * (`HttpListenerSinkTest.java:103-473`).
  *
  * The client below speaks the protocol from scratch (masked client
  * frames per §5.1) so the test exercises graft's server against the
  * RFC, not against its own code.
  */
class WsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4, "graft-ws")

  // ---- minimal RFC 6455 client -------------------------------------------

  private final class WsClient(host: String, port: Int, path: String,
      ssl: Option[javax.net.ssl.SSLContext] = None) {
    val sock: Socket = ssl match {
      case None => new Socket(host, port)
      case Some(ctx) => ctx.getSocketFactory.createSocket(host, port)
    }
    private val in = new BufferedInputStream(sock.getInputStream)
    private val out: OutputStream = sock.getOutputStream
    private val rnd = new scala.util.Random(42)

    val acceptHeader: String = {
      val key = java.util.Base64.getEncoder.encodeToString(
        Array.fill(16)(rnd.nextInt(256).toByte))
      out.write((s"GET $path HTTP/1.1\r\nHost: $host:$port\r\n" +
        "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
        s"Sec-WebSocket-Key: $key\r\nSec-WebSocket-Version: 13\r\n\r\n")
        .getBytes(UTF_8))
      out.flush()
      val head = readHead(in)
      assert(head.startsWith("HTTP/1.1 101"), s"no upgrade: $head")
      // computed INDEPENDENTLY from the RFC (not via WsEndpoint) so the
      // handshake is tested against the spec, not the implementation
      val expect = java.util.Base64.getEncoder.encodeToString(
        java.security.MessageDigest.getInstance("SHA-1").digest(
          (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8)))
      val got = head.split("\r\n")
        .find(_.toLowerCase.startsWith("sec-websocket-accept:"))
        .map(_.split(":", 2)(1).trim).getOrElse("")
      assert(got == expect, "Sec-WebSocket-Accept must be SHA1(key+GUID)")
      got
    }

    private def readHead(in: InputStream): String = {
      val sb = new StringBuilder
      var last4 = 0
      var c = in.read()
      while (c >= 0) {
        sb.append(c.toChar)
        last4 = ((last4 << 8) | c) & 0xFFFFFFFF
        if (last4 == 0x0D0A0D0A) return sb.toString
        c = in.read()
      }
      sb.toString
    }

    /** Masked client frame (§5.1: client MUST mask). */
    def send(opcode: Int, payload: Array[Byte]): Unit = {
      out.write(0x80 | opcode)
      val n = payload.length
      if (n < 126) out.write(0x80 | n)
      else { assert(n <= 0xFFFF); out.write(0x80 | 126); out.write(n >> 8); out.write(n & 0xFF) }
      val mask = Array.fill(4)(rnd.nextInt(256).toByte)
      out.write(mask)
      out.write(payload.zipWithIndex.map { case (b, i) => (b ^ mask(i % 4)).toByte })
      out.flush()
    }

    /** Server frame → (opcode, payload); server frames are unmasked. */
    def read(timeoutMs: Int = 5000): (Int, Array[Byte]) = {
      sock.setSoTimeout(timeoutMs)
      val b0 = in.read(); val b1 = in.read()
      assert(b0 >= 0 && b1 >= 0, "eof")
      assert((b1 & 0x80) == 0, "server frames must not be masked")
      var len = b1 & 0x7F
      if (len == 126) len = (in.read() << 8) | in.read()
      val p = new Array[Byte](len)
      var off = 0
      while (off < len) {
        val r = in.read(p, off, len - off); assert(r >= 0); off += r
      }
      (b0 & 0xF, p)
    }

    def readText(timeoutMs: Int = 5000): String = {
      val (op, p) = read(timeoutMs)
      assert(op == 0x1, s"expected text frame, got opcode $op")
      new String(p, UTF_8)
    }

    def close(): Unit = try sock.close() catch { case _: Throwable => () }
  }

  // ---- the matrix ---------------------------------------------------------

  test("accumulate-then-drain: a connecting client receives the drop-oldest buffer") {
    val uri = "hub:test/ws-drain"
    GraftSinks.wsBroadcast(
      spark.range(1, 6).select(col("id").cast("string").as("payload")).orderBy(col("id")),
      uri, accumulateLimit = 3)
    val server = WsEndpoint.startWebsocket(uri)
    try {
      val c = new WsClient("127.0.0.1", server.port, "/")
      try {
        // cap 3, published 1..5 → the buffer holds 3,4,5
        assert(Seq(c.readText(), c.readText(), c.readText()) == Seq("3", "4", "5"))
      } finally c.close()
    } finally server.stop()
  }

  test("live push: items published after connect stream to the open socket") {
    val uri = "hub:test/ws-live"
    val server = WsEndpoint.startWebsocket(uri)
    try {
      val c = new WsClient("127.0.0.1", server.port, "/")
      try {
        GraftSinks.wsBroadcast(
          spark.range(10, 12).select(col("id").cast("string").as("payload")).orderBy(col("id")),
          uri, accumulateLimit = 10)
        assert(c.readText() == "10" && c.readText() == "11",
          "post-connect publishes must reach the connected peer")
      } finally c.close()
    } finally server.stop()
  }

  test("broadcast fan-out: every connected peer receives every item") {
    val uri = "hub:test/ws-fanout"
    val server = WsEndpoint.startWebsocket(uri)
    try {
      val c1 = new WsClient("127.0.0.1", server.port, "/")
      val c2 = new WsClient("127.0.0.1", server.port, "/")
      try {
        GraftSinks.wsBroadcast(
          spark.range(21, 24).select(col("id").cast("string").as("payload")).orderBy(col("id")),
          uri, accumulateLimit = 10)
        // the reference sends to ALL peerConnections
        // (HttpListenerSinkContext.java:181); both sockets must see all
        assert(Seq(c1.readText(), c1.readText(), c1.readText()) == Seq("21", "22", "23"))
        assert(Seq(c2.readText(), c2.readText(), c2.readText()) == Seq("21", "22", "23"))
      } finally { c1.close(); c2.close() }
    } finally server.stop()
  }

  test("control frames: ping gets pong, close gets a close reply") {
    val uri = "hub:test/ws-control"
    val server = WsEndpoint.startWebsocket(uri)
    try {
      val c = new WsClient("127.0.0.1", server.port, "/")
      try {
        c.send(0x9, "hb".getBytes(UTF_8))
        val (op, p) = c.read()
        assert(op == 0xA && new String(p, UTF_8) == "hb", "pong must echo ping payload")
        c.send(0x8, Array.emptyByteArray)
        val (op2, _) = c.read()
        assert(op2 == 0x8, "close must be echoed")
      } finally c.close()
    } finally server.stop()
  }

  test("a ping whose bytes straddle the poll timeout still gets a pong (no frame desync)") {
    val uri = "hub:test/ws-slowframe"
    val server = WsEndpoint.startWebsocket(uri)
    try {
      val c = new WsClient("127.0.0.1", server.port, "/")
      try {
        // hand-feed the frame in two writes with a pause longer than the
        // 50 ms poll cadence between them: the server reads byte 0, must
        // then WAIT for the rest instead of treating the timeout as "no
        // data" and re-parsing mid-frame bytes as a new header
        val out = c.sock.getOutputStream
        out.write(0x89) // FIN + ping
        out.flush()
        Thread.sleep(250)
        val mask = Array[Byte](1, 2, 3, 4)
        val payload = "hb".getBytes(UTF_8)
        out.write(0x80 | payload.length)
        out.write(mask)
        out.write(payload.zipWithIndex.map { case (b, i) => (b ^ mask(i % 4)).toByte })
        out.flush()
        val (op, p) = c.read()
        assert(op == 0xA && new String(p, UTF_8) == "hb",
          "split-frame ping must still round-trip as a pong")
      } finally c.close()
    } finally server.stop()
  }

  test("a frame header declaring a huge payload fails the connection, never allocates") {
    val uri = "hub:test/ws-hugeframe"
    val server = WsEndpoint.startWebsocket(uri)
    try {
      val c = new WsClient("127.0.0.1", server.port, "/")
      try {
        val out = c.sock.getOutputStream
        // 127-form length declaring 2^31-1 bytes, masked
        out.write(0x81); out.write(0x80 | 127)
        out.write(Array[Byte](0, 0, 0, 0, 0x7F.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte))
        out.write(Array[Byte](1, 2, 3, 4)) // mask
        out.flush()
        // server must drop the connection (oversized), not buffer 2 GB
        val eof = try { c.sock.getInputStream.read() < 0 } catch { case _: Throwable => true }
        assert(eof, "oversized frame must fail the connection")
      } finally c.close()
    } finally server.stop()
  }

  test("wrong client protocol: a plain HTTP request gets 400") {
    val uri = "hub:test/ws-wrongproto"
    val server = WsEndpoint.startWebsocket(uri)
    try {
      val sock = new Socket("127.0.0.1", server.port)
      try {
        sock.getOutputStream.write(
          "GET / HTTP/1.1\r\nHost: x\r\n\r\n".getBytes(UTF_8))
        sock.getOutputStream.flush()
        val buf = new Array[Byte](64)
        val n = sock.getInputStream.read(buf)
        assert(new String(buf, 0, math.max(n, 0), UTF_8).startsWith("HTTP/1.1 400"),
          "a non-upgrade request must be rejected, not frame-decoded")
      } finally sock.close()
    } finally server.stop()
  }

  /** Self-signed keytool fixture (the HttpTlsSpec device). */
  private lazy val wssStores: (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-wss").toFile
    dir.deleteOnExit()
    def run(args: String*): Unit = {
      val p = new ProcessBuilder(("keytool" +: args): _*)
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      require(p.waitFor() == 0, s"keytool ${args.head} failed:\n$out")
    }
    val ks = s"$dir/server.p12"
    val trust = s"$dir/trust.p12"
    run("-genkeypair", "-alias", "server", "-keyalg", "RSA", "-keysize", "2048",
      "-validity", "1", "-dname", "CN=127.0.0.1", "-ext", "SAN=ip:127.0.0.1",
      "-keystore", ks, "-storetype", "PKCS12", "-storepass", "graftpw")
    run("-exportcert", "-alias", "server", "-keystore", ks,
      "-storepass", "graftpw", "-file", s"$dir/server.cer")
    run("-importcert", "-alias", "server", "-file", s"$dir/server.cer",
      "-keystore", trust, "-storetype", "PKCS12", "-storepass", "graftpw", "-noprompt")
    (ks, trust)
  }

  test("TLS variant: wss round-trip over the shared keystore machinery") {
    val (ks, trust) = wssStores
    val uri = "hub:test/wss"
    GraftSinks.wsBroadcast(
      spark.range(7, 9).select(col("id").cast("string").as("payload")).orderBy(col("id")),
      uri, accumulateLimit = 10)
    val server = WsEndpoint.startWebsocket(uri,
      tls = Some(HttpEndpoint.TlsConfig(ks, "graftpw")))
    try {
      val ctx = HttpEndpoint.sslContext(None, "graftpw", Some(trust))
      val c = new WsClient("127.0.0.1", server.port, "/", ssl = Some(ctx))
      try assert(Seq(c.readText(), c.readText()) == Seq("7", "8"))
      finally c.close()
    } finally server.stop()
  }

  test("address advertisement: ws scheme, reachable host, first wins") {
    val uri = "hub:test/ws-advertise"
    val jobId = "job-ws-advertise-1"
    GraftSinks.wsBroadcast(
      spark.range(1, 2).select(col("id").cast("string").as("payload")),
      uri, accumulateLimit = 10)
    val server = WsEndpoint.startWebsocket(uri, jobId = Some(jobId))
    try {
      val addr = MemHub.sinkAddress(jobId)
      assert(addr == s"ws://127.0.0.1:${server.port}/", s"bad address: $addr")
      // the advertised address actually connects
      val c = new WsClient("127.0.0.1", server.port, "/")
      try assert(c.readText() == "1") finally c.close()
    } finally server.stop()
  }

  test("streaming shape: writeStream.foreach(wsBroadcastWriter) pushes epochs to a live socket") {
    val uri = "hub:test/ws-streaming"
    val server = WsEndpoint.startWebsocket(uri)
    try {
      val c = new WsClient("127.0.0.1", server.port, "/")
      try {
        import spark.implicits._
        val mem = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[String](spark)
        mem.addData("e1", "e2")
        val q = mem.toDF().select(col("value").as("payload"))
          .writeStream
          .foreach(GraftSinks.wsBroadcastWriter(uri, accumulateLimit = 10))
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(30000)
        assert(Seq(c.readText(), c.readText()) == Seq("e1", "e2"),
          "epoch-close publishes must reach the connected peer")
      } finally c.close()
    } finally server.stop()
  }

  test("advertiseHost override reaches the advertisement verbatim") {
    val uri = "hub:test/ws-advertise-host"
    val jobId = "job-ws-advertise-host-1"
    val server = WsEndpoint.startWebsocket(uri, jobId = Some(jobId),
      advertiseHost = Some("node-3.cluster.internal"))
    try {
      assert(MemHub.sinkAddress(jobId) ==
        s"ws://node-3.cluster.internal:${server.port}/")
    } finally server.stop()
  }
}
