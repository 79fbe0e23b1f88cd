package graft.sources.http

import java.io.{FileInputStream, OutputStream}
import java.net.InetSocketAddress
import java.security.KeyStore
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManager, TrustManagerFactory}

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer, HttpsConfigurator, HttpsParameters, HttpsServer}

import graft.sources.hub.MemHub

/** Embedded HTTP(S) endpoints — the reference's server-in-the-engine
  * pattern (S13 listener source, `HttpListenerSourceBuilder.java:214-254`;
  * K8 WS/SSE sink, `HttpListenerSinkBuilder.java:231-263`), on the JDK's
  * built-in `HttpServer` (no dependencies, binds localhost).
  *
  * The listener accepts POST/PUT bodies and appends them to the source's
  * topic log; the broadcaster serves the sink's accumulate buffer as a
  * `text/event-stream` snapshot. Lifecycle: start once per process (the
  * reference's `distributed(1)`/`forceTotalParallelismOne` analog is a
  * single server on the driver), stop on shutdown — never per micro-batch.
  *
  * TLS mirrors the reference's protocol matrix
  * (`HttpListenerSinkTest.java:103-473`): pass a [[TlsConfig]] to serve
  * https — with `needClientAuth` the handshake additionally demands a
  * client certificate the server's truststore vouches for (mutual auth);
  * a plain-http client, or one without a trusted cert, fails the
  * handshake and never reaches a handler.
  */
object HttpEndpoint {

  /** Keystore-backed TLS settings (PKCS12). `truststorePath` holds the
    * peer certificates the server trusts — required for mutual auth. */
  final case class TlsConfig(
      keystorePath: String,
      password: String,
      needClientAuth: Boolean = false,
      truststorePath: Option[String] = None)

  /** SSLContext from PKCS12 stores — shared by servers and test clients. */
  def sslContext(keystorePath: Option[String], password: String,
      truststorePath: Option[String]): SSLContext = {
    def load(path: String): KeyStore = {
      val ks = KeyStore.getInstance("PKCS12")
      val in = new FileInputStream(path)
      try { ks.load(in, password.toCharArray); ks } finally in.close()
    }
    val kms = keystorePath.map { kp =>
      val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
      kmf.init(load(kp), password.toCharArray)
      kmf.getKeyManagers
    }.orNull
    val tms: Array[TrustManager] = truststorePath.map { tp =>
      val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(load(tp))
      tmf.getTrustManagers
    }.orNull
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kms, tms, null)
    ctx
  }

  private def createServer(port: Int, tls: Option[TlsConfig],
      bindHost: String = "127.0.0.1"): HttpServer = {
    val addr = new InetSocketAddress(bindHost, port)
    tls match {
      case None => HttpServer.create(addr, 0)
      case Some(cfg) =>
        val server = HttpsServer.create(addr, 0)
        val ctx = sslContext(Some(cfg.keystorePath), cfg.password, cfg.truststorePath)
        server.setHttpsConfigurator(new HttpsConfigurator(ctx) {
          override def configure(params: HttpsParameters): Unit = {
            val ssl = ctx.getDefaultSSLParameters
            ssl.setNeedClientAuth(cfg.needClientAuth)
            params.setSSLParameters(ssl)
          }
        })
        server
    }
  }

  /** POST/PUT `/` → topic log. Returns (server, boundPort); port 0 =
    * ephemeral. With `tls` the listener serves https (and, when
    * configured, demands mutual auth). */
  def startListener(uri: String, port: Int = 0,
      tls: Option[TlsConfig] = None): (HttpServer, Int) = {
    val server = createServer(port, tls)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val method = ex.getRequestMethod
        if (method == "POST" || method == "PUT") {
          val body = ex.getRequestBody.readAllBytes()
          MemHub.publish(uri, "http", Iterator(("", Map.empty[String, String], 0L, body)))
          ex.sendResponseHeaders(200, -1)
        } else {
          // wrong-client-protocol case (HttpListenerSourceTest matrix)
          ex.sendResponseHeaders(405, -1)
        }
        ex.close()
      }
    })
    server.start()
    (server, server.getAddress.getPort)
  }

  /** GET `/events` → SSE snapshot of the broadcast buffer. */
  /** `jobId` opts into the reference's address-advertisement contract
    * (HttpListenerSinks.java:113-131): the listener binds an EPHEMERAL
    * port on whichever member won the election, and clients discover
    * `host:port` through [[graft.sources.hub.MemHub.sinkAddress]] instead
    * of having to know it up front. */
  def startBroadcast(uri: String, port: Int = 0,
      tls: Option[TlsConfig] = None,
      jobId: Option[String] = None,
      bindHost: String = "127.0.0.1",
      advertiseHost: Option[String] = None): (HttpServer, Int) = {
    val server = createServer(port, tls, bindHost)
    server.createContext("/events", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        if (ex.getRequestMethod == "GET") {
          val payloads = MemHub.poll(uri, "ws", -1)
          val body = payloads.map(m => s"data: ${new String(m.payload, "UTF-8")}\n\n")
            .mkString.getBytes("UTF-8")
          ex.getResponseHeaders.add("Content-Type", "text/event-stream")
          ex.sendResponseHeaders(200, body.length.toLong)
          val os: OutputStream = ex.getResponseBody
          os.write(body)
          os.close()
        } else {
          ex.sendResponseHeaders(405, -1)
        }
        ex.close()
      }
    })
    server.start()
    val bound = server.getAddress.getPort
    jobId.foreach { id =>
      val scheme = if (tls.isDefined) "https" else "http"
      // advertise a REACHABLE host, not a literal: the elected member's
      // name when configured, else the bind host (which is only ambiguous
      // when binding all interfaces — then fall back to the local address)
      val host = advertiseHost.getOrElse(
        if (bindHost == "0.0.0.0")
          java.net.InetAddress.getLocalHost.getHostAddress
        else bindHost)
      MemHub.advertiseSinkAddress(id, s"$scheme://$host:$bound/events")
    }
    (server, bound)
  }
}
