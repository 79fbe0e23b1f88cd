package graft.sources.http

import java.io.OutputStream
import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.sources.hub.MemHub

/** Embedded HTTP endpoints — the reference's server-in-the-engine pattern
  * (S13 listener source, `HttpListenerSourceBuilder.java:214-254`; K8
  * WS/SSE sink, `HttpListenerSinkBuilder.java:231-263`), on the JDK's
  * built-in `HttpServer` (no dependencies, binds localhost).
  *
  * The listener accepts POST/PUT bodies and appends them to the source's
  * topic log; the broadcaster serves the sink's accumulate buffer as a
  * `text/event-stream` snapshot. Lifecycle: start once per process (the
  * reference's `distributed(1)`/`forceTotalParallelismOne` analog is a
  * single server on the driver), stop on shutdown — never per micro-batch.
  */
object HttpEndpoint {

  /** POST/PUT `/` → topic log. Returns (server, boundPort); port 0 = ephemeral. */
  def startListener(uri: String, port: Int = 0): (HttpServer, Int) = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
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
  def startBroadcast(uri: String, port: Int = 0): (HttpServer, Int) = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
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
    (server, server.getAddress.getPort)
  }
}
