package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.sinks.GraftSinks
import graft.sources.GraftSources
import graft.sources.http.HttpEndpoint
import graft.sources.http.HttpEndpoint.TlsConfig

/** The reference's HTTPS protocol matrix (HttpListenerSinkTest.java:103-473,
  * HttpListenerSourceBuilder.java:214-254): TLS listener + SSE broadcast,
  * mutual auth, and the negative cases — wrong protocol, untrusted server
  * cert, missing client cert — all of which must fail the HANDSHAKE, not
  * reach a handler. Certificates are a self-signed keytool fixture minted
  * per run. */
class HttpTlsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  private val pass = "changeit"

  /** (server keystore, client truststore, client keystore, server truststore) */
  private lazy val stores: (String, String, String, String) = {
    val dir = Files.createTempDirectory("graft-tls").toFile
    dir.deleteOnExit()
    def run(args: String*): Unit = {
      val p = new ProcessBuilder(("keytool" +: args): _*)
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      require(p.waitFor() == 0, s"keytool ${args.head} failed:\n$out")
    }
    val serverKs = s"$dir/server.p12"
    val clientTrust = s"$dir/client-trust.p12"
    val clientKs = s"$dir/client.p12"
    val serverTrust = s"$dir/server-trust.p12"
    run("-genkeypair", "-alias", "server", "-keyalg", "RSA", "-keysize", "2048",
      "-validity", "1", "-dname", "CN=127.0.0.1", "-ext", "SAN=ip:127.0.0.1",
      "-keystore", serverKs, "-storetype", "PKCS12", "-storepass", pass)
    run("-exportcert", "-alias", "server", "-keystore", serverKs,
      "-storepass", pass, "-file", s"$dir/server.cer")
    run("-importcert", "-alias", "server", "-file", s"$dir/server.cer",
      "-keystore", clientTrust, "-storetype", "PKCS12", "-storepass", pass, "-noprompt")
    run("-genkeypair", "-alias", "client", "-keyalg", "RSA", "-keysize", "2048",
      "-validity", "1", "-dname", "CN=graft-client",
      "-keystore", clientKs, "-storetype", "PKCS12", "-storepass", pass)
    run("-exportcert", "-alias", "client", "-keystore", clientKs,
      "-storepass", pass, "-file", s"$dir/client.cer")
    run("-importcert", "-alias", "client", "-file", s"$dir/client.cer",
      "-keystore", serverTrust, "-storetype", "PKCS12", "-storepass", pass, "-noprompt")
    (serverKs, clientTrust, clientKs, serverTrust)
  }

  private def client(keystore: Option[String], truststore: Option[String]): HttpClient =
    HttpClient.newBuilder()
      .sslContext(HttpEndpoint.sslContext(keystore, pass, truststore))
      .build()

  private def post(c: HttpClient, url: String, body: String): Int =
    c.send(HttpRequest.newBuilder(URI.create(url))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.discarding()).statusCode()

  test("TLS listener: https POSTs land in the log; plain-http and untrusted clients fail the handshake") {
    val (serverKs, clientTrust, _, _) = stores
    val uri = "hub:test/https-live"
    val (server, port) = HttpEndpoint.startListener(uri,
      tls = Some(TlsConfig(serverKs, pass)))
    try {
      val good = client(None, Some(clientTrust))
      (1 to 5).foreach { i =>
        assert(post(good, s"https://127.0.0.1:$port/", s"""{"id":$i}""") == 200)
      }
      // wrong protocol: plaintext http against the TLS port never reaches
      // a handler — the connection dies in the handshake
      intercept[java.io.IOException] {
        post(good, s"http://127.0.0.1:$port/", """{"id":99}""")
      }
      // untrusted server cert: default trust roots don't vouch for the
      // self-signed server — handshake failure on the client side
      intercept[java.io.IOException] {
        post(HttpClient.newHttpClient(), s"https://127.0.0.1:$port/", """{"id":99}""")
      }
      val ids = GraftSources.httpListenerBatch(spark, uri)
        .select(get_json_object(col("payload"), "$.id").cast("int").as("id"))
        .collect().map(_.getInt(0)).sorted.toSeq
      assert(ids == (1 to 5), s"only the 5 TLS POSTs may land: $ids")
    } finally server.stop(0)
  }

  test("mutual auth: the listener demands a client certificate its truststore vouches for") {
    val (serverKs, clientTrust, clientKs, serverTrust) = stores
    val uri = "hub:test/https-mutual"
    val (server, port) = HttpEndpoint.startListener(uri,
      tls = Some(TlsConfig(serverKs, pass, needClientAuth = true,
        truststorePath = Some(serverTrust))))
    try {
      // no client cert -> server aborts the handshake
      intercept[java.io.IOException] {
        post(client(None, Some(clientTrust)), s"https://127.0.0.1:$port/", "x")
      }
      // trusted client cert -> accepted
      val mutual = client(Some(clientKs), Some(clientTrust))
      assert(post(mutual, s"https://127.0.0.1:$port/", """{"id":1}""") == 200)
      assert(GraftSources.httpListenerBatch(spark, uri).count() == 1)
    } finally server.stop(0)
  }

  test("TLS SSE broadcast: the sink buffer serves over https") {
    val (serverKs, clientTrust, _, _) = stores
    val uri = "hub:test/https-sse"
    GraftSinks.wsBroadcast(
      spark.range(1, 6).select(col("id").cast("string").as("payload")).orderBy(col("id")),
      uri, accumulateLimit = 3)
    val (server, port) = HttpEndpoint.startBroadcast(uri,
      tls = Some(TlsConfig(serverKs, pass)))
    try {
      val resp = client(None, Some(clientTrust)).send(
        HttpRequest.newBuilder(URI.create(s"https://127.0.0.1:$port/events")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200)
      assert(resp.headers().firstValue("Content-Type").orElse("") == "text/event-stream")
      val got = resp.body().split("\n\n").filter(_.nonEmpty)
        .map(_.stripPrefix("data: ").toInt).toSeq
      assert(got == Seq(3, 4, 5), "drop-oldest buffer: last 3 payloads")
    } finally server.stop(0)
  }
}
