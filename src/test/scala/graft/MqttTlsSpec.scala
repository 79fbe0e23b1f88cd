package graft

import java.nio.file.Files

import javax.net.ssl.{SSLException, SSLHandshakeException}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.sinks.GraftSinks
import graft.sources.GraftSources
import graft.sources.http.HttpEndpoint.TlsConfig
import graft.sources.hub.{MemHub, TlsGate}
import graft.sources.hub.TlsGate.ClientTls

/** The reference's TLS-Mosquitto matrix (mqtt SecuredMosquittoContainer:
  * MqttSources/MqttSinks against an `ssl://` broker URL): a trusted
  * client connects and reads/publishes; an untrusted or store-less client
  * fails the HANDSHAKE — connect-time, never reaching the log — and
  * mutual auth additionally demands a client certificate the broker
  * trusts. The handshake is genuine JSSE (TlsGate pumps real SSLEngines);
  * certs are a per-run keytool fixture. */
class MqttTlsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  private val pass = "changeit"

  /** (server keystore, client truststore, client keystore, server truststore) */
  private lazy val stores: (String, String, String, String) = {
    val dir = Files.createTempDirectory("graft-mqtt-tls").toFile
    dir.deleteOnExit()
    def run(args: String*): Unit = {
      val p = new ProcessBuilder(("keytool" +: args): _*)
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      require(p.waitFor() == 0, s"keytool ${args.head} failed:\n$out")
    }
    val serverKs = s"$dir/broker.p12"
    val clientTrust = s"$dir/client-trust.p12"
    val clientKs = s"$dir/client.p12"
    val serverTrust = s"$dir/broker-trust.p12"
    run("-genkeypair", "-alias", "broker", "-keyalg", "RSA", "-keysize", "2048",
      "-validity", "1", "-dname", "CN=mqtt-broker",
      "-keystore", serverKs, "-storetype", "PKCS12", "-storepass", pass)
    run("-exportcert", "-alias", "broker", "-keystore", serverKs,
      "-storepass", pass, "-file", s"$dir/broker.cer")
    run("-importcert", "-alias", "broker", "-file", s"$dir/broker.cer",
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

  test("ssl:// broker: trusted client round-trips; untrusted/plain clients fail the handshake") {
    val (serverKs, clientTrust, _, _) = stores
    val uri = "hub:test/mqtt-tls"
    MemHub.secureTlsTopics(uri, TlsConfig(serverKs, pass))
    val trusted = Some(ClientTls(None, pass, Some(clientTrust)))
    // publish over TLS, read back over TLS — payloads intact
    import spark.implicits._
    GraftSinks.mqttPublish(
      Seq(("t1", "hello".getBytes("UTF-8")), ("t1", "world".getBytes("UTF-8")))
        .toDF("topic", "payload"),
      uri, qos = 1, tls = trusted)
    val got = GraftSources.mqttBatch(spark, uri, Seq("t1"), tls = trusted)
      .select(col("payload").cast("string")).as[String].collect().sorted
    assert(got.toSeq == Seq("hello", "world"))
    // no client TLS at all: the tcp://-against-ssl-port failure
    val e1 = intercept[SSLException] {
      GraftSources.mqttBatch(spark, uri, Seq("t1")).count()
    }
    assert(e1.getMessage.contains("requires TLS"))
    // client without the broker cert in any truststore (platform CAs
    // don't vouch for the self-signed fixture): handshake fails — as the
    // client's cert-validation SSLHandshakeException or the broker's
    // fatal-alert SSLException, whichever engine throws first
    intercept[SSLException] {
      GraftSources.mqttBatch(spark, uri, Seq("t1"),
        tls = Some(ClientTls(None, pass, None))).count()
    }
    // sink side gates identically
    intercept[SSLException] {
      GraftSinks.mqttPublish(
        Seq(("t1", "x".getBytes("UTF-8"))).toDF("topic", "payload"), uri)
    }: Unit
  }

  test("ssl:// mutual auth: client certificate demanded and verified") {
    val (serverKs, clientTrust, clientKs, serverTrust) = stores
    val uri = "hub:test/mqtt-mtls"
    MemHub.secureTlsTopics(uri,
      TlsConfig(serverKs, pass, needClientAuth = true, truststorePath = Some(serverTrust)))
    import spark.implicits._
    // full stores on both sides: connect + publish + read all pass
    val mutual = Some(ClientTls(Some(clientKs), pass, Some(clientTrust)))
    GraftSinks.mqttPublish(
      Seq(("m", "secured".getBytes("UTF-8"))).toDF("topic", "payload"),
      uri, qos = 2, tls = mutual)
    assert(GraftSources.mqttBatch(spark, uri, Seq("m"), tls = mutual).count() == 1)
    // trusted server but NO client certificate: the broker demands one
    intercept[SSLException] {
      GraftSources.mqttBatch(spark, uri, Seq("m"),
        tls = Some(ClientTls(None, pass, Some(clientTrust)))).count()
    }: Unit
  }

  test("TLS gate composes with broker credentials (secured + ssl broker)") {
    val (serverKs, clientTrust, _, _) = stores
    val uri = "hub:test/mqtt-tls-auth"
    MemHub.secureTlsTopics(uri, TlsConfig(serverKs, pass))
    MemHub.secureTopics(uri, "user", "pw")
    val trusted = Some(ClientTls(None, pass, Some(clientTrust)))
    import spark.implicits._
    GraftSinks.mqttPublish(
      Seq(("a", "1".getBytes("UTF-8"))).toDF("topic", "payload"),
      uri, auth = Some(("user", "pw")), tls = trusted)
    assert(GraftSources.mqttBatch(spark, uri, Seq("a"),
      auth = Some(("user", "pw")), tls = trusted).count() == 1)
    // right TLS, wrong password: still "Not authorized to connect"
    intercept[SecurityException] {
      GraftSources.mqttBatch(spark, uri, Seq("a"),
        auth = Some(("user", "wrong")), tls = trusted).count()
    }: Unit
  }
}
