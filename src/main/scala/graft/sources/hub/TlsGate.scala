package graft.sources.hub

import java.nio.ByteBuffer

import javax.net.ssl.{SSLContext, SSLEngine, SSLEngineResult}
import javax.net.ssl.SSLEngineResult.HandshakeStatus._

import graft.sources.http.HttpEndpoint
import graft.sources.http.HttpEndpoint.TlsConfig

/** TLS gate for hub namespaces — the `ssl://` broker analog
  * (mqtt SecuredMosquittoContainer: the reference's secured tests run
  * Mosquitto behind TLS and the client connects with an `ssl://` URL and
  * its own stores). The handshake is REAL JSSE: a server `SSLEngine`
  * built from the broker's PKCS12 keystore and a client engine from the
  * caller's stores pump wrap/unwrap until the handshake completes — so
  * an untrusted server cert, a missing client cert under mutual auth, or
  * no client TLS at all fail with the genuine `SSLHandshakeException`
  * paths, never reaching the log. Swapping the in-process pump for a real
  * socket changes nothing above the engines. */
object TlsGate {

  /** Client-side stores: `keystore` is the client certificate (only needed
    * for mutual auth), `truststore` holds the broker certs the client
    * trusts (None = platform CAs, which reject self-signed brokers). */
  final case class ClientTls(
      keystore: Option[String],
      password: String,
      truststore: Option[String])

  /** Runs a full TLS handshake between broker and client engines.
    * Throws `SSLHandshakeException` (or `SSLException`) exactly where a
    * real broker connection would. */
  def handshake(server: TlsConfig, client: ClientTls): Unit = {
    val serverCtx = HttpEndpoint.sslContext(
      Some(server.keystorePath), server.password, server.truststorePath)
    val clientCtx = HttpEndpoint.sslContext(
      client.keystore, client.password, client.truststore)
    val se = serverCtx.createSSLEngine()
    se.setUseClientMode(false)
    if (server.needClientAuth) se.setNeedClientAuth(true)
    val ce = clientCtx.createSSLEngine("mqtt-broker", 8883)
    ce.setUseClientMode(true)
    pump(ce, se)
  }

  private def pump(client: SSLEngine, server: SSLEngine): Unit = {
    val bufSize = client.getSession.getPacketBufferSize + (1 << 14)
    val empty = ByteBuffer.allocate(0)
    val cApp = ByteBuffer.allocate(bufSize)
    val sApp = ByteBuffer.allocate(bufSize)
    val c2s = ByteBuffer.allocate(bufSize); c2s.flip()
    val s2c = ByteBuffer.allocate(bufSize); s2c.flip()
    client.beginHandshake()
    server.beginHandshake()
    def done(e: SSLEngine) = {
      val s = e.getHandshakeStatus
      s == NOT_HANDSHAKING || s == FINISHED
    }
    // one engine's outgoing net buffer is the other's incoming; `out` is
    // kept in read mode between wraps (compact to append, flip back)
    def step(e: SSLEngine, out: ByteBuffer, in: ByteBuffer, app: ByteBuffer): Boolean =
      e.getHandshakeStatus match {
        case NEED_TASK =>
          var t = e.getDelegatedTask
          while (t != null) { t.run(); t = e.getDelegatedTask }
          true
        case NEED_WRAP =>
          out.compact()
          val r = e.wrap(empty, out)
          out.flip()
          r.getStatus == SSLEngineResult.Status.OK && r.bytesProduced() > 0
        case NEED_UNWRAP | NEED_UNWRAP_AGAIN if in.hasRemaining =>
          app.clear()
          val r = e.unwrap(in, app)
          r.getStatus != SSLEngineResult.Status.BUFFER_UNDERFLOW
        case _ => false // waiting on peer bytes
      }
    var idle = 0
    while (!(done(client) && done(server))) {
      val progressed = step(client, c2s, s2c, cApp) | step(server, s2c, c2s, sApp)
      idle = if (progressed) 0 else idle + 1
      if (idle > 64)
        throw new javax.net.ssl.SSLHandshakeException(
          s"TLS handshake stalled (client=${client.getHandshakeStatus}, " +
            s"server=${server.getHandshakeStatus})")
    }
  }
}
