package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.{KeyFactory, KeyStore, PrivateKey, SecureRandom}
import java.security.cert.{CertificateFactory, X509Certificate}
import java.security.spec.PKCS8EncodedKeySpec
import java.util.Base64

import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

/**
 * PEM-based TLS contexts for the ingest front-ends, shaped after the
 * reference's tls config blocks (tests/tls/carbon-clickhouse.conf.tpl:
 * `ca-cert = [...]`, `certificates = [{cert, key}]`). The reference
 * terminates TLS on its ClickHouse *upload* client; this engine has no
 * HTTP sink, so the same material instead secures the *listener* side
 * (TCP plaintext + the shared HTTP endpoint), matching the e2e intent
 * of tests/tls. Pure-JDK: X509 via CertificateFactory, keys as PKCS#8
 * (`BEGIN PRIVATE KEY`, what openssl/Go tooling emit today).
 */
object Tls {

  private def pemBlocks(pem: String, label: String): Seq[Array[Byte]] = {
    val re = s"(?s)-----BEGIN $label-----(.*?)-----END $label-----".r
    re.findAllMatchIn(pem).map { m =>
      Base64.getMimeDecoder.decode(m.group(1).replaceAll("\\s", ""))
    }.toSeq
  }

  private def readCerts(pem: String): Seq[X509Certificate] = {
    val cf = CertificateFactory.getInstance("X.509")
    pemBlocks(pem, "CERTIFICATE").map(der =>
      cf.generateCertificate(new java.io.ByteArrayInputStream(der)).asInstanceOf[X509Certificate])
  }

  private def readKey(pem: String): PrivateKey = {
    val ders = pemBlocks(pem, "PRIVATE KEY")
    require(ders.nonEmpty, "no PKCS#8 'BEGIN PRIVATE KEY' block found " +
      "(legacy 'BEGIN RSA PRIVATE KEY' PKCS#1 keys: convert with openssl pkcs8 -topk8)")
    val spec = new PKCS8EncodedKeySpec(ders.head)
    Seq("RSA", "EC", "Ed25519").view.flatMap { algo =>
      scala.util.Try(KeyFactory.getInstance(algo).generatePrivate(spec)).toOption
    }.headOption.getOrElse(throw new IllegalArgumentException("unsupported private key algorithm"))
  }

  private def slurp(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)

  /** Server-side context from a PEM cert chain + PKCS#8 key file (the
    * `certificates = [{cert, key}]` shape). */
  def serverContext(certFile: String, keyFile: String): SSLContext = {
    val certs = readCerts(slurp(certFile))
    require(certs.nonEmpty, s"no certificates in $certFile")
    val key = readKey(slurp(keyFile))
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    ks.setKeyEntry("server", key, Array.emptyCharArray, certs.toArray)
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, Array.emptyCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, new SecureRandom)
    ctx
  }

  /** Client-side context trusting the given PEM CA bundle (the
    * `ca-cert = [...]` shape). */
  def clientContext(caCertFiles: Seq[String]): SSLContext = {
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    caCertFiles.flatMap(f => readCerts(slurp(f))).zipWithIndex.foreach { case (c, i) =>
      ks.setCertificateEntry(s"ca$i", c)
    }
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, new SecureRandom)
    ctx
  }
}
