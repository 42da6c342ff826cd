package graft.io

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.Base64

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

/** SMTP notifier against an in-process fake relay: the server speaks just
  * enough RFC 5321 to drive the client through its full dialogue and
  * capture the DATA payload, so the test asserts the COMPLETE on-the-wire
  * message — envelope, headers, encoded subject, base64 body — not a
  * mocked fragment. (STARTTLS needs a TLS endpoint no container relay
  * provides; the upgrade call mirrors the reference's `starttls()` and the
  * rest of the dialogue — which this covers — is identical either side of
  * the handshake.)
  */
class SmtpNotifierSpec extends AnyFunSuite {

  /** One-connection fake SMTP server; records envelope commands and the raw
    * DATA block. AUTH LOGIN's 334/334/235 exchange is a small state
    * machine (stage 1 = username prompt sent, 2 = password prompt sent).
    */
  private final class FakeSmtpServer {
    val server = new ServerSocket(0) // ephemeral port
    val commands = mutable.Buffer[String]()
    @volatile var data: String = ""
    @volatile var failure: Option[Throwable] = None

    val thread = new Thread(() =>
      try {
        val s = server.accept()
        val in = new BufferedReader(new InputStreamReader(s.getInputStream, ISO_8859_1))
        val out = new BufferedWriter(new OutputStreamWriter(s.getOutputStream, ISO_8859_1))
        def reply(r: String): Unit = { out.write(r); out.write("\r\n"); out.flush() }
        reply("220 fake.local ESMTP")
        var inData = false
        var authStage = 0
        var done = false
        val dataBuf = new StringBuilder
        var line = in.readLine()
        while (!done && line != null) {
          if (inData) {
            if (line == ".") {
              inData = false; data = dataBuf.toString; reply("250 OK queued")
            } else dataBuf.append(line).append("\r\n")
          } else {
            commands += line
            val upper = line.toUpperCase(java.util.Locale.ROOT)
            if (upper.startsWith("EHLO"))
              // Multi-line reply: exercises the client's 250-/250 parsing.
              reply("250-fake.local\r\n250-8BITMIME\r\n250 OK")
            else if (upper.startsWith("AUTH LOGIN")) { authStage = 1; reply("334 VXNlcm5hbWU6") }
            else if (authStage == 1) { authStage = 2; reply("334 UGFzc3dvcmQ6") }
            else if (authStage == 2) { authStage = 0; reply("235 authenticated") }
            else if (upper.startsWith("MAIL FROM")) reply("250 sender ok")
            else if (upper.startsWith("RCPT TO")) reply("250 recipient ok")
            else if (upper.startsWith("DATA")) { inData = true; reply("354 go") }
            else if (upper.startsWith("QUIT")) { reply("221 bye"); s.close(); done = true }
            else reply("250 ok")
          }
          if (!done) line = in.readLine()
        }
      } catch { case t: Throwable => failure = Some(t) }
      finally server.close())

    def start(): Int = { thread.start(); server.getLocalPort }
    def join(): Unit = { thread.join(5000); failure.foreach(throw _) }
  }

  private val email = AlertEmail(
    recipient = "ops@example.com",
    subject = "[ALERTE CRITICAL] Capteur A_1_100_temperature - temperature_critical",
    body = "Alerte critical pour le capteur A_1_100_temperature.\n\n" +
      "Localisation : bâtiment A, étage 1, salle 100.\n" +
      "Valeur       : 32.5 (seuil 30)")

  test("full dialogue: envelope, MIME headers, encoded subject, base64 body") {
    val fake = new FakeSmtpServer
    val port = fake.start()
    new SmtpNotifier("127.0.0.1", port, "alerts@example.com",
      password = "", startTls = false).send(email)
    fake.join()

    assert(fake.commands.exists(_.startsWith("EHLO ")))
    assert(fake.commands.contains("MAIL FROM:<alerts@example.com>"))
    assert(fake.commands.contains("RCPT TO:<ops@example.com>"))
    assert(fake.commands.exists(_.startsWith("QUIT")))
    assert(!fake.commands.exists(_.startsWith("AUTH")), "no-password skips AUTH")
    assert(!fake.commands.exists(_.startsWith("STARTTLS")))

    val lines = fake.data.split("\r\n")
    assert(lines.contains("From: alerts@example.com"))
    assert(lines.contains("To: ops@example.com"))
    assert(lines.contains("MIME-Version: 1.0"))
    assert(lines.contains("Content-Type: text/plain; charset=utf-8"))
    assert(lines.contains("Content-Transfer-Encoding: base64"))
    // RFC 2047 subject decodes back to the byte-exact French subject.
    val subj = lines.find(_.startsWith("Subject: ")).get
      .stripPrefix("Subject: ")
    assert(subj.startsWith("=?UTF-8?B?") && subj.endsWith("?="))
    val decodedSubject = new String(Base64.getDecoder.decode(
      subj.stripPrefix("=?UTF-8?B?").stripSuffix("?=")), UTF_8)
    assert(decodedSubject === email.subject)
    // Body: everything after the blank header separator, base64-decoded,
    // must reproduce the accented French body byte-for-byte.
    val bodyB64 = lines.dropWhile(_.nonEmpty).drop(1).mkString
    val decodedBody = new String(Base64.getMimeDecoder.decode(bodyB64), UTF_8)
    assert(decodedBody === email.body)
  }

  test("CRLF or angle brackets in recipient/user refuse the send (SMTP injection)") {
    // No server: the guard must trip before any connection is attempted.
    val n = new SmtpNotifier("127.0.0.1", 1, "alerts@example.com",
      password = "", startTls = false)
    for (bad <- Seq("a@b.c>\r\nRCPT TO:<evil@x.y", "a@b.c>extra", "a\nb@c.d")) {
      val ex = intercept[IllegalArgumentException] {
        n.send(email.copy(recipient = bad))
      }
      assert(ex.getMessage.contains("refusing to send"))
    }
    val exUser = intercept[IllegalArgumentException] {
      new SmtpNotifier("127.0.0.1", 1, "evil\r\nuser@x.y",
        password = "", startTls = false).send(email)
    }
    assert(exUser.getMessage.contains("smtp user"))
  }

  test("AUTH LOGIN runs when a password is configured") {
    val fake = new FakeSmtpServer
    val port = fake.start()
    new SmtpNotifier("127.0.0.1", port, "alerts@example.com",
      password = "s3cret", startTls = false).send(email)
    fake.join()
    assert(fake.commands.contains("AUTH LOGIN"))
    assert(fake.commands.contains(
      Base64.getEncoder.encodeToString("alerts@example.com".getBytes(UTF_8))))
    assert(fake.commands.contains(
      Base64.getEncoder.encodeToString("s3cret".getBytes(UTF_8))))
    assert(fake.commands.contains("MAIL FROM:<alerts@example.com>"))
  }

  test("an unexpected reply code fails the send loudly") {
    // A server that greets then rejects EHLO: the client must throw, not
    // swallow — a silently dropped critical alert is unacceptable.
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      val s = server.accept()
      val out = new BufferedWriter(
        new OutputStreamWriter(s.getOutputStream, ISO_8859_1))
      out.write("220 fake\r\n"); out.flush()
      out.write("554 no service\r\n"); out.flush()
      s.close(); server.close()
    })
    t.start()
    val ex = intercept[java.io.IOException] {
      new SmtpNotifier("127.0.0.1", server.getLocalPort, "a@example.com",
        startTls = false).send(email)
    }
    assert(ex.getMessage.contains("expected 250"))
    t.join(5000)
  }

  test("forConfig gates on ALERT_NOTIFIER") {
    import graft.config.PipelineConfig
    val log = AlertNotifier.forConfig(PipelineConfig.fromEnv(Map.empty))
    assert(log.isInstanceOf[LoggingNotifier])
    val smtp = AlertNotifier.forConfig(PipelineConfig.fromEnv(Map(
      "ALERT_NOTIFIER" -> "smtp", "SMTP_HOST" -> "relay.example.com",
      "SMTP_PASS" -> "x", "SMTP_STARTTLS" -> "false")))
    assert(smtp.isInstanceOf[SmtpNotifier])
  }
}
