package graft.io

import org.apache.spark.sql.Row

/** K5: alert notification (reference: gestionnaire_mail.py:28-83).
  *
  * The notifier is a trait so the streaming pipeline, unit tests, and a
  * real SMTP deployment share the exact same formatting/filter code path;
  * only delivery differs. The severity filter (critical/warning only,
  * gestionnaire_mail.py:79-83) is applied in the STREAM (F5,
  * `SparkEntry.alertsMailable`), not here — by the time an AlertEmail is
  * built the alert is already mailable.
  */
final case class AlertEmail(
    recipient: String,
    subject: String,
    body: String)

object AlertEmail {

  /** Format one flattened alert row into the reference's exact subject and
    * body shape (gestionnaire_mail.py:49-67: French labels, optional
    * battery/signal lines).
    */
  def fromAlertRow(row: Row, recipient: String): AlertEmail = {
    def opt(name: String): Option[Any] =
      if (row.schema.fieldNames.contains(name) && !row.isNullAt(row.fieldIndex(name)))
        Some(row.get(row.fieldIndex(name)))
      else None
    def str(name: String): String = opt(name).map(_.toString).getOrElse("?")

    val severity = str("severity")
    val sensorId = str("sensor_id")
    // Locale.ROOT: default-locale upcasing turns "critical" into "CRİTİCAL"
    // on Turkish-locale JVMs, breaking the byte-exact subject.
    val subject = s"[ALERTE ${severity.toUpperCase(java.util.Locale.ROOT)}] " +
      s"Capteur $sensorId - ${str("alert_type")}"
    val base = Seq(
      s"Alerte $severity pour le capteur $sensorId.",
      "",
      s"Localisation : bâtiment ${str("building")}, étage ${str("floor")}, salle ${str("room")}.",
      s"Type d'alerte : ${str("alert_type")}",
      s"Message      : ${str("message")}",
      s"Valeur       : ${str("actual_value")} (seuil ${str("threshold_value")})",
      s"Déclenchée   : ${str("triggered_at")}")
    val extras =
      opt("battery_level").map(b => s"Niveau batterie : $b%").toSeq ++
        opt("signal_strength").map(s => s"Signal         : $s dBm").toSeq
    AlertEmail(recipient, subject, (base ++ extras).mkString("\n"))
  }
}

trait AlertNotifier extends Serializable {
  def send(email: AlertEmail): Unit
}

/** Default: log-only delivery (safe everywhere; swap for an SMTP impl in a
  * deployment that has a mail relay).
  */
final class LoggingNotifier extends AlertNotifier {
  override def send(email: AlertEmail): Unit =
    // Mirrors the reference's console trace (gestionnaire_mail.py:74).
    println(s"[MAIL] ${email.subject} -> ${email.recipient}")
}

/** Test notifier: collects emails in memory (driver-side; use only in
  * local-mode tests).
  */
final class InMemoryNotifier extends AlertNotifier {
  val sent = new java.util.concurrent.ConcurrentLinkedQueue[AlertEmail]()
  override def send(email: AlertEmail): Unit = sent.add(email)
  def emails: Seq[AlertEmail] = {
    import scala.jdk.CollectionConverters._
    sent.asScala.toSeq
  }
}

object AlertNotifier {

  /** Config-gated wiring: `ALERT_NOTIFIER=smtp` selects real delivery
    * (reference parity — gestionnaire_mail.py actually sends); anything
    * else is log-only, the safe default for every environment without a
    * relay.
    */
  def forConfig(cfg: graft.config.PipelineConfig): AlertNotifier =
    if (cfg.smtp.notifier == "smtp")
      new SmtpNotifier(cfg.smtp.host, cfg.smtp.port, cfg.smtp.user,
        cfg.smtp.password, cfg.smtp.startTls)
    else new LoggingNotifier
}

/** Production SMTP delivery over a raw socket — the reference's
  * `smtplib.SMTP(host, port)` → `starttls()` → `login()` →
  * `send_message(MIMEText(body, _charset="utf-8"))` sequence
  * (gestionnaire_mail.py:22-26, 70-74) re-implemented on
  * `java.net`/`javax.net.ssl` with zero mail-library dependency. The
  * message mirrors MIMEText's on-the-wire shape: base64
  * content-transfer-encoding, RFC 2047 encoded-word subject (the French
  * alert subjects are non-ASCII), From = the authenticated user,
  * To = the per-email recipient.
  *
  * One connection per send, not one held open: the notifier runs from
  * `foreachBatch` on whichever executor the micro-batch lands, and a
  * held-open connection dies with the first network blip — the
  * reference's module-scope `server` does exactly that (its documented
  * fragility). Alert traffic is severity-filtered to ~1% upstream, so
  * per-send handshakes are noise.
  *
  * `password.isEmpty` skips AUTH (open relay / test server);
  * `startTls = false` skips the TLS upgrade (plaintext relay / test
  * server). Any unexpected reply code throws — a silently dropped
  * critical alert is the one unacceptable failure mode.
  */
final class SmtpNotifier(
    host: String,
    port: Int,
    user: String,
    password: String = "",
    startTls: Boolean = true,
    timeoutMs: Int = 10000) extends AlertNotifier {

  import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
  import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

  override def send(email: AlertEmail): Unit = {
    // SMTP-injection guard: user and recipient are interpolated into MAIL
    // FROM/RCPT TO commands and From:/To: headers, so a CR/LF or angle
    // bracket in either would inject protocol commands or extra headers.
    // Both come from config today, but recipient is a per-email field a
    // future caller could populate from data — reject, don't sanitize.
    for ((what, v) <- Seq("smtp user" -> user, "recipient" -> email.recipient))
      require(!v.exists(c => c == '\r' || c == '\n' || c == '<' || c == '>'),
        s"$what contains CR/LF or angle brackets — refusing to send: $v")
    val plain = new java.net.Socket()
    plain.connect(new java.net.InetSocketAddress(host, port), timeoutMs)
    plain.setSoTimeout(timeoutMs)
    var socket: java.net.Socket = plain
    try {
      var io = wrap(socket)
      expect(readReply(io._1), "220", "greeting")
      command(io, s"EHLO graft.local", "250")
      if (startTls) {
        command(io, "STARTTLS", "220")
        val ssl = javax.net.ssl.SSLSocketFactory.getDefault
          .asInstanceOf[javax.net.ssl.SSLSocketFactory]
          .createSocket(socket, host, port, true)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        // Raw SSLSockets do NOT verify the peer's hostname by default
        // (only HttpsURLConnection does) — without this a MITM with any
        // valid certificate could read the relay credentials.
        val params = ssl.getSSLParameters
        params.setEndpointIdentificationAlgorithm("HTTPS")
        ssl.setSSLParameters(params)
        ssl.startHandshake()
        socket = ssl
        io = wrap(socket)
        command(io, s"EHLO graft.local", "250") // capabilities reset by TLS
      }
      if (password.nonEmpty) {
        val b64 = java.util.Base64.getEncoder
        command(io, "AUTH LOGIN", "334")
        command(io, b64.encodeToString(user.getBytes(UTF_8)), "334")
        command(io, b64.encodeToString(password.getBytes(UTF_8)), "235")
      }
      command(io, s"MAIL FROM:<$user>", "250")
      command(io, s"RCPT TO:<${email.recipient}>", "250")
      command(io, "DATA", "354")
      io._2.write(mimeMessage(email))
      command(io, "\r\n.", "250") // end-of-data; reply confirms acceptance
      command(io, "QUIT", "221")
    } finally socket.close()
  }

  /** MIMEText(body, _charset="utf-8") equivalent. Base64 body lines never
    * begin with '.' (not in the alphabet) and no header does, so no
    * dot-stuffing is ever needed on this message shape.
    */
  private[io] def mimeMessage(email: AlertEmail): String = {
    val subject = "=?UTF-8?B?" + java.util.Base64.getEncoder
      .encodeToString(email.subject.getBytes(UTF_8)) + "?="
    val body = new String(
      java.util.Base64.getMimeEncoder(76, Array[Byte]('\r', '\n'))
        .encode(email.body.getBytes(UTF_8)), ISO_8859_1)
    Seq(
      s"From: $user",
      s"To: ${email.recipient}",
      s"Subject: $subject",
      "MIME-Version: 1.0",
      "Content-Type: text/plain; charset=utf-8",
      "Content-Transfer-Encoding: base64",
      "",
      body).mkString("\r\n")
  }

  private type Io = (BufferedReader, BufferedWriter)

  private def wrap(s: java.net.Socket): Io = (
    new BufferedReader(new InputStreamReader(s.getInputStream, ISO_8859_1)),
    new BufferedWriter(new OutputStreamWriter(s.getOutputStream, ISO_8859_1)))

  private def command(io: Io, line: String, code: String): String = {
    io._2.write(line); io._2.write("\r\n"); io._2.flush()
    expect(readReply(io._1), code, line.takeWhile(_ != ':'))
  }

  /** Reads one (possibly multi-line `250-...`/`250 ...`) SMTP reply. */
  private def readReply(in: BufferedReader): String = {
    val sb = new StringBuilder
    var line = in.readLine()
    while (line != null && line.length > 3 && line.charAt(3) == '-') {
      sb.append(line).append('\n')
      line = in.readLine()
    }
    if (line == null) throw new java.io.IOException("SMTP peer closed stream")
    sb.append(line).toString
  }

  private def expect(reply: String, code: String, ctx: String): String = {
    if (!reply.startsWith(code))
      throw new java.io.IOException(s"SMTP $ctx: expected $code, got: $reply")
    reply
  }
}
