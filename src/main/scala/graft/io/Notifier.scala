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
