package graft.alerts

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.Base64

/** S11 — real SMTP notification sink: a socket-level RFC 5321 client
  * implementing the reference's send semantics (web_scheduler.py:3720-3796):
  * one message per recipient (the reference loops `recipient_list` and sends
  * each its own `Message`), comma-split recipients handled by the caller via
  * [[Notifier.splitRecipients]], attachments named by basename with the xlsx
  * content type (:3773-3777), missing attachment files skipped with the
  * send continuing (:3780), and the first per-recipient failure aborting the
  * remaining sends (:3789 re-raise).
  *
  * AUTH LOGIN runs when a username is configured; STARTTLS is issued when
  * `useTls` and the server advertises it (the offline test stub speaks
  * plaintext). JDK sockets only — no mail library ships in this container.
  */
final class SmtpNotifier(
    server: String, port: Int, useTls: Boolean,
    username: String, password: String, sender: String) extends Notifier {

  override def send(recipients: Seq[String], subject: String, body: String,
                    attachments: Seq[String] = Nil): Either[String, Unit] = {
    val from = if (sender.nonEmpty) sender else username // :3741 fallback
    try {
      // per-recipient transactions, in order; first failure aborts the rest
      recipients.foreach { rcpt =>
        transact(from, rcpt, mimeMessage(from, rcpt, subject, body, attachments))
      }
      Right(())
    } catch { case e: Exception => Left(e.getMessage) }
  }

  // ---- SMTP dialogue ----------------------------------------------------

  private def transact(from: String, rcpt: String, message: String): Unit = {
    var sock: Socket = new Socket(server, port)
    sock.setSoTimeout(10000)
    var in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
    var out = new OutputStreamWriter(sock.getOutputStream, UTF_8)
    def cmd(line: String, expect: Int): Seq[String] = {
      out.write(line + "\r\n"); out.flush(); reply(in, expect)
    }
    try {
      reply(in, 220) // greeting
      val hostname = java.net.InetAddress.getLocalHost.getHostName
      val ehlo = cmd(s"EHLO $hostname", 250)
      val canTls = ehlo.exists(_.toUpperCase.contains("STARTTLS"))
      if (useTls && canTls) {
        cmd("STARTTLS", 220)
        // actually upgrade: wrap the socket in TLS (the 220 alone changes
        // nothing — the server now expects a ClientHello), then re-EHLO on
        // the encrypted channel per RFC 3207 §4.2 with fresh streams
        val tls = javax.net.ssl.SSLSocketFactory.getDefault
          .asInstanceOf[javax.net.ssl.SSLSocketFactory]
          .createSocket(sock, server, port, true)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        tls.setSoTimeout(10000)
        // endpoint identification: a bare SSLSocket accepts ANY valid
        // certificate — an active MITM presenting its own cert would pass
        // the handshake and harvest the AUTH LOGIN credentials TLS exists
        // to protect. "HTTPS" enables RFC 2818/6125 hostname matching
        // against `server` (what smtplib gets from ssl.create_default_context).
        val params = tls.getSSLParameters
        params.setEndpointIdentificationAlgorithm("HTTPS")
        tls.setSSLParameters(params)
        tls.startHandshake()
        sock = tls
        in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
        out = new OutputStreamWriter(sock.getOutputStream, UTF_8)
        cmd(s"EHLO $hostname", 250)
      } else if (useTls) {
        // caller asked for TLS but the server doesn't offer STARTTLS:
        // refuse REGARDLESS of credentials — silently continuing would put
        // the message (and AUTH LOGIN, when configured) on the wire in
        // cleartext. Matches smtplib, whose starttls() raises
        // SMTPNotSupportedError unconditionally when the extension is absent.
        throw new RuntimeException(
          "STARTTLS requested but not offered by server; refusing cleartext send")
      }
      if (username.nonEmpty) {
        cmd("AUTH LOGIN", 334)
        cmd(Base64.getEncoder.encodeToString(username.getBytes(UTF_8)), 334)
        cmd(Base64.getEncoder.encodeToString(password.getBytes(UTF_8)), 235)
      }
      cmd(s"MAIL FROM:<$from>", 250)
      cmd(s"RCPT TO:<$rcpt>", 250)
      cmd("DATA", 354)
      // normalize to CRLF FIRST: RFC 5321 §2.3.8 requires CRLF line
      // endings, and alert bodies are built with \n — sending bare LFs
      // violates the spec (strict servers bounce), and a lax server that
      // treats LF as a line break could see a '.'-prefixed "line" the
      // CRLF-only dot-stuffing pass below never saw (truncating the
      // message at a '.'-led preview line)
      val crlf = message.replace("\r\n", "\n").replace("\r", "\n")
        .replace("\n", "\r\n")
      // dot-stuffing (RFC 5321 §4.5.2): a body line starting '.' gets one more
      val stuffed = crlf.split("\r\n", -1)
        .map(l => if (l.startsWith(".")) "." + l else l).mkString("\r\n")
      out.write(stuffed); out.write("\r\n.\r\n"); out.flush()
      reply(in, 250)
      cmd("QUIT", 221)
    } finally sock.close()
  }

  private def reply(in: BufferedReader, expect: Int): Seq[String] = {
    // multi-line replies: "250-..." continues, "250 ..." ends
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    var done = false
    while (!done) {
      val l = in.readLine()
      if (l == null) throw new RuntimeException("connection closed by server")
      lines += l
      done = !(l.length >= 4 && l.charAt(3) == '-')
    }
    val code = lines.last.take(3).toIntOption.getOrElse(-1)
    if (code != expect)
      throw new RuntimeException(s"SMTP error: expected $expect, got '${lines.last}'")
    lines.toSeq
  }

  // ---- MIME construction ------------------------------------------------

  private def encodedWord(s: String): String =
    if (s.forall(c => c >= ' ' && c < 127)) s
    else "=?UTF-8?B?" + Base64.getEncoder.encodeToString(s.getBytes(UTF_8)) + "?="

  private def mimeMessage(from: String, rcpt: String, subject: String,
                          body: String, attachments: Seq[String]): String = {
    val date = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME
      .format(java.time.ZonedDateTime.now(java.time.ZoneOffset.UTC))
    val head =
      s"""From: $from\r
         |To: $rcpt\r
         |Subject: ${encodedWord(subject)}\r
         |Date: $date\r
         |MIME-Version: 1.0\r
         |""".stripMargin
    val existing = attachments.filter(p => Files.exists(Paths.get(p)))
    if (existing.isEmpty) {
      head +
        "Content-Type: text/plain; charset=utf-8\r\n" +
        "Content-Transfer-Encoding: 8bit\r\n\r\n" + body
    } else {
      val boundary = "graft-" + java.util.UUID.randomUUID().toString
      val textPart =
        s"--$boundary\r\n" +
        "Content-Type: text/plain; charset=utf-8\r\n" +
        "Content-Transfer-Encoding: 8bit\r\n\r\n" + body + "\r\n"
      val xlsxType =
        "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
      val fileParts = existing.map { p =>
        val name = Paths.get(p).getFileName.toString // basename (:3775)
        val b64 = Base64.getMimeEncoder(76, "\r\n".getBytes)
          .encodeToString(Files.readAllBytes(Paths.get(p)))
        s"--$boundary\r\n" +
          // the reference always tags attachments as xlsx (:3776)
          s"""Content-Type: $xlsxType; name="$name"""" + "\r\n" +
          s"""Content-Disposition: attachment; filename="$name"""" + "\r\n" +
          "Content-Transfer-Encoding: base64\r\n\r\n" + b64 + "\r\n"
      }.mkString
      head +
        s"""Content-Type: multipart/mixed; boundary="$boundary"""" + "\r\n\r\n" +
        textPart + fileParts + s"--$boundary--\r\n"
    }
  }
}
