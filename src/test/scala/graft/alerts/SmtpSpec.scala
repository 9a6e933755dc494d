package graft.alerts

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

/** In-process stub SMTP server: speaks enough RFC 5321 to exercise the real
  * client dialogue (greeting/EHLO/AUTH LOGIN/MAIL/RCPT/DATA/QUIT), records
  * every transaction, and can reject a recipient to drive the error path. */
final class StubSmtpServer(rejectRcpt: Option[String] = None) {
  final case class Tx(from: String, rcpt: String, data: String,
                      authUser: Option[String], authPass: Option[String])
  private val txs = scala.collection.mutable.ArrayBuffer.empty[Tx]
  def transactions: Seq[Tx] = txs.synchronized(txs.toSeq)

  private val sock = new ServerSocket(0, 8, java.net.InetAddress.getByName("127.0.0.1"))
  val port: Int = sock.getLocalPort
  @volatile private var running = true

  private val thread = new Thread(() => {
    while (running) {
      try {
        val c = sock.accept()
        val in = new BufferedReader(new InputStreamReader(c.getInputStream, UTF_8))
        val out = new OutputStreamWriter(c.getOutputStream, UTF_8)
        def w(s: String): Unit = { out.write(s + "\r\n"); out.flush() }
        w("220 stub ESMTP")
        var from = ""; var rcpt = ""; var user: Option[String] = None
        var pass: Option[String] = None
        var open = true
        while (open) {
          val line = in.readLine()
          if (line == null) open = false
          else {
            val up = line.toUpperCase
            if (up.startsWith("EHLO")) { w("250-stub greets you"); w("250-AUTH LOGIN"); w("250 OK") }
            else if (up.startsWith("AUTH LOGIN")) {
              w("334 VXNlcm5hbWU6")
              user = Some(new String(Base64.getDecoder.decode(in.readLine()), UTF_8))
              w("334 UGFzc3dvcmQ6")
              pass = Some(new String(Base64.getDecoder.decode(in.readLine()), UTF_8))
              w("235 authenticated")
            }
            else if (up.startsWith("MAIL FROM:")) { from = line.drop(10).trim.stripPrefix("<").stripSuffix(">"); w("250 OK") }
            else if (up.startsWith("RCPT TO:")) {
              rcpt = line.drop(8).trim.stripPrefix("<").stripSuffix(">")
              if (rejectRcpt.contains(rcpt)) w("550 mailbox unavailable") else w("250 OK")
            }
            else if (up.startsWith("DATA")) {
              w("354 go ahead")
              val b = new StringBuilder
              var l = in.readLine()
              while (l != null && l != ".") {
                // un-stuff leading dots (client stuffs per RFC 5321 §4.5.2)
                b.append(if (l.startsWith("..")) l.drop(1) else l).append("\r\n")
                l = in.readLine()
              }
              txs.synchronized { txs += Tx(from, rcpt, b.toString, user, pass) }
              w("250 accepted")
            }
            else if (up.startsWith("QUIT")) { w("221 bye"); open = false }
            else w("250 OK")
          }
        }
        c.close()
      } catch { case _: Exception if !running => case _: Exception => }
    }
  })
  thread.setDaemon(true)
  thread.start()

  def stop(): Unit = { running = false; sock.close() }
}

/** Real SMTP dialogue tests for [[SmtpNotifier]] against the stub server —
  * reference semantics from web_scheduler.py:3720-3796. */
class SmtpSpec extends AnyFunSuite {

  test("per-recipient transactions with auth, matching the reference's loop") {
    val srv = new StubSmtpServer()
    try {
      val n = new SmtpNotifier("127.0.0.1", srv.port, useTls = false,
        "mailer", "s3cret", "noreply@x.com")
      val out = n.send(Notifier.splitRecipients("a@x.com, b@x.com"),
        "nightly report", "all good")
      assert(out == Right(()))
      val txs = srv.transactions
      // one SEPARATE message per recipient (web_scheduler.py:3755-3790)
      assert(txs.map(_.rcpt) == Seq("a@x.com", "b@x.com"))
      assert(txs.forall(_.from == "noreply@x.com"))
      assert(txs.forall(_.authUser.contains("mailer")))
      assert(txs.forall(_.authPass.contains("s3cret")))
      assert(txs.head.data.contains("Subject: nightly report"))
      assert(txs.head.data.contains("To: a@x.com"))
      assert(txs.head.data.contains("all good"))
    } finally srv.stop()
  }

  test("sender falls back to username when default sender empty (:3741)") {
    val srv = new StubSmtpServer()
    try {
      val n = new SmtpNotifier("127.0.0.1", srv.port, useTls = false,
        "mailer@x.com", "pw", "")
      assert(n.send(Seq("a@x.com"), "s", "b") == Right(()))
      assert(srv.transactions.head.from == "mailer@x.com")
    } finally srv.stop()
  }

  test("xlsx attachment: basename filename, content type, base64 payload") {
    val srv = new StubSmtpServer()
    try {
      val dir = java.nio.file.Files.createTempDirectory("smtp-att")
      val f = dir.resolve("monthly_report.xlsx")
      val payload = Array.tabulate[Byte](300)(i => (i % 251).toByte)
      java.nio.file.Files.write(f, payload)
      val missing = dir.resolve("nope.xlsx").toString
      val n = new SmtpNotifier("127.0.0.1", srv.port, useTls = false,
        "", "", "noreply@x.com")
      // missing attachment skipped, send continues (web_scheduler.py:3780)
      assert(n.send(Seq("a@x.com"), "含附件", "见附件",
        Seq(f.toString, missing)) == Right(()))
      val data = srv.transactions.head.data
      assert(data.contains("Content-Type: multipart/mixed"))
      assert(data.contains(
        "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"))
      assert(data.contains("filename=\"monthly_report.xlsx\"")) // basename only
      assert(!data.contains("nope.xlsx"))
      // payload survives base64 round-trip
      val b64 = data.split("\r\n\r\n").find(_.startsWith("MA")).getOrElse {
        // locate the base64 block after the attachment headers
        val i = data.indexOf("Content-Transfer-Encoding: base64\r\n\r\n")
        data.substring(i + 37).split("\r\n--").head
      }
      val decoded = Base64.getMimeDecoder.decode(b64.trim)
      assert(decoded.toSeq == payload.toSeq)
      // non-ASCII subject is MIME encoded-word
      assert(data.contains("Subject: =?UTF-8?B?"))
    } finally srv.stop()
  }

  test("dot-stuffed body line survives the DATA phase intact") {
    val srv = new StubSmtpServer()
    try {
      val n = new SmtpNotifier("127.0.0.1", srv.port, useTls = false, "", "", "s@x.com")
      assert(n.send(Seq("a@x.com"), "s", ".leading dot\nnormal") == Right(()))
      assert(srv.transactions.head.data.contains(".leading dot"))
      assert(!srv.transactions.head.data.contains("..leading"))
    } finally srv.stop()
  }

  test("bare-LF body lines normalize to CRLF so dot-stuffing covers them (RFC 5321 §2.3.8)") {
    val srv = new StubSmtpServer()
    try {
      val n = new SmtpNotifier("127.0.0.1", srv.port, useTls = false, "", "", "s@x.com")
      // alert bodies are \n-built. Pre-normalization, the CRLF-only
      // dot-stuffing pass never saw LF-separated "lines", so a body whose
      // LF-line is exactly "." went out UNSTUFFED — any server that
      // splits on LF (the stub's readLine does, like many lax MTAs) read
      // it as end-of-DATA and silently TRUNCATED the message there.
      assert(n.send(Seq("a@x.com"), "s", "line1\n.\nline2-after-dot") == Right(()))
      val data = srv.transactions.head.data
      assert(data.contains("line2-after-dot"),
        s"message truncated at the bare-dot line: $data")
      assert(data.contains("line1"), data)
    } finally srv.stop()
  }

  test("rejected recipient aborts the remaining sends with the error") {
    val srv = new StubSmtpServer(rejectRcpt = Some("bad@x.com"))
    try {
      val n = new SmtpNotifier("127.0.0.1", srv.port, useTls = false, "", "", "s@x.com")
      val out = n.send(Seq("good@x.com", "bad@x.com", "never@x.com"), "s", "b")
      assert(out.isLeft)
      assert(out.left.exists(_.contains("550")))
      // first recipient delivered; third never attempted (reference re-raise)
      assert(srv.transactions.map(_.rcpt) == Seq("good@x.com"))
    } finally srv.stop()
  }

  test("useTls + credentials against a server without STARTTLS refuses cleartext AUTH") {
    // the stub never advertises STARTTLS; sending AUTH LOGIN anyway would
    // leak base64 credentials in cleartext — the client must refuse
    // (smtplib raises SMTPNotSupportedError in the reference's path)
    val srv = new StubSmtpServer()
    try {
      val n = new SmtpNotifier("127.0.0.1", srv.port, useTls = true,
        "user", "secret", "s@x.com")
      val out = n.send(Seq("a@x.com"), "s", "b")
      assert(out.isLeft)
      assert(out.left.exists(_.contains("refusing cleartext")))
      assert(srv.transactions.isEmpty) // nothing was sent
    } finally srv.stop()
  }

  test("useTls WITHOUT credentials against a server without STARTTLS also refuses") {
    // smtplib's starttls() raises regardless of whether AUTH follows —
    // silently falling back to cleartext delivery would betray the
    // caller's explicit TLS request even when no password is at stake
    val srv = new StubSmtpServer()
    try {
      val n = new SmtpNotifier("127.0.0.1", srv.port, useTls = true,
        "", "", "s@x.com")
      val out = n.send(Seq("a@x.com"), "s", "b")
      assert(out.isLeft)
      assert(out.left.exists(_.contains("refusing cleartext")))
      assert(srv.transactions.isEmpty)
    } finally srv.stop()
  }
}
