package graft.serve

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's metadata-serving query layer (SURVEY.md §2.2-2.6 P/J/T
  * tables): filtered, joined, paginated list queries as DataFrame programs.
  */
object Serve {

  /** T4 — pagination envelope (web_scheduler.py:5239-5423): per_page clamped
    * to [1,100], ceil-div page count, ordered LIMIT/OFFSET page. */
  final case class Page(rows: Seq[org.apache.spark.sql.Row], page: Int,
                        perPage: Int, total: Long, pages: Long)

  def paginate(df: DataFrame, orderBy: Seq[Column], page: Int, perPage: Int): Page = {
    val pp = math.max(1, math.min(perPage, 100)) // clamp (web_scheduler.py:5336)
    val pg = math.max(1, page)
    val total = df.count()
    val pages = (total + pp - 1) / pp // ceil-div (F13, web_scheduler.py:5288)
    val rows = df.orderBy(orderBy: _*).offset((pg - 1) * pp).limit(pp).collect().toSeq
    Page(rows, pg, pp, total, pages)
  }

  /** P8 — dynamic conjunctive WHERE builder (web_scheduler.py:4599-4644):
    * fold provided predicates with AND; no predicates → pass-through. */
  def conjunctiveFilter(df: DataFrame, predicates: Seq[Column]): DataFrame =
    predicates.reduceOption(_ && _).map(df.filter).getOrElse(df)

  /** A4 — latest row per key (greatest-n-per-group window). */
  def latestPerKey(df: DataFrame, key: String, time: String, tieBreak: String): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(key).orderBy(col(time).desc, col(tieBreak).desc)))
      .filter(col("__rn") === 1).drop("__rn")

  /** J6 — task list with latest-run status (web_scheduler.py:4621-4648):
    * LEFT join to the latest-log window; optional status filter where
    * "never_executed" selects the NULL side (the reference's
    * `tl.task_id IS NULL` anti-join shape). */
  def tasksWithLatestStatus(tasks: DataFrame, taskLogs: DataFrame,
                            statusFilter: Option[String] = None,
                            nameLike: Option[String] = None): DataFrame = {
    val latest = latestPerKey(taskLogs, "taskId", "executionTime", "id")
      .select(col("taskId"), col("status").as("latest_status"),
              col("executionTime").as("latest_execution_time"))
    val joined = tasks.join(latest, tasks("id") === latest("taskId"), "left")
      .drop("taskId")
    val byStatus = statusFilter match {
      case Some("never_executed") => joined.filter(col("latest_status").isNull)
      case Some(s)                => joined.filter(col("latest_status") === s)
      case None                   => joined
    }
    nameLike.map(s => byStatus.filter(col("name").contains(s))).getOrElse(byStatus)
      .orderBy(col("id").desc) // T1
  }

  /** F8/F9 — auth primitives. The reference stores werkzeug hashes
    * (web_scheduler.py:690,1652,4104 `generate_password_hash` /
    * `check_password_hash`), whose wire format is public:
    * `pbkdf2:sha256:<iterations>$<salt>$<hex(pbkdf2_hmac(sha256))>`.
    * Hashes EMITTED here use that exact format (JDK PBKDF2WithHmacSHA256,
    * werkzeug's current 600000-iteration default, 32-byte dk), so a users
    * table migrated FROM the reference's scheduler.db authenticates here
    * unchanged — and one exported TO it authenticates there. Legacy
    * `salt:sha256hex` rows written by earlier rounds still verify. */
  object Auth {
    private val rnd = new java.security.SecureRandom()
    private val DefaultIterations = 600000 // werkzeug ≥2.3 default

    private def pbkdf2Hex(password: String, salt: String, iterations: Int): String = {
      val spec = new javax.crypto.spec.PBEKeySpec(
        password.toCharArray, salt.getBytes("UTF-8"), iterations, 256)
      val f = javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      f.generateSecret(spec).getEncoded.map("%02x".format(_)).mkString
    }

    def hashPassword(password: String, salt: String): String =
      hashPassword(password, salt, DefaultIterations)

    def hashPassword(password: String, salt: String, iterations: Int): String =
      s"pbkdf2:sha256:$iterations$$$salt$$${pbkdf2Hex(password, salt, iterations)}"

    /** werkzeug's gen_salt shape: 16 chars, url/db-safe alphanumerics. */
    def newSalt(): String = {
      val alphabet = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
      Array.fill(16)(alphabet(rnd.nextInt(alphabet.length))).mkString
    }

    def verifyPassword(password: String, stored: String): Boolean =
      stored.split("\\$", 3) match {
        // werkzeug ≥3 DEFAULT format: scrypt:N:r:p$salt$hex (dklen=64) —
        // the JDK has no scrypt provider, so [[Scrypt]] implements
        // RFC 7914 (PBKDF2-HMAC-SHA256 + ROMix/Salsa20-8) in pure Scala;
        // a users table exported from a current werkzeug deployment
        // authenticates here unchanged
        case Array(method, salt, hex) if method.startsWith("scrypt:") =>
          method.split(":", 4) match {
            case Array(_, n, r, p) =>
              try {
                val dk = Scrypt.derive(password.getBytes("UTF-8"),
                  salt.getBytes("UTF-8"), n.toInt, r.toInt, p.toInt,
                  dkLen = hex.length / 2)
                java.security.MessageDigest.isEqual(
                  dk.map("%02x".format(_)).mkString.getBytes("UTF-8"),
                  hex.getBytes("UTF-8"))
              } catch {
                // any malformed/hostile parameter row (non-numeric, out of
                // the derive caps, absurd dkLen, …) is a clean reject —
                // a stored-hash row must never be able to crash the login
                // path or force an unbounded allocation
                case scala.util.control.NonFatal(_) => false
              }
            case _ => false
          }
        // werkzeug format: method$salt$hash, method = pbkdf2:sha256[:iter]
        case Array(method, salt, _) if method.startsWith("pbkdf2:sha256") =>
          val iterations = method.split(":", 3) match {
            case Array(_, _, it) => try it.toInt catch { case _: NumberFormatException => return false }
            case _ => DefaultIterations // werkzeug omits iter at its default
          }
          java.security.MessageDigest.isEqual(
            stored.getBytes("UTF-8"),
            hashPassword(password, salt, iterations).getBytes("UTF-8"))
        // legacy (pre-r8) format: salt:sha256(salt+password)
        case _ => stored.split(":", 2) match {
          case Array(salt, _) =>
            val md = java.security.MessageDigest.getInstance("SHA-256")
            val d = md.digest((salt + password).getBytes("UTF-8"))
            java.security.MessageDigest.isEqual(
              stored.getBytes("UTF-8"),
              (salt + ":" + d.map("%02x".format(_)).mkString).getBytes("UTF-8"))
          case _ => false
        }
      }

    /** secrets.token_urlsafe(32) equivalent (web_scheduler.py:4225). */
    def newToken(): String = {
      val b = new Array[Byte](32); rnd.nextBytes(b)
      java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(b)
    }
  }

  /** RFC 7914 scrypt, pure JVM — the KDF behind werkzeug ≥3's default
    * password hashes (`scrypt:32768:8:1$salt$hex`). PBKDF2-HMAC-SHA256
    * expand, sequential-memory-hard ROMix over the Salsa20/8 core,
    * PBKDF2 finish. Pinned against the RFC §12 test vectors AND an
    * OpenSSL-derived werkzeug-parameter vector in ServeSpec; the
    * werkzeug default (N=32768, r=8, p=1) costs one 32 MB V array per
    * login — login-path only, never on the data plane. */
  object Scrypt {

    def derive(password: Array[Byte], salt: Array[Byte], n: Int, r: Int,
               p: Int, dkLen: Int): Array[Byte] = {
      require(n > 1 && (n & (n - 1)) == 0, "N must be a power of two > 1")
      require(r > 0 && p > 0 && dkLen > 0, "r, p, dkLen must be positive")
      // Parameters come from STORED rows (the users table), so they are
      // attacker-influenceable: cap them before any allocation. The caps
      // are ~128x werkzeug's default work factor (N=32768, r=8, p=1 =
      // 32 MB), far above any legitimate deployment, and keep every
      // array size inside a positive Int — without them a hostile row
      // like scrypt:67108864:8:1$… overflows n*words into a negative
      // allocation size, and a large-but-valid N forces a multi-GB
      // allocation per login attempt.
      require(n <= (1 << 22), s"scrypt N=$n exceeds cap 2^22")
      require(r <= 256, s"scrypt r=$r exceeds cap 256")
      require(p <= 64, s"scrypt p=$p exceeds cap 64")
      require(128L * r * n <= (1L << 28),
        s"scrypt memory 128*r*N = ${128L * r * n} exceeds 256 MB cap")
      require(dkLen <= 1024, s"scrypt dkLen=$dkLen exceeds cap 1024")
      val mfLen = 128 * r
      val b = pbkdf2(password, salt, p * mfLen)
      val out = new Array[Byte](p * mfLen)
      var i = 0
      while (i < p) { // the p lanes are independent (parallelizable by spec)
        System.arraycopy(
          roMix(java.util.Arrays.copyOfRange(b, i * mfLen, (i + 1) * mfLen),
            n, r), 0, out, i * mfLen, mfLen)
        i += 1
      }
      pbkdf2(password, out, dkLen)
    }

    /** Single-iteration PBKDF2-HMAC-SHA256 (scrypt only ever uses c=1)
      * with byte-array password. HMAC pads a short key with zeros, so an
      * EMPTY password keys identically to a single zero byte — the
      * substitution keeps SecretKeySpec (which rejects empty keys) happy
      * without changing the MAC (RFC 7914 §12 vector 1 proves it). */
    private def pbkdf2(pw: Array[Byte], salt: Array[Byte],
                       dkLen: Int): Array[Byte] = {
      val mac = javax.crypto.Mac.getInstance("HmacSHA256")
      mac.init(new javax.crypto.spec.SecretKeySpec(
        if (pw.isEmpty) new Array[Byte](1) else pw, "HmacSHA256"))
      val out = new Array[Byte](dkLen)
      var block = 1; var off = 0
      while (off < dkLen) {
        mac.update(salt)
        val t = mac.doFinal(Array[Byte]((block >>> 24).toByte,
          (block >>> 16).toByte, (block >>> 8).toByte, block.toByte))
        val len = math.min(32, dkLen - off)
        System.arraycopy(t, 0, out, off, len)
        off += len; block += 1
      }
      out
    }

    /** ROMix over one 128r-byte block, word-oriented (little-endian). */
    private def roMix(block: Array[Byte], n: Int, r: Int): Array[Byte] = {
      val words = 32 * r
      val x = new Array[Int](words)
      val bb = java.nio.ByteBuffer.wrap(block)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < words) { x(i) = bb.getInt(); i += 1 }
      val v = new Array[Int](n * words)
      val y = new Array[Int](words)
      i = 0
      while (i < n) {
        System.arraycopy(x, 0, v, i * words, words)
        blockMix(x, y, r)
        i += 1
      }
      i = 0
      while (i < n) {
        // integerify: first LE word of the LAST 64-byte sub-block, mod N
        val j = x(words - 16) & (n - 1)
        var k = 0
        while (k < words) { x(k) ^= v(j * words + k); k += 1 }
        blockMix(x, y, r)
        i += 1
      }
      val ob = java.nio.ByteBuffer.allocate(block.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      i = 0
      while (i < words) { ob.putInt(x(i)); i += 1 }
      ob.array()
    }

    /** BlockMix_salsa20/8: X = B[2r-1]; Y[i] = Salsa(X ^ B[i]); output is
      * Y even-indexed then odd-indexed (RFC 7914 §4). In place on `b`
      * with `scratch` reused across calls. */
    private def blockMix(b: Array[Int], scratch: Array[Int], r: Int): Unit = {
      val x = new Array[Int](16)
      System.arraycopy(b, (2 * r - 1) * 16, x, 0, 16)
      var i = 0
      while (i < 2 * r) {
        var k = 0
        while (k < 16) { x(k) ^= b(i * 16 + k); k += 1 }
        salsa8(x)
        // even sub-blocks land first, odd ones in the second half
        val dst = (if (i % 2 == 0) i / 2 else r + i / 2) * 16
        System.arraycopy(x, 0, scratch, dst, 16)
        i += 1
      }
      System.arraycopy(scratch, 0, b, 0, 2 * r * 16)
    }

    /** Salsa20/8 core (8 rounds), in place on 16 LE words. */
    private def salsa8(x: Array[Int]): Unit = {
      val in = x.clone()
      @inline def rl(a: Int, s: Int): Int = Integer.rotateLeft(a, s)
      var i = 0
      while (i < 8) {
        // column round
        x(4) ^= rl(x(0) + x(12), 7); x(8) ^= rl(x(4) + x(0), 9)
        x(12) ^= rl(x(8) + x(4), 13); x(0) ^= rl(x(12) + x(8), 18)
        x(9) ^= rl(x(5) + x(1), 7); x(13) ^= rl(x(9) + x(5), 9)
        x(1) ^= rl(x(13) + x(9), 13); x(5) ^= rl(x(1) + x(13), 18)
        x(14) ^= rl(x(10) + x(6), 7); x(2) ^= rl(x(14) + x(10), 9)
        x(6) ^= rl(x(2) + x(14), 13); x(10) ^= rl(x(6) + x(2), 18)
        x(3) ^= rl(x(15) + x(11), 7); x(7) ^= rl(x(3) + x(15), 9)
        x(11) ^= rl(x(7) + x(3), 13); x(15) ^= rl(x(11) + x(7), 18)
        // row round
        x(1) ^= rl(x(0) + x(3), 7); x(2) ^= rl(x(1) + x(0), 9)
        x(3) ^= rl(x(2) + x(1), 13); x(0) ^= rl(x(3) + x(2), 18)
        x(6) ^= rl(x(5) + x(4), 7); x(7) ^= rl(x(6) + x(5), 9)
        x(4) ^= rl(x(7) + x(6), 13); x(5) ^= rl(x(4) + x(7), 18)
        x(11) ^= rl(x(10) + x(9), 7); x(8) ^= rl(x(11) + x(10), 9)
        x(9) ^= rl(x(8) + x(11), 13); x(10) ^= rl(x(9) + x(8), 18)
        x(12) ^= rl(x(15) + x(14), 7); x(13) ^= rl(x(12) + x(15), 9)
        x(14) ^= rl(x(13) + x(12), 13); x(15) ^= rl(x(14) + x(13), 18)
        i += 2
      }
      i = 0
      while (i < 16) { x(i) += in(i); i += 1 }
    }
  }
}
