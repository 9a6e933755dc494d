package graft.serve

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ServeSpec extends SparkSuite {

  test("pagination envelope: clamp to 100, ceil-div pages, ordered page (T4)") {
    import spark.implicits._
    val df = (1 to 250).map(i => (i.toLong, s"r$i")).toDF("id", "v")
    val p = Serve.paginate(df, Seq(col("id").desc), page = 2, perPage = 1000)
    assert(p.perPage == 100) // clamp (web_scheduler.py:5336)
    assert(p.total == 250 && p.pages == 3)
    // page 2 of desc order: ids 150..51
    assert(p.rows.head.getLong(0) == 150L && p.rows.last.getLong(0) == 51L)
    val last = Serve.paginate(df, Seq(col("id").desc), page = 3, perPage = 100)
    assert(last.rows.size == 50)
  }

  test("conjunctive filter folds provided predicates only (P8)") {
    import spark.implicits._
    val df = Seq((1, "a", true), (2, "b", true), (3, "a", false))
      .toDF("id", "grp", "flag")
    assert(Serve.conjunctiveFilter(df, Nil).count() == 3)
    assert(Serve.conjunctiveFilter(df,
      Seq(col("grp") === "a", col("flag"))).count() == 1)
  }

  test("tasksWithLatestStatus: latest wins, never_executed = NULL side (J6)") {
    import spark.implicits._
    val tasks = Seq((1L, "etl"), (2L, "report"), (3L, "cleanup"))
      .toDF("id", "name")
    val logs = Seq(
      (10L, 1L, "failed",  "2026-01-01 10:00:00"),
      (11L, 1L, "success", "2026-01-01 11:00:00"), // latest for task 1
      (12L, 2L, "failed",  "2026-01-01 09:00:00")  // latest for task 2
    ).toDF("id", "taskId", "status", "executionTime")
      .withColumn("executionTime", to_timestamp(col("executionTime")))

    val all = Serve.tasksWithLatestStatus(tasks, logs).collect()
    assert(all.length == 3)
    val byId = all.map(r => r.getLong(0) -> r.getAs[String]("latest_status")).toMap
    assert(byId(1L) == "success" && byId(2L) == "failed" && byId(3L) == null)

    val never = Serve.tasksWithLatestStatus(tasks, logs, Some("never_executed"))
    assert(never.collect().map(_.getLong(0)).toSeq == Seq(3L))

    val failed = Serve.tasksWithLatestStatus(tasks, logs, Some("failed"))
    assert(failed.collect().map(_.getLong(0)).toSeq == Seq(2L))

    val liked = Serve.tasksWithLatestStatus(tasks, logs, None, Some("port"))
    assert(liked.collect().map(_.getAs[String]("name")).toSeq == Seq("report"))
  }

  test("auth: hash round-trip, reject wrong password, token shape (F8/F9)") {
    val h = Serve.Auth.hashPassword("admin123", Serve.Auth.newSalt())
    assert(h.startsWith("pbkdf2:sha256:600000$"), "emitted format is werkzeug's")
    assert(Serve.Auth.verifyPassword("admin123", h))
    assert(!Serve.Auth.verifyPassword("nope", h))
    val tok = Serve.Auth.newToken()
    assert(tok.length >= 42 && !tok.contains("="))
  }

  test("auth: werkzeug-format hashes from the reference verify unchanged") {
    // vectors computed independently with Python stdlib
    // hashlib.pbkdf2_hmac('sha256', pw, salt, iter) — the exact function
    // behind werkzeug's generate_password_hash (web_scheduler.py:690)
    val migrated = "pbkdf2:sha256:600000$AbCd1234EfGh5678$" +
      "cefed2a200aa147c295f74dde93f203a30f19a874d5f12d0bdb46026866f3f71"
    assert(Serve.Auth.verifyPassword("admin123", migrated))
    assert(!Serve.Auth.verifyPassword("admin124", migrated))
    // non-default iteration count parses from the method segment
    val it1000 = "pbkdf2:sha256:1000$saltsalt$" +
      "86047d1ecaad2aea56c699eff32f7d4eb3c36a34d3ffd3dc49394d69fa5d2d74"
    assert(Serve.Auth.verifyPassword("secret", it1000))
    assert(!Serve.Auth.verifyPassword("Secret", it1000))
    // malformed method strings reject, not crash
    assert(!Serve.Auth.verifyPassword("x", "pbkdf2:sha256:abc$s$h"))
  }

  test("auth: legacy salt:sha256 rows from earlier catalogs still verify") {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val legacy = "00ff00ff:" +
      md.digest("00ff00ffoldpw".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(Serve.Auth.verifyPassword("oldpw", legacy))
    assert(!Serve.Auth.verifyPassword("newpw", legacy))
  }

  test("scrypt: RFC 7914 §12 vectors (incl. empty password) bit-exact") {
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    assert(hex(Serve.Scrypt.derive("".getBytes, "".getBytes, 16, 1, 1, 64)) ==
      "77d6576238657b203b19ca42c18a0497f16b4844e3074ae8dfdffa3fede21442" +
      "fcd0069ded0948f8326a753a0fc81f17e8d3e0fb2e0d3628cf35e20c38d18906")
    assert(hex(Serve.Scrypt.derive("password".getBytes, "NaCl".getBytes,
        1024, 8, 16, 64)) ==
      "fdbabe1c9d3472007856e7190d01e9fe7c6ad7cbc8237830e77376634b373162" +
      "2eaf30d92e22a3886ff109279d9830dac727afb94a83ee6d8360cbdfa2cc0640")
    assert(hex(Serve.Scrypt.derive("pleaseletmein".getBytes,
        "SodiumChloride".getBytes, 16384, 8, 1, 64)) ==
      "7023bdcb3afd7348461c06cd81fd38ebfda8fbba904f8e3ea9b543f6545da1f2" +
      "d5432955613f0fcf62d49705242a9af9e61e85dc0d651e40dfcf017b45575887")
    intercept[IllegalArgumentException](
      Serve.Scrypt.derive("x".getBytes, "y".getBytes, 15, 1, 1, 32)) // N not 2^k
  }

  test("auth: werkzeug-3 scrypt hashes (its current default) verify unchanged") {
    // reference vector produced with OpenSSL scrypt at werkzeug 3's
    // default parameters (N=32768 r=8 p=1, dklen=64, text salt):
    // hashlib.scrypt(b'admin123', salt=b'abcDEF0123456789', ...)
    val stored = "scrypt:32768:8:1$abcDEF0123456789$" +
      "93a1075b907116ee00e8ae3aafc8b9bb25932d2f7c46ede7efeefeebab8f0932" +
      "b216e65b6010311014af8d30ccbb85b550d9cc2c22bbc07dc62562920aedd102"
    assert(Serve.Auth.verifyPassword("admin123", stored))
    assert(!Serve.Auth.verifyPassword("admin124", stored))
    // malformed parameter strings are a clean reject, not an exception
    assert(!Serve.Auth.verifyPassword("x", "scrypt:abc:8:1$s$00"))
    assert(!Serve.Auth.verifyPassword("x", "scrypt:15:8:1$s$00"))
    // hostile parameter rows: N=2^26 overflows n*words without the cap
    // (NegativeArraySizeException), and large-but-valid N/r force multi-GB
    // allocations — all must be clean rejects, never a crash or an alloc
    assert(!Serve.Auth.verifyPassword("x", "scrypt:67108864:8:1$s$00"))
    assert(!Serve.Auth.verifyPassword("x", "scrypt:4194304:8:1$s$00"))
    assert(!Serve.Auth.verifyPassword("x", "scrypt:1024:100000:1$s$00"))
    assert(!Serve.Auth.verifyPassword("x", "scrypt:1024:8:1000000$s$00"))
    assert(!Serve.Auth.verifyPassword("x",
      "scrypt:2147483648:8:1$s$00")) // N > Int.MaxValue: NumberFormat path
  }
}
