package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.serve.Json

/** End-to-end platform wiring: Main.start brings up the catalog, the
  * combined scheduler+alert daemon, both REST surfaces and the dashboard;
  * a task created over the admin API is executed by the DAEMON (not
  * run-now) within its 1 s tick cadence, and its log is readable over the
  * query API; Main.App.stop() drains everything (zero storage blocks).
  */
class MainSpec extends SparkSuite {

  private val client = HttpClient.newHttpClient()

  private def send(port: Int, method: String, path: String, body: String = "",
                   cookie: Option[String] = None): (Int, Any, Option[String]) = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
    cookie.foreach(c => b.header("Cookie", c))
    val req = method match {
      case "GET" => b.GET()
      case m => b.method(m, HttpRequest.BodyPublishers.ofString(body))
    }
    val r = client.send(req.build(), HttpResponse.BodyHandlers.ofString())
    val setCookie = r.headers().firstValue("Set-Cookie")
      .map[Option[String]](v => Some(v.split(';').head)).orElse(None)
    (r.statusCode(), Json.parse(r.body()), setCookie)
  }

  private def asMap(v: Any) = v.asInstanceOf[Map[String, Any]]

  test("daemon executes an admin-created task; logs readable; clean stop") {
    val app = Main.start(spark, tmpDir("main-catalog"))
    try {
      // login on the mutating surface (seeded default admin)
      val (lc, _, cookie) = send(app.adminPort, "POST", "/api/login",
        """{"username":"admin","password":"admin123"}""")
      assert(lc == 200 && cookie.isDefined)
      // create a SQL script + an immediately-due task (interval 0)
      val (sc, sb, _) = send(app.adminPort, "POST", "/api/sql-scripts",
        """{"name":"probe","sql_content":"SELECT 1 AS one"}""", cookie)
      assert(sc == 200, s"script create failed: $sb")
      val sid = asMap(sb)("id").asInstanceOf[Long]
      val (tc, tb, _) = send(app.adminPort, "POST", "/api/tasks",
        s"""{"name":"daemon-probe","task_type":"sql","sql_script_id":$sid,
            "schedule_interval":0}""", cookie)
      assert(tc == 200, s"task create failed: $tb")
      val tid = asMap(tb)("id").asInstanceOf[Long]
      // the read API is token-authed (reference: @login_required reads) —
      // mint one over the admin surface, the full production lifecycle
      val (kc, kb, _) = send(app.adminPort, "POST", "/api/users/generate-token",
        """{"name":"e2e-probe"}""", cookie)
      assert(kc == 200, s"token mint failed: $kb")
      val bearer = asMap(kb)("token").asInstanceOf[String]
      def getLogs(tid: Long): (Int, Any) = {
        val b = HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${app.httpPort}/api/task-logs/$tid"))
          .header("Authorization", s"Bearer $bearer").GET()
        val r = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
        (r.statusCode(), Json.parse(r.body()))
      }
      // no token → 401 on the read surface too
      assert(send(app.httpPort, "GET", s"/api/task-logs/$tid")._1 == 401)
      // the ORCHESTRATOR daemon (1 s ticks) must pick it up — no run-now
      val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
      var logs = Vector.empty[Map[String, Any]]
      while (logs.isEmpty && System.nanoTime < deadline) {
        Thread.sleep(500)
        val (gc, gb) = getLogs(tid)
        if (gc == 200)
          logs = asMap(gb)("logs").asInstanceOf[Vector[Any]].map(asMap)
      }
      assert(logs.nonEmpty, "daemon never executed the due task")
      assert(logs.head("status") == "success", s"unexpected log: ${logs.head}")
      // the production composition ships the unauthenticated debug surface
      // OFF (AdminApi's default stays on for reference-parity harnesses
      // that construct it directly; Main must not let any local process
      // mint a write-API token)
      def rawStatus(method: String, path: String): Int = {
        val b = HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${app.adminPort}$path"))
        val r = client.send(
          (if (method == "GET") b.GET()
           else b.method(method, HttpRequest.BodyPublishers.ofString("{}")))
            .build(), HttpResponse.BodyHandlers.ofString())
        r.statusCode() // unregistered contexts 404 with a non-JSON body
      }
      assert(rawStatus("POST", "/api/debug/add-token") != 200,
        "production Main registered the unauthenticated token-minting route")
      assert(rawStatus("GET", "/api/sql-alerts-debug") != 200)
      // dashboard is served from the same admin port
      val page = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${app.adminPort}/")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(page.statusCode() == 200 && page.body().contains("graft"))
    } finally app.stop()
    // graceful stop: daemon joined, pools drained, zero storage blocks
    assert(graft.core.Mat.liveCountAllScopes == 0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked blocks: ${spark.sparkContext.getPersistentRDDs.keys}")
  }
}
