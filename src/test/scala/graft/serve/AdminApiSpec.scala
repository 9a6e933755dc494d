package graft.serve

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSuite
import graft.catalog.CatalogStore
import graft.catalog.Model._

/** Golden request/response tests for the mutating REST surface — shapes from
  * web_scheduler.py's CRUD routes (field names, messages, status codes). */
class AdminApiSpec extends SparkSuite {

  private val executed = scala.collection.mutable.ListBuffer.empty[Long]

  private val notifier = new graft.alerts.InMemoryNotifier
  private val testSends = scala.collection.mutable.ListBuffer.empty[(String, String)]

  private lazy val env: (AdminApi, Int, CatalogStore) = {
    val store = new CatalogStore(spark, tmpDir("admin-cat"))
    val exec: Task => Either[String, String] = t => {
      executed += t.id
      if (t.name.contains("slow")) Thread.sleep(1500)
      if (t.name.contains("tracker")) // a Jdbc.runScript-style snapshot
        assert(graft.core.Mat.tracked(spark.range(100).toDF("id")).count() == 100)
      if (t.name.contains("doomed")) Left("boom") else Right("ok")
    }
    val alerts = new graft.alerts.AlertService(spark, store, notifier,
      tmpDir("admin-export"),
      clock = () => java.time.LocalDateTime.of(2026, 1, 10, 12, 0, 0))
    val api = new AdminApi(spark, store, exec, Some(alerts),
      currentUserId = () => 7L,
      clock = () => java.time.LocalDateTime.of(2026, 1, 10, 12, 0, 0),
      uploadsDir = tmpDir("admin-uploads"),
      testMailer = (cfg, rcpt) => {
        testSends += (cfg.configName -> rcpt)
        if (rcpt.contains("bounce")) Left("bounced") else Right(())
      })
    val port = api.start()
    (api, port, store)
  }

  private val client = HttpClient.newHttpClient()

  /** Raw request with an explicit Cookie header (None = unauthenticated). */
  private def rawCall(method: String, path: String, body: String,
                      cookie: Option[String]): (Int, Any, Option[String]) = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${env._2}$path"))
    cookie.foreach(c => b.header("Cookie", c))
    val req = method match {
      case "GET"    => b.GET()
      case "DELETE" => b.DELETE()
      case m        => b.method(m, HttpRequest.BodyPublishers.ofString(body))
    }
    val r = client.send(req.build(), HttpResponse.BodyHandlers.ofString())
    val setCookie = r.headers().firstValue("Set-Cookie")
      .map[Option[String]](v => Some(v.split(';').head)).orElse(None)
    (r.statusCode(), Json.parse(r.body()), setCookie)
  }

  /** Session cookie from logging in as the seeded default admin
    * (admin/admin123 — web_scheduler.py:688-689). */
  private lazy val sessionCookie: String = {
    val (code, _, cookie) = rawCall("POST", "/api/login",
      """{"username":"admin","password":"admin123"}""", None)
    assert(code == 200, s"seed-admin login failed: $code")
    cookie.get
  }

  private def call(method: String, path: String, body: String = ""): (Int, Any) = {
    val (code, parsed, _) = rawCall(method, path, body, Some(sessionCookie))
    (code, parsed)
  }

  private def asMap(v: Any) = v.asInstanceOf[Map[String, Any]]

  test("task lifecycle: create → get → update → toggle → run → delete") {
    // create: missing fields → 400 (web_scheduler.py:4801)
    val (cBad, bBad) = call("POST", "/api/tasks", """{"name":"x"}""")
    assert(cBad == 400 && asMap(bBad) == Map("error" -> "缺少必要字段"))
    // create with cron: invalid → 400 with the reference's message prefix
    val (cCron, bCron) = call("POST", "/api/tasks",
      """{"name":"t","task_type":"sql","cron_expression":"not a cron"}""")
    assert(cCron == 400)
    assert(asMap(bCron)("error").toString.startsWith("无效的Cron表达式"))
    // valid create with interval
    val (c1, b1) = call("POST", "/api/tasks",
      """{"name":"etl","task_type":"sql","sql_script_id":3,
         "schedule_interval":3600,"dependencies":[1,2],"max_retries":2}""")
    assert(c1 == 200)
    assert(asMap(b1)("message") == "任务创建成功")
    val id = asMap(b1)("id").asInstanceOf[Long]
    // valid create with cron: next_run from the cron, interval forced 0
    val (c2, b2) = call("POST", "/api/tasks",
      """{"name":"nightly","task_type":"python","script_path":"s.py",
         "cron_expression":"0 2 * * *"}""")
    assert(c2 == 200)
    val cronId = asMap(b2)("id").asInstanceOf[Long]
    // get detail
    val (cg, bg) = call("GET", s"/api/tasks/$id")
    assert(cg == 200)
    val t = asMap(bg)
    assert(t("name") == "etl" && t("schedule_interval") == 3600L)
    assert(t("dependencies") == Vector(1L, 2L) && t("max_retries") == 2L)
    assert(t("next_run") == "2026-01-10 13:00:00") // now + interval
    val (cg2, bg2) = call("GET", s"/api/tasks/$cronId")
    assert(asMap(bg2)("next_run") == "2026-01-11 02:00:00") // cron next
    assert(cg2 == 200)
    assert(call("GET", "/api/tasks/999")._1 == 404)
    // update recomputes next_run only on valid cron
    val (cu, bu) = call("PUT", s"/api/tasks/$id",
      """{"name":"etl2","cron_expression":"*/30 * * * *"}""")
    assert(cu == 200 && asMap(bu)("message") == "任务更新成功")
    assert(asMap(call("GET", s"/api/tasks/$id")._2)("next_run") == "2026-01-10 12:30:00")
    // toggle flips isActive (F12)
    assert(asMap(call("POST", s"/api/tasks/$id/toggle")._2)("message") == "任务状态已更新")
    assert(asMap(call("GET", s"/api/tasks/$id")._2)("is_active") == false)
    // run-now executes, logs, stamps last_run
    val (cr, br) = call("POST", s"/api/tasks/$id/run")
    assert(cr == 200 && asMap(br)("message") == "任务执行成功")
    assert(executed.contains(id))
    assert(env._3.read[TaskLog]("task_logs").collect()
      .exists(l => l.taskId == id && l.status == "success"))
    assert(asMap(call("GET", s"/api/tasks/$id")._2)("last_run") == "2026-01-10 12:00:00")
    // failed execution reports the error in the message
    val (c3, b3) = call("POST", "/api/tasks",
      """{"name":"doomed","task_type":"sql","sql_script_id":1}""")
    assert(c3 == 200)
    val doomedId = asMap(b3)("id").asInstanceOf[Long]
    val (cf, bf) = call("POST", s"/api/tasks/$doomedId/run")
    assert(cf == 200 && asMap(bf)("message") == "任务执行失败: boom")
    // incomplete config → 400 (web_scheduler.py:5058)
    val (c4, b4) = call("POST", "/api/tasks", """{"name":"no-script","task_type":"python"}""")
    val nsId = asMap(b4)("id").asInstanceOf[Long]
    assert(c4 == 200)
    assert(call("POST", s"/api/tasks/$nsId/run")._1 == 400)
    // delete
    assert(asMap(call("DELETE", s"/api/tasks/$id")._2)("message") == "任务已删除")
    assert(call("DELETE", s"/api/tasks/$id")._1 == 404)
  }

  test("db-config CRUD with the FK delete guard") {
    val (c1, b1) = call("POST", "/api/db-configs",
      """{"name":"wh","db_type":"mysql","host":"h","port":3306,
         "username":"u","password":"p"}""")
    assert(c1 == 200 && asMap(b1)("message") == "数据库配置创建成功")
    val cfgId = asMap(b1)("id").asInstanceOf[Long]
    // a script referencing the config blocks deletion (web_scheduler.py:3927)
    val (c2, b2) = call("POST", "/api/sql-scripts",
      s"""{"name":"refresh","db_config_id":$cfgId,"sql_content":"SELECT 1"}""")
    assert(c2 == 200 && asMap(b2)("message") == "SQL脚本创建成功")
    val scriptId = asMap(b2)("id").asInstanceOf[Long]
    val (cDel, bDel) = call("DELETE", s"/api/db-configs/$cfgId")
    assert(cDel == 400)
    assert(asMap(bDel)("error") == "有1个SQL脚本正在使用此数据库配置，无法删除")
    // script list joins the config name
    val scripts = asMap(call("GET", "/api/sql-scripts")._2)("sql_scripts")
      .asInstanceOf[Vector[Any]].map(asMap)
    assert(scripts.head("db_config_name") == "wh")
    // delete script, then config deletion succeeds
    assert(asMap(call("DELETE", s"/api/sql-scripts/$scriptId")._2)("message") == "SQL脚本删除成功")
    assert(asMap(call("DELETE", s"/api/db-configs/$cfgId")._2)("message") == "数据库配置删除成功")
    assert(call("GET", s"/api/sql-scripts/$scriptId")._1 == 404)
  }

  test("sql-alert lifecycle: create validation chain, list aliases, check, delete") {
    // prerequisites: an email config and a script WITH a db config
    import spark.implicits._
    env._3.overwrite(Seq(EmailConfig(1L, "ops", "smtp.local", 25, false, "u",
      "p", "noreply@x", true, isDefault = true,
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))).toDS(), "email_configs")
    val (_, bCfg) = call("POST", "/api/db-configs",
      """{"name":"adb","db_type":"mysql","host":"h","port":1,"username":"u","password":"p"}""")
    val cfgId = asMap(bCfg)("id").asInstanceOf[Long]
    val (_, bScr) = call("POST", "/api/sql-scripts",
      s"""{"name":"probe","db_config_id":$cfgId,
          "sql_content":"SELECT 1 AS one; SELECT 2 AS two"}""")
    val scriptId = asMap(bScr)("id").asInstanceOf[Long]
    val (_, bScrNoCfg) = call("POST", "/api/sql-scripts",
      """{"name":"orphan","sql_content":"SELECT 1"}""")
    val orphanId = asMap(bScrNoCfg)("id").asInstanceOf[Long]

    // validation chain (web_scheduler.py:2805-2830)
    assert(asMap(call("POST", "/api/sql-alerts", """{"name":"a"}""")._2) ==
      Map("error" -> "缺少必要参数"))
    assert(asMap(call("POST", "/api/sql-alerts",
      """{"name":"a","sql_script_id":999,"recipients":"x@y"}""")._2) ==
      Map("error" -> "SQL脚本不存在"))
    assert(asMap(call("POST", "/api/sql-alerts",
      s"""{"name":"a","sql_script_id":$orphanId,"recipients":"x@y"}""")._2)("error")
      .toString.startsWith("SQL脚本没有关联的数据库配置"))
    val (cBadCron, bBadCron) = call("POST", "/api/sql-alerts",
      s"""{"name":"a","sql_script_id":$scriptId,"recipients":"x@y",
          "cron_expression":"bogus"}""")
    assert(cBadCron == 400)
    assert(asMap(bBadCron)("error") == "无效的cron表达式: bogus")
    // create (201), email config falls back to the default
    val (cOk, bOk) = call("POST", "/api/sql-alerts",
      s"""{"name":"rows-alert","sql_script_id":$scriptId,"recipients":"a@x,b@x",
          "condition":"not_empty","cron_expression":"0 * * * *"}""")
    assert(cOk == 201 && asMap(bOk)("message") == "SQL预警创建成功")
    val alertId = asMap(bOk)("id").asInstanceOf[Long]
    // list carries the reference's frontend alias fields
    val listed = asMap(call("GET", "/api/sql-alerts")._2)("alerts")
      .asInstanceOf[Vector[Any]].map(asMap)
    val al = listed.find(_("id") == alertId).get
    assert(al("script_name") == "probe" && al("email_config_name") == "ops")
    assert(al("emails") == "a@x,b@x" && al("enabled") == true)
    assert(al("next_check") == "2026-01-10 13:00:00") // cron next from clock
    // manual check: SELECT 2 AS two → 1 row → not_empty triggers, email sent
    val (cChk, bChk) = call("POST", s"/api/sql-alerts/$alertId/check")
    assert(cChk == 200)
    val chk = asMap(bChk)
    assert(chk("triggered") == true && chk("result_count") == 1L)
    assert(chk("message") == "SQL预警触发，已发送邮件通知")
    assert(chk("email_sent") == true)
    assert(notifier.sent.exists(_.subject == "[ALERT] rows-alert"))
    assert(call("POST", "/api/sql-alerts/999/check")._1 == 404)
    // latest-log reflects the check just run (web_scheduler.py:5137-5227)
    val (cLl, bLl) = call("GET", s"/api/sql-alerts/$alertId/latest-log")
    assert(cLl == 200)
    assert(asMap(bLl)("alert_name") == "rows-alert")
    assert(asMap(bLl)("status") == "triggered")
    val (cLd, bLd) = call("GET", s"/api/sql-alerts/$alertId/latest-log-details")
    assert(cLd == 200)
    assert(asMap(bLd)("details").toString.contains("Row count: 1"))
    assert(call("GET", "/api/sql-alerts/999/latest-log")._1 == 404)
    // PUT: partial update; empty cron clears next_check (web_scheduler.py:3023)
    val (cPut, bPut) = call("PUT", s"/api/sql-alerts/$alertId",
      """{"name":"rows-alert-v2","threshold":5,"cron_expression":""}""")
    assert(cPut == 200)
    val putAlert = asMap(asMap(bPut)("alert"))
    assert(asMap(bPut)("message") == "SQL预警更新成功")
    assert(putAlert("name") == "rows-alert-v2" && putAlert("threshold") == 5L)
    assert(putAlert("next_check") == null) // cleared
    assert(asMap(call("PUT", s"/api/sql-alerts/$alertId",
      """{"cron_expression":"junk"}""")._2)("error") == "无效的cron表达式: junk")
    assert(call("PUT", "/api/sql-alerts/999", "{}")._1 == 404)
    // disabled alerts refuse the check (web_scheduler.py:3180)
    val a0 = env._3.read[SqlAlert]("sql_alerts").collect().find(_.id == alertId).get
    env._3.upsert[SqlAlert]("sql_alerts", Seq(a0.copy(isEnabled = false)), _.id)
    assert(asMap(call("POST", s"/api/sql-alerts/$alertId/check")._2) ==
      Map("error" -> "预警已禁用"))
    // delete
    val (cDel, bDel) = call("DELETE", s"/api/sql-alerts/$alertId")
    assert(cDel == 200 && asMap(bDel) ==
      Map("success" -> true, "message" -> "SQL预警删除成功"))
    assert(call("DELETE", s"/api/sql-alerts/$alertId")._1 == 404)
  }

  test("upload: multipart .py into managed dir, then listed (S10)") {
    def multipart(filename: String, content: String): (Int, Any) = {
      val boundary = "----graftform"
      val body = s"--$boundary\r\n" +
        s"""Content-Disposition: form-data; name="file"; filename="$filename"""" +
        "\r\nContent-Type: text/x-python\r\n\r\n" + content + s"\r\n--$boundary--\r\n"
      val req = java.net.http.HttpRequest
        .newBuilder(URI.create(s"http://127.0.0.1:${env._2}/api/upload"))
        .header("Content-Type", s"multipart/form-data; boundary=$boundary")
        .header("Cookie", sessionCookie)
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build()
      val r = client.send(req, HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), Json.parse(r.body()))
    }
    // .py required (web_scheduler.py:4283)
    assert(asMap(multipart("evil.sh", "x")._2) == Map("error" -> "只支持.py文件"))
    assert(asMap(multipart("", "x")._2) == Map("error" -> "没有选择文件"))
    val (c, b) = multipart("probe job.py", "print('hi')\n")
    assert(c == 200 && asMap(b)("message") == "文件上传成功")
    val path = asMap(b)("filepath").toString
    assert(path.endsWith("probe_job.py")) // sanitized (F10)
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(path)) == "print('hi')\n")
    // listed by /api/python-scripts
    val listed = call("GET", "/api/python-scripts")._2.asInstanceOf[Vector[Any]].map(asMap)
    assert(listed.exists(_("name") == "probe_job.py"))
  }

  test("email-config lifecycle: default exclusivity, delete guard, test send") {
    // create two configs; the second claims default → first loses it
    assert(asMap(call("POST", "/api/email-configs",
      """{"config_name":"primary","mail_server":"smtp1","mail_port":25,
         "mail_username":"u1","mail_password":"p1","is_default":true}""")._2)
      ("message") == "邮件配置创建成功")
    assert(asMap(call("POST", "/api/email-configs",
      """{"config_name":"backup","mail_server":"smtp2","mail_port":25,
         "mail_username":"u2","mail_password":"p2","is_default":true}""")._2)
      ("message") == "邮件配置创建成功")
    def cfgs() = call("GET", "/api/email-configs")._2.asInstanceOf[Vector[Any]].map(asMap)
    val afterCreate = cfgs().filter(c =>
      Seq("primary", "backup").contains(c("config_name")))
    assert(afterCreate.count(_("is_default") == true) == 1)
    assert(afterCreate.find(_("config_name") == "backup").get("is_default") == true)
    val primaryId = afterCreate.find(_("config_name") == "primary").get("id").asInstanceOf[Long]
    val backupId = afterCreate.find(_("config_name") == "backup").get("id").asInstanceOf[Long]
    // set-default flips back (web_scheduler.py:1984)
    assert(asMap(call("POST", s"/api/email-configs/$primaryId/set-default")._2)
      ("message") == "默认邮件配置设置成功")
    assert(cfgs().find(_("id") == primaryId).get("is_default") == true)
    assert(cfgs().find(_("id") == backupId).get("is_default") == false)
    // the default config cannot be deleted (web_scheduler.py:2297)
    val (cDel, bDel) = call("DELETE", s"/api/email-configs/$primaryId")
    assert(cDel == 400)
    assert(asMap(bDel)("error") == "不能删除默认邮件配置，请先设置其他配置为默认")
    assert(call("DELETE", "/api/email-configs/999")._1 == 404)
    // test send through the injected mailer (web_scheduler.py:2320-2373)
    assert(asMap(call("POST", s"/api/email-configs/$backupId/test", "{}")._2)
      ("error") == "请提供收件人邮箱")
    val (cT, bT) = call("POST", s"/api/email-configs/$backupId/test",
      """{"recipient":"ops@x.com"}""")
    assert(cT == 200 && asMap(bT)("message") == "测试邮件发送成功")
    assert(testSends.contains("backup" -> "ops@x.com"))
    val (cB, bB) = call("POST", s"/api/email-configs/$backupId/test",
      """{"recipient":"bounce@x.com"}""")
    assert(cB == 500 && asMap(bB)("error").toString.startsWith("测试邮件发送失败"))
    // incomplete config refuses the test
    val (_, bInc) = call("POST", "/api/email-configs",
      """{"config_name":"incomplete","mail_server":"s"}""")
    val incId = cfgs().find(_("config_name") == "incomplete").get("id").asInstanceOf[Long]
    assert(asMap(call("POST", s"/api/email-configs/$incId/test",
      """{"recipient":"a@x"}""")._2)("error") == "邮件配置不完整")
    // delete the non-default works
    assert(asMap(call("DELETE", s"/api/email-configs/$incId")._2)
      ("message") == "邮件配置删除成功")
  }

  test("task-alert CRUD: type constraint, default email fallback") {
    // ensure an email config exists (default fallback target)
    call("POST", "/api/email-configs",
      """{"config_name":"ta-cfg","mail_server":"s","mail_port":25,
         "mail_username":"u","mail_password":"p","is_default":true}""")
    assert(asMap(call("POST", "/api/task-alerts", """{"name":"a"}""")._2) ==
      Map("error" -> "缺少必要参数"))
    assert(asMap(call("POST", "/api/task-alerts",
      """{"name":"a","alert_type":"explode","recipients":"x@y"}""")._2)
      ("error") == "预警类型必须是 success、failure 或 timeout")
    val (c1, b1) = call("POST", "/api/task-alerts",
      """{"name":"fail-watch","task_id":1,"condition":"failure","emails":"x@y,z@y"}""")
    assert(c1 == 201 && asMap(b1)("message") == "任务预警创建成功")
    val id = asMap(b1)("id").asInstanceOf[Long]
    val listed = asMap(call("GET", "/api/task-alerts")._2)("alerts")
      .asInstanceOf[Vector[Any]].map(asMap)
    val a = listed.find(_("id") == id).get
    assert(a("alert_type") == "failure" && a("emails") == "x@y,z@y")
    assert(a("email_config_id") != null) // fell back to the default config
    assert(asMap(call("PUT", s"/api/task-alerts/$id",
      """{"enabled":false}""")._2)("message") == "任务预警更新成功")
    assert(asMap(call("GET", s"/api/task-alerts/$id")._2)("is_enabled") == false)
    assert(asMap(call("DELETE", s"/api/task-alerts/$id")._2)("message") == "任务预警删除成功")
    assert(call("DELETE", s"/api/task-alerts/$id")._1 == 404)
  }

  test("user management: create, duplicate guard, change-password, delete cascade") {
    val (c1, b1) = call("POST", "/api/users",
      """{"username":"alice","password":"pw1"}""")
    assert(c1 == 200 && asMap(b1)("message") == "用户创建成功")
    val aliceId = asMap(b1)("id").asInstanceOf[Long]
    assert(asMap(call("POST", "/api/users",
      """{"username":"alice","password":"other"}""")._2)("error") == "用户名已存在")
    assert(asMap(call("POST", "/api/users", """{"username":"x"}""")._2)
      ("error") == "用户名和密码不能为空")
    // change-password for the CURRENT user — the logged-in seeded admin
    // (id 1, password admin123; web_scheduler.py:688-689)
    assert(asMap(call("POST", "/api/users/change-password",
      """{"current_password":"wrong","new_password":"n"}""")._2)
      ("error") == "当前密码错误")
    assert(asMap(call("POST", "/api/users/change-password",
      """{"current_password":"admin123","new_password":"newpw"}""")._2)
      ("message") == "密码修改成功")
    val admin = env._3.read[User]("users").collect().find(_.id == 1L).get
    assert(Serve.Auth.verifyPassword("newpw", admin.passwordHash))
    // restore so later tests can log in with the seeded credentials
    assert(asMap(call("POST", "/api/users/change-password",
      """{"current_password":"newpw","new_password":"admin123"}""")._2)
      ("message") == "密码修改成功")
    // delete: self-guard, then cascade removes alice's tokens
    assert(asMap(call("DELETE", "/api/users/1")._2)("error") == "不能删除当前登录用户")
    env._3.upsert[UserToken]("user_tokens", Seq(UserToken(991L, aliceId, "tkn",
      java.sql.Timestamp.valueOf("2099-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))), _.id)
    assert(asMap(call("DELETE", s"/api/users/$aliceId")._2)
      ("message") == "用户 alice 删除成功")
    assert(!env._3.read[UserToken]("user_tokens").collect().exists(_.userId == aliceId))
    assert(call("DELETE", s"/api/users/$aliceId")._1 == 404)
  }

  test("latest-log: task context prefixes and empty-log hints") {
    val (_, bT) = call("POST", "/api/tasks",
      """{"name":"ll-sql","task_type":"sql","sql_script_id":42}""")
    val id = asMap(bT)("id").asInstanceOf[Long]
    // no logs yet → sql-specific hint (web_scheduler.py:5117)
    assert(asMap(call("GET", s"/api/tasks/$id/latest-log")._2)
      ("message") == s"暂无执行日志（SQL脚本ID: 42）")
    // run it (executor succeeds) → latest log with the sql prefix
    call("POST", s"/api/tasks/$id/run")
    val m = asMap(call("GET", s"/api/tasks/$id/latest-log")._2)
    assert(m("task_name") == "ll-sql" && m("status") == "success")
    assert(m("message").toString.startsWith("[SQL脚本ID: 42] "))
    assert(call("GET", "/api/tasks/9999/latest-log")._1 == 404)
  }

  test("token management: generate, list (user-scoped), delete") {
    // name required (web_scheduler.py:4221)
    val (cBad, bBad) = call("POST", "/api/users/generate-token", """{}""")
    assert(cBad == 400 && asMap(bBad) == Map("error" -> "Token名称不能为空"))
    val (c1, b1) = call("POST", "/api/users/generate-token",
      """{"name":"ci-token","days":7}""")
    assert(c1 == 200)
    val m = asMap(b1)
    assert(m("message") == "Token生成成功")
    assert(m("token").toString.length >= 40) // urlsafe 32 bytes ≈ 43 chars
    assert(m("expires_at") == "2026-01-17 12:00:00") // now + 7 days
    val tokId = m("id").asInstanceOf[Long]
    val listed = asMap(call("GET", "/api/users/tokens")._2)("tokens")
      .asInstanceOf[Vector[Any]].map(asMap)
    assert(listed.exists(t => t("id") == tokId && t("name") == "ci-token"))
    assert(asMap(call("DELETE", s"/api/users/tokens/$tokId")._2)("message") == "Token删除成功")
    assert(!asMap(call("GET", "/api/users/tokens")._2)("tokens")
      .asInstanceOf[Vector[Any]].map(asMap).exists(_("id") == tokId))
  }

  test("a users row migrated from the reference's scheduler.db authenticates") {
    // the reference stores werkzeug generate_password_hash output
    // (web_scheduler.py:690); this row's hash was computed independently
    // with Python stdlib pbkdf2_hmac — loading it as-is must log in
    val store = env._3
    store.upsert[User]("users", Seq(User(91L, "migrated",
      "pbkdf2:sha256:600000$AbCd1234EfGh5678$" +
        "cefed2a200aa147c295f74dde93f203a30f19a874d5f12d0bdb46026866f3f71",
      java.sql.Timestamp.valueOf("2026-01-10 12:00:00"))), _.id)
    val (cOk, bOk, cookie) = rawCall("POST", "/api/login",
      """{"username":"migrated","password":"admin123"}""", None)
    assert(cOk == 200 && asMap(bOk) == Map("message" -> "登录成功", "redirect" -> "/"))
    assert(cookie.exists(_.startsWith("session=")))
    val (cBad, _, _) = rawCall("POST", "/api/login",
      """{"username":"migrated","password":"admin1234"}""", None)
    assert(cBad == 401)
  }

  test("session auth lifecycle: 401 without login, login sets cookie, logout revokes") {
    // login_required semantics (web_scheduler.py:1741-1748): no session →
    // golden 401 body on every admin route
    val (cNone, bNone, _) = rawCall("GET", "/api/db-configs", "", None)
    assert(cNone == 401 && asMap(bNone) == Map("error" -> "未授权访问"))
    val (cMut, bMut, _) = rawCall("POST", "/api/tasks",
      """{"name":"t","task_type":"sql"}""", None)
    assert(cMut == 401 && asMap(bMut) == Map("error" -> "未授权访问"))
    // wrong credentials → reference's exact error (web_scheduler.py:1671)
    val (cBad, bBad, _) = rawCall("POST", "/api/login",
      """{"username":"admin","password":"nope"}""", None)
    assert(cBad == 401 && asMap(bBad) == Map("error" -> "用户名或密码错误"))
    // fresh login → golden success body + cookie that unlocks routes
    val (cOk, bOk, cookie) = rawCall("POST", "/api/login",
      """{"username":"admin","password":"admin123"}""", None)
    assert(cOk == 200)
    assert(asMap(bOk) == Map("message" -> "登录成功", "redirect" -> "/"))
    assert(cookie.exists(_.startsWith("session=")))
    assert(rawCall("GET", "/api/db-configs", "", cookie)._1 == 200)
    // logout revokes THIS session; the old cookie is dead, others live on
    val (cOut, bOut, _) = rawCall("POST", "/api/logout", "", cookie)
    assert(cOut == 200 && asMap(bOut) == Map("message" -> "已退出登录"))
    assert(rawCall("GET", "/api/db-configs", "", cookie)._1 == 401)
    assert(rawCall("GET", "/api/db-configs", "", Some(sessionCookie))._1 == 200)
  }

  test("concurrent POSTs allocate distinct ids (write lock)") {
    // read-max-then-upsert id allocation must serialize: without the write
    // lock two concurrent creates mint the same id and one row vanishes
    // (the reference serializes via SQLite's write lock + AUTOINCREMENT)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (1 to 6).map { i => Future {
      call("POST", "/api/db-configs",
        s"""{"name":"cc-$i","db_type":"mysql","host":"h","port":3306,
            "username":"u","password":"p"}""")
    }}
    val ids = Await.result(Future.sequence(fs), 60.seconds)
      .map { case (code, body) => assert(code == 200); asMap(body)("id") }
    assert(ids.distinct.size == ids.size, s"duplicate ids minted: $ids")
  }

  test("API stays responsive while a slow run-now is in flight") {
    // the reference serves 4 workers × 1000 connections; a slow task must
    // not head-of-line-block the API (VERDICT r2 missing #1)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val (cc, cb) = call("POST", "/api/tasks",
      """{"name":"slowpoke","task_type":"sql","sql_script_id":1,
         "schedule_interval":3600}""")
    assert(cc == 200)
    val slowId = asMap(cb)("id").asInstanceOf[Long]
    val runF = Future(call("POST", s"/api/tasks/$slowId/run"))
    Thread.sleep(200) // let run-now enter the (1.5 s) executor
    val t0 = System.nanoTime()
    val (gc, _) = call("GET", "/api/db-configs")
    val getMs = (System.nanoTime() - t0) / 1e6
    assert(gc == 200)
    assert(getMs < 1000.0,
      s"GET took ${getMs}ms — starved behind the in-flight run-now")
    val (rc, rb) = Await.result(runF, 60.seconds)
    assert(rc == 200 && asMap(rb)("message") == "任务执行成功")
  }

  test("run-now drains its tracked snapshots at request end (serve-only no-leak)") {
    // ADVICE r3 medium: a serve-only deployment (no daemon loop in the
    // JVM) must not accumulate run-now snapshots — the handler thread
    // drains its OWN scope in the exchange finally, and per-owner scoping
    // keeps a concurrent daemon from touching the frames mid-request
    val (cc, cb) = call("POST", "/api/tasks",
      """{"name":"tracker-task","task_type":"sql","sql_script_id":1,
         "schedule_interval":3600}""")
    assert(cc == 200)
    val id = asMap(cb)("id").asInstanceOf[Long]
    val (rc, rb) = call("POST", s"/api/tasks/$id/run")
    assert(rc == 200 && asMap(rb)("message") == "任务执行成功")
    assert(graft.core.Mat.liveCountAllScopes == 0,
      "run-now's tracked snapshot survived the request-end drain")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked blocks: ${spark.sparkContext.getPersistentRDDs.keys}")
  }

  test("dashboard: static page open, task list + log panel session-authed") {
    // the static page is reachable WITHOUT a session (it hosts the login
    // form, like the reference's /login template route)
    val req = HttpRequest.newBuilder(
      URI.create(s"http://127.0.0.1:${env._2}/")).GET().build()
    val page = client.send(req, HttpResponse.BodyHandlers.ofString())
    assert(page.statusCode() == 200)
    assert(page.headers().firstValue("Content-Type").get.startsWith("text/html"))
    assert(page.body().contains("graft 调度管理平台"))
    assert(page.body().contains("/api/login")) // drives the JSON surface
    // every reference template page has a section: tasks, logs, scripts,
    // alerts, db-configs, email-configs, notification logs, users
    Seq("任务管理", "运行日志", "SQL 脚本", "SQL 告警", "数据库配置",
        "邮件配置", "通知日志", "用户管理").foreach { h =>
      assert(page.body().contains(h), s"missing section $h")
    }
    Seq("/api/email-configs", "/api/notification-logs", "/api/users")
      .foreach(r => assert(page.body().contains(r), s"page does not drive $r"))
    // unknown static path → 404, /api prefix routing unaffected
    val miss = client.send(HttpRequest.newBuilder(
      URI.create(s"http://127.0.0.1:${env._2}/nope")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(miss.statusCode() == 404)
    // the data routes the page drives are session-gated
    val (unauth, ub, _) = rawCall("GET", "/api/tasks", "", None)
    assert(unauth == 401 && asMap(ub) == Map("error" -> "未授权访问"))
    // authed list: envelope {tasks:[...]} newest-first with schedule fields
    val (cc, cb) = call("POST", "/api/tasks",
      """{"name":"ui-seed","task_type":"sql","sql_script_id":1,
         "schedule_interval":60}""")
    assert(cc == 200)
    val id = asMap(cb)("id").asInstanceOf[Long]
    val (lc, lb) = call("GET", "/api/tasks")
    assert(lc == 200)
    val rows = asMap(lb)("tasks").asInstanceOf[Vector[Any]].map(asMap)
    val mine = rows.find(_("id") == id).get
    assert(mine("name") == "ui-seed" && mine("task_type") == "sql")
    assert(mine("is_active") == true && mine("schedule_interval") == 60L)
    // run it, then the log panel route returns the appended log row
    val (rc2, _) = call("POST", s"/api/tasks/$id/run")
    assert(rc2 == 200)
    val (gc, gb) = call("GET", s"/api/task-logs/$id")
    assert(gc == 200)
    val logs = asMap(gb)("logs").asInstanceOf[Vector[Any]].map(asMap)
    assert(logs.nonEmpty && logs.head("status") == "success")
    val (nc, nb) = call("GET", "/api/task-logs/999999")
    assert(nc == 404 && asMap(nb) == Map("message" -> "任务不存在"))
  }

  test("sessions persist across a restart (flask_session parity)") {
    // the reference's filesystem session store keeps logins valid across
    // server restarts; with sessionDir set ours must too
    val sdir = tmpDir("admin-sess")
    val store2 = new CatalogStore(spark, tmpDir("admin-cat2"))
    val exec: Task => Either[String, String] = _ => Right("ok")
    def req(port: Int, method: String, path: String, body: String,
            cookie: Option[String]) = {
      val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      cookie.foreach(c => b.header("Cookie", c))
      val r = client.send(
        (if (method == "GET") b.GET()
         else b.method(method, HttpRequest.BodyPublishers.ofString(body))).build(),
        HttpResponse.BodyHandlers.ofString())
      (r.statusCode(),
       r.headers().firstValue("Set-Cookie")
        .map[Option[String]](v => Some(v.split(';').head)).orElse(None))
    }
    val api1 = new AdminApi(spark, store2, exec, sessionDir = Some(sdir))
    val p1 = api1.start()
    val (lc, cookie) = req(p1, "POST", "/api/login",
      """{"username":"admin","password":"admin123"}""", None)
    assert(lc == 200 && cookie.isDefined)
    assert(req(p1, "GET", "/api/tasks", "", cookie)._1 == 200)
    api1.stop()
    // a NEW server over the same session dir honors the old cookie
    val api2 = new AdminApi(spark, store2, exec, sessionDir = Some(sdir))
    val p2 = api2.start()
    assert(req(p2, "GET", "/api/tasks", "", cookie)._1 == 200,
      "session did not survive the restart")
    // a traversal cookie on the OPEN logout route must not delete files
    // outside the session dir (raw client input reaches dropSession)
    val victim = new java.io.File(sdir).getParentFile
    val marker = new java.io.File(victim, "victim-file")
    java.nio.file.Files.write(marker.toPath, "x".getBytes)
    assert(req(p2, "POST", "/api/logout", "",
      Some("session=../victim-file"))._1 == 200)
    assert(marker.exists(), "path traversal deleted a file outside sessionDir")
    marker.delete()
    // logout deletes the file: a third restart rejects the cookie
    assert(req(p2, "POST", "/api/logout", "", cookie)._1 == 200)
    api2.stop()
    val api3 = new AdminApi(spark, store2, exec, sessionDir = Some(sdir))
    val p3 = api3.start()
    assert(req(p3, "GET", "/api/tasks", "", cookie)._1 == 401,
      "logged-out session resurrected after restart")
    // expired session files (older than the 31-day TTL) are culled at load
    val stale = new java.io.File(sdir, "staleSid123")
    java.nio.file.Files.write(stale.toPath, "1".getBytes)
    stale.setLastModified(System.currentTimeMillis() - 32L * 24 * 3600 * 1000)
    api3.stop()
    val api4 = new AdminApi(spark, store2, exec, sessionDir = Some(sdir))
    val p4 = api4.start()
    assert(!stale.exists(), "expired session file survived load")
    assert(req(p4, "GET", "/api/tasks", "", Some("session=staleSid123"))._1 == 401)
    api4.stop()
    // hardened deployments disable the unauthenticated debug surface
    val api5 = new AdminApi(spark, store2, exec, debugEndpoints = false)
    val p5 = api5.start()
    assert(req(p5, "GET", "/api/sql-alerts-debug", "", None)._1 != 200)
    assert(req(p5, "POST", "/api/debug/add-token", "{}", None)._1 != 200)
    api5.stop()
  }

  test("session TTL: enforced per-request mid-uptime, refreshed by use") {
    // load-time culling alone keeps a leaked sid valid for the whole
    // uptime of a long-running server; the TTL must fire on LOOKUP too,
    // and active use must refresh it (Flask refreshes permanent sessions
    // per request)
    val sdir = tmpDir("admin-sess-ttl")
    val store3 = new CatalogStore(spark, tmpDir("admin-cat-ttl"))
    val exec: Task => Either[String, String] = _ => Right("ok")
    var now = java.time.LocalDateTime.of(2026, 1, 1, 12, 0)
    val api = new AdminApi(spark, store3, exec, clock = () => now,
      sessionDir = Some(sdir))
    val p = api.start()
    def req(method: String, path: String, cookie: Option[String]) = {
      val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$p$path"))
      cookie.foreach(c => b.header("Cookie", c))
      val r = client.send(
        (if (method == "GET") b.GET()
         else b.method(method, HttpRequest.BodyPublishers.ofString("{}"))).build(),
        HttpResponse.BodyHandlers.ofString())
      (r.statusCode(),
       r.headers().firstValue("Set-Cookie")
        .map[Option[String]](v => Some(v.split(';').head)).orElse(None))
    }
    val (lc, cookie) = {
      val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$p/api/login"))
        .method("POST", HttpRequest.BodyPublishers.ofString(
          """{"username":"admin","password":"admin123"}"""))
      val r = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), r.headers().firstValue("Set-Cookie")
        .map[Option[String]](v => Some(v.split(';').head)).orElse(None))
    }
    assert(lc == 200 && cookie.isDefined)
    // 20 days of silence: inside the 31-day TTL, and the use REFRESHES it
    now = now.plusDays(20)
    assert(req("GET", "/api/tasks", cookie)._1 == 200)
    // 20 more days (40 since login, 20 since last use): still valid —
    // an active user is never logged out
    now = now.plusDays(20)
    assert(req("GET", "/api/tasks", cookie)._1 == 200)
    // 32 days of silence: expires MID-UPTIME, no restart involved, and
    // the session file goes with it (a later restart can't resurrect it)
    now = now.plusDays(32)
    assert(req("GET", "/api/tasks", cookie)._1 == 401,
      "idle session outlived its TTL on a running server")
    val sid = cookie.get.stripPrefix("session=")
    assert(!new java.io.File(sdir, sid).exists(),
      "expired session file survived per-request culling")
    api.stop()
  }

  test("debug surface: sql-alerts-debug (no auth, inner-join) and add-token") {
    // GET /api/sql-alerts-debug answers WITHOUT a session cookie
    // (web_scheduler.py:2752-2754) while the authed route 401s
    assert(rawCall("GET", "/api/sql-alerts", "", None)._1 == 401)
    val (dc0, db0, _) = rawCall("GET", "/api/sql-alerts-debug", "", None)
    assert(dc0 == 200)
    val before = asMap(db0)("alerts").asInstanceOf[Vector[Any]].map(asMap)
    // seed an email config + script + alert through the authed surface
    assert(call("POST", "/api/email-configs",
      """{"config_name":"dbg-mail","mail_server":"smtp.x","mail_port":25,
         "mail_username":"u","mail_password":"p","mail_default_sender":"u@x"}"""
    )._1 == 200)
    val (_, sb) = call("POST", "/api/sql-scripts",
      """{"name":"dbg-script","sql_content":"SELECT 1","db_config_id":1}""")
    val sid = asMap(sb)("id").asInstanceOf[Long]
    val (ac, ab) = call("POST", "/api/sql-alerts",
      s"""{"name":"dbg-alert","sql_script_id":$sid,"recipients":"a@b.c"}""")
    assert(ac == 201)
    val aid = asMap(ab)("id").asInstanceOf[Long]
    val (dc, dbod, _) = rawCall("GET", "/api/sql-alerts-debug", "", None)
    assert(dc == 200)
    val rows = asMap(dbod)("alerts").asInstanceOf[Vector[Any]].map(asMap)
    val mine = rows.find(_("id") == aid).get
    // reference adds the frontend-alias fields (web_scheduler.py:2771-2780)
    assert(mine("script_name") == "dbg-script" && mine("emails") == "a@b.c" &&
      mine("enabled") == true && mine("condition") == "not_empty" &&
      mine("threshold") == 1L && mine("email_config_name") != null)
    assert(rows.size == before.size + 1)
    // POST /api/debug/add-token without auth: defaults from :4496-4500
    val (tc, tb, _) = rawCall("POST", "/api/debug/add-token", "{}", None)
    assert(tc == 200)
    val tok = asMap(tb)("token").asInstanceOf[String]
    assert(asMap(tb)("message") == "Token添加成功" && tok.nonEmpty)
    val store = env._3
    val row = store.read[graft.catalog.Model.UserToken]("user_tokens")
      .collect().find(_.token == tok).get
    assert(row.userId == 1L && row.name.contains("Debug Token"))
    // INSERT OR REPLACE on the token UNIQUE constraint (:4511): re-POSTing
    // the same token swaps the row in place instead of duplicating it
    val (tc2, _, _) = rawCall("POST", "/api/debug/add-token",
      s"""{"token":"$tok","user_id":2,"name":"Renamed","days":5}""", None)
    assert(tc2 == 200)
    val again = store.read[graft.catalog.Model.UserToken]("user_tokens")
      .collect().filter(_.token == tok)
    assert(again.length == 1 && again.head.userId == 2L &&
      again.head.name.contains("Renamed"))
  }

  test("run-now and manual alert check share the scheduler/orchestrator in-flight guards (409 while running)") {
    val store2 = new CatalogStore(spark, tmpDir("admin-inflight"))
    val exec: Task => Either[String, String] = _ => Right("ok")
    val taskGuard = new graft.sched.InFlightGuard
    val alertGuard = new graft.sched.InFlightGuard
    def req(port: Int, method: String, path: String, body: String,
            cookie: Option[String]) = {
      val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      cookie.foreach(c => b.header("Cookie", c))
      val r = client.send(
        (if (method == "GET") b.GET()
         else b.method(method, HttpRequest.BodyPublishers.ofString(body))).build(),
        HttpResponse.BodyHandlers.ofString())
      (r.statusCode(),
       r.headers().firstValue("Set-Cookie")
        .map[Option[String]](v => Some(v.split(';').head)).orElse(None))
    }
    import spark.implicits._
    store2.overwrite(spark.createDataset(Seq(Task(
      1L, "guarded", "python", Some("scripts/x.py"), None, 600L, None, None,
      isActive = true, None, 0, 60, None,
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))), "tasks")
    val api = new AdminApi(spark, store2, exec,
      Some(new graft.alerts.AlertService(spark, store2, notifier,
        tmpDir("admin-inflight-exp"))),
      taskInFlight = taskGuard, alertInFlight = alertGuard)
    val port = api.start()
    try {
      val (lc, cookie) = req(port, "POST", "/api/login",
        """{"username":"admin","password":"admin123"}""", None)
      assert(lc == 200)
      // the SCHEDULED loop holds the task in flight (same guard instance
      // Main wires from Scheduler.inFlight) — a manual run must not race
      // it into a double execution
      assert(taskGuard.tryAcquire(1L))
      assert(req(port, "POST", "/api/tasks/1/run", "", cookie)._1 == 409)
      taskGuard.release(1L)
      assert(req(port, "POST", "/api/tasks/1/run", "", cookie)._1 == 200)
      // same contract for the manual alert check vs the orchestrator
      store2.overwrite(spark.createDataset(Seq(SqlAlert(
        5L, "watch", 1L, None, "ops@x.com", "not_empty", 0,
        isEnabled = true, None, None, None))), "sql_alerts")
      assert(alertGuard.tryAcquire(5L))
      assert(req(port, "POST", "/api/sql-alerts/5/check", "", cookie)._1 == 409)
      alertGuard.release(5L)
    } finally api.stop()
  }

  test("write-lock exemption matches the three execution routes EXACTLY") {
    // the r14 shape keyed on bare segment names (run/check/test anywhere
    // in the path), so a future mutating route reusing a generic name —
    // e.g. a `.../test` CRUD sub-resource — would silently skip the
    // write lock and regress max(id)+1 log-allocation serialization
    def slow(m: String, path: String) =
      AdminApi.isSlowExecutionRoute(m,
        path.split('/').toSeq.filter(_.nonEmpty))
    assert(slow("POST", "/api/tasks/7/run"))
    assert(slow("POST", "/api/sql-alerts/7/check"))
    assert(slow("POST", "/api/email-configs/7/test"))
    // generic-name lookalikes stay LOCKED
    assert(!slow("POST", "/api/tasks/7/test"))
    assert(!slow("POST", "/api/email-configs/7/run"))
    assert(!slow("POST", "/api/tests/7/update"))
    assert(!slow("POST", "/api/run"))
    assert(!slow("PUT", "/api/tasks/7/run"))
    assert(!slow("POST", "/api/tasks/7/run/extra"))
  }
}
