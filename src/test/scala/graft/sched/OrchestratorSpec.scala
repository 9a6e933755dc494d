package graft.sched

import java.sql.Timestamp
import java.time.LocalDateTime

import graft.SparkSuite
import graft.alerts.{AlertService, InMemoryNotifier}
import graft.catalog.CatalogStore
import graft.catalog.Model._

class OrchestratorSpec extends SparkSuite {

  private val t0 = LocalDateTime.of(2026, 3, 1, 8, 0)

  test("combined tick runs due tasks AND due alerts; alert cadence respected") {
    graft.core.Tables.events(spark, sfDir).createOrReplaceTempView("orch_events")
    val store = new CatalogStore(spark, tmpDir("orch"))
    import spark.implicits._
    store.overwrite(spark.createDataset(Seq(SqlScript(
      1L, "errors", None,
      "SELECT * FROM orch_events WHERE event_type = 'error'",
      Timestamp.valueOf(t0)))), "sql_scripts")
    store.overwrite(spark.createDataset(Seq(Task(
      1L, "refresh", "sql", None, Some(1L), 600L, None, None, isActive = true,
      None, 0, 0, None, Timestamp.valueOf(t0)))), "tasks")
    store.overwrite(spark.createDataset(Seq(SqlAlert(
      9L, "errors-watch", 1L, None, "ops@x.com", "not_empty", 0,
      isEnabled = true, None, None, None))), "sql_alerts")

    val notifier = new InMemoryNotifier
    var now = t0
    val clock = () => now
    val sched = new Scheduler(spark, store,
      Scheduler.defaultExecutor(spark, store), clock)
    val alerts = new AlertService(spark, store, notifier, tmpDir("orch_exp"), clock)
    val orch = new Orchestrator(spark, store, sched, alerts, clock)

    val (tasks1, alerts1) = orch.tick()
    assert(tasks1.map(_.action) == Seq("executed"))
    assert(alerts1 == Seq(orch.AlertTickResult(9L, "triggered")))
    assert(notifier.sent.nonEmpty)
    assert(store.read[SqlAlertLog]("sql_alert_logs").count() == 1)

    // 100 s later: task not due (600 s interval), alert not due (300 s default)
    now = t0.plusSeconds(100)
    val (tasks2, alerts2) = orch.tick()
    assert(tasks2.map(_.action) == Seq("not_due"))
    assert(alerts2 == Seq(orch.AlertTickResult(9L, "not_due")))

    // 301 s later: alert due again, task still waiting
    now = t0.plusSeconds(301)
    val (tasks3, alerts3) = orch.tick()
    assert(tasks3.map(_.action) == Seq("not_due"))
    assert(alerts3 == Seq(orch.AlertTickResult(9L, "triggered")))

    // Daemon-session storage hygiene: ticks ran SQL tasks (whose query
    // snapshots are tracked materializations) — after N ticks, storage is
    // back at baseline. The reference's daemon runs for days
    // (web_scheduler.py:5486-5488); accumulated blocks would OOM it.
    (1 to 5).foreach { i => now = now.plusSeconds(601); orch.tick() }
    assert(graft.core.Mat.liveCount == 0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"daemon leaked storage blocks: ${spark.sparkContext.getPersistentRDDs.keys}")
  }

  test("admission task type: one tick runs the embedding admission loop e2e, logs, gates") {
    val store = new CatalogStore(spark, tmpDir("adm"))
    import spark.implicits._
    // task 1: the embedding admission loop over the test corpus, due now;
    // task 2: gated on task 1 (dependency must block until 1 has a log);
    // task 3: a malformed spec — must fail loud into task_logs
    store.overwrite(spark.createDataset(Seq(
      Task(1L, "admit-embeddings", "admission",
        Some("embedding:" + sfDir), None, 600L, None, None, isActive = true,
        None, 0, 0, None, Timestamp.valueOf(t0)),
      Task(2L, "post-admit-report", "admission",
        Some("embedding:" + sfDir), None, 600L, None, None, isActive = true,
        Some("1"), 0, 0, None, Timestamp.valueOf(t0)),
      Task(3L, "bad-spec", "admission",
        Some("nonsense"), None, 600L, None, None, isActive = true,
        None, 0, 0, None, Timestamp.valueOf(t0)))), "tasks")
    store.overwrite(spark.createDataset(Seq.empty[SqlAlert]), "sql_alerts")
    var now = t0
    val sched = new Scheduler(spark, store,
      Scheduler.defaultExecutor(spark, store), () => now)
    val orch = new Orchestrator(spark, store, sched,
      new AlertService(spark, store, new InMemoryNotifier, tmpDir("adm_exp"),
        () => now), () => now)

    // tick 1: task 1 executes the real q159 loop (stored bucket table +
    // micro-batch probes); task 2 blocks — its dependency has never run
    // (ST4's never-run-blocks rule); task 3 fails loud
    val (r1, _) = orch.tick()
    assert(r1.find(_.taskId == 1L).map(_.action).contains("executed"))
    assert(r1.find(_.taskId == 1L).flatMap(_.status).contains("success"))
    assert(r1.find(_.taskId == 2L).map(_.action).contains("blocked_dependency"))
    assert(r1.find(_.taskId == 3L).map(_.action).contains("executed"))
    assert(r1.find(_.taskId == 3L).flatMap(_.status).contains("failed"))
    val logs1 = store.read[TaskLog]("task_logs").collect()
    val ok1 = logs1.find(l => l.taskId == 1L && l.status == "success")
    assert(ok1.isDefined, s"no success log for task 1: ${logs1.toSeq}")
    // the log message carries the real admission outcome: the q159 corpus
    // plants exact copies that MUST be rejected, and natural increment
    // rows that must be admitted — both counts nonzero
    val msg = ok1.get.message
    val m = "admitted=(\\d+) rejected=(\\d+)".r.findFirstMatchIn(msg)
    assert(m.isDefined, s"unexpected admission log message: $msg")
    assert(m.get.group(1).toLong > 0, s"no admissions: $msg")
    assert(m.get.group(2).toLong > 0, s"no rejections (planted dups missed): $msg")
    assert(logs1.exists(l => l.taskId == 3L && l.status == "failed" &&
      l.message.contains("admission task spec")))

    // tick 2: task 1 not due (600 s cadence); task 2's dependency now has
    // a success log, so IT runs the loop
    now = t0.plusSeconds(5)
    val (r2, _) = orch.tick()
    assert(r2.find(_.taskId == 1L).map(_.action).contains("not_due"))
    assert(r2.find(_.taskId == 2L).map(_.action).contains("executed"))
    assert(r2.find(_.taskId == 2L).flatMap(_.status).contains("success"))

    // daemon hygiene: the admission runs tracked materializations (probe
    // increments) — tick end must have released them
    assert(graft.core.Mat.liveCount == 0)
  }

  test("admission task: an EMPTY increment logs admitted=0 success, not a spurious failure") {
    import spark.implicits._
    val dir = tmpDir("admempty")
    // every vec_id lands in the CORPUS partition (vec_id%5 != 4, %25 != 0)
    // → the staged increment is empty: an idle day. Pre-fix this NPE'd in
    // the task's agg (sum over zero rows is NULL) and the idle day was
    // logged "failed", firing retry/alerts for nothing.
    Seq(1L, 6L, 11L, 16L)
      .map(i => (i, Array.tabulate(64)(j => ((i + j) % 7).toFloat), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val r = AdmissionTask.run(spark, "embedding:" + dir)
    assert(r == Right("embedding admission: admitted=0 rejected=0"), s"got $r")
    // the minhash arm over an idle documents increment behaves the same
    Seq((1L, "alpha beta gamma delta", "en", "web", 22L),
        (2L, "epsilon zeta eta theta", "en", "web", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r2 = AdmissionTask.run(spark, "minhash:" + dir)
    assert(r2 == Right("minhash admission: dup_pairs=0 rejected_docs=0"), s"got $r2")
  }

  test("compact task type: one tick compacts a streaming sink's closed partitions e2e") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sink = tmpDir("csink") + "/out"
    // a foreachBatch-shaped sink: 3 batch partitions × 8 tiny files each
    (0 to 2).foreach { b =>
      spark.range(b * 100, (b + 1) * 100).toDF("id").repartition(8)
        .write.parquet(s"$sink/batch_id=$b")
    }
    def files(b: Int) = new java.io.File(s"$sink/batch_id=$b")
      .listFiles().count(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    def values() = spark.read.parquet(sink).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val before = values()
    assert(before.size == 300 && (0 to 2).forall(files(_) == 8))

    val store = new CatalogStore(spark, tmpDir("cmp"))
    // task 1: compact closed partitions, due now; task 2: full compaction
    // gated on task 1 (dependency must block until 1 has a success log);
    // task 3: malformed spec — fails loud into task_logs
    store.overwrite(spark.createDataset(Seq(
      Task(1L, "compact-closed", "compact",
        Some(s"$sink:128:closed"), None, 600L, None, None, isActive = true,
        None, 0, 0, None, Timestamp.valueOf(t0)),
      Task(2L, "compact-final", "compact",
        Some(s"$sink:128:all"), None, 600L, None, None, isActive = true,
        Some("1"), 0, 0, None, Timestamp.valueOf(t0)),
      Task(3L, "bad-spec", "compact",
        Some("nonsense"), None, 600L, None, None, isActive = true,
        None, 0, 0, None, Timestamp.valueOf(t0)))), "tasks")
    store.overwrite(spark.createDataset(Seq.empty[SqlAlert]), "sql_alerts")
    var now = t0
    val sched = new Scheduler(spark, store,
      Scheduler.defaultExecutor(spark, store), () => now)
    val orch = new Orchestrator(spark, store, sched,
      new AlertService(spark, store, new InMemoryNotifier, tmpDir("cmp_exp"),
        () => now), () => now)

    // tick 1: closed partitions (0, 1) collapse to one file each; the
    // highest batch — the only one a stream restart could replay — is
    // untouched; rows and values survive byte-for-byte
    val (r1, _) = orch.tick()
    assert(r1.find(_.taskId == 1L).flatMap(_.status).contains("success"))
    assert(r1.find(_.taskId == 2L).map(_.action).contains("blocked_dependency"))
    assert(r1.find(_.taskId == 3L).flatMap(_.status).contains("failed"))
    assert(files(0) == 1 && files(1) == 1 && files(2) == 8,
      s"expected 1/1/8 files, got ${files(0)}/${files(1)}/${files(2)}")
    assert(values() == before, "compaction changed the sink's rows")
    val logs1 = store.read[TaskLog]("task_logs").collect()
    assert(logs1.exists(l => l.taskId == 1L && l.status == "success" &&
      l.message.contains("rewritten=2")), s"log: ${logs1.toSeq}")
    assert(logs1.exists(l => l.taskId == 3L && l.status == "failed" &&
      l.message.contains("compact task spec")))

    // tick 2: the gated full compaction runs — final partition compacts too
    now = t0.plusSeconds(5)
    val (r2, _) = orch.tick()
    assert(r2.find(_.taskId == 2L).flatMap(_.status).contains("success"))
    assert(files(2) == 1, s"scope=all left ${files(2)} files in the final partition")
    assert(values() == before)

    // idempotency: a retried run rewrites nothing
    val again = CompactionTask.run(spark, s"$sink:128:all")
    assert(again.exists(_.contains("rewritten=0")), s"not idempotent: $again")

    // a file-sink directory with a transaction log is refused loudly
    val fs = tmpDir("fsink")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(fs, "_spark_metadata"))
    val refused = CompactionTask.run(spark, s"$fs:128:all")
    assert(refused.isLeft && refused.swap.exists(_.contains("_spark_metadata")))

    // crash recovery: a run that died BETWEEN the two renames leaves the
    // partition only in its hidden `.old` (plus a complete `.tmp`) — the
    // next run must RESTORE it, not reap it (a blind leftover delete
    // would lose the partition)
    import java.nio.file.{Files => JF, Paths => JP}
    JF.move(JP.get(s"$sink/batch_id=0"), JP.get(s"$sink/.batch_id=0.old"))
    spark.range(0, 100).toDF("id").coalesce(1)
      .write.parquet(s"$sink/.batch_id=0.tmp") // the in-flight rewrite
    val recovered = CompactionTask.run(spark, s"$sink:128:all")
    assert(recovered.isRight, s"recovery run failed: $recovered")
    assert(JF.isDirectory(JP.get(s"$sink/batch_id=0")),
      "crashed partition not restored from its .old")
    assert(!JF.exists(JP.get(s"$sink/.batch_id=0.tmp")) &&
      !JF.exists(JP.get(s"$sink/.batch_id=0.old")), "leftovers not reaped")
    assert(values() == before, "crash recovery changed the sink's rows")

    // ...and with the live dir present, stale leftovers are reaped without
    // touching it
    spark.range(500, 510).toDF("id").coalesce(1)
      .write.parquet(s"$sink/.batch_id=1.old")
    val reaped = CompactionTask.run(spark, s"$sink:128:all")
    assert(reaped.isRight && !JF.exists(JP.get(s"$sink/.batch_id=1.old")))
    assert(values() == before)
  }

  test("index task type: one tick builds the corpus index e2e; warm no-op; gates admission") {
    import java.nio.file.{Files => JF, Paths => JP}
    // a COPY of the gate corpus gets its own corpusSuffix, so the first
    // run must BUILD every artifact (nothing shared with other specs) and
    // the warm/built split in the log is deterministic
    val corpus = tmpDir("idxcorpus")
    Seq("documents.parquet", "embeddings.parquet").foreach { f =>
      JF.copy(JP.get(sfDir, f), JP.get(corpus, f))
    }

    val store = new CatalogStore(spark, tmpDir("idx"))
    import spark.implicits._
    // task 1: the index build, due now; task 2: the admission loop GATED
    // on task 1 — the production DAG (an admission pass must never probe
    // artifacts that were never built); task 3: a missing corpus dir —
    // must fail loud into task_logs
    store.overwrite(spark.createDataset(Seq(
      Task(1L, "build-index", "index",
        Some(corpus), None, 600L, None, None, isActive = true,
        None, 0, 0, None, Timestamp.valueOf(t0)),
      Task(2L, "admit-embeddings", "admission",
        Some("embedding:" + corpus), None, 600L, None, None, isActive = true,
        Some("1"), 0, 0, None, Timestamp.valueOf(t0)),
      Task(3L, "bad-dir", "index",
        Some(corpus + "/nope"), None, 600L, None, None, isActive = true,
        None, 0, 0, None, Timestamp.valueOf(t0)))), "tasks")
    store.overwrite(spark.createDataset(Seq.empty[SqlAlert]), "sql_alerts")
    var now = t0
    val sched = new Scheduler(spark, store,
      Scheduler.defaultExecutor(spark, store), () => now)
    val orch = new Orchestrator(spark, store, sched,
      new AlertService(spark, store, new InMemoryNotifier, tmpDir("idx_exp"),
        () => now), () => now)

    // tick 1: the index task builds all 8 canonical artifacts; the gated
    // admission blocks (never-run dependency); the bad dir fails loud
    val (r1, _) = orch.tick()
    assert(r1.find(_.taskId == 1L).flatMap(_.status).contains("success"))
    assert(r1.find(_.taskId == 2L).map(_.action).contains("blocked_dependency"))
    assert(r1.find(_.taskId == 3L).flatMap(_.status).contains("failed"))
    val logs1 = store.read[TaskLog]("task_logs").collect()
    val ok1 = logs1.find(l => l.taskId == 1L && l.status == "success")
    assert(ok1.isDefined, s"no success log for the index task: ${logs1.toSeq}")
    assert(ok1.get.message.contains("built=9 warm=0"),
      s"first run must build everything: ${ok1.get.message}")
    assert(logs1.exists(l => l.taskId == 3L && l.status == "failed" &&
      l.message.contains("no such corpus directory")))

    // tick 2: the dependency now has a success log — the admission loop
    // runs against the artifacts the index task just built (its own
    // ensure calls re-attach WARM; a rebuild here would mean the index
    // task's fingerprints don't match the query paths')
    now = t0.plusSeconds(5)
    val (r2, _) = orch.tick()
    assert(r2.find(_.taskId == 2L).flatMap(_.status).contains("success"))
    val msg2 = store.read[TaskLog]("task_logs").collect()
      .find(l => l.taskId == 2L && l.status == "success").map(_.message)
    assert(msg2.exists(_.contains("admitted=")), s"admission log: $msg2")

    // idempotency: a re-run between corpus refreshes is a warm no-op —
    // and a genuinely ZERO-JOB one: the seed-model collect is a by-name
    // thunk evaluated only on rebuild, and stored codebook reads memoize,
    // so a cadence-scheduled index task costs nothing between refreshes
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobCounter = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(jobCounter)
    val again =
      try {
        val r = IndexTask.run(spark, corpus)
        Thread.sleep(1000) // listener bus is async — let events drain
        r
      } finally spark.sparkContext.removeSparkListener(jobCounter)
    assert(again.exists(_.contains("built=0 warm=9")),
      s"re-run must warm-attach everything: $again")
    assert(jobs.get() == 0, s"warm index tick ran ${jobs.get()} Spark jobs")

    // daemon hygiene: no leaked tracked materializations
    assert(graft.core.Mat.liveCount == 0)
  }

  test("self-growing admission task: tick 2 rejects a near-dup of a doc ADMITTED in tick 1") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def text(seed: String): String =
      (1 to 40).map(j => s"${seed}w$j").mkString(" ")
    val corpusDir = tmpDir("grow-corpus")
    val incDir = tmpDir("grow-inc") + "/files"
    Seq((1L, text("corp1"), "en", "web", 40L),
        (2L, text("corp2"), "en", "web", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$corpusDir/documents.parquet")

    val store = new CatalogStore(spark, tmpDir("grow-store"))
    store.overwrite(spark.createDataset(Seq(Task(
      1L, "grow-admit", "admission",
      Some(s"minhash-grow:$corpusDir:$incDir"), None, 600L, None, None,
      isActive = true, None, 0, 0, None, Timestamp.valueOf(t0)))), "tasks")
    store.overwrite(spark.createDataset(Seq.empty[SqlAlert]), "sql_alerts")
    var now = t0
    val sched = new Scheduler(spark, store,
      Scheduler.defaultExecutor(spark, store), () => now)
    val orch = new Orchestrator(spark, store, sched,
      new AlertService(spark, store, new InMemoryNotifier,
        tmpDir("grow-exp"), () => now), () => now)
    def lastMsg(): String = store.read[TaskLog]("task_logs").collect()
      .maxBy(_.id).message

    // tick 0: no increment has ever arrived — an idle day logs 0/0 success
    val (r0, _) = orch.tick()
    assert(r0.find(_.taskId == 1L).flatMap(_.status).contains("success"))
    assert(lastMsg().contains("admitted=0 rejected=0"), lastMsg())

    // tick 1: increment A — one fresh doc (100) and one exact copy of a
    // CORPUS doc (101, must reject against the frozen table)
    now = now.plusSeconds(601)
    Seq((100L, text("freshA")), (101L, text("corp1")))
      .toDF("doc_id", "text").write.mode("append").parquet(incDir)
    val (r1, _) = orch.tick()
    assert(r1.find(_.taskId == 1L).flatMap(_.status).contains("success"))
    assert(lastMsg().contains("admitted=1 rejected=1"), lastMsg())

    // tick 2: increment B — a copy of doc 100 (ADMITTED last tick: must
    // reject via the GROWABLE standing state, the inc-vs-inc loop the
    // frozen-corpus-only path structurally cannot catch) and a fresh doc
    now = now.plusSeconds(601)
    Seq((200L, text("freshA")), (201L, text("freshB")))
      .toDF("doc_id", "text").write.mode("append").parquet(incDir)
    val (r2, _) = orch.tick()
    assert(r2.find(_.taskId == 1L).flatMap(_.status).contains("success"))
    assert(lastMsg().contains("admitted=1 rejected=1"),
      s"tick 2 must reject the near-dup of tick 1's admission: ${lastMsg()}")

    // the standing state holds exactly the three admitted docs
    val sfx = graft.core.Warehouse.corpusSuffix(corpusDir)
    val admitted = spark.table(s"graft_adm_docs_$sfx")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(admitted == Seq(100L, 201L), s"admitted-docs table: $admitted")
    val grown = spark.table(s"graft_sig_grow_$sfx")
      .select("id").distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(grown == Seq(100L, 201L), s"growable signature ids: $grown")

    // tick 3: nothing new arrived — idle again, zero admissions, and the
    // previously-processed increments are NOT re-read (stream offsets)
    now = now.plusSeconds(601)
    val (r3, _) = orch.tick()
    assert(r3.find(_.taskId == 1L).flatMap(_.status).contains("success"))
    assert(lastMsg().contains("admitted=0 rejected=0"), lastMsg())

    graft.core.Warehouse.sweepCorpus(spark, corpusDir)
    graft.core.Fs.deleteRecursively(
      graft.core.Warehouse.warehousePath(spark).resolve("_graft_admit_" + sfx))
    assert(graft.core.Mat.liveCount == 0)
  }

  test("self-growing EMBEDDING admission: tick 2 rejects a dup of a vector ADMITTED in tick 1") {
    import spark.implicits._
    def vec(seed: Long): Array[Float] = {
      // seeded gaussian: distinct seeds give near-orthogonal vectors
      // (|cos| ~ 1/sqrt(64)), identical seeds exact copies — no
      // accidental >=0.9 cosine between different seeds
      val rnd = new scala.util.Random(seed)
      Array.fill(64)(rnd.nextGaussian().toFloat)
    }
    val corpusDir = tmpDir("egrow-corpus")
    val incDir = tmpDir("egrow-inc") + "/files"
    (0L until 20L).map(i => (i, vec(i), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$corpusDir/embeddings.parquet")

    val store = new CatalogStore(spark, tmpDir("egrow-store"))
    store.overwrite(spark.createDataset(Seq(Task(
      1L, "egrow-admit", "admission",
      Some(s"embedding-grow:$corpusDir:$incDir"), None, 600L, None, None,
      isActive = true, None, 0, 0, None, Timestamp.valueOf(t0)))), "tasks")
    store.overwrite(spark.createDataset(Seq.empty[SqlAlert]), "sql_alerts")
    var now = t0
    val sched = new Scheduler(spark, store,
      Scheduler.defaultExecutor(spark, store), () => now)
    val orch = new Orchestrator(spark, store, sched,
      new AlertService(spark, store, new InMemoryNotifier,
        tmpDir("egrow-exp"), () => now), () => now)
    def lastMsg(): String = store.read[TaskLog]("task_logs").collect()
      .maxBy(_.id).message

    // tick 1: vec 100 fresh (admit), vec 101 = exact copy of CORPUS vec 3
    // (reject against the frozen bucket table)
    Seq((100L, vec(777L)), (101L, vec(3L)))
      .toDF("vec_id", "embedding").write.mode("append").parquet(incDir)
    val (r1, _) = orch.tick()
    assert(r1.find(_.taskId == 1L).flatMap(_.status).contains("success"))
    assert(lastMsg().contains("admitted=1 rejected=1"), lastMsg())

    // tick 2: vec 200 = copy of ADMITTED vec 100 (must reject via the
    // GROWABLE bucket table), vec 201 fresh (admit)
    now = now.plusSeconds(601)
    Seq((200L, vec(777L)), (201L, vec(888L)))
      .toDF("vec_id", "embedding").write.mode("append").parquet(incDir)
    val (r2, _) = orch.tick()
    assert(r2.find(_.taskId == 1L).flatMap(_.status).contains("success"))
    assert(lastMsg().contains("admitted=1 rejected=1"),
      s"tick 2 must reject the dup of tick 1's admission: ${lastMsg()}")

    val sfx = graft.core.Warehouse.corpusSuffix(corpusDir)
    val grown = spark.table(s"graft_vecbkt_grow_$sfx")
      .select("id").distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(grown == Seq(100L, 201L), s"growable bucket ids: $grown")

    graft.core.Warehouse.sweepCorpus(spark, corpusDir)
    graft.core.Fs.deleteRecursively(graft.core.Warehouse.warehousePath(spark)
      .resolve("_graft_admit_emb_" + sfx))
    assert(graft.core.Mat.liveCount == 0)
  }

  test("grow fold: admit (task tick) → promote → serve RETURNS the admitted vector; replayed fold bit-identical; upsert serves new, never old") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def vec(seed: Long): Array[Float] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(64)(rnd.nextGaussian().toFloat)
    }
    // v = a·vec(base) + b·vec(noiseSeed): cos(v, vec(base)) ≈ a — below
    // the 0.9 admission bar, far above the corpus's ~1/sqrt(64) noise
    def blend(base: Long, noiseSeed: Long, a: Float, b: Float): Array[Float] = {
      val x = vec(base); val y = vec(noiseSeed)
      x.indices.map(i => a * x(i) + b * y(i)).toArray
    }
    val corpusDir = tmpDir("gfold-corpus")
    val incDir = tmpDir("gfold-inc") + "/files"
    (0L until 20L).map(i => (i, vec(i), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$corpusDir/embeddings.parquet")

    val store = new CatalogStore(spark, tmpDir("gfold-store"))
    store.overwrite(spark.createDataset(Seq(Task(
      1L, "gfold-admit", "admission",
      Some(s"embedding-grow:$corpusDir:$incDir"), None, 600L, None, None,
      isActive = true, None, 0, 0, None, Timestamp.valueOf(t0)))), "tasks")
    store.overwrite(spark.createDataset(Seq.empty[SqlAlert]), "sql_alerts")
    val now = t0
    val sched = new Scheduler(spark, store,
      Scheduler.defaultExecutor(spark, store), () => now)
    val orch = new Orchestrator(spark, store, sched,
      new AlertService(spark, store, new InMemoryNotifier,
        tmpDir("gfold-exp"), () => now), () => now)

    // the REAL admission loop admits vec 100 — correlated with corpus
    // vec 3 (cos ≈ 0.8: under the dup bar, far above the noise floor)
    Seq((100L, blend(3L, 777L, 0.8f, 0.6f)))
      .toDF("vec_id", "embedding").write.mode("append").parquet(incDir)
    val (r1, _) = orch.tick()
    assert(r1.find(_.taskId == 1L).flatMap(_.status).contains("success"))

    def serve() = graft.operators.Pipeline.grownServe(spark, corpusDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(x => (x._1, x._2)).toSeq
    val s1 = serve()
    // the admitted vector IS SERVED: top neighbor of its correlated query
    assert(s1.exists(x => x._1 == 3L && x._2 == 1 && x._3 == 100L),
      s"admitted vec 100 should be query 3's top-1 neighbor: " +
        s1.filter(_._1 == 3L).toString)
    // replayed fold (promote runs again inside serve): bit-identical
    val fp = graft.core.Warehouse.fingerprintOf(spark,
      "graft_int8_grown_" + graft.core.Warehouse.corpusSuffix(corpusDir))
    val s2 = serve()
    assert(s1 == s2, "replayed fold changed serving results")
    assert(graft.core.Warehouse.fingerprintOf(spark,
      "graft_int8_grown_" + graft.core.Warehouse.corpusSuffix(corpusDir)) == fp,
      "replayed fold rebuilt instead of warm-attaching")

    // UPSERT: vec 5 gets a NEW embedding correlated with vec 7. Before:
    // 5 is not 7's top-1; after: the SAME id serves its new vector and
    // the old one never surfaces
    assert(!s1.exists(x => x._1 == 7L && x._2 == 1 && x._3 == 5L))
    val newV5 = Seq((5L, blend(7L, 888L, 0.8f, 0.6f)))
      .toDF("vec_id", "embedding")
    val applied = graft.operators.Pipeline.upsertVectors(
      spark, corpusDir, newV5)
    assert(applied == 1L)
    val s3 = serve()
    assert(s3.exists(x => x._1 == 7L && x._2 == 1 && x._3 == 5L),
      s"upserted vec 5 should serve its NEW embedding (query 7's top-1): " +
        s3.filter(_._1 == 7L).toString)
    // replayed upsert (at-least-once): idempotent no-op
    assert(graft.operators.Pipeline.upsertVectors(spark, corpusDir, newV5) == 0L)
    assert(serve() == s3, "replayed upsert changed serving results")
    // a SECOND update of the same id with a DIFFERENT vector fails loud
    val conflicting = Seq((5L, vec(999L))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Pipeline.upsertVectors(spark, corpusDir, conflicting)
    }
    assert(e.getMessage.contains("DIFFERENT"), e.getMessage)

    // GROW-NAMESPACE VACUUM as a scheduled tick (r16 verdict ask #3): the
    // standing update compacts into the promoted overlay, after which a
    // SECOND update of the same id succeeds and serves the NEWEST vector
    store.overwrite(spark.createDataset(Seq(Task(
      2L, "gfold-growvac", "vacuum",
      Some(s"grow::$corpusDir"), None, 600L, None, None,
      isActive = true, None, 0, 0, None, Timestamp.valueOf(t0)))), "tasks")
    val (r2, _) = orch.tick()
    val vr = r2.find(_.taskId == 2L)
    assert(vr.flatMap(_.status).contains("success"), vr.toString)
    assert(store.read[TaskLog]("task_logs").collect()
      .exists(l => l.taskId == 2L && l.message.contains("grow-vacuum")),
      "grow-vacuum tick should log its fold summary")
    // between folds the id is unblocked: update 5 AGAIN, toward vec 9 now
    val thirdV5 = Seq((5L, blend(9L, 555L, 0.8f, 0.6f)))
      .toDF("vec_id", "embedding")
    assert(graft.operators.Pipeline.upsertVectors(
      spark, corpusDir, thirdV5) == 1L)
    val s5 = serve()
    assert(s5.exists(x => x._1 == 9L && x._2 == 1 && x._3 == 5L),
      s"re-upserted vec 5 should serve its NEWEST embedding (query 9's " +
        s"top-1): ${s5.filter(_._1 == 9L).toString}")
    assert(!s5.exists(x => x._1 == 7L && x._2 == 1 && x._3 == 5L),
      "the SUPERSEDED update (toward vec 7) must no longer rank first")
    // replayed second update: idempotent no-op; a replayed grow-vacuum
    // promotes nothing and the serve stays bit-identical
    assert(graft.operators.Pipeline.upsertVectors(
      spark, corpusDir, thirdV5) == 0L)
    assert(graft.operators.Pipeline.vacuumGrowNamespace(
      spark, corpusDir)._2 == 1L) // the standing third update compacts
    assert(graft.operators.Pipeline.vacuumGrowNamespace(
      spark, corpusDir) == ((0L, 0L)), "replayed grow-vacuum must be a no-op")
    assert(serve() == s5, "grow-vacuum changed serving results")

    // BETWEEN-FOLD DELETE (r16 verdict ask #4): a delete after the fold is
    // honored IMMEDIATELY by the grown path via the serve-time anti-join —
    // no rebuild — and the next grow-vacuum folds it into the artifacts
    // with a bit-identical probe (id 17 is outside the 16-seed range, so
    // the rebuilt codebook/centroids are unchanged)
    val int8Grown = "graft_int8_grown_" +
      graft.core.Warehouse.corpusSuffix(corpusDir)
    val fpPre = graft.core.Warehouse.fingerprintOf(spark, int8Grown)
    graft.operators.Pipeline.addTombstones(spark, corpusDir, "vec",
      Seq(17L).toDF("id"))
    val s6 = serve()
    assert(!s6.exists(x => x._1 == 17L || x._3 == 17L),
      "deleted id 17 must be excluded immediately — as query and neighbor")
    assert(graft.core.Warehouse.fingerprintOf(spark, int8Grown) == fpPre,
      "a between-fold delete must NOT rebuild the grown artifacts")
    graft.operators.Pipeline.vacuumGrowNamespace(spark, corpusDir)
    assert(graft.core.Warehouse.fingerprintOf(spark, int8Grown) != fpPre,
      "the grow-vacuum should fold the delete into rebuilt artifacts")
    assert(serve() == s6,
      "folding a non-seed delete must leave the probe bit-identical")

    graft.core.Warehouse.sweepCorpus(spark, corpusDir)
    graft.core.Fs.deleteRecursively(graft.core.Warehouse.warehousePath(spark)
      .resolve("_graft_admit_emb_" +
        graft.core.Warehouse.corpusSuffix(corpusDir)))
    graft.core.Mat.releaseAll(blocking = true)
  }

  test("vacuum task: delete → probe excludes → vacuum folds → probe invariant, list emptied") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = tmpDir("vac-corpus")
    // 60 vectors; the panel is vec_id < 50, seeds are the 16 lowest ids —
    // the deletions (20, 33) sit OUTSIDE the seed range so the rebuilt
    // index's centroids/codebook are unchanged and the probe must be
    // BIT-IDENTICAL before and after the fold
    (0L until 60L).map { i =>
      (i, Array.tabulate(64)(j => (((i * 17 + j * 5) % 11).toFloat - 5.0f)), 1)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    Seq((1L, (1 to 30).map(i => s"w$i").mkString(" "), "en", "web", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val sfx = graft.core.Warehouse.corpusSuffix(dir)

    def serve() = graft.operators.Pipeline.tombstoneAwareServe(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(r => (r._1, r._2)).toSeq
    val baseline = serve()
    assert(baseline.nonEmpty)
    assert(baseline.exists(r => r._3 == 20L || r._3 == 33L),
      "test premise: 20/33 must appear as neighbors before deletion")

    // DELETE two vectors: the probe must exclude them IMMEDIATELY (as
    // query and neighbor), refilling top-k from survivors
    val added = graft.operators.Pipeline.addTombstones(spark, dir, "vec",
      Seq(20L, 33L).toDF("id"))
    assert(added == 2L)
    // idempotent re-delete appends nothing
    assert(graft.operators.Pipeline.addTombstones(spark, dir, "vec",
      Seq(20L, 33L).toDF("id")) == 0L)
    val afterDelete = serve()
    assert(!afterDelete.exists(r => r._1 == 20L || r._3 == 20L ||
      r._1 == 33L || r._3 == 33L), "probe returned a tombstoned id")
    assert(afterDelete.map(_._1).distinct.size == 48, "panel must refill to 48")

    // VACUUM via a scheduled tick: below-threshold first (defers), then a
    // real fold (threshold 0 forces it)
    val store = new CatalogStore(spark, tmpDir("vac-store"))
    store.overwrite(spark.createDataset(Seq(
      Task(1L, "vac-defer", "vacuum", Some(s"$dir:0.9"), None, 600L, None,
        None, isActive = true, None, 0, 0, None, Timestamp.valueOf(t0)),
      Task(2L, "vac-run", "vacuum", Some(s"$dir:0.0"), None, 600L, None,
        None, isActive = true, Some("1"), 0, 0, None, Timestamp.valueOf(t0)),
      Task(3L, "vac-bad", "vacuum", Some(""), None, 600L, None, None,
        isActive = true, None, 0, 0, None, Timestamp.valueOf(t0)))), "tasks")
    store.overwrite(spark.createDataset(Seq.empty[SqlAlert]), "sql_alerts")
    var now = t0
    val sched = new Scheduler(spark, store,
      Scheduler.defaultExecutor(spark, store), () => now)
    val orch = new Orchestrator(spark, store, sched,
      new AlertService(spark, store, new InMemoryNotifier, tmpDir("vac-exp"),
        () => now), () => now)
    val (r1, _) = orch.tick()
    assert(r1.find(_.taskId == 1L).flatMap(_.status).contains("success"))
    assert(r1.find(_.taskId == 2L).map(_.action).contains("blocked_dependency"))
    assert(r1.find(_.taskId == 3L).flatMap(_.status).contains("failed"))
    val logs1 = store.read[TaskLog]("task_logs").collect()
    assert(logs1.exists(l => l.taskId == 1L && l.message.contains("deferred")),
      s"below-threshold must defer: ${logs1.map(_.message).toSeq}")
    // the deferral did NOT touch the artifacts or the list
    assert(spark.table(s"graft_tombstones_$sfx").count() == 2L)

    now = t0.plusSeconds(5)
    val (r2, _) = orch.tick()
    assert(r2.find(_.taskId == 2L).flatMap(_.status).contains("success"))
    val msg2 = store.read[TaskLog]("task_logs").collect()
      .filter(_.taskId == 2L).maxBy(_.id).message
    assert(msg2.contains("folded vec=2 doc=0"), msg2)
    // the fold REBUILT the artifacts without the deleted rows...
    spark.catalog.refreshTable(s"graft_int8_$sfx")
    val int8Ids = spark.table(s"graft_int8_$sfx").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(!int8Ids.contains(20L) && !int8Ids.contains(33L),
      "vacuum did not rebuild the int8 artifact without the tombstones")
    assert(spark.table(s"graft_pq_seed_$sfx").filter(col("id").isin(20L, 33L))
      .count() == 0, "vacuum left tombstoned codes in the PQ table")
    // ...emptied the ACTIVE list and retained the FOLDED log
    assert(spark.table(s"graft_tombstones_$sfx").count() == 0L)
    assert(spark.table(s"graft_tombstones_fold_$sfx").count() == 2L)
    // and the probe is BIT-IDENTICAL to the anti-join era: exclusion via
    // rebuilt artifacts ≡ exclusion via the live list
    assert(serve() == afterDelete,
      "vacuum changed probe results (fold must be invisible to serving)")

    graft.core.Warehouse.sweepCorpus(spark, dir)
    assert(graft.core.Mat.liveCount == 0)
  }

  test("runLoop: daemon ticks until stopped (ST1)") {
    val store = new CatalogStore(spark, tmpDir("loop"))
    import spark.implicits._
    store.overwrite(spark.createDataset(Seq.empty[Task]), "tasks")
    store.overwrite(spark.createDataset(Seq.empty[SqlAlert]), "sql_alerts")
    var ticks = 0
    val sched = new Scheduler(spark, store, _ => Right("ok"),
      clock = () => { ticks += 1; LocalDateTime.now() })
    val orch = new Orchestrator(spark, store, sched,
      new AlertService(spark, store, new InMemoryNotifier, tmpDir("loop_exp")))
    val t = new Thread(() => orch.runLoop(tickMillis = 50L))
    t.setDaemon(true); t.start()
    val deadline = System.currentTimeMillis() + 10000
    while (ticks < 3 && System.currentTimeMillis() < deadline) Thread.sleep(50)
    orch.stopped = true
    t.join(5000)
    assert(ticks >= 3, s"expected >=3 ticks, got $ticks")
    assert(!t.isAlive)
  }
}
