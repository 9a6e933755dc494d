package graft.core

import java.io.{BufferedReader, InputStreamReader}
import java.nio.file.Paths

import graft.SparkSuite

/** TWO-PROCESS contracts of the on-disk lock layer, pinned with a real
  * forked JVM (graft.devtools.LockProbe — plain NIO, no Spark, so forks
  * are sub-second):
  *  - warehouse ensure/build locks SERIALIZE across processes (the loser
  *    blocks until the winner releases, then proceeds — its ensure body's
  *    fingerprint re-check makes that a re-attach, not a rebuild);
  *  - catalog-root ownership FAILS LOUD in the second process and is
  *    released by the OS when the owner exits.
  */
class CrossProcessLockSpec extends SparkSuite {

  /** Fork a plain JVM running LockProbe with the test classpath
    * (Test/fork := true, so java.class.path is the real one). */
  private def fork(args: String*): (Process, BufferedReader) = {
    val java = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val cmd = Seq(java, "-cp", System.getProperty("java.class.path"),
      "graft.devtools.LockProbe") ++ args
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    (p, new BufferedReader(new InputStreamReader(p.getInputStream)))
  }

  private def awaitLine(r: BufferedReader, want: String): String = {
    var line = r.readLine()
    while (line != null && !line.contains(want)) line = r.readLine()
    assert(line != null, s"child exited before printing $want")
    line
  }

  test("warehouse build lock serializes two PROCESSES; waiter proceeds on release") {
    val lock = Paths.get(tmpDir("xproc-lock"), "_graft_locks", "t.lock")
    val holdMs = 2500L
    val (child, out) = fork("hold", lock.toString, holdMs.toString)
    try {
      // child prints "HELD <releaseDeadlineEpochMs>" AFTER taking the OS
      // lock and holds it at least until that deadline — so asserting we
      // acquired at/after the deadline proves serialization by ORDERING
      // (same machine clock), with no sensitivity to fork/JVM startup or
      // pipe-buffering jitter that an elapsed-time window has
      val deadline = awaitLine(out, "HELD").trim.split("\\s+").last.toLong
      var acquiredAt = 0L
      Locks.withFileLock(lock) { acquiredAt = System.currentTimeMillis() }
      assert(acquiredAt > 0)
      // 100 ms slop: both sides read the same machine clock, but
      // System.currentTimeMillis is not monotonic — an NTP step between
      // the child's deadline stamp and our acquisition could otherwise
      // flake an ordering that the OS lock did in fact enforce
      assert(acquiredAt >= deadline - 100L,
        s"second process acquired at $acquiredAt, ${deadline - acquiredAt} " +
        "ms before the holder's release deadline — no cross-process " +
        "serialization")
      awaitLine(out, "RELEASED")
    } finally { child.destroyForcibly(); child.waitFor() }
  }

  test("catalog root ownership: second process fails loud; OS releases on owner exit") {
    val root = tmpDir("xproc-cat")
    val lockFile = Paths.get(root, "_graft_owner.lock")
    val (child, out) = fork("own", lockFile.toString, "15000")
    try {
      awaitLine(out, "OWNED")
      // the raw claim reports contention…
      assert(!Locks.tryOwnProcessWide(lockFile))
      // …and CatalogStore surfaces it as a loud construction failure
      val e = intercept[IllegalStateException](
        new graft.catalog.CatalogStore(spark, root))
      assert(e.getMessage.contains("owned by another running graft process"))
      child.destroyForcibly(); child.waitFor() // owner dies → OS releases
      // a dead owner never wedges the root: construction now succeeds,
      // and a second store over the same root IN-PROCESS is idempotent
      val s1 = new graft.catalog.CatalogStore(spark, root)
      val s2 = new graft.catalog.CatalogStore(spark, root)
      assert(s1 != null && s2 != null)
    } finally { child.destroyForcibly(); child.waitFor() }
  }

  test("ownership claims key by REAL path: a symlinked root is the same claim") {
    val real = Paths.get(tmpDir("xproc-sym"), "store")
    java.nio.file.Files.createDirectories(real)
    val link = real.getParent.resolve("store-link")
    java.nio.file.Files.createSymbolicLink(link, real)
    assert(Locks.tryOwnProcessWide(real.resolve("_graft_owner.lock")))
    // same physical lock file via the symlink: must be the idempotent
    // same-process no-op, not a phantom "owned by another process"
    assert(Locks.tryOwnProcessWide(link.resolve("_graft_owner.lock")))
  }

  test("withFileLock is reentrant for the same thread (nested ensure* on one table)") {
    val lock = Paths.get(tmpDir("xproc-reent"), "_graft_locks", "t.lock")
    var reached = false
    Locks.withFileLock(lock) {
      // the old behavior: OverlappingFileLockException from the nested
      // same-JVM acquisition; now the outer frame's OS lock covers it
      Locks.withFileLock(lock) { reached = true }
      // still holding after inner exit: a THIRD nesting works too
      Locks.withFileLock(lock) { assert(reached) }
    }
    assert(reached)
    // fully released on outer exit: a fresh acquisition succeeds
    Locks.withFileLock(lock) { reached = false }
    assert(!reached)
  }

  test("tryOwnProcessWide serializes with a live scoped section instead of racing it") {
    // the r14 TOCTOU: a claim that checked activeScoped just before the
    // scoped holder registered could open+close a second channel on the
    // held file — on POSIX that close silently releases the holder's OS
    // lock. Both primitives now serialize on the same per-key monitor, so
    // a concurrent claim WAITS for the scoped section to end (then claims
    // cleanly) and a SAME-THREAD claim inside the section fails loud.
    val lock = Paths.get(tmpDir("xproc-toctou"), "_graft_locks", "t.lock")
    val inSection = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    @volatile var claimedAt = 0L
    @volatile var sectionEndAt = 0L
    val holder = new Thread(() => Locks.withFileLock(lock) {
      inSection.countDown()
      release.await(10, java.util.concurrent.TimeUnit.SECONDS)
      sectionEndAt = System.nanoTime()
    })
    holder.start()
    assert(inSection.await(10, java.util.concurrent.TimeUnit.SECONDS))
    val claimer = new Thread(() => {
      val ok = Locks.tryOwnProcessWide(lock)
      claimedAt = if (ok) System.nanoTime() else -1L
    })
    claimer.start()
    Thread.sleep(300) // give the claimer time to (wrongly) slip through
    assert(claimedAt == 0L,
      "claim completed while the scoped section still held the file")
    release.countDown()
    claimer.join(10000); holder.join(10000)
    assert(claimedAt > 0L, "claim should succeed once the section ended")
    assert(claimedAt >= sectionEndAt,
      "claim resolved before the scoped section exited")
    // same-THREAD composition on one file is a caller bug: still loud
    val lock2 = Paths.get(tmpDir("xproc-toctou2"), "_graft_locks", "t.lock")
    Locks.withFileLock(lock2) {
      intercept[IllegalStateException](Locks.tryOwnProcessWide(lock2))
    }
  }
}
