package graft.core

import java.nio.channels.{FileChannel, OverlappingFileLockException}
import java.nio.file.{Files, Path, StandardOpenOption}

/** OS-level (cross-PROCESS) lock primitives for the on-disk artifacts two
  * JVMs could otherwise race on: warehouse ingest builds (Warehouse) and
  * catalog roots (CatalogStore). `java.nio` file locks are held per
  * PROCESS and released by the OS on process death, so a crashed owner
  * never wedges the resource.
  *
  * JVM-internal discipline is handled HERE: file locks are per-process,
  * so a second acquisition attempt from the SAME JVM would throw
  * OverlappingFileLockException instead of blocking — [[withFileLock]]
  * therefore serializes same-key threads on an internal per-key monitor
  * ([[keyMonitors]]), and [[tryOwnProcessWide]] is a process-wide
  * idempotent claim. SAME-THREAD nesting of [[withFileLock]] on one lock
  * file is reentrant (the outer frame's OS lock covers the inner body),
  * so a nested same-table ensure* is safe.
  */
object Locks {

  /** Ensure `lockFile` exists and return its canonical claim key: the
    * REAL (symlink-resolved) path, so the same physical lock reached via
    * a symlinked root keys identically instead of tripping
    * OverlappingFileLockException / a phantom "owned by another
    * process". Creating the file FIRST (atomically, exists is fine)
    * means toRealPath always resolves; it also means the key is known
    * BEFORE any channel is opened — important because on POSIX, closing
    * ANY extra channel on a file can release the process's existing
    * locks on it (the documented FileLock caveat), so the
    * already-held/already-owned fast paths below must never open one. */
  private def ensureAndKey(lockFile: Path): String = {
    if (lockFile.getParent != null) Files.createDirectories(lockFile.getParent)
    try Files.createFile(lockFile)
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
    lockFile.toAbsolutePath.toRealPath().toString
  }

  /** Lock-file keys held by the CURRENT THREAD via [[withFileLock]] —
    * makes same-thread nesting on one lock file reentrant. File locks
    * are per-process, so without this a nested acquisition from the
    * same JVM throws OverlappingFileLockException instead of blocking.
    * Thread-local suffices because [[withFileLock]] serializes same-key
    * entry on its own per-key monitor ([[keyMonitors]]), so two THREADS
    * never hold one key concurrently. */
  private val heldByThread = new ThreadLocal[java.util.HashSet[String]] {
    override def initialValue(): java.util.HashSet[String] =
      new java.util.HashSet[String]()
  }

  /** Per-key in-JVM monitors for [[withFileLock]]: cross-THREAD same-file
    * acquisition serializes HERE, inside Locks, before any channel is
    * opened. Without this, a second thread's ch.lock() would throw
    * OverlappingFileLockException and its finally ch.close() would close
    * an EXTRA channel on a file the first thread holds locked — which on
    * POSIX can silently release the first thread's OS lock (the FileLock
    * close-releases-locks caveat ensureAndKey documents). With the
    * monitor that path is unreachable by construction instead of by
    * caller discipline (Warehouse.withTableLock's own monitor remains a
    * harmless outer layer).
    *
    * Entries are never removed: one Object per distinct lock-file path
    * for the JVM's lifetime. Bounded by construction today — lock files
    * exist only per warehouse TABLE and per catalog ROOT, both small
    * finite sets. If a future caller keys locks by something unbounded
    * (per-tempdir, per-request), add eviction here first. Note also that
    * a thread blocked on the OS lock inside the monitor extends monitor
    * hold time — acceptable because same-key waiters would queue either
    * way; the monitor only changes WHERE they queue. */
  private val keyMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Blocking cross-process critical section on `lockFile`: waits until
    * no other PROCESS holds the lock, runs `f`, releases. Reentrant for
    * the SAME THREAD (the outer frame keeps holding the OS lock —
    * monitors are reentrant, so re-entry falls through to the
    * heldByThread fast path); cross-thread same-file callers serialize
    * on the per-key monitor. The lock file itself is never deleted
    * (deleting lock files is a classic TOCTOU — a waiter blocked on a
    * deleted inode serializes against nobody). */
  def withFileLock[A](lockFile: Path)(f: => A): A = {
    val key = ensureAndKey(lockFile)
    val held = heldByThread.get()
    if (held.contains(key)) f // reentry: the outer frame's OS lock covers us
    else keyMonitors.computeIfAbsent(key, _ => new Object).synchronized {
      // overlap guard: if THIS process already owns the file process-wide
      // ([[tryOwnProcessWide]]), opening a second channel here would throw
      // OverlappingFileLockException and — worse — its close() could drop
      // the standing claim (the POSIX close-releases-locks caveat). The
      // claim already excludes other processes and the monitor serializes
      // in-JVM threads, so the section is covered without a new channel.
      if (owned.containsKey(key)) f
      else {
        // register the claim BEFORE the channel opens: tryOwnProcessWide's
        // overlap guard reads activeScoped, and registering only after
        // ch.lock() returned left a window where a concurrent claim passed
        // the guard, hit OverlappingFileLockException, and closed a second
        // channel on a file whose scoped lock is held — the POSIX
        // close-releases-locks hazard the guard exists to prevent
        activeScoped.add(key)
        try {
          val ch = FileChannel.open(lockFile, StandardOpenOption.WRITE)
          try {
            val l = ch.lock() // blocks until the owning process releases/dies
            held.add(key)
            try f finally { held.remove(key); l.release() }
          } finally ch.close()
        } finally activeScoped.remove(key)
      }
    }
  }

  /** Keys currently inside a [[withFileLock]] scoped section (any thread)
    * — the mirror-image overlap guard for [[tryOwnProcessWide]]. */
  private val activeScoped =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Process-lifetime ownership claims, keyed by lock-file path. */
  private val owned =
    new java.util.concurrent.ConcurrentHashMap[String, FileChannel]()

  /** Claim `lockFile` for this PROCESS's remaining lifetime. Returns true
    * when this process holds the claim (idempotent — a second claim from
    * the same process is a cheap no-op, so multiple in-JVM owners of one
    * root compose; their writes already serialize on in-JVM monitors),
    * false when ANOTHER process holds it. The OS releases the claim at
    * process exit — including crashes — so ownership can never leak past
    * the owner's death. */
  def tryOwnProcessWide(lockFile: Path): Boolean = {
    val key = ensureAndKey(lockFile)
    // idempotent re-claim resolves BEFORE any channel is opened — a
    // second open+close on an owned file could release the held OS lock
    // on POSIX (see ensureAndKey)
    if (owned.containsKey(key)) return true
    // serialize with [[withFileLock]] on the SAME per-key monitor: the
    // scoped section holds it for its whole duration, so the overlap
    // guard below and this claim's channel open/close can never
    // interleave with a scoped acquisition mid-flight (the TOCTOU where
    // a claim passed the guard just before activeScoped was populated,
    // then closed a second channel on the scoped holder's file).
    // Re-entry from a thread INSIDE a scoped section still reaches the
    // guard (monitors are reentrant) and fails loud as intended.
    // NO lock wider than the per-key monitor is taken: a global monitor
    // here nested Locks.this -> keyMonitor(key) against withFileLock's
    // keyMonitor(key)-for-the-section hold, an ABBA shape (and a single
    // global wait point) the per-key serialization never needed.
    keyMonitors.computeIfAbsent(key, _ => new Object).synchronized {
      // re-check under the monitor: a concurrent claim of the SAME key may
      // have won while this thread waited for the monitor — proceeding
      // would open+close a second channel on an owned file (POSIX releases
      // the held lock on close)
      if (owned.containsKey(key)) return true
      // overlap guard: claiming a file that is mid-[[withFileLock]] in this
      // process would open+close a second channel on it — on POSIX the
      // close can silently release the scoped holder's OS lock. The two
      // primitives use disjoint lock files by design; composing them on one
      // file is a caller bug that must fail loud, not corrupt locking.
      if (activeScoped.contains(key))
        throw new IllegalStateException(
          s"lock file '$lockFile' is in scoped withFileLock use in this " +
          "process; process-wide ownership claims must use a distinct file")
      val ch = FileChannel.open(lockFile, StandardOpenOption.WRITE)
      val l =
        try ch.tryLock()
        catch { case _: OverlappingFileLockException => null }
      if (l == null) { ch.close(); false }
      else { owned.put(key, ch); true }
    }
  }
}
