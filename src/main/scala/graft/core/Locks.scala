package graft.core

import java.nio.channels.{FileChannel, OverlappingFileLockException}
import java.nio.file.{Files, Path, StandardOpenOption}

/** OS-level (cross-PROCESS) lock primitives for the on-disk artifacts two
  * JVMs could otherwise race on: warehouse ingest builds (Warehouse) and
  * catalog roots (CatalogStore). `java.nio` file locks are held per
  * PROCESS and released by the OS on process death, so a crashed owner
  * never wedges the resource.
  *
  * JVM-internal discipline still matters: file locks are per-process, so
  * a second acquisition attempt from the SAME JVM throws
  * OverlappingFileLockException instead of blocking. Callers therefore
  * pair these with an in-JVM monitor ([[Warehouse.withTableLock]]) or a
  * process-wide idempotent claim ([[tryOwnProcessWide]]).
  */
object Locks {

  /** Blocking cross-process critical section on `lockFile`: waits until
    * no other PROCESS holds the lock, runs `f`, releases. The lock file
    * itself is never deleted (deleting lock files is a classic TOCTOU —
    * a waiter blocked on a deleted inode serializes against nobody). */
  def withFileLock[A](lockFile: Path)(f: => A): A = {
    if (lockFile.getParent != null) Files.createDirectories(lockFile.getParent)
    val ch = FileChannel.open(lockFile, StandardOpenOption.CREATE,
      StandardOpenOption.WRITE)
    try {
      val l = ch.lock() // blocks until the owning process releases/dies
      try f finally l.release()
    } finally ch.close()
  }

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
    val key = lockFile.toAbsolutePath.normalize.toString
    if (owned.containsKey(key)) return true
    this.synchronized {
      if (owned.containsKey(key)) return true
      if (lockFile.getParent != null)
        Files.createDirectories(lockFile.getParent)
      val ch = FileChannel.open(lockFile, StandardOpenOption.CREATE,
        StandardOpenOption.WRITE)
      val l =
        try ch.tryLock()
        catch { case _: OverlappingFileLockException => null }
      if (l == null) { ch.close(); false }
      else { owned.put(key, ch); true }
    }
  }
}
