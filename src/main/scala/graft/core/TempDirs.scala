package graft.core

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Process-scoped scratch directories for operators that stage files
  * (streaming work dirs, export round-trips, the release writer, the 10×
  * probe corpus). Every dir returned by [[tempDir]] is registered for a
  * best-effort recursive delete at JVM exit — without this, each
  * Verify/Bench invocation stranded another /tmp tree per staging query
  * and repeated rounds accumulated unbounded temp data. Deletion is
  * last (after Spark's own shutdown hooks have stopped streams and
  * committers) and swallows per-file failures: cleanup must never turn a
  * green run red. */
object TempDirs {

  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  // Hadoop's ShutdownHookManager at a priority BELOW its default (10),
  // which is where Spark registers stream/committer shutdown — a plain
  // Runtime hook runs UNORDERED w.r.t. Spark's, so the sweep could race a
  // still-stopping stream's final sink writes and delete files mid-commit.
  // Ordered registration makes "deletion is last" true by contract, not
  // by luck.
  org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
    new Runnable {
      override def run(): Unit = dirs.forEach { d =>
        try {
          if (Files.exists(d))
            Files.walk(d).sorted(Comparator.reverseOrder[Path]())
              .forEach(p => try Files.deleteIfExists(p)
                            catch { case _: Exception => () })
        } catch { case _: Exception => () }
      }
    }, 5)

  /** A fresh temp directory, swept at JVM exit. */
  def tempDir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }
}
