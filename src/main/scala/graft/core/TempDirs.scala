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

  /** Root for SMALL, short-lived scratch (streaming stage/checkpoint/sink
    * dirs — per-call state that never outlives the query that made it):
    * `SPARK_GRAFT_SCRATCH_DIR` if set, else the fastest writable local
    * volume (`/dev/shm` when present — ephemeral stream scratch belongs on
    * memory/SSD-class storage exactly like shuffle spill under
    * `spark.local.dir`; a synchronous drive's checkpoint needs no
    * durability, its unit of recovery is the whole call), else
    * `java.io.tmpdir`. Bulk temp (probe corpora, export round-trips) stays
    * on [[tempDir]] — sized in GBs at the scale gates, it must not compete
    * with executor heap for RAM-backed tmpfs. Resolved once: a scratch
    * root that changes mid-JVM would split a query's stage and checkpoint
    * across volumes. */
  private lazy val scratchRoot: Path = {
    val candidates =
      sys.env.get("SPARK_GRAFT_SCRATCH_DIR").map(java.nio.file.Paths.get(_)).toSeq ++
      Seq(java.nio.file.Paths.get("/dev/shm"),
          java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")))
    candidates.find { d =>
      try Files.isDirectory(d) && Files.isWritable(d)
      catch { case _: Exception => false }
    }.getOrElse(java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")))
  }

  /** A fresh SCRATCH directory under [[scratchRoot]], swept at JVM exit —
    * for the streaming work dirs (staged chunks, checkpoint, file sink).
    * Same lifecycle as [[tempDir]]; only the volume differs. */
  def scratchDir(prefix: String): String = {
    val p = Files.createTempDirectory(scratchRoot, prefix)
    dirs.add(p)
    p.toString
  }
}
