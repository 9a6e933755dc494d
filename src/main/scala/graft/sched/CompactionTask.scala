package graft.sched

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/** task_type='compact' — scheduled small-file compaction for the engine's
  * streaming append sinks (the 100 TB operational gap the r12 review
  * named: a foreachBatch sink writes one batchId-keyed partition per
  * micro-batch, so a continuously-running admission stream accrues
  * thousands of tiny parquet files whose open/seek cost eventually
  * dominates every downstream scan).
  *
  * The task row's `scriptPath` slot carries the spec
  * `"<sinkDir>:<targetMB>:<closed|all>"`:
  *
  *  - `<sinkDir>` — a batchId-keyed foreachBatch sink directory
  *    (`batch_id=N` subdirectories: q82 / q96 / q159's layout).
  *  - `<targetMB>` — target output file size; each partition is rewritten
  *    to ceil(bytes / targetMB) files (coalesce — a merge, no shuffle).
  *  - `closed` — compact every batch partition EXCEPT the highest id.
  *    Structured Streaming's at-least-once contract can only ever replay
  *    the latest uncommitted batch, so lower ids are immutable ("closed")
  *    and safe to rewrite while the stream lives; `all` additionally
  *    compacts the final partition, for sinks whose stream has quiesced.
  *
  * Idempotent by construction: a partition already at (or below) its
  * target file count is skipped, so re-running the task — retry after a
  * transient failure, an over-eager cadence — is a no-op. Each partition
  * swap is rename-based (write aside, rename away, rename in), so a crash
  * mid-task leaves every partition fully old, fully new, or — in the
  * window between the two renames — fully present in its hidden `.old`;
  * the next run RESTORES a `.old` whose live dir is missing before
  * reaping leftovers, so no crash point loses data. Hidden (dot-prefixed)
  * names are invisible to Spark's file index.
  *
  * READER visibility: the swap is NOT atomic for concurrent scans — local
  * directory swaps cannot be. Between the two renames the partition is
  * entirely absent, so a scan of a LIVE sink racing the swap can read one
  * closed partition short (or hit FileNotFound if it listed pre-swap). No
  * data is ever lost (crash recovery restores `.old`); the exposure is a
  * transiently incomplete read. Operationally: schedule compaction gated
  * on the writer's cadence (the task dependency already expresses "not
  * while the writer runs") and have consumers of a maintained sink read
  * off-peak or retry — the same contract object stores give rename-based
  * maintenance jobs.
  *
  * Directories carrying a `_spark_metadata` transaction log (the built-in
  * file sink: q48/q109/q114) are REFUSED loudly: their readers resolve
  * files through the log, and rewriting data files would orphan it. Their
  * compaction story is the file sink's own log-aware mechanism, not a
  * blind rewrite — an honest error beats silent corruption.
  *
  * As a scheduled task, retry / dependency / cadence semantics apply
  * unchanged: gate compaction on the admission task that writes the sink
  * (dependency), run it on a nightly cadence, and alert through
  * task_alerts on repeated failure — OrchestratorSpec runs the loop e2e.
  */
object CompactionTask {

  def run(spark: SparkSession, spec: String): Either[String, String] = {
    val parts = spec.split(":")
    if (parts.length < 3)
      return Left("compact task spec must be '<dir>:<targetMB>:<closed|all>', " +
        s"got '$spec'")
    val scope = parts.last
    val targetMbStr = parts(parts.length - 2)
    val dir = parts.dropRight(2).mkString(":")
    val targetMb = targetMbStr.toIntOption.getOrElse(-1)
    if (targetMb <= 0)
      return Left(s"compact: targetMB must be a positive integer, got '$targetMbStr'")
    if (scope != "closed" && scope != "all")
      return Left(s"compact: scope must be 'closed' or 'all', got '$scope'")
    try compact(spark, dir, targetMb.toLong * 1024 * 1024, scope)
    catch { case NonFatal(e) => Left(s"compact failed for $dir: ${e.getMessage}") }
  }

  private def compact(spark: SparkSession, dir: String, targetBytes: Long,
                      scope: String): Either[String, String] = {
    val root = Paths.get(dir)
    if (!Files.isDirectory(root))
      return Left(s"compact: no such sink directory: $dir")
    if (Files.exists(root.resolve("_spark_metadata")))
      return Left(s"compact: $dir is a file-sink with a _spark_metadata " +
        "transaction log; rewriting its files would orphan the log " +
        "(use a batchId-keyed foreachBatch sink for compactable streams)")
    // recover leftovers from a crashed previous run before re-listing.
    // A crash between the two renames leaves the partition ONLY in its
    // hidden `.old` (the rename away happened, the rename in did not) —
    // restore it FIRST; blindly deleting both leftovers there would lose
    // the partition. With the live dir present, `.old` is a fully-swapped
    // duplicate and `.tmp` is at best a complete copy — both reaped.
    listDir(root)
      .filter(_.getFileName.toString.matches("\\.batch_id=.*\\.old"))
      .foreach { oldDir =>
        val live = root.resolve(
          oldDir.getFileName.toString.stripPrefix(".").stripSuffix(".old"))
        if (!Files.exists(live)) Files.move(oldDir, live)
        else deleteRecursively(oldDir)
      }
    listDir(root)
      .filter(_.getFileName.toString.matches("\\.batch_id=.*\\.tmp"))
      .foreach(deleteRecursively)
    val batches = listDir(root)
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("batch_id="))
      .sortBy(p => p.getFileName.toString.stripPrefix("batch_id=").toLong)
    if (batches.isEmpty)
      return Left(s"compact: $dir has no batch_id=N partitions " +
        "(only batchId-keyed foreachBatch sinks are compactable)")
    // the highest batch id is the only partition a stream restart can
    // replay (at-least-once re-delivers the last uncommitted batch);
    // everything below it is immutable
    val eligible = if (scope == "all") batches else batches.dropRight(1)
    var filesBefore = 0L; var filesAfter = 0L; var rewritten = 0
    eligible.foreach { d =>
      val files = dataFiles(d)
      val bytes = files.map(Files.size(_)).sum
      val targetFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
      filesBefore += files.size
      if (files.size <= targetFiles) {
        filesAfter += files.size // already compact — idempotent no-op
      } else {
        val name = d.getFileName.toString
        val tmp = root.resolve(s".$name.tmp")
        val old = root.resolve(s".$name.old")
        // coalesce = merge without shuffle; hidden tmp dir is invisible
        // to any concurrent reader of the sink root
        spark.read.parquet(d.toString).coalesce(targetFiles.toInt)
          .write.mode("overwrite").parquet(tmp.toString)
        Files.move(d, old)
        Files.move(tmp, d)
        deleteRecursively(old)
        filesAfter += dataFiles(d).size
        rewritten += 1
      }
    }
    Right(s"compacted $dir: partitions=${eligible.size} rewritten=$rewritten " +
      s"files=$filesBefore->$filesAfter scope=$scope")
  }

  /** Directory entries, with the underlying stream CLOSED before
    * returning — `Files.list` holds an open directory handle until
    * closed, and a scheduler running compaction on a cadence for months
    * must not leak one fd per listing. */
  private def listDir(d: Path): List[Path] = {
    val s = Files.list(d)
    try s.iterator().asScala.toList finally s.close()
  }

  /** Parquet data files of one partition dir (hidden/_SUCCESS excluded —
    * the same visibility rule Spark's file index applies). */
  private def dataFiles(d: Path): List[Path] =
    listDir(d).filter { p =>
      val n = p.getFileName.toString
      Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith(".")
    }

  private def deleteRecursively(p: Path): Unit =
    graft.core.Fs.deleteRecursively(p)
}
