package graft.sched

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** task_type='admission' — the engine's north-star scheduled job, wired
  * into the reference's scheduler semantics (the reference schedules ETL
  * scripts, web_scheduler.py:1289-1582; this engine's equivalent recurring
  * job is the dedup/admission loop over the day's increment).
  *
  * The task row's `scriptPath` slot (the reference's free-form payload
  * column for non-SQL tasks) carries the spec `"<kind>:<corpusDir>"`:
  *
  *  - `embedding:<dir>` — one pass of
  *    [[graft.operators.Pipeline.streamEmbeddingAdmission]] (q159): the
  *    increment's micro-batches probe the STORED LSH bucket table
  *    (ingest artifact, ensured on first run) and every vector gets an
  *    admit/reject verdict at cosine ≥ 0.9.
  *  - `minhash:<dir>` — one pass of
  *    [[graft.operators.Pipeline.streamIncrementalDedup]] (q82): banded
  *    MinHash candidates against the stored signature table, refined by
  *    exact verification at Jaccard ≥ 0.9, emitting the increment's
  *    near-duplicate pairs.
  *
  * Either way the run is SYNCHRONOUS within the tick (ST8), its outcome
  * summary lands in task_logs via the normal scheduler path, and retry /
  * dependency / cadence policies apply unchanged — an admission task can
  * depend on the ingest task that refreshes the corpus artifacts, retry on
  * a transient failure without advancing next_run, and alert through
  * task_alerts like any reference task.
  */
object AdmissionTask {

  def run(spark: SparkSession, spec: String): Either[String, String] =
    spec.split(":", 2) match {
      case Array("embedding", dir) if dir.nonEmpty =>
        try {
          val out = graft.operators.Pipeline.streamEmbeddingAdmission(spark, dir)
            .agg(
              // coalesce: sum() over ZERO rows is NULL — an idle increment
              // (no new vectors today) must log admitted=0 success, not NPE
              // into the retry/alert path as a spurious failure
              coalesce(sum(when(col("admit"), 1L).otherwise(0L)), lit(0L))
                .as("admitted"),
              coalesce(sum(when(col("admit"), 0L).otherwise(1L)), lit(0L))
                .as("rejected"))
            .head()
          Right(s"embedding admission: admitted=${out.getLong(0)} " +
            s"rejected=${out.getLong(1)}")
        } catch { case NonFatal(e) =>
          Left(s"embedding admission failed: ${e.getMessage}")
        }
      case Array("minhash", dir) if dir.nonEmpty =>
        try {
          val pairs = graft.operators.Pipeline.streamIncrementalDedup(spark, dir)
          val out = pairs.agg(
            count(lit(1)).as("pairs"),
            countDistinct(col("inc_id")).as("rejected"))
            .head()
          Right(s"minhash admission: dup_pairs=${out.getLong(0)} " +
            s"rejected_docs=${out.getLong(1)}")
        } catch { case NonFatal(e) =>
          Left(s"minhash admission failed: ${e.getMessage}")
        }
      // SELF-GROWING admission: '<minhash-grow>:<corpusDir>:<incDir>' —
      // each tick dedups the increment files that arrived since the last
      // tick against the frozen corpus AND every previously-admitted
      // increment, then appends the survivors to the growable standing
      // tables (Pipeline.growingMinhashAdmission)
      case Array(kind @ ("minhash-grow" | "embedding-grow"), rest)
          if rest.nonEmpty =>
        rest.split(":", 2) match {
          case Array(corpusDir, incDir)
              if corpusDir.nonEmpty && incDir.nonEmpty =>
            try {
              val verdicts =
                if (kind == "minhash-grow")
                  graft.operators.Pipeline
                    .growingMinhashAdmission(spark, corpusDir, incDir)
                else
                  graft.operators.Pipeline
                    .growingEmbeddingAdmission(spark, corpusDir, incDir)
              val out = verdicts.agg(
                  coalesce(sum(when(col("admit"), 1L).otherwise(0L)), lit(0L))
                    .as("admitted"),
                  coalesce(sum(when(col("admit"), 0L).otherwise(1L)), lit(0L))
                    .as("rejected"))
                .head()
              Right(s"$kind admission: admitted=${out.getLong(0)} " +
                s"rejected=${out.getLong(1)}")
            } catch { case NonFatal(e) =>
              Left(s"$kind admission failed: ${e.getMessage}")
            }
          case _ =>
            Left(s"$kind admission spec must be " +
              s"'$kind:<corpusDir>:<incDir>', got '$spec'")
        }
      case _ =>
        Left("admission task spec must be '<embedding|minhash>:<dir>' or " +
          s"'<minhash-grow|embedding-grow>:<corpusDir>:<incDir>', got '$spec'")
    }
}
