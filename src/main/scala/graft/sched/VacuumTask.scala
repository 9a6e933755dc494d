package graft.sched

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** task_type='vacuum' — DELETE maintenance for the stored vector/doc
  * indexes, completing the task DAG's lifecycle:
  *
  *   index (build) → admission (incremental add) → vacuum (deletions)
  *                                                → compact (sink files)
  *
  * Deletions accumulate in a per-corpus TOMBSTONE table
  * ([[graft.operators.Pipeline.addTombstones]]); every tombstone-aware
  * probe anti-joins it, so results are correct the moment a delete lands.
  * What the vacuum adds is COST control: once the active-tombstone
  * fraction passes the threshold, it folds the deletions into the stored
  * artifacts (rebuild minus tombstones via the ensure* contract — seeded
  * cells, seeded + labeled PQ codes, int8, LSH buckets, MinHash
  * signatures), records them in the permanent FOLDED table (what keeps a
  * lost artifact reconstructible), and empties the active list — the
  * serving anti-join's broadcast side returns to zero rows.
  *
  * The task row's `scriptPath` carries `"vacuum-spec <corpusDir>[:<threshold>]"`
  * — actually just `"<corpusDir>[:<threshold>]"`; threshold is the
  * active-tombstone fraction (of the larger of the two corpora) above
  * which the fold runs, default 0.01. Below threshold the tick logs a
  * skip (success — deferral is the job working as designed, not a
  * failure). Retry / dependency / cadence semantics apply unchanged.
  */
object VacuumTask {

  def run(spark: SparkSession, spec: String): Either[String, String] = {
    // grow-namespace vacuum (r17): spec "grow:<ns>:<corpusDir>" compacts a
    // grow namespace's mutable state — between-fold deletions fold into
    // the grown artifacts, the standing admitted state compacts into the
    // promoted overlay (unblocking a fresh UPDATE of every id), and the
    // rebuild runs in the tick (ingest work, never the next serve)
    if (spec.trim.startsWith("grow:")) {
      val gp = spec.trim.stripPrefix("grow:").split(":", 2)
      if (gp.length < 2 || gp(1).isEmpty)
        return Left("grow-vacuum task spec must be 'grow:<ns>:<corpusDir>', " +
          s"got '$spec'")
      val (ns, gdir) = (gp(0), gp(1))
      if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(gdir)))
        return Left(s"grow-vacuum task: no such corpus directory: $gdir")
      return try {
        val (nMoved, nPromoted) =
          graft.operators.Pipeline.vacuumGrowNamespace(spark, gdir, ns)
        Right(s"grow-vacuum[$ns]: folded $nMoved between-fold deletions, " +
          s"promoted $nPromoted standing updates into the overlay; " +
          "grown artifacts rebuilt")
      } catch { case NonFatal(e) =>
        Left(s"grow-vacuum failed for $gdir ns=$ns: ${e.getMessage}")
      }
    }
    val parts = spec.trim.split(":", 2)
    val dir = parts(0)
    if (dir.isEmpty)
      return Left("vacuum task spec must be '<corpusDir>[:<threshold>]', " +
        s"got '$spec'")
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
      return Left(s"vacuum task: no such corpus directory: $dir")
    val threshold =
      if (parts.length < 2) 0.01
      else try parts(1).toDouble catch {
        case _: NumberFormatException =>
          return Left(s"vacuum task: invalid threshold '${parts(1)}'")
      }
    try {
      val ts = graft.operators.Pipeline.ensureTombstoneTable(spark, dir)
      val active = graft.core.Warehouse.readGrowableTable(spark, ts)
        .groupBy("kind").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val nVec = active.getOrElse("vec", 0L)
      val nDoc = active.getOrElse("doc", 0L)
      if (nVec == 0L && nDoc == 0L)
        return Right("vacuum: no active tombstones, skipped")
      def corpusCount(table: String): Long =
        corpusCountCached(spark, dir, table)
      val vecFrac =
        if (nVec == 0L) 0.0
        else nVec.toDouble / math.max(1L, corpusCount("embeddings"))
      val docFrac =
        if (nDoc == 0L) 0.0
        else nDoc.toDouble / math.max(1L, corpusCount("documents"))
      val frac = math.max(vecFrac, docFrac)
      if (frac < threshold)
        return Right(f"vacuum: fraction $frac%.4f below threshold " +
          f"$threshold%.4f (vec=$nVec doc=$nDoc), deferred")
      val folded = graft.operators.Pipeline.vacuumCorpusArtifacts(spark, dir)
      Right(s"vacuum: folded vec=${folded("vec")} doc=${folded("doc")} " +
        "tombstones into the stored artifacts; active list emptied")
    } catch { case NonFatal(e) =>
      Left(s"vacuum failed for $dir: ${e.getMessage}")
    }
  }

  /** Corpus row counts for the threshold fraction, CACHED by source stamp
    * (§16 item 5, r15): once tombstones exist, a long-lived scheduler paid
    * a parquet listing + count job on EVERY tick for a value that only
    * changes when the corpus files do — the stamp (driver-side listing,
    * no Spark job) keys the memo, so a regenerated corpus recounts and a
    * warm deferral tick's only Spark work is the small tombstone-table
    * aggregate. Eviction-bounded (the codebook-memo shape): a daemon
    * cycling through unbounded corpora clears past 64 entries. */
  private val countMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private[sched] def corpusCountCached(spark: SparkSession, dir: String,
                                       table: String): Long = {
    val stamp = graft.core.Warehouse.sourceStamp(s"$dir/$table.parquet")
    if (stamp == "absent") return 0L
    if (countMemo.size() > 64) countMemo.clear()
    countMemo.computeIfAbsent(s"$dir|$table|$stamp", _ =>
      try java.lang.Long.valueOf(
        spark.read.parquet(s"$dir/$table.parquet").count())
      catch { case NonFatal(_) => java.lang.Long.valueOf(0L) }
    ).longValue()
  }
}
