package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Dump each query's result parquet; on failure, write a 1-row parquet
    * with a single `verify_error` column IN ITS PLACE so the driver's
    * compare records an explicit red row (schema/hash mismatch) instead of
    * the query silently vanishing from the correctness report — r6 lost 18
    * queries that way. Returns the failed names. */
  private[graft] def dumpQueries(spark: SparkSession, sfDir: String, outDir: String,
      queries: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)])
      : Seq[String] =
    queries.flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        try {
          import spark.implicits._
          Seq(Option(e.getMessage).getOrElse(e.getClass.getName).take(500))
            .toDF("verify_error")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => () }
        Some(name)
      } finally
        // BLOCKING, like Bench at every boundary: a non-blocking unpersist
        // future from the final query can outlive its queue entry and race
        // spark.stop() into a shutdown stack-trace flood (the r3 failure)
        graft.core.Mat.releaseAll(blocking = true)
    }

  /** A typo'd filter name must fail loud, not silently vanish from the
    * correctness report with _failed.json=[] (the r1/r6 failure mode). */
  private[graft] def validateFilter(f: Set[String]): Unit = {
    require(f.nonEmpty, "query-name filter given but names no queries")
    val unknown = f -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown verify queries: ${unknown.mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    // optional 3rd arg (dev only): comma-separated query-name filter
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] =
      if (args.length > 2)
        Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
    only.foreach(validateFilter)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // one session factory for every entry point (GraftSession: UTC, micros
    // parquet timestamps for the DuckDB oracle, AQE) — r6 post-mortem:
    // hand-rolled builders diverged on a conf and the drift surfaced only
    // in the entry points that lacked it
    val spark = graft.core.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failed = dumpQueries(spark, sfDir, outDir,
      SparkEntry.queries.toSeq.filter { case (name, _) => only.forall(_.contains(name)) })
    // loud, stdout, unmissable (this is how r1 lost q28 and r6 lost 18
    // queries); plus a machine-readable artifact next to the parquets
    if (failed.nonEmpty)
      println(s"[verify] FAILED ${failed.size} queries (error parquet written " +
        s"in place of results): " + failed.sorted.mkString(", "))
    Files.writeString(Paths.get(s"$outDir/_failed.json"),
      failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // blocking drain before stop — same shutdown discipline as Bench: no
    // unpersist future may race the stopping block manager
    graft.core.Mat.releaseAllScopes(blocking = true)
    spark.stop()
  }
}
