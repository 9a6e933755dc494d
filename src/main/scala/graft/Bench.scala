package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Bench {

  /** Synthesize a 10× documents + embeddings corpus (hash-generated: 5k-word
    * vocabulary so shingle/bucket collision statistics resemble the real
    * corpus, not degenerate copies that would plant artificial near-dup
    * mass) and time the dedup/ANN family on it. Catches super-linear growth
    * that the sf0.1 numbers alone cannot show.
    *
    * r2 post-mortem: this probe recorded q24 at 16.5× time for 10× data —
    * which was NOT the band join going quadratic but the probe running last
    * in a session whose pinned checkpoint blocks (since released via
    * core.Mat) crowded the storage pool. With lifecycle management in
    * place the same probe measures ~1.3× time at 10× rows (fixed overheads
    * still dominate at this scale; candidate pairs stay collision-bounded). */
  private def scaleProbe(spark: SparkSession, sfDir: String,
                         factor: Int): Seq[(String, Double, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("graft-probe").toString
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count() * factor
    val nVecs = spark.read.parquet(s"$sfDir/embeddings.parquet").count() * factor
    // 2% of docs (id % 50 == 1) are MUTATIONS of their predecessor: same
    // word stream with every 17th position re-hashed (~6% token churn →
    // shingle Jaccard ≈ 0.7-0.8). Without planted near-dups the r3 probe
    // returned 0 candidate pairs at 10× — it timed signature + band-join
    // machinery but never pair SCORING at volume.
    val base = when(pmod(col("id"), lit(50)) === 1 && col("id") > 0,
      col("id") - 1).otherwise(col("id"))
    spark.range(nDocs).select(
        col("id").as("doc_id"),
        concat_ws(" ", transform(
          sequence(lit(1), lit(60) + pmod(base, lit(60))),
          j => concat(lit("w"), pmod(
            when(col("id") =!= base && pmod(j, lit(17)) === 0, hash(col("id"), j))
              .otherwise(hash(base, j)), lit(5000))))).as("text"),
        lit("en").as("lang"), lit("synth").as("source"), lit(0L).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.range(nVecs).select(
        col("id").as("vec_id"),
        transform(sequence(lit(1), lit(64)),
          j => (pmod(hash(col("id"), j), lit(2000001)).cast("double") / 1000000.0
                - 1.0).cast("float")).as("embedding"),
        lit(0).as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Seq("q22_exact_dup_groups", "q24_minhash_pairs", "q41_embedding_dups")
      .map { name =>
        val t0 = System.nanoTime()
        val rows = try SparkEntry.queries(name)(spark, dir).count()
                   catch { case _: Throwable => -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        // result consumed — drop tracked blocks. BLOCKING: a non-blocking
        // unpersist future from the last probe query can outlive the final
        // drain (its queue entry is already gone) and race spark.stop()
        graft.core.Mat.releaseAll(blocking = true)
        (name, sec, rows)
      }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup: JIT/codegen/scheduler paths + parquet reader init
    // (region is 5 rows — engine machinery, not query data)
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      // the query's RESULT was just consumed (count) — release the blocks
      // its operators tracked, exactly like the scheduler daemon does at
      // tick end. Untimed lifecycle bookkeeping; blocking so no unpersist
      // future can linger past its queue entry into session shutdown.
      graft.core.Mat.releaseAll(blocking = true)
      name -> sec
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // 10× scale probe for the dedup/ANN family (disable: SPARK_GRAFT_SCALE_PROBE=0)
    val probeJson =
      if (sys.env.get("SPARK_GRAFT_SCALE_PROBE").contains("0")) ""
      else {
        val p = scaleProbe(spark, sfDir, factor = 10)
        val entries = p.map { case (k, sec, rows) =>
          s"\"" + k + s"\":{\"sec\":$sec,\"rows\":$rows}"
        }.mkString(",")
        s""","scale_probe_10x":{$entries}"""
      }
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$probeJson}"""
    // r3 post-mortem: the metric line printed BEFORE spark.stop() was
    // displaced out of the driver's 2000-char stdout tail by a shutdown
    // stack-trace flood — non-blocking unpersist futures racing the
    // stopping block manager ("Block rdd_N was not removed normally" +
    // RejectedExecutionException). Order of record: drain every scope
    // BLOCKING, stop the session, and print the metric line LAST.
    graft.core.Mat.releaseAllScopes(blocking = true)
    spark.stop()
    println(json)
  }
}
