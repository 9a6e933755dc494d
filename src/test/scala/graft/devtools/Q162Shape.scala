package graft.devtools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adjudication harness for q162's materialization trade (the r12 review
  * deferred a withMaterialized wrap around the `coded` subtree; this
  * measurement REJECTED it — see the comment at Pipeline.pqTrainedAudit).
  * Times the production (untracked, three-branch) shape against a
  * localCheckpoint-materialized variant on a given corpus dir, and
  * reports the plan shape. Measured on this box (32 cores):
  *
  *   sf0.1 (200k vecs):  untracked 0.78 s   tracked 2.14 s   (2.7×)
  *   sf10  (2M vecs):    untracked 0.77 s   tracked 9.2 s    (12×)
  *
  * The three "redundant" scans are narrow bucketed code-table reads,
  * fully fused into each consumer's whole-stage codegen; the checkpoint
  * pays a full write + read of the joined rows and breaks fusion at the
  * LogicalRDD boundary. Usage:
  *   sbt "Test/runMain graft.devtools.Q162Shape <corpusDir>"
  */
object Q162Shape {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")

    // warm both stored artifacts + page cache once
    graft.operators.Pipeline.pqTrainedAudit(spark, dir).count()
    graft.core.Mat.releaseAll(blocking = true)

    def time(label: String, f: => DataFrame): Unit = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.count()
        graft.core.Mat.releaseAll(blocking = true)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q162shape] $label%-10s median=${reps.sorted.apply(1)}%.3f s  (${reps.map(r => f"$r%.2f").mkString(", ")})")
    }

    time("production", graft.operators.Pipeline.pqTrainedAudit(spark, dir))
    time("materialized", variant(spark, dir, materialize = true))

    // the production plan re-scans the shared subtree (no reuse nodes) —
    // and that is the FASTER shape, because the scans are narrow bucketed
    // code-table reads fused into each consumer's codegen
    val plan = variant(spark, dir, materialize = false)
      .queryExecution.executedPlan.toString
    val reusedExchange = "ReusedExchange".r.findAllIn(plan).size
    val reusedSubquery = "ReusedSubquery".r.findAllIn(plan).size
    val scans = "Scan parquet".r.findAllIn(plan).size
    println(s"[q162shape] production plan: ReusedExchange=$reusedExchange " +
      s"ReusedSubquery=$reusedSubquery parquetScans=$scans")
    graft.core.Mat.releaseAll(blocking = true)
    spark.stop()
  }

  /** q162's body with the `coded` subtree optionally materialized — the
    * shape the r12 review proposed and this harness's measurement
    * rejected. */
  def variant(spark: SparkSession, dir: String,
              materialize: Boolean): DataFrame = {
    val M = 8; val K = 16; val DSUB = 8
    val ITERS = 10; val MAX_SAMPLE = 100000
    def tbl(prefix: String) =
      prefix + "_" + graft.core.Warehouse.corpusSuffix(dir)
    val emb = graft.core.Tables.embeddings(spark, dir)
    val stamp = graft.core.Warehouse.sourceStamp(s"$dir/embeddings.parquet")
    // artifacts already ensured by the warm-up pqTrainedAudit call
    val seedTable = tbl("graft_pq_seed")
    val seedCb = graft.functions.Vectors.pqCodebookFromTable(
      spark, seedTable, M, K, DSUB)
    val trainTable = tbl("graft_pq_train")
    val trainCb = graft.functions.Vectors.ensurePqCodes(emb, "vec_id", "embedding",
      tbl("graft_ivf_seed"), trainTable, M, K, DSUB,
      tag = stamp, codebookId = s"trained-lloyd iters=$ITERS maxSample=$MAX_SAMPLE",
      codebook = () => Some(graft.functions.Vectors.trainedPqCodebook(
        emb, "vec_id", "embedding", M, K, DSUB, iters = ITERS,
        maxSample = MAX_SAMPLE)))
    val quant = emb.select(col("vec_id"),
      graft.functions.Vectors.quantizeInt8(col("embedding")).as("qv"))
    val joined = quant
      .join(graft.functions.Vectors.pqCodesFromTable(spark, seedTable)
        .select(col("id").as("vec_id"), col("codes").as("codes_s")), Seq("vec_id"))
      .join(graft.functions.Vectors.pqCodesFromTable(spark, trainTable)
        .select(col("id").as("vec_id"), col("codes").as("codes_t")), Seq("vec_id"))
    val coded = if (materialize) graft.core.Mat.tracked(joined) else joined
    val panel = broadcast(coded.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv")))
    val errs = coded
      .select(col("vec_id").as("neighbor_id"), col("qv").as("c_qv"),
        col("codes_s"), col("codes_t"))
      .join(panel, col("query_id") =!= col("neighbor_id"))
      .select(
        graft.expressions.VectorExpressions.int8_dot(col("q_qv"), col("c_qv"))
          .as("ex"),
        graft.expressions.VectorExpressions
          .adc_score(col("q_qv"), col("codes_s"), seedCb, M, K, DSUB).as("adc_s"),
        graft.expressions.VectorExpressions
          .adc_score(col("q_qv"), col("codes_t"), trainCb, M, K, DSUB).as("adc_t"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(abs(col("ex") - col("adc_s"))).as("err_s"),
        sum(abs(col("ex") - col("adc_t"))).as("err_t"))
    val dists = coded.agg(
      sum(graft.functions.Vectors.pqDistortion(col("qv"), col("codes_s"), seedCb, M, K, DSUB))
        .as("dist_s"),
      sum(graft.functions.Vectors.pqDistortion(col("qv"), col("codes_t"), trainCb, M, K, DSUB))
        .as("dist_t"))
    errs.crossJoin(dists)
      .select(col("n_pairs"),
        col("err_s").as("sum_adc_err_seeded"),
        col("dist_s").as("sum_dist_seeded"),
        col("err_t").as("sum_adc_err_trained"),
        col("dist_t").as("sum_dist_trained"),
        (col("dist_t") * lit(100L) <= col("dist_s") * lit(88L))
          .as("trained_improves"),
        (col("err_t") * lit(100L) <= col("err_s") * lit(95L))
          .as("trained_err_better"))
  }
}
