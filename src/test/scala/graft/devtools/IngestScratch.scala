package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Ivf}
import graft.core.Tables

/** Dev profiling tool: stage-level timings for the three queries that carry
  * an ingest artifact (q52 IVF cells, q62 semantic-dedup cells, q74 MinHash
  * signature table). Answers "is the regression the ingest write, the model
  * training, or the query-path joins?" — run with
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.IngestScratch"`.
  */
object IngestScratch {
  private def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // warmup

    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val st = emb.agg(count(lit(1)), max("vec_id")).head()
    val n = st.getLong(0)
    val offset = if (st.isNullAt(1)) 1L else st.getLong(1) + 1L
    val nlist = math.max(16, math.sqrt(n / 4.0).toInt)
    // corpus-keyed artifact names + source stamp, mirroring the production
    // call sites — fixed names silently re-attach another corpus's
    // artifact and the "ingest" timings become a no-op re-attach
    val sfx = graft.core.Warehouse.corpusSuffix(dir)
    val stamp = graft.core.Warehouse.sourceStamp(s"$dir/embeddings.parquet")
    val docStamp = graft.core.Warehouse.sourceStamp(s"$dir/documents.parquet")

    // --- q52 components (fixed nlist=16) ---
    val model52 = t("q52 train(nlist=16)") {
      Ivf.train(emb, "vec_id", "embedding", dim = 64, nlist = 16)
    }
    t("q52 ensureCellTable") {
      Ivf.ensureCellTable(emb, "vec_id", "embedding", 64, 16, s"prof_ivf_$sfx", tag = stamp)
    }
    t("q52 topKFromTable") {
      Ivf.topKFromTable(spark, s"prof_ivf_$sfx", emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nprobe = 16).count()
    }

    // --- q62 components (nlist=sqrt(n/4)) ---
    val planted = emb.filter(pmod(col("vec_id"), lit(25)) === 0)
      .select((col("vec_id") + offset).as("vec_id"), col("embedding"))
    val input = emb.unionByName(planted)
    t(s"q62 ensureCellTable(nlist=$nlist)") {
      Ivf.ensureCellTable(input, "vec_id", "embedding", 64, nlist,
        s"prof_sem_$sfx", tag = s"offset=$offset $stamp")
    }
    t("q62 verdicts(fromCells)") {
      Dedup.semanticDedupFromCells(spark, s"prof_sem_$sfx", "vec_id", 0.97).count()
    }
    t("q62 audit joins") {
      val capW = org.apache.spark.sql.expressions.Window
        .partitionBy("cid").orderBy(col("id").asc)
      val capped = Ivf.cellsFromTable(spark, s"prof_sem_$sfx")
        .withColumn("rn", row_number().over(capW))
        .filter(col("rn") <= 4096).drop("rn")
      capped.as("l").join(capped.as("r"),
          col("l.cid") === col("r.cid") && col("l.id") < col("r.id"))
        .groupBy(col("r.id").as("vec_id"))
        .agg(max(graft.functions.Vectors.cosine(col("l.v"), col("r.v"))))
        .count()
    }

    // --- q74 components ---
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    t("q74 ensureSignatureTable") {
      Dedup.ensureSignatureTable(
        docs.filter(pmod(col("doc_id"), lit(5)) =!= 4), "doc_id", "text",
        s"prof_sig_$sfx", k = 48, bands = 12, tag = docStamp)
    }
    t("q74 candidates (unverified)") {
      Dedup.minhashCandidatesAgainstTable(spark, s"prof_sig_$sfx",
          docs.filter(pmod(col("doc_id"), lit(5)) === 4),
          "doc_id", "text", k = 48, bands = 12, threshold = 0.2)
        .select(col("inc_id"), col("corpus_id")).count()
    }
    t("q74 full query") {
      SparkEntry.queries("q74_incremental_stored")(spark, dir).count()
    }

    // --- q58 for comparison (regressed 2.1 -> 6.5 s) ---
    t("q58 dupClustersLsh") {
      SparkEntry.queries("q58_dup_clusters_lsh")(spark, dir).count()
    }
    t("q57 dupClusters") {
      SparkEntry.queries("q57_dup_clusters")(spark, dir).count()
    }
    graft.core.Mat.releaseAllScopes(blocking = true)
    spark.stop()
  }
}
