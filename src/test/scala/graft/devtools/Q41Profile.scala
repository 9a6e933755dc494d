package graft.devtools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Vectors
import graft.operators.Pipeline

/** Stage-level timing for q41 embedding near-dup pairs (dev-only): LSH
  * bucket-row materialization, candidate-pair generation + dedup, exact
  * cosine verification, and end-to-end — the r9 verdict's ask #2 wants the
  * verification-mass claim measured, not asserted.
  * Usage: runMain graft.devtools.Q41Profile <dir> [reps] */
object Q41Profile {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[q41prof] $label: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (_ <- 1 to reps) {
      // mirror embeddingDupsAudit's corpus: embeddings + planted copies
      val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
      val st = emb.agg(count(lit(1)), max("vec_id")).head()
      val n = st.getLong(0)
      val offset = if (st.isNullAt(1)) 1L else st.getLong(1) + 1L
      val planted = emb.filter(pmod(col("vec_id"), lit(25)) === 0)
        .select((col("vec_id") + offset).as("vec_id"), col("embedding"))
      val corpus = emb.unionByName(planted)
      val bits = Vectors.adaptiveBits(n + n / 25)
      println(s"[q41prof] corpus=${n + n / 25} adaptive_bits=$bits")
      graft.core.Mat.withMaterialized(
          Vectors.bucketRows(corpus, "vec_id", "embedding", "id",
            dim = 64, bitsPerTable = bits, nTables = 6, bucketCap = 256)) { b =>
        time("bucket_rows_mat")(b.count())
        val pairs = b.as("l").join(b.as("r"),
            col("l.tbl") === col("r.tbl") && col("l.sig") === col("r.sig") &&
            col("l.id") < col("r.id"))
          .select(col("l.id").as("query_id"), col("r.id").as("neighbor_id"))
        time("raw_collisions")(pairs.count())
        // the old (pre-r10) verify shape for comparison: dedup all raw
        // collisions, then join full vectors back twice — the stage the
        // r9 curve showed dominating q41's sf10 wall
        graft.core.Mat.withMaterialized(
            pairs.dropDuplicates("query_id", "neighbor_id")) { deduped =>
          time("deduped_pairs")(deduped.count())
          val scored = deduped
            .join(corpus.select(col("vec_id").as("neighbor_id"),
                                col("embedding").as("cv")), Seq("neighbor_id"))
            .join(corpus.select(col("vec_id").as("query_id"),
                                col("embedding").as("qv")), Seq("query_id"))
            .select(col("query_id"), col("neighbor_id"),
                    round(Vectors.cosine(col("qv"), col("cv")), 6).as("cos_sim"))
          time("old_shape_verify")(scored.filter(col("cos_sim") >= 0.9).count())
        }
      }
      graft.core.Mat.releaseAll(blocking = true)
      // the r10 production shape: cosine fused into the bucket self-join
      time("fused_selfpairs")(Vectors.lshSelfPairs(corpus, "vec_id",
        "embedding", dim = 64, minCos = 0.9).count())
      graft.core.Mat.releaseAll(blocking = true)
      time("end_to_end_q41")(Pipeline.embeddingDupsAudit(spark, dir).count())
      graft.core.Mat.releaseAll(blocking = true)
      println("[q41prof] ---")
    }
    spark.stop()
  }
}
