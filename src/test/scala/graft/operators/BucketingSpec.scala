package graft.operators

import graft.SparkSuite

class BucketingSpec extends SparkSuite {

  test("bucketed fact-fact join runs with zero shuffle exchanges") {
    val orders = graft.core.Tables.orders(spark, sfDir)
    val lineitem = graft.core.Tables.lineitem(spark, sfDir)
      .withColumnRenamed("l_orderkey", "o_orderkey")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    Bucketing.writeBucketed(orders, "bkt_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "bkt_lineitem", "o_orderkey", 8)
    try {
      val joined = Bucketing.bucketedJoin(spark, "bkt_orders", "bkt_lineitem",
        "o_orderkey")
      assert(!Bucketing.hasShuffle(joined))
      // correctness: same result as the plain (shuffling) join
      val plain = orders.join(lineitem, Seq("o_orderkey"))
      assert(joined.count() == plain.count())
      // control: an un-bucketed aggregate DOES shuffle (detector works)
      assert(Bucketing.hasShuffle(lineitem.groupBy("o_orderkey").count()))
    } finally {
      spark.sql("DROP TABLE bkt_orders")
      spark.sql("DROP TABLE bkt_lineitem")
    }
  }

  test("stored signature table: corpus side of the incremental band join never shuffles") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 4)
    val inc = docs.filter(pmod(col("doc_id"), lit(5)) === 4)
    spark.sql("DROP TABLE IF EXISTS sig_corpus")
    graft.functions.Dedup.writeSignatureTable(corpus, "doc_id", "text", "sig_corpus")
    try {
      val viaTable = graft.functions.Dedup.minhashCandidatesAgainstTable(
        spark, "sig_corpus", inc, "doc_id", "text", threshold = 0.2)
      // identical results to the on-the-fly two-sided form
      val onTheFly = graft.functions.Dedup.minhashCandidatesAgainst(
        corpus, inc, "doc_id", "text", threshold = 0.2)
      val a = viaTable.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      val b = onTheFly.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      assert(a.toSeq == b.toSeq)
      // plan: the ONLY hash exchange aligns the (small, already
      // materialized) increment side — the bucketed corpus scan feeds the
      // join directly. A second exchange means the table's bucketing was
      // not honored and the corpus re-shuffles on every increment.
      val plan = viaTable.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges <= 1, s"corpus side re-shuffled ($exchanges exchanges):\n$plan")
      graft.core.Mat.releaseAll()
      assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    } finally spark.sql("DROP TABLE sig_corpus")
  }
}
