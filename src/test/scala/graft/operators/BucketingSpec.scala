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
}
