package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class OperatorsSpec extends SparkSuite {

  test("asof join: every purchase pairs with the latest click at-or-before it") {
    val out = Advanced.asofPurchaseClick(spark, sfDir)
    val purchases = graft.core.Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    assert(out.count() == purchases) // left-join semantics: nothing dropped
    // no paired click may be after its purchase
    assert(out.filter(col("asof_click_ts") > col("purchase_ts")).count() == 0)
    // spot-check one user end-to-end
    val row = out.filter(col("asof_click_ts").isNotNull).orderBy("purchase_id").head()
    val uid = row.getLong(1)
    val purchaseTs = row.getAs[java.time.LocalDateTime](2) // ntz → LocalDateTime
    val best = graft.core.Tables.events(spark, sfDir)
      .filter(col("event_type") === "click" && col("user_id") === uid &&
              col("ts") <= lit(purchaseTs))
      .orderBy(col("ts").desc, col("event_id").desc).head()
    assert(best.getAs[java.time.LocalDateTime]("ts") ==
      row.getAs[java.time.LocalDateTime](3))
  }

  test("salted join equals plain join (inner + left) and spreads hot keys") {
    import spark.implicits._
    // heavily skewed left: 10k rows on key 1, a handful elsewhere
    val left = ((1 to 10000).map(i => (1L, i.toLong)) ++
      Seq((2L, 1L), (3L, 2L))).toDF("k", "row_id")
    val right = Seq((1L, "hot"), (2L, "warm"), (4L, "unmatched")).toDF("k", "label")
    val plain = left.join(right, Seq("k")).orderBy("k", "row_id", "label")
    val salted = SkewJoin.saltedJoin(left, right, "k", 8, col("row_id"))
      .orderBy("k", "row_id", "label")
    assert(plain.collect().toSeq == salted.collect().toSeq)
    val plainLeft = left.join(right, Seq("k"), "left").count()
    val saltedLeft = SkewJoin.saltedJoin(left, right, "k", 8, col("row_id"), "left").count()
    assert(plainLeft == saltedLeft)
  }

  test("pivot matches conditional aggregation") {
    val out = Advanced.eventPivot(spark, sfDir).orderBy("cohort").collect()
    assert(out.length == 5)
    val total = out.map(r => (1 to 5).map(r.getLong).sum).sum
    assert(total == graft.core.Tables.events(spark, sfDir).count())
  }
}
