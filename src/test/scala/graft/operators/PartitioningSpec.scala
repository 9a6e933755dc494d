package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Partitioned layout: date-partitioned writes and partition pruning — the
  * standard day-partitioned DWD layout the reference's production workload
  * uses (dwd_*_di tables, SURVEY.md §0). */
class PartitioningSpec extends SparkSuite {

  test("day-partitioned write prunes non-matching partitions at read") {
    val out = tmpDir("part") + "/events_by_day"
    val events = graft.core.Tables.events(spark, sfDir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    events.write.partitionBy("day").parquet(out)

    val allDays = events.select("day").distinct().count()
    assert(allDays > 1)

    val oneDay = events.select(max("day")).collect().head.getString(0)
    val pruned = spark.read.parquet(out).filter(col("day") === oneDay)

    // partition filter reaches the scan; only one partition dir is read
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(s"day#\\d+ = $oneDay".r.findFirstIn(plan).isDefined) // attr carries exprId
    assert(pruned.count() == events.filter(col("day") === oneDay).count())

    // control: unfiltered read sees every partition
    assert(spark.read.parquet(out).count() == events.count())
  }
}
