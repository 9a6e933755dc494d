package graft.core

import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** r17 optimization contracts: content-stamp-keyed memoization
  * (Warehouse.tableStamp / cachedByStamp / growableHasRows) must
  * invalidate on every append and truncate — the caches exist to remove
  * redundant Spark jobs from warm serving paths, never to serve stale
  * state. */
class StampCacheSpec extends SparkSuite {
  import spark.implicits._

  test("tableStamp + growableHasRows + cachedByStamp track growable appends and truncates") {
    val t = "stampcache_t1"
    Warehouse.ensureGrowableTable(spark, t, "spec v1",
      new org.apache.spark.sql.types.StructType().add("id", "long"), null, 0)
    // a freshly created growable table holds a 0-row part file: the
    // file-listing alone cannot prove emptiness, the row probe must
    assert(!Warehouse.growableHasRows(spark, t),
      "empty created table must read as row-less")
    val s0 = Warehouse.tableStamp(spark, t)

    var computes = 0
    def probe(): Long = Warehouse.cachedByStamp(spark, "spec-count", Seq(t)) {
      computes += 1
      Warehouse.readGrowableTable(spark, t).count()
    }
    assert(probe() == 0L && computes == 1)
    assert(probe() == 0L && computes == 1, "unchanged stamp must hit the memo")

    Seq(1L, 2L).toDF("id").write.mode("append").format("parquet").saveAsTable(t)
    val s1 = Warehouse.tableStamp(spark, t)
    assert(s1 != s0, "append must change the content stamp")
    assert(Warehouse.growableHasRows(spark, t), "append must flip the row probe")
    assert(probe() == 2L && computes == 2, "append must invalidate the memo")

    Warehouse.truncateGrowable(spark, t)
    assert(Warehouse.tableStamp(spark, t) != s1, "truncate must change the stamp")
    assert(!Warehouse.growableHasRows(spark, t), "truncate must empty the row probe")
    assert(probe() == 0L && computes == 3)
    Warehouse.clear(spark, t)
  }

  test("readGrowableTable still observes appends under the stamp-gated refresh") {
    val t = "stampcache_t2"
    Warehouse.ensureGrowableTable(spark, t, "spec v1",
      new org.apache.spark.sql.types.StructType().add("id", "long"), null, 0)
    assert(Warehouse.readGrowableTable(spark, t).count() == 0L)
    // write through a raw append (no refresh of this session's relation
    // cache) — the stamp-gated read must still see the new rows
    Seq(7L).toDF("id").write.mode("append").format("parquet").saveAsTable(t)
    assert(Warehouse.readGrowableTable(spark, t)
      .filter(col("id") === 7L).count() == 1L)
    Warehouse.clear(spark, t)
  }
}
