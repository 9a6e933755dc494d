package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.Dedup

/** The two growable-table contracts the r15 round left unpinned:
  *
  *  1. FRESHNESS AS CONTRACT (r15 verdict "what's wrong" #3): every reader
  *     goes through [[Warehouse.readGrowableTable]], which refreshes the
  *     relation cache before reading — a reader added without it could
  *     silently serve last tick's state after a cloned-session append.
  *  2. CROSS-SESSION RE-ATTACH + APPEND (r15 §16 known-item 6, deferred
  *     spec): a fresh session re-attaching an existing growable table goes
  *     through the DDL path (CREATE TABLE ... CLUSTERED BY ... LOCATION →
  *     an EXTERNAL table), and the bucketed writer must keep appending to
  *     it with the bucket spec and the anti-join idempotency intact.
  */
class GrowableTableContractSpec extends SparkSuite {

  import spark.implicits._

  private def doc(id: Long, seed: String): (Long, String) =
    (id, (1 to 40).map(j => s"${seed}w$j").mkString(" "))

  test("readGrowableTable sees a cloned-session append the cached relation predates") {
    val t = "graft_test_growfresh"
    Warehouse.clear(spark, t)
    Warehouse.ensureGrowableTable(spark, t, "fresh v1",
      new org.apache.spark.sql.types.StructType().add("id", "long"), null, 0)
    // cache the relation (and its file listing) in THIS session first —
    // the foreachBatch shape: the outer session has read the table before
    // the stream's cloned session appends to it
    assert(spark.table(t).count() == 0L)
    val clone = spark.newSession()
    clone.range(1, 3).select(col("id"))
      .write.mode("append").format("parquet").saveAsTable(t)
    // the contract read must see the appended rows regardless of what the
    // stale cached listing would have served
    assert(Warehouse.readGrowableTable(spark, t).count() == 2L)
    Warehouse.clear(spark, t)
  }

  test("fresh-session DDL re-attach of a growable table keeps rows, bucket spec, and append idempotency") {
    val t = "graft_test_growreattach"
    Warehouse.clear(spark, t)
    Dedup.ensureGrowableSignatureTable(spark, t, k = 48, bands = 12)
    Dedup.appendSignatureRows(spark,
      Seq(doc(10L, "alpha"), doc(11L, "beta")).toDF("doc_id", "text"),
      "doc_id", "text", t, k = 48, bands = 12)
    val rowsBefore = spark.table(t).count()
    assert(rowsBefore > 0L)
    // simulate a FRESH session: drop the catalog entry while keeping the
    // on-disk state. DROP TABLE on a MANAGED table deletes its directory
    // (the trap §16 item 6 recorded), so stash the dir across the drop.
    val dir = Warehouse.tableDir(spark, t)
    val stash = java.nio.file.Files.createTempDirectory("growreattach")
      .resolve("stashed")
    java.nio.file.Files.move(dir, stash)
    spark.sql(s"DROP TABLE IF EXISTS `$t`")
    java.nio.file.Files.createDirectories(dir.getParent)
    java.nio.file.Files.move(stash, dir)
    assert(!spark.catalog.tableExists(t))
    // re-attach: fingerprint present + catalog entry missing → the DDL
    // CREATE ... CLUSTERED BY ... LOCATION path (an EXTERNAL table)
    Dedup.ensureGrowableSignatureTable(spark, t, k = 48, bands = 12)
    assert(spark.catalog.tableExists(t))
    assert(spark.table(t).count() == rowsBefore, "re-attach lost rows")
    val desc = spark.sql(s"DESCRIBE FORMATTED `$t`").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.get("Type").exists(_.contains("EXTERNAL")),
      s"re-attached growable table should be EXTERNAL: ${desc.get("Type")}")
    assert(desc.get("Bucket Columns").exists(_.contains("bh")),
      s"bucket spec lost on re-attach: ${desc.get("Bucket Columns")}")
    // the bucketed writer must append onto the EXTERNAL re-attached table:
    // one replayed id (anti-joined away) + one new id
    Dedup.appendSignatureRows(spark,
      Seq(doc(10L, "alpha"), doc(12L, "gamma")).toDF("doc_id", "text"),
      "doc_id", "text", t, k = 48, bands = 12)
    val perId = Warehouse.readGrowableTable(spark, t)
      .groupBy("id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perId.keySet == Set(10L, 11L, 12L), s"ids after append: $perId")
    assert(perId(10L) == 12L, // 12 bands exactly once — replay did not double-insert
      s"replayed id 10 should hold exactly its 12 band rows: ${perId(10L)}")
    // the banded probe reads the appended layout: an exact copy of the
    // POST-re-attach appended doc must collide
    val probe = Seq(doc(100L, "gamma")).toDF("doc_id", "text")
    val cands = Dedup.minhashCandidatesAgainstTable(spark, t, probe,
        "doc_id", "text", k = 48, bands = 12, threshold = 0.2)
      .select("inc_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands == Set((100L, 12L)), s"probe missed the appended doc: $cands")
    Warehouse.clear(spark, t)
    graft.core.Mat.releaseAll(blocking = true)
  }
}
