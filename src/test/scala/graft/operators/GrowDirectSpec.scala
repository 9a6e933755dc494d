package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** Direct (no-scheduler) contract of Pipeline.growingMinhashAdmission:
  * two sequential calls over a growing increment directory — the second
  * call must see the first call's admissions in the growable standing
  * state (stream offsets skip processed files; relation caches refresh
  * across the stream's cloned-session appends). */
class GrowDirectSpec extends SparkSuite {
  import spark.implicits._
  private def text(seed: String): String =
    (1 to 40).map(j => s"${seed}w$j").mkString(" ")

  test("two direct growingMinhashAdmission calls: second sees first's admissions") {
    val corpusDir = tmpDir("gdbg-corpus")
    val incDir = tmpDir("gdbg-inc") + "/files"
    Seq((1L, text("corp1"), "en", "web", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$corpusDir/documents.parquet")
    val sfx = graft.core.Warehouse.corpusSuffix(corpusDir)

    Seq((100L, text("freshA")), (101L, text("corp1")))
      .toDF("doc_id", "text").write.mode("append").parquet(incDir)
    val v1 = Pipeline.growingMinhashAdmission(spark, corpusDir, incDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).sortBy(_._1).toSeq
    val growIds = spark.table(s"graft_sig_grow_$sfx").select("id").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val admIds = spark.table(s"graft_adm_docs_$sfx").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(v1 == Seq((100L, true), (101L, false)),
      s"verdicts=$v1 grow=$growIds adm=$admIds")

    Seq((200L, text("freshA")), (201L, text("freshB")))
      .toDF("doc_id", "text").write.mode("append").parquet(incDir)
    val v2 = Pipeline.growingMinhashAdmission(spark, corpusDir, incDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).sortBy(_._1).toSeq
    assert(v2 == Seq((200L, false), (201L, true)), v2)

    graft.core.Warehouse.sweepCorpus(spark, corpusDir)
    graft.core.Fs.deleteRecursively(
      graft.core.Warehouse.warehousePath(spark).resolve("_graft_admit_" + sfx))
    graft.core.Mat.releaseAll(blocking = true)
  }
}
