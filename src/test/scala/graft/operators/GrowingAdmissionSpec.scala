package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.Dedup

/** Batch-level contracts of the self-growing admission loop
  * (Pipeline.growingMinhashAdmission): the growable-table read path is
  * PARITY with the direct batch machinery, appends are replay-idempotent,
  * and config drift on the standing state fails loud. */
class GrowingAdmissionSpec extends SparkSuite {

  import spark.implicits._

  private def doc(id: Long, seed: String): (Long, String) =
    (id, (1 to 40).map(j => s"${seed}w$j").mkString(" "))

  test("growable-table read path is PARITY with direct batch candidates") {
    val grow = "graft_test_grow_parity"
    graft.core.Warehouse.clear(spark, grow)
    val fp = graft.core.Warehouse.tableDir(spark, grow)
      .resolveSibling(grow + "/_graft_meta.json")
    java.nio.file.Files.deleteIfExists(fp)
    Dedup.ensureGrowableSignatureTable(spark, grow, k = 48, bands = 12)
    // admit two distinct docs into the growable table
    val admitted = Seq(doc(10L, "alpha"), doc(11L, "beta")).toDF("doc_id", "text")
    Dedup.appendSignatureRows(spark, admitted, "doc_id", "text", grow,
      k = 48, bands = 12)
    // probe with one exact copy of an admitted doc and one fresh doc
    val probe = Seq((100L, admitted.filter(col("doc_id") === 10L)
        .head().getString(1)), doc(101L, "gamma")).toDF("doc_id", "text")
    val viaTable = Dedup.minhashCandidatesAgainstTable(spark, grow, probe,
        "doc_id", "text", k = 48, bands = 12, threshold = 0.2)
      .select("inc_id", "corpus_id").collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSet
    val direct = Dedup.minhashCandidatesAgainst(admitted, probe,
        "doc_id", "text", k = 48, bands = 12, threshold = 0.2)
      .select("inc_id", "corpus_id").collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSet
    assert(viaTable == direct,
      s"stored growable path diverged from direct: $viaTable vs $direct")
    assert(viaTable == Set((100L, 10L)), s"expected the planted copy: $viaTable")
    graft.core.Warehouse.clear(spark, grow)
    graft.core.Mat.releaseAll(blocking = true)
  }

  test("doc grow fold: promote compacts corpus ∪ admitted into ONE grown table; probe finds the admitted doc; replay warm-attaches") {
    import graft.core.Warehouse
    val dir = java.nio.file.Files.createTempDirectory("docfold").toString
    Seq(doc(1L, "alpha"), doc(2L, "beta"), doc(3L, "gamma"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val sfx = Warehouse.corpusSuffix(dir)
    Pipeline.admitDocs(spark, dir,
      Seq(doc(100L, "delta")).toDF("doc_id", "text"), ns = "t")
    val grown = Pipeline.promoteAdmittedDocs(spark, dir, ns = "t")
    assert(grown == s"graft_sig_grown_t_$sfx")
    // the grown table holds corpus AND admitted signature rows
    val ids = spark.table(grown).select("id").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 100L), s"grown ids: $ids")
    // a probe copying the ADMITTED doc finds it in ONE scan of the
    // grown table (the compaction contract)
    val probe = Seq(doc(900L, "delta")).toDF("doc_id", "text")
    val cands = graft.functions.Dedup.minhashCandidatesAgainstTable(
        spark, grown, probe, "doc_id", "text", k = 48, bands = 12,
        threshold = 0.2)
      .select("inc_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands == Set((900L, 100L)), s"probe missed the admitted doc: $cands")
    // replayed fold: same fingerprint, zero rebuild
    val fp = Warehouse.fingerprintOf(spark, grown)
    Pipeline.promoteAdmittedDocs(spark, dir, ns = "t")
    assert(Warehouse.fingerprintOf(spark, grown) == fp,
      "replayed doc fold rebuilt instead of warm-attaching")
    Warehouse.sweepCorpus(spark, dir)
    graft.core.Mat.releaseAll(blocking = true)
  }

  test("appendSignatureRows is id-anti-join idempotent; config drift fails loud") {
    val grow = "graft_test_grow_replay"
    graft.core.Warehouse.clear(spark, grow)
    Dedup.ensureGrowableSignatureTable(spark, grow, k = 48, bands = 12)
    val batch = Seq(doc(20L, "delta"), doc(21L, "epsilon")).toDF("doc_id", "text")
    Dedup.appendSignatureRows(spark, batch, "doc_id", "text", grow,
      k = 48, bands = 12)
    val once = spark.table(grow).count()
    assert(once > 0)
    // replay: the exact same batch appends nothing
    Dedup.appendSignatureRows(spark, batch, "doc_id", "text", grow,
      k = 48, bands = 12)
    assert(spark.table(grow).count() == once, "replayed append double-inserted")
    // a genuinely new doc still appends
    Dedup.appendSignatureRows(spark, Seq(doc(22L, "zeta")).toDF("doc_id", "text"),
      "doc_id", "text", grow, k = 48, bands = 12)
    assert(spark.table(grow).count() > once)
    // the bucket spec survived the appends (the band join's co-location)
    val cat = spark.sql(s"DESCRIBE TABLE EXTENDED $grow").collect()
      .map(r => r.getString(0) + " " + r.getString(1)).mkString("\n")
    assert(cat.contains("Num Buckets") && cat.contains("bh"),
      s"growable table lost its bucket spec:\n$cat")
    // standing admission state must never silently reset on config drift
    val e = intercept[IllegalStateException](
      Dedup.ensureGrowableSignatureTable(spark, grow, k = 32, bands = 8))
    assert(e.getMessage.contains("cannot be silently reset"), e.getMessage)
    graft.core.Warehouse.clear(spark, grow)
    graft.core.Mat.releaseAll(blocking = true)
  }

  test("growable BUCKET table: probe parity, append idempotency, batch replay") {
    import graft.functions.Vectors
    def vec(seed: Long): Array[Float] = {
      // seeded gaussian: distinct seeds give near-orthogonal vectors
      // (|cos| ~ 1/sqrt(64)), identical seeds exact copies — no
      // accidental >=0.9 cosine between different seeds
      val rnd = new scala.util.Random(seed)
      Array.fill(64)(rnd.nextGaussian().toFloat)
    }
    val grow = "graft_test_vecgrow"
    graft.core.Warehouse.clear(spark, grow)
    graft.core.Warehouse.clear(spark, grow + "_cfg")
    Vectors.ensureGrowableBucketTable(spark, grow, dim = 64, bitsPerTable = 4)
    val admitted = Seq((10L, vec(1L)), (11L, vec(2L)))
      .toDF("vec_id", "embedding")
    Vectors.appendBucketRows(spark, admitted, "vec_id", "embedding", grow)
    val once = spark.table(grow).count()
    assert(once > 0)
    // replayed append adds nothing; a new id still appends
    Vectors.appendBucketRows(spark, admitted, "vec_id", "embedding", grow)
    assert(spark.table(grow).count() == once, "replayed append double-inserted")
    // probe parity: stored growable path == direct two-sided probe at the
    // SAME fixed bits (the cfg pins the layout)
    val probe = Seq((100L, vec(1L)), (101L, vec(55L)))
      .toDF("vec_id", "embedding")
    val viaTable = Vectors.lshScoredPairsAgainstTable(spark, grow, probe,
        "vec_id", "embedding", dim = 64, minCos = 0.9)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Vectors.lshScoredPairs(admitted, probe, "vec_id",
        "embedding", dim = 64, bitsPerTable = 4, minCos = 0.9)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaTable == direct,
      s"stored growable path diverged from direct: $viaTable vs $direct")
    assert(viaTable.contains((100L, 10L)), s"planted copy missed: $viaTable")
    // config drift on the standing layout fails loud
    val e = intercept[IllegalStateException](
      Vectors.ensureGrowableBucketTable(spark, grow, dim = 64,
        bitsPerTable = 8))
    assert(e.getMessage.contains("cannot be silently reset"), e.getMessage)
    graft.core.Warehouse.clear(spark, grow)
    graft.core.Warehouse.clear(spark, grow + "_cfg")
    graft.core.Mat.releaseAll(blocking = true)
  }

  test("growingEmbeddingBatch replay: growable table and verdict sink once-written") {
    import graft.functions.Vectors
    def vec(seed: Long): Array[Float] = {
      // seeded gaussian: distinct seeds give near-orthogonal vectors
      // (|cos| ~ 1/sqrt(64)), identical seeds exact copies — no
      // accidental >=0.9 cosine between different seeds
      val rnd = new scala.util.Random(seed)
      Array.fill(64)(rnd.nextGaussian().toFloat)
    }
    val corpusDir = tmpDir("egadm-corpus")
    (0L until 16L).map(i => (i, vec(i), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$corpusDir/embeddings.parquet")
    val sfx = graft.core.Warehouse.corpusSuffix(corpusDir)
    val corpusTable = s"graft_vecbkt_adm_$sfx"
    val growTable = s"graft_vecbkt_grow_$sfx"
    Vectors.ensureBucketTable(
      graft.core.Tables.embeddings(spark, corpusDir)
        .select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", dim = 64, table = corpusTable,
      tag = graft.core.Warehouse.sourceStamp(s"$corpusDir/embeddings.parquet"))
    val bits = spark.table(corpusTable + "_cfg").head().getAs[Int]("bits")
    Vectors.ensureGrowableBucketTable(spark, growTable, dim = 64,
      bitsPerTable = bits)
    val out = tmpDir("egadm-out")
    // fresh vec 50, copy of CORPUS vec 3 (reject), within-batch copy of 50
    val batch = Seq((50L, vec(777L)), (51L, vec(3L)), (52L, vec(777L)))
      .toDF("vec_id", "embedding")
    Pipeline.growingEmbeddingBatch(spark, corpusTable, growTable, batch,
      batchId = 0L, out)
    def state() = (
      spark.table(growTable).select("id").distinct().count(),
      spark.read.parquet(s"$out/batch_id=0").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .sortBy(_._1).toSeq)
    val s1 = state()
    assert(s1._1 == 1L, s"expected exactly vec 50 in the growable: $s1")
    assert(s1._2 == Seq((50L, 0L, true), (51L, 1L, false), (52L, 1L, false)),
      s1._2)
    Pipeline.growingEmbeddingBatch(spark, corpusTable, growTable, batch,
      batchId = 0L, out)
    assert(state() == s1, s"replay mutated state: ${state()} vs $s1")
    graft.core.Warehouse.sweepCorpus(spark, corpusDir)
    graft.core.Mat.releaseAll(blocking = true)
  }

  test("growingAdmissionBatch replay: standing tables and verdict sink once-written") {
    val corpusDir = tmpDir("gadm-corpus")
    Seq((1L, doc(1L, "corp")._2, "en", "web", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$corpusDir/documents.parquet")
    val sfx = graft.core.Warehouse.corpusSuffix(corpusDir)
    val corpusTable = s"graft_sig_adm_$sfx"
    val growTable = s"graft_sig_grow_$sfx"
    val admTable = s"graft_adm_docs_$sfx"
    val docs = graft.core.Tables.documents(spark, corpusDir)
      .select(col("doc_id"), col("text"))
    Dedup.ensureSignatureTable(docs, "doc_id", "text", corpusTable,
      k = 48, bands = 12,
      tag = graft.core.Warehouse.sourceStamp(s"$corpusDir/documents.parquet"))
    Dedup.ensureGrowableSignatureTable(spark, growTable, k = 48, bands = 12)
    graft.core.Warehouse.ensureGrowableTable(spark, admTable,
      "admitted-docs v1",
      new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long").add("text", "string"), null, 0)
    val out = tmpDir("gadm-out")
    // batch: one fresh doc, one exact copy of the CORPUS doc (reject),
    // and an exact within-batch copy of the fresh doc (pair-greedy reject)
    val fresh = doc(50L, "fresh")
    val batch = Seq(fresh, (51L, doc(1L, "corp")._2), (52L, fresh._2))
      .toDF("doc_id", "text")
    Pipeline.growingAdmissionBatch(spark, docs, corpusTable, growTable,
      admTable, batch, batchId = 0L, out, k = 48, bands = 12)
    def state() = (
      spark.table(growTable).select("id").distinct().count(),
      spark.table(admTable).count(),
      spark.read.parquet(s"$out/batch_id=0").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1).toSeq)
    val s1 = state()
    assert(s1._1 == 1L && s1._2 == 1L, s"expected exactly doc 50 admitted: $s1")
    assert(s1._3 == Seq((50L, 0L, true), (51L, 1L, false), (52L, 1L, false)), s1._3)
    // replay the SAME batch (foreachBatch is at-least-once): every side
    // effect must be exactly-once — anti-joined appends, overwrite sink
    Pipeline.growingAdmissionBatch(spark, docs, corpusTable, growTable,
      admTable, batch, batchId = 0L, out, k = 48, bands = 12)
    assert(state() == s1, s"replay mutated state: ${state()} vs $s1")
    graft.core.Warehouse.sweepCorpus(spark, corpusDir)
    graft.core.Mat.releaseAll(blocking = true)
  }
}
