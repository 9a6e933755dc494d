package graft.devtools

/** Dev harness: print every main-bench warmCheck flag for a corpus dir —
  * the fastest way to find which artifact keeps `warehouse_warm` false.
  * Usage: Test/runMain graft.devtools.WarmDebug [sfDir] */
object WarmDebug {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.core.GraftSession.local(4)
    spark.sparkContext.setLogLevel("WARN")
    val sfx = graft.core.Warehouse.corpusSuffix(dir)
    val embStamp = graft.core.Warehouse.sourceStamp(s"$dir/embeddings.parquet")
    val docStamp = graft.core.Warehouse.sourceStamp(s"$dir/documents.parquet")
    val emb = Seq("graft_ivf_cells", "graft_semdedup_cells", "graft_ivf_inc",
      "graft_ivf_seed", "graft_vecbkt_corpus", "graft_pq_seed",
      "graft_pq_train", "graft_int8", "graft_pq_lbl", "graft_vecbkt_adm",
      "graft_pq_lbl_grown_q171") ++
      Seq("ivf_grown", "pq_grown", "int8_grown", "vecbkt_grown")
        .flatMap(b => Seq(s"graft_${b}_q166", s"graft_${b}_q167",
          s"graft_${b}_q170", s"graft_${b}_q171"))
    val doc = Seq("graft_sig_corpus", "graft_clusters", "graft_sig_grown_q169",
      "graft_terms", s"graft_terms_grown_q169")
    for (t <- emb)
      println(s"$t: " + graft.core.Warehouse.isFresh(spark, s"${t}_$sfx", Seq(embStamp)))
    for (t <- doc)
      println(s"$t: " + graft.core.Warehouse.isFresh(spark, s"${t}_$sfx", Seq(docStamp)))
    println("graft_terms_df: " + graft.core.Warehouse.isFresh(
      spark, s"graft_terms_${sfx}_df", Seq(docStamp)))
    println("graft_terms_grown_q169_df: " + graft.core.Warehouse.isFresh(
      spark, s"graft_terms_grown_q169_${sfx}_df", Seq(docStamp)))
    spark.stop()
  }
}
