package graft.operators

import org.apache.spark.sql.functions._

/** Dev profiling main: round count + per-round cost of the q57
  * label-propagation loop at a given SF (`sbt "runMain
  * graft.operators.CcScratch /root/testdata/sf0.1"`). Informs whether
  * O(diameter) propagation or O(log) shortcutting wins on real dup graphs. */
object CcScratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    // warm the session the way Bench's earlier queries would
    Pipeline.exactDupGroups(spark, dir).count()
    Pipeline.jaccardAdjacent(spark, dir).count()
    val docs = graft.core.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val fp = docs.select(col("doc_id"),
      graft.functions.Text.fingerprint(col("text")).as("f"))
    val star = fp.join(fp.groupBy("f").agg(min("doc_id").as("mn")), "f")
      .filter(col("doc_id") =!= col("mn"))
      .select(col("doc_id").as("a"), col("mn").as("b"))
    val near = Pipeline.jaccardAdjacent(spark, dir).filter(col("jaccard") >= 0.35)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val edges = star.union(near)
    def time[T](label: String)(f: => T): T = {
      val t = System.nanoTime; val r = f
      println(f"$label: ${(System.nanoTime - t) / 1e9}%.2f s"); r
    }
    time("star.count")(star.count())
    time("near.count")(near.count())
    time("edges.count")(edges.count())
    val t0 = System.nanoTime
    val sym = time("sym checkpoint")(
      edges.union(edges.select(col("b").as("a"), col("a").as("b")))
        .localCheckpoint())
    var labels = docs.select(col("doc_id").as("id"), col("doc_id").as("label"))
      .localCheckpoint()
    var prev = labels.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
    var changed = true; var iter = 0
    while (changed && iter < 40) {
      val cand = sym.join(labels, sym("a") === labels("id"))
        .select(sym("b").as("id"), labels("label").as("nl"))
        .groupBy("id").agg(min("nl").as("nl"))
      val next = labels.join(cand, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        .localCheckpoint()
      val ns = next.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
      changed = ns.compareTo(prev) != 0; prev = ns
      labels = next; iter += 1
      println(f"round $iter changed=$changed elapsed=${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
