package graft.devtools

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The sf1/sf3 scale evidence is only as good as ScaleGen's invariants —
  * this spec pins them at factor 2 over sf0.001 (runs in seconds):
  * consistent FK remapping, constant dup RATE under injective token
  * renaming, exact within-replica cosine preservation under the ±1
  * diagonal transform, and the id-offset conventions the planted-dup
  * oracles (%25, %10, lcm-7150) depend on. */
class ScaleGenSpec extends SparkSuite {

  private lazy val (src, dst) = {
    val d = tmpDir("scalegen")
    ScaleGen.replicateTo(spark, "/root/testdata/sf0.001", d, factor = 2)
    ("/root/testdata/sf0.001", d)
  }

  private def read(dir: String, t: String) = spark.read.parquet(s"$dir/$t.parquet")

  test("row counts scale by the factor; dims copy as-is") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
                  "events", "documents", "embeddings"))
      assert(read(dst, t).count() == 2 * read(src, t).count(), t)
    for (t <- Seq("region", "nation"))
      assert(read(dst, t).count() == read(src, t).count(), t)
  }

  test("FKs remap consistently: no dangling keys across replicas") {
    val dangling = read(dst, "orders").join(read(dst, "customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(dangling == 0, s"$dangling orders reference no customer")
    val li = read(dst, "lineitem")
    assert(li.join(read(dst, "orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count() == 0)
    assert(li.join(read(dst, "supplier"),
      col("l_suppkey") === col("s_suppkey"), "left_anti").count() == 0)
    assert(li.join(read(dst, "part"),
      col("l_partkey") === col("p_partkey"), "left_anti").count() == 0)
  }

  test("dup RATE stays constant: exact-dup mass scales linearly, never cross-replica") {
    def dupMass(dir: String): Long = {
      val fp = read(dir, "documents").select(
        md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("f"))
      fp.groupBy("f").count().filter(col("count") > 1)
        .agg(coalesce(sum("count"), lit(0L))).head.getLong(0)
    }
    // injective per-replica token renaming: each replica reproduces the
    // source's dup families exactly, and replicas never collide — naive
    // copying would instead make EVERY source doc a cross-replica dup
    assert(dupMass(dst) == 2 * dupMass(src))
  }

  test("embeddings: within-replica cosines exactly preserved, planted %25 convention intact") {
    val srcEmb = read(src, "embeddings").select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val dstEmb = read(dst, "embeddings").select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val n = srcEmb.size
    val span = ((srcEmb.keys.max + 1 + 24) / 25) * 25 // ScaleGen's vec offset
    // replica 1 pairs have EXACTLY the source pair's cosine (the ±1
    // diagonal is orthogonal: signs cancel in both dot and norms)
    for (Seq(i, j) <- srcEmb.keys.toSeq.sorted.take(6).combinations(2)) {
      val s = cos(srcEmb(i), srcEmb(j))
      val r = cos(dstEmb(i + span), dstEmb(j + span))
      assert(math.abs(s - r) < 1e-6, s"cosine($i,$j) drifted: $s vs $r")
    }
    // offsets are multiples of 25, so replica ids keep id%25 plants
    assert(span % 25 == 0 && dstEmb.size == 2 * n)
  }

  test("documents: doc_id offset is an lcm(10,11,13,25,50) multiple (mod-convention plants)") {
    val maxSrc = read(src, "documents").agg(max("doc_id")).head.getLong(0)
    val minRep1 = read(dst, "documents").filter(col("doc_id") > maxSrc)
      .agg(min("doc_id")).head.getLong(0)
    assert(minRep1 % 7150 == 0, s"replica offset $minRep1 breaks mod plants")
  }

  test("events: replicas shift time, never interleave (density constant)") {
    // ts may read as TIMESTAMP_NTZ — cast to an instant for Row access
    val srcMax = read(src, "events")
      .agg(max(col("ts").cast("timestamp"))).head.getTimestamp(0)
    val rep1Min = read(dst, "events")
      .filter(col("event_id") >= read(src, "events").count())
      .agg(min(col("ts").cast("timestamp"))).head.getTimestamp(0)
    // 35-day shift > the ~30-day source span: replica windows are disjoint
    assert(rep1Min.after(srcMax), "replica 1 events overlap the source window")
  }
}
