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
    // semi/anti compose with the salt replication (no right rows emitted)
    assert(SkewJoin.saltedJoin(left, right, "k", 8, col("row_id"),
      "left_semi").count() == left.join(right, Seq("k"), "left_semi").count())
    // right/full-outer would emit nSalts copies of every unmatched right
    // row — the blanket variant now guards like saltedJoinHeavyKeys
    val e = intercept[IllegalArgumentException](
      SkewJoin.saltedJoin(left, right, "k", 8, col("row_id"), "right_outer"))
    assert(e.getMessage.contains("saltedJoin"), e.getMessage)
    intercept[IllegalArgumentException](
      SkewJoin.saltedJoin(left, right, "k", 8, col("row_id"), "full_outer"))
  }

  test("heavy-key salting: only the hot key salts; result equals plain join") {
    import spark.implicits._
    val left = ((1 to 10000).map(i => (1L, i.toLong)) ++
      Seq((2L, 1L), (3L, 2L))).toDF("k", "row_id")
    val right = Seq((1L, "hot"), (2L, "warm"), (4L, "unmatched")).toDF("k", "label")
    val plain = left.join(right, Seq("k")).orderBy("k", "row_id", "label")
    val adaptive = SkewJoin.saltedJoinHeavyKeys(left, right, "k", 8,
        col("row_id"), heavyThreshold = 100)
      .orderBy("k", "row_id", "label")
    assert(plain.collect().toSeq == adaptive.collect().toSeq)
    // left join keeps unmatched heavy AND light left rows exactly once
    val withLonelyHeavy = left.unionByName(
      (1 to 5000).map(i => (9L, i.toLong)).toDF("k", "row_id"))
    val plainLeft = withLonelyHeavy.join(right, Seq("k"), "left")
    val adaptLeft = SkewJoin.saltedJoinHeavyKeys(withLonelyHeavy, right, "k",
      8, col("row_id"), heavyThreshold = 100, joinType = "left")
    assert(plainLeft.count() == adaptLeft.count())
    assert(adaptLeft.filter(col("k") === 9L && col("label").isNull).count() == 5000)
    // uniform data: no key passes the threshold → degenerates to the
    // plain join (no union, no salt replication in the plan)
    val uniform = (1 to 300).map(i => (i.toLong, i.toLong)).toDF("k", "row_id")
    val deg = SkewJoin.saltedJoinHeavyKeys(uniform, right, "k", 8,
      col("row_id"), heavyThreshold = 100)
    assert(!deg.queryExecution.optimizedPlan.toString.contains("__salt"))
    assert(deg.count() == uniform.join(right, Seq("k")).count())
    // a threshold so low everything is "heavy" fails loud, never
    // broadcasts an unbounded key set
    val e = intercept[IllegalArgumentException] {
      SkewJoin.saltedJoinHeavyKeys(uniform, right, "k", 8, col("row_id"),
        heavyThreshold = 0, maxHeavyKeys = 10)
    }
    assert(e.getMessage.contains("heavy"))
    // NULL join keys: never salted (they cannot match an equi-join) and
    // never LOST — a left join preserves them exactly like the plain
    // join, even when nulls themselves are past the heavy threshold
    val nullHeavy = ((1 to 500).map(_ => (Option.empty[Long], 0L)) ++
      (1 to 300).map(i => (Some(1L), i.toLong)) ++
      Seq((Some(2L), 1L))).toDF("k", "row_id")
    val plainN = nullHeavy.join(right, Seq("k"), "left")
    val adaptN = SkewJoin.saltedJoinHeavyKeys(nullHeavy, right, "k", 8,
      col("row_id"), heavyThreshold = 100, joinType = "left")
    assert(adaptN.count() == plainN.count())
    assert(adaptN.filter(col("k").isNull).count() == 500)
    // inner join drops null keys on both forms identically
    assert(SkewJoin.saltedJoinHeavyKeys(nullHeavy, right, "k", 8,
        col("row_id"), heavyThreshold = 100).count() ==
      nullHeavy.join(right, Seq("k")).count())
  }

  test("pivot matches conditional aggregation") {
    val out = Advanced.eventPivot(spark, sfDir).orderBy("cohort").collect()
    assert(out.length == 5)
    val total = out.map(r => (1 to 5).map(r.getLong).sum).sum
    assert(total == graft.core.Tables.events(spark, sfDir).count())
  }

  test("connectedComponents fails loud instead of returning unconverged labels") {
    import spark.implicits._
    // a 30-node path graph has diameter 29: min-label propagation moves
    // labels one hop per round, so maxIter=3 CANNOT converge — silently
    // returning would hand back wrong cluster ids
    val ids = spark.range(30).select(col("id").as("doc_id"))
    val edges = (0L until 29L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      Pipeline.connectedComponents(ids, edges, maxIter = 3).collect()
    }
    assert(e.getMessage.contains("not converged"))
    // and with enough rounds the same graph converges to one component
    val ok = Pipeline.connectedComponents(ids, edges, maxIter = 30)
    assert(ok.filter(col("cluster_id") === 0L).count() == 30)
    graft.core.Mat.releaseAll()
  }

  test("dupClustersLsh clusters a planted multi-way near-dup family via LSH edges") {
    import spark.implicits._
    val dir = tmpDir("graft-lsh-clusters")
    val base = (1 to 50).map(i => s"w$i").mkString(" ")
    // each family member mutates ONE distinct token of the base doc —
    // pairwise shingle Jaccard ≈ 0.88, found by the banded MinHash join
    // (NOT by fingerprint identity, and ids are non-adjacent so the q57
    // edge sources would miss them)
    def mut(pos: Int) =
      (1 to 50).map(i => if (i == pos) s"mut$pos" else s"w$i").mkString(" ")
    val family = Seq(10L -> base, 20L -> mut(7), 30L -> mut(23), 40L -> mut(41))
    val noise = (100L until 160L).map(i =>
      i -> (1 to 50).map(j => s"n${i}x$j").mkString(" "))
    (family ++ noise).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val out = Pipeline.dupClustersLsh(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    for (id <- Seq(10L, 20L, 30L, 40L))
      assert(out(id)._1 == 10L, s"doc $id not in family cluster: ${out(id)}")
    assert(out(10L)._2 && !out(20L)._2)
    // noise docs stay singletons
    assert((100L until 160L).forall(i => out(i) == (i, true)))
    graft.core.Mat.releaseAll()
  }

  test("exact-NN sample gate activates above the query-count threshold") {
    // default threshold (4096) never fires at test SF: all vectors are queries
    val full = Pipeline.exactNearestNeighbor(spark, sfDir)
    val n = graft.core.Tables.embeddings(spark, sfDir).count()
    assert(full.select("query_id").distinct().count() == n)
    // forced low threshold: a deterministic hash-sample of ~maxQueries
    // queries is ground-truthed, never corpus × corpus
    val gated = Pipeline.exactNearestNeighbor(spark, sfDir, maxQueries = 100)
    val sampled = gated.select("query_id").distinct().count()
    assert(sampled > 0 && sampled < n, s"sample gate did not engage: $sampled of $n")
    // deterministic: same sample on a re-run
    assert(gated.select("query_id").distinct().count() == sampled)
  }

  test("winnowing: shared ≥8-token run guarantees a shared fingerprint; density stays O(1/w)") {
    import spark.implicits._
    val dir = tmpDir("winnow")
    val run = (1 to 9).map(i => s"r$i").mkString(" ") // 9 > k+w-1 = 8 shared tokens
    Seq(
      (1L, s"a1 a2 a3 $run a4 a5"),
      (2L, s"b1 $run b2 b3 b4 b5"),
      (3L, (1 to 120).map(i => s"u$i").mkString(" ")), // long, all-unique corpus noise
      (4L, "tiny doc")) // < k tokens: one whole-doc gram, one fingerprint
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val out = Pipeline.winnowFingerprints(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // the MOSS guarantee: docs 1 and 2 share a full gram window of the run
    assert(out(1L)._3 >= 1, s"doc 1 shares no fingerprint: ${out(1L)}")
    assert(out(2L)._3 >= 1, s"doc 2 shares no fingerprint: ${out(2L)}")
    // the unique doc shares nothing, and winnowing keeps far fewer
    // fingerprints than grams (expected ~2/(w+1) = 0.4 of 116 grams)
    assert(out(3L)._3 == 0)
    assert(out(3L)._2 <= out(3L)._1 && out(3L)._4 < 0.75,
      s"winnow kept too many fingerprints: ${out(3L)}")
    // short doc: single whole-doc gram → exactly one fingerprint
    assert(out(4L) == ((1L, 1L, 0L, 1.0)))
  }

  test("funnel: stages must be strictly ordered and inside the 7-day window; cohort offsets are exact weeks") {
    import spark.implicits._
    val dir = tmpDir("funnel")
    val H = 3600L * 1000000000L // one hour in ns (events.ts is int64 nanos)
    val D = 24 * H
    val t0 = 1704067200L * 1000000000L // 2024-01-01T00:00Z
    Seq(
      // user 1: clean view → click → purchase, all inside the windows
      (t0, 1L, "view"), (t0 + H, 1L, "click"), (t0 + 2 * H, 1L, "purchase"),
      // user 2: click BEFORE the first view must not count as stage 2
      (t0 - H, 2L, "click"), (t0, 2L, "view"), (t0 + H, 2L, "purchase"),
      // user 3: click outside the 7-day conversion window
      (t0, 3L, "view"), (t0 + 8 * D, 3L, "click"),
      // user 4: purchase outside the 7-day window after the click
      (t0, 4L, "view"), (t0 + H, 4L, "click"), (t0 + H + 8 * D, 4L, "purchase"),
      // user 5: no view at all → not in the funnel
      (t0, 5L, "purchase"))
      .toDF("ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val out = Relational.funnelConversion(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(4), r.getBoolean(5))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == ((true, true)))
    assert(out(2L) == ((false, false)), "pre-view click leaked into the funnel")
    assert(out(3L) == ((false, false)), "out-of-window click leaked")
    assert(out(4L) == ((true, false)), "out-of-window purchase leaked")
    // cohort: one user first seen in week 1, active again two weeks later
    val dir2 = tmpDir("cohort")
    Seq((t0, 1L, "view"), (t0 + 15 * D, 1L, "click"))
      .toDF("ts", "user_id", "event_type")
      .write.parquet(s"$dir2/events.parquet")
    val coh = Relational.cohortRetention(spark, dir2).collect()
      .map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(coh == Map(0 -> ((1L, 1L, 1.0)), 2 -> ((1L, 1L, 1.0))))
  }

  test("q30 sessionize binds the 30-min rule on true timestamps: a fractional 1800.5 s gap starts a new session") {
    import spark.implicits._
    val dir = tmpDir("sess")
    val S = 1000000000L // 1 s in ns (events.ts fixture is int64 nanos)
    val t0 = 1704067200L * S
    Seq(
      // user 1: gap of exactly 1800 s → SAME session (rule is strict >)
      (1L, t0, 1L), (2L, t0 + 1800 * S, 1L),
      // user 2: fractional gap 1800.5 s → NEW session. unix_timestamp
      // flooring read this diff as 1800 whole seconds and merged the
      // sessions while the oracle's fractional epoch() split them
      (3L, t0, 2L), (4L, t0 + 1800 * S + S / 2, 2L),
      // user 3: 1801 s → new session under either arithmetic (control)
      (5L, t0, 3L), (6L, t0 + 1801 * S, 3L))
      .toDF("event_id", "ts", "user_id")
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.parquet(s"$dir/events.parquet")
    val got = Relational.sessionize(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L),
      s"fractional-gap sessionization wrong: $got")
  }

  test("q106 proximity: ±5-minute boundary is inclusive and pairs cross bin edges") {
    import spark.implicits._
    val dir = tmpDir("prox")
    val S = 1000000000L // 1 s in ns (events.ts fixture is int64 nanos)
    val t0 = 1704067200L * S // exactly on a 5-min bin boundary
    Seq(
      (1L, t0, 10L, "error"),
      (2L, t0 + 300 * S, 20L, "purchase"),         // exactly +5 min: counted
      (3L, t0 + 300 * S + 1000L, 21L, "purchase"), // +5 min + 1 µs: excluded
      (4L, t0 - 300 * S, 22L, "purchase"),         // exactly −5 min, PREVIOUS bin
      (5L, t0 + 299 * S, 23L, "purchase"),         // in range, same bin
      (6L, t0 + 7200 * S, 11L, "error"))           // isolated: must report 0
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.parquet(s"$dir/events.parquet")
    val got = Relational.errorProximity(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 6L -> 0L),
      s"boundary/bin-edge handling wrong: $got")
  }

  test("q106 proximity: seeded random corpora match the naive inequality join exactly") {
    import spark.implicits._
    // the bin rewrite must be RESULT-INVARIANT against the quadratic spec
    // on arbitrary time layouts — boundary cases the hand fixture can't
    // enumerate (events straddling bins, ties, empty neighborhoods)
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val dir = tmpDir(s"proxrand$trial")
      val S = 1000000000L
      val t0 = 1704067200L * S
      val n = 60
      val rows = (1 to n).map { i =>
        val ts = t0 + (rnd.nextLong().abs % (3 * 3600)) * S +
          (rnd.nextLong().abs % 1000000) * 1000L // sub-second micros
        val tpe = if (rnd.nextBoolean()) "error" else "purchase"
        (i.toLong, ts, (i % 7).toLong, tpe)
      }
      rows.toDF("event_id", "ts", "user_id", "event_type")
        .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
        .write.parquet(s"$dir/events.parquet")
      val got = Relational.errorProximity(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // naive spec, computed directly from the fixture rows on the driver
      val errs = rows.filter(_._4 == "error")
      val purch = rows.filter(_._4 == "purchase")
      val want = errs.map { e =>
        e._1 -> purch.count(p => math.abs(e._2 / 1000 - p._2 / 1000) <= 300000000L).toLong
      }.toMap
      assert(got == want, s"trial $trial: binned join diverged from the naive spec")
    }
  }

  test("q108 containment catches a fully-contained doc whose Jaccard is far below the near-dup bar") {
    import spark.implicits._
    val dir = tmpDir("contain")
    val small = (1 to 12).map(i => s"w$i").mkString(" ")  // 10 shingles
    val big = (1 to 40).map(i => s"w$i").mkString(" ")    // 38 shingles ⊇ small's
    val other = (100 to 120).map(i => s"x$i").mkString(" ")
    Seq((1L, small, "en", "src0", 0L), (2L, big, "en", "src0", 0L),
        (3L, other, "en", "src1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = Pipeline.containmentPairs(spark, dir).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)),
      "expected exactly the contained pair (1,2)")
    assert(rows.head.getDouble(2) == 1.0, "full containment must score 1.0")
    // the same pair's Jaccard is 10/38 ≈ 0.26 — q24's symmetric bar would
    // never surface it; that asymmetry is this operator's reason to exist
    graft.core.Mat.releaseAll()
  }

  test("q108 containment: seeded random corpora match the brute-force overlap spec") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      val dir = tmpDir(s"containrand$trial")
      // small vocab → real shingle overlap; docs ≥ 5 tokens so the
      // whole-doc fold path (hash-only, not string-replicable) never fires
      val docs = (1 to 25).map { i =>
        val n = 5 + rnd.nextInt(20)
        i.toLong -> (1 to n).map(_ => s"t${rnd.nextInt(12)}").mkString(" ")
      }
      docs.map { case (id, text) => (id, text, "en", "src0", 0L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val got = Pipeline.containmentPairs(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // driver-side spec on shingle STRINGS (hash sets have identical
      // cardinalities modulo 64-bit collisions)
      def sh(t: String): Set[String] =
        t.split("\\s+").toSeq.sliding(3).map(_.mkString(" ")).toSet
      val want = (for {
        (a, ta) <- docs; (b, tb) <- docs if a < b
        inter = (sh(ta) & sh(tb)).size
        ov = inter.toDouble / math.min(sh(ta).size, sh(tb).size)
        if ov >= 0.9
      } yield (a, b) -> ov).toMap
      assert(got == want, s"trial $trial: containment diverged from brute force")
      graft.core.Mat.releaseAll()
    }
  }

  test("decontaminate flags exactly the train docs sharing an 8-gram with the eval set") {
    import spark.implicits._
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val dir = tmpDir("decon")
    Seq(
      (7L, s"e1 e2 $shared", "en", "src0", 0L),            // eval doc (id % 10 == 7)
      (0L, s"x1 x2 $shared x3", "en", "src0", 0L),         // train, contaminated
      (1L, (1 to 12).map(i => s"c$i").mkString(" "), "en", "src1", 0L)) // train, clean
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = Pipeline.decontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.keySet == Set(0L, 1L)) // eval docs excluded from the output
    assert(out(0L) == (1L, true))     // one distinct shared shingle
    assert(out(1L) == (0L, false))
    // the eval shingle set joins as a BROADCAST (the 100 TB shape: eval
    // suites are tiny vs the corpus — the corpus streams through one pass)
    val plan = Pipeline.decontaminate(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("leakageSafeSplit: cluster-atomic on the corpus; planted families match md5 ground truth") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // THE guarantee on the real corpus: no cluster spans two splits
    val out = Pipeline.leakageSafeSplit(spark, sfDir)
    val spans = out.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count()
    assert(spans == 0L, s"$spans clusters span >1 split")
    // planted fixture: 20 exact-duplicate pairs (2i, 2i+1). Ground truth
    // recomputed here from first principles (plain MessageDigest md5),
    // independent of the operator's Spark expressions.
    // family tokens fully disjoint across families, so the adjacent-
    // Jaccard edge source can never bridge two families (pair members are
    // exact copies; cross-family Jaccard is 0)
    val fixture = (0L until 40L)
      .map(id => (id, (1 to 12).map(j => s"fam${id / 2}tok$j").mkString(" ")))
      .toDF("doc_id", "text")
    val tmp = tmpDir("leak")
    fixture.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def bucket(id: Long): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      Integer.parseInt(hex, 16) % 100
    }
    def splitOf(b: Int) = if (b < 80) "train" else if (b < 90) "valid" else "test"
    val got = Pipeline.leakageSafeSplit(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getBoolean(3)))
      .toMap
    (0L until 40L).foreach { id =>
      val cid = (id / 2) * 2
      val expectSplit = splitOf(bucket(cid))
      val expectLeak = splitOf(bucket(cid)) != splitOf(bucket(cid + 1))
      assert(got(id) == ((cid, expectSplit, expectLeak)),
        s"doc $id: got ${got(id)}, expected ($cid, $expectSplit, $expectLeak)")
    }
    // sanity on the fixture itself: md5 over 20 pairs virtually always
    // tears at least one pair under the per-doc rule
    assert((0L until 40L by 2).exists(c =>
      splitOf(bucket(c)) != splitOf(bucket(c + 1))))
  }

  test("tokenBudgetSample matches a from-first-principles recomputation (md5 order, cumsum, budget)") {
    import org.apache.spark.sql.functions._
    // independent ground truth: plain Scala tokenization + MessageDigest
    // md5 ordering + running sum — none of the operator's Spark
    // expressions (a wrong window partition/order/frame fails here;
    // definition-restating assertions would not catch it)
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      var cum = 0L
      rows.map { case (id, src, text) =>
        (id, src, text.toLowerCase.split("\\s+").count(_.nonEmpty).toLong)
      }.sortBy { case (id, _, _) => (md5hex(id.toString), id) }
        .map { case (id, src, n) =>
          cum += n; id -> ((src, n, cum, cum <= 4096L))
        }
    }.toMap
    val got = Pipeline.tokenBudgetSample(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got.size == expect.size)
    expect.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: got ${got(id)}, expected $e")
    }
  }

  test("duplicatedSpans: planted shared 8-gram block lights up both docs, unique docs stay dark") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val block = (1 to 8).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"$block alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"iota kappa lambda mu nu xi omicron pi $block"),
      (3L, "solo tokens only here nothing shared across documents at all"))
      .toDF("doc_id", "text")
    val tmp = tmpDir("spans")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Pipeline.duplicatedSpans(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._2 == 1L && out(2L)._2 == 1L,
      s"each planted doc shares exactly the one 8-gram block: $out")
    assert(out(3L)._2 == 0L, "unique doc reported shared grams")
    assert(out(1L)._1 == 9L, s"doc 1 has 16 tokens -> 9 distinct 8-grams: $out")
  }

  test("repetitionMetrics: sorted-run top-bigram equals the group-count form") {
    import spark.implicits._
    val dir = tmpDir("rep")
    Seq(
      (0L, "a b a b a b a b", "en", "src0", 0L),                    // top 'a b' ×4 of 7
      (1L, (1 to 12).map(i => s"w$i").mkString(" "), "en", "src1", 0L), // all distinct
      (2L, "x", "en", "src2", 0L),                                  // single token
      (3L, "l1\nl2\nl1\nl1", "en", "src3", 0L))                     // duplicate lines
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val m = Pipeline.repetitionMetrics(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(0L).getAs[Int]("n_bigrams") == 7 && m(0L).getAs[Int]("top_bigram_n") == 4)
    assert(!m(0L).getAs[Boolean]("repetition_ok")) // 4/7 > 0.2
    assert(m(1L).getAs[Int]("top_bigram_n") == 1 && m(1L).getAs[Boolean]("repetition_ok"))
    assert(m(2L).getAs[Int]("n_bigrams") == 1)     // short doc: whole-text shingle
    assert(m(3L).getAs[Int]("n_lines") == 4 && m(3L).getAs[Double]("dup_line_frac") == 0.5)
    // parity with the explode → groupBy inverted-index form on the real
    // corpus: the zero-shuffle sorted-run trick computes the same number
    val docs = graft.core.Tables.documents(spark, sfDir)
    val groupForm = docs
      .select(col("doc_id"),
        explode(graft.functions.Dedup.shingles(
          graft.functions.Text.tokens(col("text")), 2)).as("g"))
      .groupBy("doc_id", "g").count()
      .groupBy("doc_id").agg(max("count").as("top_group"),
        count(lit(1)).as("nd_group"), sum("count").as("total_group"))
    val mismatch = Pipeline.repetitionMetrics(spark, sfDir)
      .join(groupForm, "doc_id")
      .filter(col("top_bigram_n") =!= col("top_group") ||
        col("n_bigrams") =!= col("total_group") ||
        round(lit(1.0) - col("nd_group").cast("double") / col("n_bigrams").cast("double"), 4)
          =!= col("dup_bigram_frac")).count()
    assert(mismatch == 0)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("chunkDocuments: W=32/S=24 windows — boundaries, tail, and content md5") {
    import spark.implicits._
    val dir = tmpDir("chunk")
    val toks70 = (1 to 70).map(i => s"t$i")
    Seq(
      (1L, toks70.mkString(" "), "en", "src0", 0L), // 70 toks -> 3 chunks
      (2L, "only five tokens right here", "en", "src1", 0L)) // 5 -> 1 chunk
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = Pipeline.chunkDocuments(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getString(3))).toMap
    assert(out.size == 4)
    assert(out((1L, 0))._1 == 32 && out((1L, 1))._1 == 32)
    assert(out((1L, 2))._1 == 22, "tail chunk holds the 22 remaining tokens")
    // chunk 1 starts at token 25 (overlap of 8 with chunk 0) — exact content
    assert(out((1L, 1))._2 == md5Hex(toks70.slice(24, 56).mkString(" ")))
    assert(out((2L, 0)) == ((5, md5Hex("only five tokens right here"))))
  }

  test("targetOverlapScore: bigram hits against the en vocabulary, exact counts") {
    import spark.implicits._
    val dir = tmpDir("dsir")
    Seq(
      (1L, "a b c d", "en", "src0", 0L),  // target: vocab {a b, b c, c d}
      (2L, "a b c x", "de", "src0", 0L),  // hits: a b, b c -> 2 of 3
      (3L, "z z z", "de", "src0", 0L),    // z z not in vocab -> 0 of 2
      (4L, "solo", "de", "src0", 0L))     // no bigrams -> null score
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val m = Pipeline.targetOverlapScore(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Boolean]("is_target") && m(1L).getAs[Long]("n_hits") == 3L)
    assert(m(2L).getAs[Long]("n_bigrams") == 3L && m(2L).getAs[Long]("n_hits") == 2L)
    assert(m(2L).getAs[Double]("overlap_score") == 2.0 / 3.0)
    assert(m(3L).getAs[Long]("n_hits") == 0L)
    assert(m(4L).getAs[Long]("n_bigrams") == 0L && m(4L).isNullAt(4))
  }

  test("vocabCoverage: exact counts; single-token source covers fully") {
    import spark.implicits._
    val dir = tmpDir("vocab")
    // src_a: 150 singleton types + 'common' x30; src_b: 'common' x10
    val aText = ((1 to 150).map(i => s"w$i") ++ Seq.fill(30)("common")).mkString(" ")
    (Seq((1L, aText, "en", "src_a", 0L)) ++
      (0 until 10).map(i => (10L + i, "common", "en", "src_b", 0L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val m = Pipeline.vocabCoverage(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("src_a").getAs[Long]("n_tokens") == 180L)
    assert(m("src_a").getAs[Long]("n_types") == 151L)
    assert(m("src_b").getAs[Long]("n_tokens") == 10L &&
      m("src_b").getAs[Long]("n_types") == 1L)
    // 'common' (40 occurrences) tops the global head, so src_b is fully
    // covered; src_a's coverage = (30 common + 99 tie-break singletons)/180
    assert(m("src_b").getAs[Double]("top100_coverage") == 1.0)
    assert(m("src_a").getAs[Double]("top100_coverage") == 129.0 / 180.0)
    assert(m("src_a").getAs[Double]("type_token_ratio") == 151.0 / 180.0)
  }

  test("curriculumBins: quartiles balanced and ordered by quality within each source") {
    val out = Pipeline.curriculumBins(spark, sfDir)
    import org.apache.spark.sql.functions._
    val bySrc = out.groupBy("source", "stage").count()
      .groupBy("source").agg((max("count") - min("count")).as("spread"),
                             countDistinct("stage").as("nstages"))
    assert(bySrc.filter(col("spread") > 1 || col("nstages") =!= 4).count() == 0,
      "ntile quartiles must be balanced (sizes differ by at most 1)")
    // stage boundaries respect the quality order: min(stage s) >= max(stage s+1)
    val b = out.groupBy("source", "stage")
      .agg(min("quality").as("lo"), max("quality").as("hi"))
    val viol = b.as("a").join(b.as("c"),
        col("a.source") === col("c.source") &&
        col("a.stage") + 1 === col("c.stage"))
      .filter(col("a.lo") < col("c.hi")).count()
    assert(viol == 0, "a later stage holds higher quality than an earlier one")
  }

  test("contaminationAttribution: argmax shared grams, ties to the lower eval id") {
    import spark.implicits._
    val dir = tmpDir("attr")
    def toks(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val x20 = toks("x", 20)                        // 13 grams
    val x15 = (1 to 15).map(i => s"x$i").mkString(" ") // 8 grams, all inside x20's
    val z8 = toks("z", 8)                          // exactly one 8-gram
    Seq(
      (1L, x20, "en", "src0", 0L),                 // train: 13 shared w/ eval 7, 8 w/ 17
      (2L, toks("y", 10), "en", "src0", 0L),       // train: clean
      (3L, z8, "en", "src0", 0L),                  // train: ties eval 27 vs 37
      (7L, x20, "en", "src0", 0L),                 // eval
      (17L, x15, "en", "src0", 0L),                // eval
      (27L, z8 + " " + toks("w", 4), "en", "src0", 0L), // eval: contains z-gram
      (37L, z8 + " " + toks("v", 4), "en", "src0", 0L)) // eval: contains z-gram too
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val m = Pipeline.contaminationAttribution(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m(1L) == ((7L, 13L)), s"doc 1 should attribute to eval 7: $m")
    assert(m(3L) == ((27L, 1L)), s"tie must break to the lower eval id: $m")
    assert(!m.contains(2L), "clean train doc must not appear")
  }

  test("lengthHistogram: power-of-two buckets from binary digit length") {
    import spark.implicits._
    val dir = tmpDir("lhist")
    val lens = Seq(1, 2, 3, 4, 7, 8)
    lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, (1 to n).map(j => s"t$j").mkString(" "), "en", "srcA", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val m = Pipeline.lengthHistogram(spark, dir).collect()
      .map(r => r.getInt(1) -> ((r.getLong(2), r.getInt(4), r.getInt(5)))).toMap
    assert(m == Map(
      1 -> ((1L, 1, 1)),   // n=1
      2 -> ((2L, 2, 3)),   // n in [2,3]
      3 -> ((2L, 4, 7)),   // n in [4,7]
      4 -> ((1L, 8, 8))))  // n=8
  }

  test("epochMix: per-doc copy counts equal floor(epochs) + md5-fractional share") {
    import spark.implicits._
    val dir = tmpDir("emix")
    def doc(id: Long, src: String) =
      (id, (1 to 100).map(i => s"t$i").mkString(" "), "en", src, 0L)
    // srcA: 400 tokens (4 docs), srcB: 100 tokens (1 doc)
    (Seq(doc(10, "srcA"), doc(11, "srcA"), doc(12, "srcA"), doc(13, "srcA"),
         doc(20, "srcB")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Pipeline.epochMix(spark, dir).groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tot = math.sqrt(400.0) + math.sqrt(100.0)
    def expected(id: Long, n: Double) = {
      val e = 1000000.0 * math.sqrt(n) / tot / n
      val b = Integer.parseInt(md5Hex(id.toString).substring(0, 4), 16) % 100
      e.toLong + (if (b.toDouble < (e - math.floor(e)) * 100.0) 1 else 0)
    }
    Seq(10L, 11L, 12L, 13L).foreach { id =>
      assert(got(id) == expected(id, 400.0), s"doc $id") }
    assert(got(20L) == expected(20L, 100.0))
  }

  test("crossSourceDups: planted exact-dup family attributes pairs to source pairs") {
    import spark.implicits._
    val dir = tmpDir("xsrc")
    val t = (1 to 60).map(i => s"v$i").mkString(" ")
    val other = (100 to 170).map(i => s"u$i").mkString(" ")
    Seq(
      (1L, t, "en", "src_x", 0L), (2L, t, "en", "src_y", 0L),
      (3L, t, "en", "src_x", 0L), (4L, other, "en", "src_y", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val m = Pipeline.crossSourceDups(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m == Map(("src_x", "src_x") -> 1L, ("src_x", "src_y") -> 2L))
  }

  test("q164 widened fallback: a starving filter falls back to nprobe=nlist") {
    import spark.implicits._
    // only 3 corpus vectors carry the filtered label (55/56/57, none in
    // the query panel) — EVERY query starves its probed cells (< k
    // matches exist anywhere), so every query must widen and return
    // exactly those 3 neighbors; a dead fallback would return 0-row or
    // partial panels the moment a filter gets selective
    val dir = tmpDir("fann-starve")
    (0L until 60L).map { i =>
      (i, Array.tabulate(64)(j => (((i * 31 + j * 7) % 13).toFloat - 6.0f)),
        if (i >= 55L && i <= 57L) 3 else 1)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = Pipeline.ivfPqFilteredTopK(spark, dir).collect()
    val byQuery = out.groupBy(_.getLong(0))
    assert(byQuery.size == 50, s"expected all 50 panel queries: ${byQuery.size}")
    byQuery.foreach { case (q, rows) =>
      assert(rows.forall(_.getBoolean(4)), s"query $q did not widen")
      assert(rows.map(_.getLong(2)).toSet == Set(55L, 56L, 57L),
        s"query $q neighbors: ${rows.map(_.getLong(2)).toSeq}")
      assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3),
        s"query $q ranks: ${rows.map(_.getInt(1)).toSeq}")
    }
    graft.core.Warehouse.sweepCorpus(spark, dir)
    graft.core.Mat.releaseAll(blocking = true)
  }
}
