package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class FunctionsSpec extends SparkSuite {

  test("tokens/tokenCount handle runs of whitespace") {
    import spark.implicits._
    val df = Seq("the  quick   brown fox", "", "one").toDF("text")
    val counts = df.select(Text.tokenCount(col("text"))).collect().map(_.getInt(0))
    assert(counts.toSeq == Seq(4, 0, 1))
  }

  test("quality score rises with stopwords, falls with punctuation") {
    import spark.implicits._
    val df = Seq(
      ("natural", "the cat sat on the mat and the dog is in a house"),
      ("noisy", "x;;;; y.... z!!!! ???? ;;;")
    ).toDF("kind", "text")
    val m = df.select(col("kind"), Text.qualityScore(col("text")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("natural") > 0.8)
    assert(m("noisy") < 0.2)
  }

  test("langId picks the language whose stopwords dominate") {
    import spark.implicits._
    val df = Seq(
      ("en", "the cat and the dog of the house"),
      ("de", "der hund und die katze ist nicht da"),
      ("fr", "le chat et la maison est une belle"),
      ("es", "el gato es una casa para los perros"),
      ("zh", "这是 中文 文本"),
      ("und", "qwerty zxcvb asdfg")
    ).toDF("expected", "text")
    val got = df.select(col("expected"), Text.langId(col("text")))
      .collect().map(r => r.getString(0) -> r.getString(1))
    got.foreach { case (exp, pred) => assert(pred == exp, s"expected $exp got $pred") }
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    import spark.implicits._
    val df = Seq("Hello   World", "hello world", "hello worlds").toDF("text")
    val fps = df.select(Text.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("shingles produce w-grams; short docs fall back to one joined gram") {
    import spark.implicits._
    val df = Seq("a b c d", "a b").toDF("text")
    val sh = df.select(Dedup.shingles(Text.tokens(col("text")), 3))
      .collect().map(_.getSeq[String](0))
    assert(sh(0).toSeq == Seq("a b c", "b c d"))
    assert(sh(1).toSeq == Seq("a b"))
  }

  test("minhash estimate ≈ exact jaccard for similar docs") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val similar = (1 to 38).map(i => s"tok$i").mkString(" ") + " x y"
    val different = (100 to 140).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, base), (2L, similar), (3L, different)).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidates(df, "doc_id", "text", k = 64, bands = 16,
      threshold = 0.3).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(!pairs.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }

  test("fused ShingleMinHash: MinHash signature properties") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"),          // identical text
      (3L, "a b c d e f g h i j k l"),  // superset: strictly more shingles
      (4L, "z y x w v u t s"),          // disjoint
      (5L, "a b"),                      // shorter than w → whole-doc shingle
      (6L, "a b")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(df, "doc_id", "text", k = 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // deterministic: identical token streams → identical signatures
    assert(sigs(1L) == sigs(2L))
    assert(sigs(5L) == sigs(6L))
    // monotone: a superset of shingles can only lower each family minimum
    sigs(1L).zip(sigs(3L)).foreach { case (s1, s3) => assert(s3 <= s1) }
    // discriminative: disjoint shingle sets share (almost surely) no minima
    assert(sigs(1L).zip(sigs(4L)).count { case (a, b) => a == b } <= 2)
    // estimator coherence: identical docs → est 1.0 through the whole
    // candidate pipeline; disjoint docs never become candidates
    val cands = Dedup.minhashCandidates(df, "doc_id", "text", threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cands((1L, 2L)) == 1.0)
    assert(!cands.keySet.exists { case (a, b) => b == 4L || a == 4L })
    // the Generate barrier holds: the plan carries sig as a concrete
    // attribute (Generate explode), not an inlined projection per reference
    val plan = Dedup.minhashSignatures(df, "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Generate"))
  }

  test("ngramJaccard: identical → 1, disjoint → 0") {
    import spark.implicits._
    val df = Seq(("a b c d e", "a b c d e", 1.0), ("a b c d e", "x y z w v", 0.0))
      .toDF("ta", "tb", "expected")
    df.select(Dedup.ngramJaccard(col("ta"), col("tb")).as("j"), col("expected"))
      .collect().foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("simhash: near-identical docs within small hamming distance, disjoint far") {
    import spark.implicits._
    val a = (1 to 60).map(i => s"tok$i").mkString(" ")
    val b = (1 to 58).map(i => s"tok$i").mkString(" ") + " q r"
    val c = (200 to 260).map(i => s"tok$i").mkString(" ")
    val df = Seq(("a", a), ("b", b), ("c", c)).toDF("k", "text")
      .select(col("k"), Dedup.simhash(Text.tokens(col("text"))).as("sh"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(m("a"), m("b")) < 12)
    assert(ham(m("a"), m("c")) > 20)
  }

  test("cosine: orthogonal → 0, identical → 1") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 2f), Array(1f, 2f), 1.0),
      (Array(1f, 0f), Array(-1f, 0f), -1.0)
    ).toDF("a", "b", "expected")
    df.select(Vectors.cosine(col("a"), col("b")).as("c"), col("expected"))
      .collect().foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("fused cosine expression matches the higher-order composition bit-for-bit") {
    import spark.implicits._
    val emb = graft.core.Tables.embeddings(spark, sfDir).limit(50)
    val pairs = emb.select(col("vec_id").as("ida"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("idb"), col("embedding").as("b")))
      .filter(col("ida") < col("idb"))
    val diffs = pairs.select(
        Vectors.cosine(col("a"), col("b")).as("fused"),
        Vectors.cosineHof(col("a"), col("b")).as("hof"))
      .filter(col("fused") =!= col("hof")).count()
    assert(diffs == 0)
  }

  test("fused cosine: zero vector yields null, not NaN") {
    import spark.implicits._
    val df = Seq((Array(0f, 0f), Array(1f, 2f))).toDF("a", "b")
    assert(df.select(Vectors.cosine(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("embeddingNearDups: pairs are deduped, thresholded, symmetric-free") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0.99f, 0.14f, 0f)),
      (3L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val dups = Dedup.embeddingNearDups(vecs, "vec_id", "embedding",
      dim = 3, threshold = 0.9, bitsPerTable = 2, nTables = 4).collect()
    assert(dups.forall(r => r.getLong(0) < r.getLong(1)))
    assert(dups.forall(_.getDouble(2) >= 0.9))
  }

  test("lshSignatures: deterministic, scale-invariant, sign-flips under negation") {
    import spark.implicits._
    val v = Array(0.3f, -1.2f, 0.7f, 2.1f)
    val df = Seq(("v", v), ("v2", v), ("scaled", v.map(_ * 7f)),
      ("neg", v.map(-_))).toDF("name", "vec")
    val sigs = df.select(col("name"),
        Vectors.lshSignatures(col("vec"), dim = 4, bitsPerTable = 5, nTables = 3).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(sigs("v") == sigs("v2"))       // deterministic
    assert(sigs("v") == sigs("scaled"))   // cosine LSH ignores magnitude
    // negating the vector flips every projection's sign (none lands on 0)
    val mask = (1 << 5) - 1
    assert(sigs("neg") == sigs("v").map(s => ~s & mask))
  }

  test("adaptiveBits tracks corpus size and clamps") {
    assert(Vectors.adaptiveBits(500) == 4)
    assert(Vectors.adaptiveBits(2000) == 6)
    assert(Vectors.adaptiveBits(200000) == 13)
    assert(Vectors.adaptiveBits(1) == 4)                    // min clamp
    assert(Vectors.adaptiveBits(1000000000L) == 25)
    assert(Vectors.adaptiveBits(Long.MaxValue / 2) == 26)   // max clamp
    // monotone non-decreasing over a sweep
    val bits = (1 to 30).map(i => Vectors.adaptiveBits(1L << i))
    assert(bits == bits.sorted)
  }

  test("LSH candidate count grows ~O(n), not O(n²), across scale factors") {
    // n=500 (sf0.01) vs n=2000 (sf0.1): with adaptive bits the expected
    // bucket size is constant, so candidates should scale ~4× (linear),
    // far below the 16× a fixed bucket count would produce.
    val small = Vectors.lshSelfPairs(
      graft.core.Tables.embeddings(spark, sf001Dir),
      "vec_id", "embedding", dim = 64).count()
    val large = Vectors.lshSelfPairs(
      graft.core.Tables.embeddings(spark, sf01Dir),
      "vec_id", "embedding", dim = 64).count()
    assert(small > 0 && large > 0)
    val ratio = large.toDouble / small.toDouble
    assert(ratio < 8.0, s"candidate growth $ratio looks super-linear (small=$small large=$large)")
  }

  test("lshSelfPairs minCos pushdown emits the same pairs as post-filtering") {
    val emb = graft.core.Tables.embeddings(spark, sf001Dir)
    val pushed = Vectors.lshSelfPairs(emb, "vec_id", "embedding", dim = 64,
        minCos = 0.4)
      .select("query_id", "neighbor_id", "cos_sim").collect().toSet
    val post = Vectors.lshSelfPairs(emb, "vec_id", "embedding", dim = 64)
      .filter(col("cos_sim") >= 0.4)
      .select("query_id", "neighbor_id", "cos_sim").collect().toSet
    assert(pushed == post)
    assert(pushed.nonEmpty)
  }

  test("lshScoredPairs finds planted increment copies with guaranteed recall") {
    val emb = graft.core.Tables.embeddings(spark, sf001Dir)
    val corpus = emb.filter(col("vec_id") % 2 === 0)
    // queries = exact copies of 10 corpus vectors, re-keyed above the space
    val queries = corpus.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val hits = Vectors.lshScoredPairs(corpus, queries, "vec_id", "embedding",
        dim = 64, minCos = 0.99)
      .collect().map(r => r.getLong(0) - 100000 -> r.getLong(1)).toSet
    // every planted copy must surface exactly its source (identical
    // vectors collide in every table; nothing else scores >= 0.99)
    assert(hits == corpus.filter(col("vec_id") < 20)
      .select("vec_id").collect().map(r => r.getLong(0) -> r.getLong(0)).toSet)
  }

  test("IVF: nprobe == nlist degenerates to exact brute-force top-k") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    val model = Ivf.train(emb, "vec_id", "embedding", dim = 64, nlist = 8)
    assert(model.centroids.length == 8)
    assert(model.centroids.forall(_._2.length == 64))
    val ivf = Ivf.topK(emb, queries, "vec_id", "embedding", 64, k = 5,
        model, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val exact = Vectors.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(ivf.sortBy(t => (t._1, t._2)).toSeq == exact.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("IVF: seedModel centroids are the nlist lowest-id vectors, in id order") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val m = Ivf.seedModel(emb, "vec_id", "embedding", nlist = 4)
    assert(m.centroids.map(_._1) == Seq(0, 1, 2, 3))
    val expected = emb.orderBy(col("vec_id")).limit(4).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq)
    assert(m.centroids.map(_._2.toSeq) == expected.toSeq)
    // at nprobe == nlist the seeded layout degenerates to brute force
    // exactly like the trained one (the q152 exact_at_full contract)
    val queries = emb.filter(col("vec_id") < 5)
    val ivf = Ivf.topK(emb, queries, "vec_id", "embedding", 64, k = 3,
        m, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    val exact = Vectors.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(ivf.toSeq == exact.toSeq)
  }

  test("IVF: partial probing keeps useful recall at a fraction of the scan") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 20)
    val model = Ivf.train(emb, "vec_id", "embedding", dim = 64, nlist = 8)
    val ivfTop1 = Ivf.topK(emb, queries, "vec_id", "embedding", 64, k = 1,
        model, nprobe = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val exactTop1 = Vectors.bruteForceTopK(emb, queries, "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // every query answers from its probed cells…
    assert(ivfTop1.keySet == exactTop1.keySet)
    // …and ≥ half find the TRUE nearest neighbor while scanning 3/8 of the
    // corpus (deterministic: seeded init, fixed iterations)
    val recall = exactTop1.count { case (q, nn) => ivfTop1.get(q).contains(nn) }
    assert(recall >= exactTop1.size / 2, s"top-1 recall $recall/${exactTop1.size}")
  }

  test("GraftExtensions: native expressions callable from SQL") {
    graft.GraftExtensions.register(spark)
    val cos = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(0.6D, 0.8D)) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(cos - 0.6) < 1e-12)
    val sig = spark.sql(
      "SELECT shingle_minhash(split('a b c d e', ' '), 3, 16) AS s")
      .collect().head.getSeq[Int](0)
    assert(sig.length == 16)
    // literal-argument contract is enforced
    intercept[Exception] {
      spark.sql("SELECT shingle_minhash(array('a'), 1 + 2, 16)").collect()
    }
    // the extensions class itself wires the same builders
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext) // must not throw
  }

  test("fused simhash64 is bit-identical to the composed built-in form") {
    // real corpus text + crafted edges: empty doc, single token, duplicated
    // tokens, reversed order (the invariance surfaces), unicode
    import spark.implicits._
    val edges = Seq("", "one", "a b c d e f g", "g f e d c b a",
      "a a b b c c", "中文 токены mixed 123").toDF("text")
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("text")).limit(200).union(edges)
    val toks = Text.tokens(col("text"))
    val mismatches = docs
      .select(Dedup.simhash(toks).as("fused"),
              Dedup.simhashComposed(toks).as("composed"))
      .filter(col("fused") =!= col("composed")).count()
    assert(mismatches == 0)
    // registered as a SQL function
    graft.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT simhash64(split('a b c', ' ')) AS s").collect().head.getLong(0)
    val viaCol = edges.sparkSession.range(1)
      .select(Dedup.simhash(split(lit("a b c"), " "))).collect().head.getLong(0)
    assert(viaSql == viaCol)
  }

  test("materialization lifecycle: storage returns to baseline after consume + releaseAll") {
    // The daemon-session invariant (VERDICT r2 #1): operators that
    // checkpoint intermediates must not pin blocks forever. Intermediates
    // (banded signatures, LSH buckets, k-means sample) are scoped and
    // released inside the operator; RESULT frames are tracked and drained
    // by the session owner at its boundary — after which the session holds
    // ZERO persistent RDDs.
    graft.core.Mat.releaseAllScopes(blocking = false) // clean slate regardless of test order/threads
    val docs = graft.core.Tables.documents(spark, sfDir)
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    assert(Dedup.minhashCandidates(docs, "doc_id", "text", threshold = 0.2).count() >= 0)
    assert(Vectors.lshSelfPairs(emb, "vec_id", "embedding", dim = 64).count() > 0)
    val model = Ivf.train(emb, "vec_id", "embedding", dim = 64, nlist = 4)
    assert(model.centroids.length == 4)
    assert(graft.core.Mat.liveCount > 0) // results are tracked, not leaked anonymously
    graft.core.Mat.releaseAll()
    assert(graft.core.Mat.liveCountAllScopes == 0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked storage blocks: ${spark.sparkContext.getPersistentRDDs.keys}")
  }

  test("minhash band buckets are capped: a duplicate-heavy corpus stays bounded") {
    // duplicate-heavy input is the NORMAL case for a dedup pass: 5000
    // identical docs collide in EVERY band. Uncapped, one bucket yields
    // C(5000,2) ≈ 12.5M candidate pairs (quadratic in the family size);
    // capped, the lowest `bucketCap` ids survive deterministically in every
    // band and the pair count is exactly C(cap, 2).
    val text = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = spark.range(5000).select(col("id").as("doc_id"), lit(text).as("text"))
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text",
      threshold = 0.5, bucketCap = 32)
    assert(pairs.count() == 32L * 31 / 2)
    // deterministic lowest-id survivors — same ids in every band
    val maxId = pairs.agg(max("id_b")).collect()(0).getLong(0)
    assert(maxId == 31L)
    // all survivors are exact dups of each other: estimated jaccard is 1
    assert(pairs.filter(col("est_jaccard") < 1.0).count() == 0)
    graft.core.Mat.releaseAll()
  }

  test("IVF hash-mod sampling bounds the training set and stays deterministic") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val m1 = Ivf.train(emb, "vec_id", "embedding", dim = 64, nlist = 4, maxSample = 50)
    val m2 = Ivf.train(emb, "vec_id", "embedding", dim = 64, nlist = 4, maxSample = 50)
    assert(m1.centroids == m2.centroids) // partition-independent determinism
    assert(m1.centroids.length == 4)
    // a bounded-sample model still answers exactly when every cell is probed
    val queries = emb.filter(col("vec_id") < 5)
    val ivf = Ivf.topK(emb, queries, "vec_id", "embedding", 64, k = 3, m1, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val exact = Vectors.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(ivf.sortBy(t => (t._1, t._2)).toSeq == exact.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("semanticDedup keeps the lowest id of each identical family, co-locates dups") {
    import spark.implicits._
    // 4 orthogonal directions, each planted 3×: whatever the quantizer does,
    // identical vectors share a cell (deterministic argmax) and orthogonal
    // pairs score cosine 0 < threshold — so the keep set is exactly the
    // min id of each family, independent of cluster composition
    val dirs = Seq(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
                   Array(0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 1f))
    val rows = for (d <- 0 until 4; c <- 0 until 3) yield (d * 3L + c, dirs(d))
    val df = rows.toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(df, "vec_id", "embedding", dim = 4,
      nlist = 4, threshold = 0.97)
    val kept = out.filter(col("keep")).collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(0L, 3L, 6L, 9L))
    val cells = out.select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (d <- 0 until 4)
      assert(cells(d * 3L) == cells(d * 3L + 1) && cells(d * 3L) == cells(d * 3L + 2))
    graft.core.Mat.releaseAll()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("semanticDedup clusterCap bounds the scored set; past-cap rows are kept unscored") {
    import spark.implicits._
    val v = Array(1f, 0f)
    val df = (0L until 5L).map(i => (i, v)).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(df, "vec_id", "embedding", dim = 2,
      nlist = 1, threshold = 0.97, clusterCap = 2)
    // ids 0,1 are scored (1 dominated by 0); 2,3,4 are past the cap —
    // kept un-scored rather than scanned quadratically
    val kept = out.filter(col("keep")).collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(0L, 2L, 3L, 4L))
    graft.core.Mat.releaseAll()
  }

  test("minhashCandidatesAgainst finds planted increment-vs-corpus near-dups only") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i")
    val corpus = Seq(
      (0L, base.mkString(" ")),
      (1L, (1 to 40).map(i => s"other$i").mkString(" "))).toDF("doc_id", "text")
    // increment: id 4 duplicates corpus doc 0 exactly (every band matches —
    // guaranteed candidate); id 14 is a 1-token mutation (bands match with
    // high probability, deterministic for fixed hash seeds); id 9 is noise
    val inc = Seq(
      (4L, base.mkString(" ")),
      (14L, base.updated(5, "mutA").mkString(" ")),
      (9L, (1 to 40).map(i => s"noise$i").mkString(" "))).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidatesAgainst(corpus, inc, "doc_id", "text",
      threshold = 0.3).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((4L, 0L)), s"exact dup pair missing: ${pairs.toSeq}")
    assert(pairs.toSet.subsetOf(Set((4L, 0L), (14L, 0L))),
      s"noise produced pairs: ${pairs.toSeq}")
    graft.core.Mat.releaseAll()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("simhashCandidates: token-reorder dups always pair (Hamming 0); bound respected") {
    import spark.implicits._
    val words = (1 to 40).map(i => s"w$i")
    val docs = Seq(
      (0L, words.mkString(" ")),
      (1L, words.reverse.mkString(" ")),            // same multiset → Hamming 0
      (2L, (1 to 40).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.simhashCandidates(docs, "doc_id", "text").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    // the reorder dup is guaranteed: all 4 bands match exactly
    assert(got.get((0L, 1L)).contains(0), s"reorder dup not found: $got")
    // every returned pair honors the Hamming bound
    assert(got.values.forall(_ <= 3))
    graft.core.Mat.releaseAll()
  }

  test("bruteForceTopK returns k ranked neighbors excluding self") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0.9f, 0.1f, 0f)),
      (2L, Array(0f, 1f, 0f)), (3L, Array(0.95f, 0.05f, 0f)))
      .toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 0L)
    val top = Vectors.bruteForceTopK(vecs, q, "vec_id", "embedding", 2).collect()
    assert(top.length == 2)
    assert(top.map(_.getLong(2)).toSeq == Seq(3L, 1L)) // ranked by cosine
    assert(top.forall(_.getLong(0) == 0L))
  }

  test("quantizeInt8: extremes land exactly on ±127, zero vector stays zero") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(2f, -2f, 1f, 0f)),   // m=2: exact ±127, midpoint, zero
      (1L, Array(0f, 0f, 0f, 0f)),    // all-zero: no div-by-zero, all 0
      (2L, Array(-0.5f, 0.25f, 0.5f, -0.125f))) // negative max magnitude
      .toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"), Vectors.quantizeInt8(col("embedding")).as("q"),
        Vectors.dotLong(Vectors.quantizeInt8(col("embedding")),
                        Vectors.quantizeInt8(col("embedding"))).as("nsq"),
        Vectors.l1Long(Vectors.quantizeInt8(col("embedding"))).as("l1"))
      .orderBy("vec_id").collect()
    assert(out(0).getSeq[Int](1) == Seq(127, -127, 64, 0)) // floor(63.5+0.5)=64
    assert(out(1).getSeq[Int](1) == Seq(0, 0, 0, 0))
    // m=0.5: -0.5→-127, 0.25→floor(64)=64, 0.5→127, -0.125→floor(-31.25)=-32
    assert(out(2).getSeq[Int](1) == Seq(-127, 64, 127, -32))
    assert(out(0).getLong(2) == 127L*127 + 127L*127 + 64L*64)
    assert(out(0).getLong(3) == 127L + 127 + 64)
  }

  test("pq_encode: zero-distance self-codes, lowest-index tie-break; adc_score manual") {
    import spark.implicits._
    import graft.expressions.VectorExpressions
    // 2 subspaces × 2 dims, 3 centroids; centroids 1 and 2 are identical
    // in subspace 1 (tie → lowest index)
    val cb = Array(
      /* s=0 */ 1, 2,   10, 20,   5, 5,
      /* s=1 */ 3, 4,   -7, -8,   -7, -8)
    val df = Seq(
      (0L, Array(1, 2, 3, 4)),     // = centroid 0 in both subspaces
      (1L, Array(10, 20, -7, -8)), // s0 → 1; s1 ties between 1,2 → 1
      (2L, Array(6, 6, 0, 0)))     // s0: d(c0)=41,d(c1)=212,d(c2)=2 → 2; s1: d(c0)=25,d(c1/2)=113 → 0
      .toDF("vec_id", "v")
    val out = df.select(col("vec_id"),
        VectorExpressions.pq_encode(col("v"), cb, 2, 3, 2).as("codes"))
      .orderBy("vec_id").collect()
    assert(out(0).getSeq[Int](1) == Seq(0, 0))
    assert(out(1).getSeq[Int](1) == Seq(1, 1))
    assert(out(2).getSeq[Int](1) == Seq(2, 0))
    // ADC: query (1,1,1,1) vs codes (2,1): dot((1,1),(5,5)) + dot((1,1),(-7,-8))
    val adc = Seq((Array(1, 1, 1, 1), Array(2, 1))).toDF("q", "codes")
      .select(VectorExpressions.adc_score(col("q"), col("codes"), cb, 2, 3, 2))
      .head().getLong(0)
    assert(adc == (5 + 5) + (-7 - 8))
  }

  test("int8_dot fused expression is bit-identical to the HOF composition") {
    import spark.implicits._
    val df = graft.core.Tables.embeddings(spark, sf001Dir)
      .select(col("vec_id"), Vectors.quantizeInt8(col("embedding")).as("q"))
    val pairs = df.as("a").join(df.as("b"),
      col("a.vec_id") + 1 === col("b.vec_id"))
    val diff = pairs.select(
        Vectors.dotLong(col("a.q"), col("b.q")).as("fused"),
        Vectors.dotLongHof(col("a.q"), col("b.q")).as("hof"))
      .filter(col("fused") =!= col("hof")).count()
    assert(diff == 0L)
    // and the empty/degenerate shape: zero-length arrays dot to 0
    val z = Seq((Array.empty[Int], Array.empty[Int])).toDF("x", "y")
      .select(Vectors.dotLong(col("x"), col("y"))).head().getLong(0)
    assert(z == 0L)
  }

  test("int8QuantRecall: panel shape, rank bounds, top1_float matches brute force") {
    val out = graft.operators.Pipeline.int8QuantRecall(spark, sf001Dir)
    val rows = out.collect()
    assert(rows.length == 50)
    assert(rows.forall(r => r.getInt(3) >= 0 && r.getInt(3) <= 10))
    // the float-side top-1 must agree with the established brute-force path
    val emb = graft.core.Tables.embeddings(spark, sf001Dir)
    val expected = Vectors.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 50), "vec_id", "embedding", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.foreach { r =>
      assert(r.getLong(4) == expected(r.getLong(0)),
        s"query ${r.getLong(0)}: float top1 ${r.getLong(4)} != brute ${expected(r.getLong(0))}")
    }
    // int8 at 64 dims preserves most of the ranking: sane quality floor
    val meanOverlap = rows.map(_.getInt(3)).sum.toDouble / rows.length
    assert(meanOverlap >= 8.0, s"int8 top-10 overlap degraded to $meanOverlap")
  }

  test("trainedPqCodebook: deterministic, materially lower distortion than seeded") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val M = 8; val K = 16; val DSUB = 8
    val t1 = Vectors.trainedPqCodebook(emb, "vec_id", "embedding", M, K, DSUB)
    val t2 = Vectors.trainedPqCodebook(emb, "vec_id", "embedding", M, K, DSUB)
    assert(t1.sameElements(t2), "trained codebook not deterministic")
    val seed = Vectors.seededPqCodebook(emb, "vec_id", "embedding", M, K, DSUB)
    assert(!t1.sameElements(seed))
    val quant = emb.select(Vectors.quantizeInt8(col("embedding")).as("qv"))
    def dist(cb: Array[Int]): Long = quant.select(
      sum(Vectors.pqDistortion(col("qv"),
        graft.expressions.VectorExpressions.pq_encode(col("qv"), cb, M, K, DSUB),
        cb, M, K, DSUB))).head().getLong(0)
    val ds = dist(seed); val dt = dist(t1)
    // q162's contract bar: Lloyd training must cut quantization distortion
    // by ≥15% (measured ~25% on this corpus)
    assert(dt * 100 <= ds * 85, s"trained distortion $dt not ≤ 0.85 × seeded $ds")
    // r13: a sample smaller than k must fail LOUD (the seeded path's
    // require), never train on silently-zero centroids
    val tiny = emb.filter(col("vec_id") < K - 1)
    val e = intercept[IllegalArgumentException] {
      Vectors.trainedPqCodebook(tiny, "vec_id", "embedding", M, K, DSUB)
    }
    assert(e.getMessage.contains("corpus too small"), e.getMessage)
    graft.core.Mat.releaseAll()
  }

  test("pqDistortion matches a driver-side brute-force min-distance sum") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).filter(col("vec_id") < 20)
    val M = 8; val K = 16; val DSUB = 8
    val cb = Vectors.seededPqCodebook(
      graft.core.Tables.embeddings(spark, sfDir), "vec_id", "embedding", M, K, DSUB)
    val quant = emb.select(Vectors.quantizeInt8(col("embedding")).as("qv"))
    val engine = quant.select(
      sum(Vectors.pqDistortion(col("qv"),
        graft.expressions.VectorExpressions.pq_encode(col("qv"), cb, M, K, DSUB),
        cb, M, K, DSUB))).head().getLong(0)
    val brute = quant.collect().map { r =>
      val q = r.getSeq[Int](0)
      (0 until M).map { s =>
        (0 until K).map { j =>
          (0 until DSUB).map { i =>
            val d = (q(s * DSUB + i) - cb((s * K + j) * DSUB + i)).toLong
            d * d
          }.sum
        }.min
      }.sum
    }.sum
    assert(engine == brute, s"pqDistortion $engine != brute-force $brute")
  }

  test("minhash banding rejects invalid k/bands configs loudly") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f"), (2L, "g h i j k l")).toDF("doc_id", "text")
    // bands > k → r = 0: every row would hash an EMPTY slice into ONE
    // bucket and search silently collapses to the cap's lowest ids
    val e1 = intercept[IllegalArgumentException](
      Dedup.minhashCandidates(docs, "doc_id", "text", k = 8, bands = 16))
    assert(e1.getMessage.contains("banding"), e1.getMessage)
    // non-dividing k silently drops trailing signature components
    intercept[IllegalArgumentException](
      Dedup.minhashCandidates(docs, "doc_id", "text", k = 10, bands = 4))
    intercept[IllegalArgumentException](
      Dedup.minhashCandidatesAgainst(docs, docs, "doc_id", "text",
        k = 10, bands = 4))
    intercept[IllegalArgumentException](
      Dedup.writeSignatureTable(docs, "doc_id", "text", "graft_badband_t",
        k = 8, bands = 16))
    intercept[IllegalArgumentException](
      Dedup.minhashCandidatesAgainstTable(spark, "graft_any_t", docs,
        "doc_id", "text", k = 10, bands = 4))
    // the valid production config still passes the guard
    assert(Dedup.minhashCandidates(docs, "doc_id", "text",
      k = 48, bands = 12).columns.nonEmpty)
  }

  test("cosine_sim / int8_dot / lsh_signatures fail loud on dimension mismatch") {
    import spark.implicits._
    def rootMsgs(t: Throwable): String = {
      val sb = new StringBuilder
      var c: Throwable = t
      while (c != null) { sb.append(Option(c.getMessage).getOrElse("")); c = c.getCause }
      sb.toString
    }
    // a 512-vs-768-dim config drift used to silently truncate to the
    // shorter vector and score plausible-but-wrong similarities
    // corpus-wide — now the same loud posture as the PQ kernels
    val mism = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    val e1 = intercept[Throwable](mism.select(
      graft.expressions.VectorExpressions.cosine_sim(col("a"), col("b"))).collect())
    assert(rootMsgs(e1).contains("cosine_sim"), s"unexpected: $e1")
    val mismI = Seq((Seq(1, 2, 3), Seq(1, 2))).toDF("a", "b")
    val e2 = intercept[Throwable](mismI.select(
      graft.expressions.VectorExpressions.int8_dot(col("a"), col("b"))).collect())
    assert(rootMsgs(e2).contains("int8_dot"), s"unexpected: $e2")
    // lsh_signatures: vector shorter than the plane dimension
    val planes = Array.fill(2 * 4 * 3)(0.5) // 2 tables × 4 bits × dim 3
    val shortV = Seq(Tuple1(Seq(1.0f, 2.0f))).toDF("v")
    val e3 = intercept[Throwable](shortV.select(
      graft.expressions.VectorExpressions.lsh_signatures(col("v"), planes, 4, 2))
      .collect())
    assert(rootMsgs(e3).contains("lsh_signatures"), s"unexpected: $e3")
    // equal dims still score
    val ok = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("a", "b")
      .select(graft.expressions.VectorExpressions.cosine_sim(col("a"), col("b")))
      .collect().head.getDouble(0)
    assert(math.abs(ok - 1.0) < 1e-9)
  }

  test("PQ kernels fail loud on corrupt input, never mis-score silently") {
    import spark.implicits._
    def rootMsgs(t: Throwable): String = {
      val sb = new StringBuilder
      var c: Throwable = t
      while (c != null) { sb.append(Option(c.getMessage).getOrElse("")); c = c.getCause }
      sb.toString
    }
    val cb = Array.fill(8 * 16 * 8)(1)
    // encode input shorter than m*dsub
    val shortIn = Seq(Tuple1(Seq.fill(7)(1))).toDF("qv")
    val e1 = intercept[Throwable] {
      shortIn.select(graft.expressions.VectorExpressions
        .pq_encode(col("qv"), cb, 8, 16, 8)).collect()
    }
    assert(rootMsgs(e1).contains("pq_encode"), s"unexpected: $e1")
    // ADC with an out-of-range code (would index the next subspace's
    // centroids in the flattened codebook)
    val badCode = Seq((Seq.fill(64)(1), Seq.fill(8)(99))).toDF("qv", "codes")
    val e2 = intercept[Throwable] {
      badCode.select(graft.expressions.VectorExpressions
        .adc_score(col("qv"), col("codes"), cb, 8, 16, 8)).collect()
    }
    assert(rootMsgs(e2).contains("adc_score"), s"unexpected: $e2")
    // ADC with a truncated codes array
    val shortCodes = Seq((Seq.fill(64)(1), Seq.fill(3)(0))).toDF("qv", "codes")
    val e3 = intercept[Throwable] {
      shortCodes.select(graft.expressions.VectorExpressions
        .adc_score(col("qv"), col("codes"), cb, 8, 16, 8)).collect()
    }
    assert(rootMsgs(e3).contains("adc_score"), s"unexpected: $e3")
    // the happy path still scores: code 0 everywhere = Σ dot(q, centroid0)
    val ok = Seq((Seq.fill(64)(2), Seq.fill(8)(0))).toDF("qv", "codes")
      .select(graft.expressions.VectorExpressions
        .adc_score(col("qv"), col("codes"), cb, 8, 16, 8)).head().getLong(0)
    assert(ok == 2L * 64L) // every product 2*1, 64 terms
  }

  test("codebook memo is eviction-bounded: crossing the cap clears, then reloads") {
    // a daemon cycling unbounded distinct artifacts (per-tempdir test
    // warehouses, many corpora) must not grow the memo forever; past the
    // cap the map clears and a later hit re-reads — an amortization cost,
    // never a correctness one
    val loads = new java.util.concurrent.atomic.AtomicInteger(0)
    def load(i: Int): Array[Int] = { loads.incrementAndGet(); Array(i) }
    val first = Vectors.memoCodebook("evict-spec-key-0", () => load(0))
    assert(first.sameElements(Array(0)))
    // warm hit: no reload
    Vectors.memoCodebook("evict-spec-key-0", () => load(0))
    assert(loads.get() == 1)
    // blow past the cap with distinct keys (other specs may have seeded
    // entries — the cap is a threshold, so over-filling is fine)
    (1 to Vectors.CodebookMemoMax + 2).foreach(i =>
      Vectors.memoCodebook(s"evict-spec-key-$i", () => load(i)))
    // the original key was evicted by the threshold clear: reload happens
    val before = loads.get()
    val again = Vectors.memoCodebook("evict-spec-key-0", () => load(0))
    assert(again.sameElements(Array(0)))
    assert(loads.get() == before + 1,
      "key-0 should have been evicted by the threshold clear and reloaded")
  }
}
