package graft.functions

import graft.SparkSuite

class BpeSpec extends SparkSuite {

  test("train: classic pair-frequency merges with deterministic tie-break") {
    // "abab"×3 + "abc"×2 → pair freqs (a,b)=8, (b,a)=3, (b,c)=2
    val m = Bpe.train(Map("abab" -> 3L, "abc" -> 2L), 2)
    assert(m.head == ("a", "b"))
    // after merge 1: [ab,ab]×3 and [ab,c]×2 → (ab,ab)=3 beats (ab,c)=2
    assert(m(1) == ("ab", "ab"))
  }

  test("trainOnCorpus: distributed word counts feed the exact local trainer") {
    import spark.implicits._
    // planted fixture: known frequencies, a tie the ordering must break
    val docs = Seq("abab abab abc", "abab ABC xyz 123", "xyz? abab").toDF("text")
    val got = Bpe.trainOnCorpus(docs, "text", nMerges = 3)
    // local twin over hand-counted frequencies: abab×4, abc×2, xyz×2
    val want = Bpe.train(Map("abab" -> 4L, "abc" -> 2L, "xyz" -> 2L), 3)
    assert(got == want, s"got $got want $want")
    // corpus contract: distributed == local trainer over the same text
    // (two pre-token paths — SQL regexp vs java regex — one merge loop)
    val corpus = graft.core.Tables.documents(spark, sfDir)
    val localFreqs = corpus.select("text").collect()
      .flatMap(r => "[a-z]+".r.findAllIn(r.getString(0).toLowerCase(java.util.Locale.ROOT)))
      .groupBy(identity).map { case (w, o) => w -> o.length.toLong }
    assert(Bpe.trainOnCorpus(corpus, "text", 24) == Bpe.train(localFreqs, 24))
    // and the checked-in fixture IS what training on this corpus family
    // produces at sf0.01 (provenance note on `merges`): shape-check only
    assert(Bpe.trainOnCorpus(corpus, "text", 24).length == 24)
  }

  test("encode: staged fold equals the delimited-string replace reference (the oracle's form)") {
    // independent reference mirroring SparkEntry's generated DuckDB SQL:
    // java String.replace is left-to-right non-overlapping, like DuckDB's
    def refEncode(w: String): Int = {
      var s = "|" + w.map(_.toString).mkString("||") + "|"
      Bpe.merges.foreach { case (a, b) => s = s.replace(s"|$a||$b|", s"|$a$b|") }
      s.split("\\|\\|").length
    }
    val words = Seq("join", "hash", "batch", "scan", "customer", "window",
      "a", "er", "stream", "vector", "xyzzy", "partition", "aaa", "rowrow")
    words.foreach { w =>
      assert(Bpe.encode(w).length == refEncode(w), s"word $w")
    }
  }

  test("encode reconstructs trained whole words; unseen words stay granular") {
    assert(Bpe.encode("join") == List("join"))
    assert(Bpe.encode("hash") == List("hash"))
    assert(Bpe.encode("batch") == List("batch"))
    assert(Bpe.encode("xq").length == 2)
  }

  test("mergedTokenCounts: hand-computed counts over a tiny frame") {
    import spark.implicits._
    val df = Seq((1L, "join hash!"), (2L, "xq 7")).toDF("doc_id", "text")
    val got = Bpe.mergedTokenCounts(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "join hash!" → join(1) + hash(1) + !(1);  "xq 7" → x,q(2) + 7(1)
    assert(got == Map(1L -> 3L, 2L -> 3L))
  }

  test("encodedSequences: hand-computed stream + md5; n_symbols equals mergedTokenCounts on the corpus") {
    import spark.implicits._
    val df = Seq((1L, "Join hash! 7"), (2L, "")).toDF("doc_id", "text")
    val got = Bpe.encodedSequences(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList.sortBy(_._1)
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // "Join hash! 7" → join ∙ hash ∙ ! ∙ 7 (case-folded, passthrough kept)
    assert(got == List((1L, 4L, md5("join hash ! 7")), (2L, 0L, md5(""))))
    // cross-path consistency on the real corpus: the sequence length from
    // the stream builder equals q70's independent count path, every doc
    val docs = graft.core.Tables.documents(spark, sfDir)
    val a = Bpe.encodedSequences(docs, "doc_id", "text")
      .select("doc_id", "n_symbols")
    val b = Bpe.mergedTokenCounts(docs, "doc_id", "text")
      .withColumnRenamed("n_bpe_merged", "n_symbols")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("roundtripAudit: counts, flag and decoded-stream md5 on a fixture (incl. null text)") {
    import spark.implicits._
    val df = Seq((1L, "Join hash! 7"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Bpe.roundtripAudit(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
                 r.getString(4))).toList.sortBy(_._1)
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // decoded stream: alpha tokens case-folded and re-assembled from their
    // encode() symbols, digits/symbols passed through verbatim; a null
    // text row is (0, 0, lossless, md5("")) — the SQL oracle's contract
    assert(got == List((1L, 4L, 4L, true, md5("join hash ! 7")),
                       (2L, 0L, 0L, true, md5(""))))
  }
}
