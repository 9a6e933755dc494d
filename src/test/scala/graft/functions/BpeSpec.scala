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
}
