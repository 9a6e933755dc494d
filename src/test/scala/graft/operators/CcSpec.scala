package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Convergence-rate contract for the connected-components loop: pointer
  * doubling must make round count LOGARITHMIC in graph diameter, not
  * linear — the difference between "log₂(diameter) rounds at 100 TB" and
  * "a high-diameter pathology burns the maxIter budget and fails". The
  * r7 verdict flagged exactly this: plain min-label propagation is
  * O(diameter) rounds, fine for shallow dup families, dead on chains. */
class CcSpec extends SparkSuite {

  test("10k-node path graph converges in ≤16 rounds (≈log₂ diameter, not diameter)") {
    import spark.implicits._
    // the adversarial case for label propagation: one long chain,
    // diameter 9999. Propagation alone needs 9999 rounds; with the
    // shortcut step, covered chain depth after k rounds is 2^(k+1)−2,
    // so k=13 suffices (+1 round for the fixpoint detector).
    val n = 10000L
    val ids = spark.range(n).select(col("id").as("doc_id"))
    val edges = spark.range(n - 1)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val (out, rounds) =
      Pipeline.connectedComponentsWithRounds(ids, edges, maxIter = 25)
    val labels = out.agg(
      countDistinct(col("cluster_id")).as("k"),
      min(col("cluster_id")).as("mn"),
      max(col("cluster_id")).as("mx"),
      count(lit(1)).as("n")).head
    assert(labels.getLong(0) == 1L && labels.getLong(1) == 0L &&
           labels.getLong(2) == 0L && labels.getLong(3) == n,
      "path graph must collapse to ONE component labeled by its min id")
    assert(rounds <= 16,
      s"convergence took $rounds rounds — pointer doubling regressed " +
        "to O(diameter) propagation")
    graft.core.Mat.releaseAll()
  }

  test("disjoint families keep distinct labels; shortcut never cross-links") {
    import spark.implicits._
    // two components with an interleaved id space: evens chain
    // {0,2,...,16}, odds chain {1,3,...,17}, nodes 18/19 isolated.
    // Pointer doubling follows label VALUES as ids — an implementation
    // that shortcuts through arbitrary ids would cross-link the chains.
    val ids = spark.range(20).select(col("id").as("doc_id"))
    val edges = (0L until 16L).map(i => (i, i + 2)).toDF("a", "b")
    val (out, _) = Pipeline.connectedComponentsWithRounds(ids, edges)
    val byCluster = out.groupBy("cluster_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byCluster == Map(0L -> 9L, 1L -> 9L, 18L -> 1L, 19L -> 1L),
      s"expected evens→0 (9), odds→1 (9), isolated 18/19: $byCluster")
    graft.core.Mat.releaseAll()
  }

  test("round-count register is per-thread: a concurrent run can't clobber mine") {
    import spark.implicits._
    // Bench attributes cc_rounds to the query IT just ran by reading the
    // register after the call — a shared var would let a concurrent CC
    // (parallel bench, daemon tick) overwrite it between run and read.
    val ids = spark.range(8).select(col("id").as("doc_id"))
    val edges = (0L until 7L).map(i => (i, i + 1)).toDF("a", "b")
    val (_, myRounds) = Pipeline.connectedComponentsWithRounds(ids, edges)
    assert(Pipeline.lastCcRounds.get().intValue() == myRounds)
    @volatile var otherRounds = -2
    val t = new Thread(() => {
      // a DIFFERENT graph shape (no edges → converges in 1 round)
      val ids2 = spark.range(4).select(col("id").as("doc_id"))
      val e2 = Seq.empty[(Long, Long)].toDF("a", "b")
      otherRounds = Pipeline.connectedComponentsWithRounds(ids2, e2)._2
      graft.core.Mat.releaseAll()
    })
    t.start(); t.join(60000)
    assert(otherRounds >= 0, "concurrent run did not complete")
    assert(otherRounds != myRounds, "shapes chosen to differ — fix the test")
    assert(Pipeline.lastCcRounds.get().intValue() == myRounds,
      "another thread's CC run clobbered this thread's round register")
    graft.core.Mat.releaseAll()
  }
}
