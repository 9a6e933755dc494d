package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's skew
  * handling isn't enough (e.g. one key holding 30% of a 100 TB fact table).
  *
  * The skewed (large) side gets a deterministic salt in [0, n) derived from
  * a high-cardinality column; the small side is exploded n× with every salt
  * value. Joining on (key, salt) splits each hot key's rows across n
  * reducers. Cost: |right| × n replication — use only when the right side is
  * per-key small but too big (or too skewed) to broadcast outright.
  */
object SkewJoin {

  /** @param saltBy high-cardinality column on `left` used to derive the
    *               deterministic salt (e.g. a row id) */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 nSalts: Int, saltBy: Column,
                 joinType: String = "inner"): DataFrame = {
    // right/full-outer would emit nSalts copies of every UNMATCHED right
    // row (each replica fails the join independently) — same guard as
    // saltedJoinHeavyKeys; semi/anti never return right rows, so they
    // compose with the replication safely
    require(Set("inner", "left", "leftouter", "leftsemi", "semi",
        "leftanti", "anti")(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/semi/anti, got $joinType")
    val salted = left.withColumn("__salt", pmod(hash(saltBy), lit(nSalts)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Targeted form — salt ONLY measured-heavy keys. The blanket variant
    * pays |right|×n replication unconditionally (measured 6.2× the plain
    * join's wall at sf1 on a UNIFORM corpus — r8 bench, q113); real skew
    * is a handful of keys, so the right split is: measure the left key
    * histogram (one map-side-combined aggregate whose shuffle carries
    * only distinct keys), broadcast the keys above `heavyThreshold`
    * (few by the definition of skew — a wide heavy set means the
    * threshold is wrong, and the builder fails loud at `maxHeavyKeys`
    * rather than broadcast an unbounded set), then:
    * light keys → plain co-partitioned join, untouched;
    * heavy keys → the salted join, replication confined to the heavy
    * slice of `right`.
    * On uniform data this degenerates to the plain join plus the
    * histogram; under real skew only the hot keys pay. Inner and
    * left joins only (right/outer would need heavy-set logic on both
    * sides — not needed by any current caller). */
  def saltedJoinHeavyKeys(left: DataFrame, right: DataFrame, key: String,
                          nSalts: Int, saltBy: Column,
                          heavyThreshold: Long,
                          joinType: String = "inner",
                          maxHeavyKeys: Int = 100000): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"saltedJoinHeavyKeys supports inner/left, got $joinType")
    // heavy set collected ONCE (bounded by maxHeavyKeys — driver-tiny by
    // the definition of skew) so the three downstream uses are scan-level
    // InSet filters (parquet-pushable), not three recomputations of the
    // histogram aggregate. NULL keys are excluded: a null never matches
    // an equi-join, so salting them buys nothing — they take the light
    // path, where the plain join preserves (left) or drops (inner) them
    // exactly as the unsplit join would.
    val heavyKeys = left.filter(col(key).isNotNull).groupBy(col(key))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > heavyThreshold)
      .select(col(key)).limit(maxHeavyKeys + 1).collect().map(_.get(0)).toSeq
    require(heavyKeys.length <= maxHeavyKeys,
      s"more than $maxHeavyKeys heavy keys — raise heavyThreshold " +
        "(a broad heavy set means the threshold is wrong, not that " +
        "everything should salt)")
    if (heavyKeys.isEmpty) left.join(right, Seq(key), joinType)
    else {
      // coalesce: isInCollection is NULL for a null key, and NULL would
      // fail BOTH filter branches — a left join's null-key rows would
      // silently vanish
      val isHeavy = coalesce(col(key).isInCollection(heavyKeys), lit(false))
      left.filter(!isHeavy).join(right, Seq(key), joinType)
        .unionByName(saltedJoin(left.filter(isHeavy), right.filter(isHeavy),
          key, nSalts, saltBy, joinType))
    }
  }
}
