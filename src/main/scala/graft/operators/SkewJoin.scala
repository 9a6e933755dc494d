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
    val salted = left.withColumn("__salt", pmod(hash(saltBy), lit(nSalts)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
