package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SCALE.md): salting splits a hot key across
  * `salts` sub-keys so no single reducer owns it, then a second (cheap,
  * cardinality = distinct keys) aggregation removes the salt.
  *
  * For algebraic aggregates Spark's own partial aggregation already
  * bounds reducer load; salting matters for holistic aggregates
  * (collect_list/percentiles/count-distinct re-aggregation) and for
  * joins against a skewed key (replicate the small side per salt).
  */
object Skew {

  /** Two-phase salted aggregation: `aggs` must be algebraic pairs of
    * (partial expression, final re-aggregation) — the common case of
    * count/sum is provided by [[saltedCounts]]. */
  def saltedCounts(df: DataFrame, key: Column, salts: Int = 16): DataFrame = {
    df.groupBy(key.as("key"), pmod(xxhash64(monotonically_increasing_id()), lit(salts)).as("salt"))
      .agg(count(lit(1)).as("partial_n"))
      .groupBy("key")
      .agg(sum("partial_n").as("n"))
  }

  /** Salted skewed-side join: replicates each `small` row `salts` times
    * and splits each `big` row into one of `salts` sub-keys, so a hot
    * join key spreads over `salts` reducers. Returns big ⋈ small on
    * `key`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
