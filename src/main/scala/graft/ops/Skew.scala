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

  /** Deterministic per-row salt in [0, salts): xxhash64 over the given
    * columns (all of `df`'s columns when none are given). NEVER derived
    * from monotonically_increasing_id or rand: a nondeterministic
    * shuffle key re-salts rows differently when a stage retries after a
    * fetch failure, double-counting or dropping them — the classic
    * Spark correctness hazard, fatal exactly at the scale where retries
    * are routine. Content-derived salt is retry-stable; its one caveat
    * (fully identical rows share a salt) is the caller's signal to pass
    * a higher-cardinality `saltCols`. */
  private def contentSalt(df: DataFrame, saltCols: Seq[Column], salts: Int): Column = {
    val cols = if (saltCols.nonEmpty) saltCols else df.columns.toSeq.map(col)
    pmod(xxhash64(cols: _*), lit(salts))
  }

  /** Two-phase salted COUNT per key: partial counts per (key, salt),
    * then the per-key sum — the count instance of the generic
    * algebraic-aggregate pattern (any aggregate with a partial form +
    * re-aggregation salts the same way; holistic aggregates do not and
    * need a different strategy). */
  def saltedCounts(df: DataFrame, key: Column, salts: Int = 16,
      saltCols: Seq[Column] = Nil): DataFrame = {
    df.groupBy(key.as("key"), contentSalt(df, saltCols, salts).as("salt"))
      .agg(count(lit(1)).as("partial_n"))
      .groupBy("key")
      .agg(sum("partial_n").as("n"))
  }

  /** Salted skewed-side join: replicates each `small` row `salts` times
    * and splits each `big` row into one of `salts` sub-keys, so a hot
    * join key spreads over `salts` reducers. Returns big ⋈ small on
    * `key`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int = 16,
      saltCols: Seq[Column] = Nil): DataFrame = {
    val saltedBig = big.withColumn("__salt", contentSalt(big, saltCols, salts))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
