package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for corpus curation. Training-data
  * pipelines need samples that are (a) stratified (per-source / per-label
  * quotas, so a dominant stratum doesn't swamp the mix), (b) reproducible
  * across runs AND engines (audits re-derive the exact sample), and (c)
  * cluster-friendly (no global ordering, no driver-side state).
  *
  * Both operators key randomness on a cryptographic hash of the row's own
  * key (md5 — identical output in every engine), never on `rand()` or
  * partition-local counters: the sample is a pure function of the data,
  * stable under re-partitioning, task retries, and engine swaps.
  */
object Sampling {

  /** md5 hex of the key's string rendering — the portable per-row
    * "random" draw. */
  private def draw(key: Column): Column = md5(key.cast("string").cast("binary"))

  /** Exactly `n` rows per stratum (fewer if the stratum is smaller):
    * rank rows within each stratum by the md5 draw (key as tiebreak) and
    * keep the first `n`. One shuffle on the stratum key; the ranking
    * window sorts within partitions only. Adds `rk` (1-based rank within
    * the stratum). */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(draw(col(keyCol)), col(keyCol))
    df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= n)
  }

  /** Bernoulli sample at `fraction` — shuffle-free (a pure per-row
    * filter; pushes to the scan). Keeps a row iff the first 8 hex chars
    * of its md5 draw, read as an integer, fall under fraction·2³². */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1], got $fraction")
    val cut = (fraction * 4294967296.0).toLong
    df.filter(conv(substring(draw(col(keyCol)), 1, 8), 16, 10).cast("long") < cut)
  }
}
