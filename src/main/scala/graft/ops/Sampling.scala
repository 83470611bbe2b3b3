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

  /** [[stratifiedSample]] with per-stratum quotas instead of a uniform
    * `n` — the corpus-mixing primitive (so many docs from source A, so
    * many from source B). Strata absent from `quotas` contribute nothing.
    * The quota table is tiny and broadcast. */
  def quotaSample(df: DataFrame, stratumCol: String, keyCol: String,
      quotas: Map[String, Int]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val q = broadcast(quotas.toSeq.toDF(stratumCol, "quota"))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(draw(col(keyCol)), col(keyCol))
    df.join(q, stratumCol)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("quota"))
      .drop("quota")
  }

  /** Data-mixture reweighting plan: given target mixture weights per
    * stratum (language, source, domain cluster — the DoReMi/Pile-style
    * mixture table), compute each stratum's token budget and repetition
    * factor ("epochs") against the corpus it actually has:
    * `epochs = target_w · T / n_tokens` with `T` the planned strata's
    * total token count — epochs > 1 means the stratum repeats,
    * epochs < 1 means it downsamples (feed the fraction to
    * [[hashSample]] / [[quotaSample]] to execute the plan). Strata
    * absent from `targets` are excluded from the plan AND from `T`.
    *
    * One partial-agg'd aggregation over the corpus (per-stratum counts
    * — strata are few), a broadcast join with the target table, and a
    * single grand-total row: nothing here grows with corpus size.
    * Deterministic: the only non-integer arithmetic is one double
    * multiply and divide, bit-identical across engines. */
  def mixturePlan(df: DataFrame, stratumCol: String, tokens: Column,
      targets: Seq[(String, Double)]): DataFrame = {
    require(targets.nonEmpty, "empty target mixture")
    val spark = df.sparkSession
    import spark.implicits._
    val stats = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokens.cast("long")).as("n_tokens"))
      .join(broadcast(targets.toDF("stratum", "target_w")), "stratum")
    // One Long to the driver: the planned-total token count.
    val total = stats.agg(sum(col("n_tokens"))).head().getLong(0)
    stats
      .withColumn("budget_tokens",
        round(col("target_w") * total).cast("long"))
      .withColumn("epochs", col("target_w") * total / col("n_tokens"))
  }

  /** Executes a [[mixturePlan]]: materializes each stratum at its
    * repetition factor as `(key, stratum, rep)` rows — every document
    * appears `floor(epochs)` times plus one more with probability
    * `frac(epochs)`, decided by the portable md5 draw on
    * `(key, rep)` — so the expected token mass per stratum is exactly
    * `epochs · n_tokens = target_w · T`, and the realized copy set is a
    * pure function of the data (retry/engine/partitioning stable, like
    * every sampler here). Downsampling falls out of the same rule
    * (epochs < 1 ⇒ floor = 0, one Bernoulli copy). Per-row cost is
    * `ceil(epochs)` emitted candidates — the explode is bounded by the
    * mixture itself, and nothing shuffles (plan is broadcast, the
    * filter is a scan-side predicate). */
  def executeMixture(df: DataFrame, stratumCol: String, keyCol: String,
      tokens: Column, targets: Seq[(String, Double)]): DataFrame = {
    require(targets.forall(_._2 > 0), s"non-positive target weight in $targets")
    val plan = mixturePlan(df, stratumCol, tokens, targets)
      .select(col("stratum").as(stratumCol), col("epochs"))
    val frac = col("epochs") - floor(col("epochs"))
    val drawNum = conv(substring(
      draw(concat(col(keyCol).cast("string"), lit("#"), col("rep").cast("string"))),
      1, 8), 16, 10).cast("long")
    df.join(broadcast(plan), stratumCol)
      .withColumn("rep",
        explode(sequence(lit(0L), ceil(col("epochs")).cast("long") - 1)))
      .filter(col("rep") < floor(col("epochs")) ||
        drawNum < floor(frac * 4294967296.0).cast("long"))
      .select(col(keyCol), col(stratumCol), col("rep"))
  }

  /** [[stratifiedSample]] for skewed strata: a two-level selection that
    * bounds any single window sort. Rows are first ranked within
    * (stratum, salt) — `salts` independent sub-sorts of |stratum|/salts
    * rows each — keeping `n` per salt; survivors (≤ n·salts per stratum)
    * are re-ranked per stratum. Exact: every global per-stratum top-n row
    * is also in its own salt's top-n, so the result EQUALS
    * [[stratifiedSample]] (asserted in tests), at the cost of one extra
    * narrow shuffle. Use when a stratum is too large to sort in one
    * task. */
  def stratifiedSampleSalted(df: DataFrame, stratumCol: String, keyCol: String,
      n: Int, salts: Int = 16): DataFrame = {
    val salt = pmod(xxhash64(col(keyCol)), lit(salts))
    val w1 = Window.partitionBy(col(stratumCol), salt)
      .orderBy(draw(col(keyCol)), col(keyCol))
    val w2 = Window.partitionBy(col(stratumCol))
      .orderBy(draw(col(keyCol)), col(keyCol))
    df.withColumn("rk", row_number().over(w1))
      .filter(col("rk") <= n)
      .withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= n)
  }

  /** Deterministic train/valid/test split: assigns each row the first
    * label whose cumulative fraction bound its md5 draw falls under.
    * Shuffle-free (per-row projection); the split is a pure function of
    * the key — reproducible across engines (the bound is an 8-hex-char
    * string compare on the md5, identical everywhere) and stable when
    * the dataset grows (a row's label never depends on other rows). */
  def splitByHash(df: DataFrame, keyCol: String,
      fractions: Seq[(String, Double)], labelCol: String = "split"): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got $fractions")
    val h = substring(draw(col(keyCol)), 1, 8)
    val cuts = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val labeled = fractions.map(_._1).zip(cuts).dropRight(1)
      .foldRight(lit(fractions.last._1): Column) { case ((label, cut), acc) =>
        val hex = f"${math.min(4294967295L, (cut * 4294967296.0).toLong)}%08x"
        when(h < lit(hex), lit(label)).otherwise(acc)
      }
    df.withColumn(labelCol, labeled)
  }
}
