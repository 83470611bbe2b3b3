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

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    * 2006, A-Res): every row draws a deterministic uniform u from its
    * md5 key and exposes the selection key ln(u)/w — order-equivalent
    * to the paper's u^(1/w) — rounded to 2⁻²⁰ fixed point BEFORE
    * comparison (the t19 determinism pattern: the only float ops are
    * one ln and one division per row, and ranking happens on exact
    * Longs with the id as total tiebreak). Keeping the top `n` keys
    * draws each row with probability proportional to its weight,
    * without replacement — the sample-∝-quality/∝-tokens primitive a
    * training-mix builder uses when uniform sampling over-represents
    * short or low-value documents. Rows with non-positive weight are
    * excluded (E-S is undefined there).
    *
    * Scale shape: a pure projection followed by a global top-n —
    * TakeOrderedAndProject (per-partition bounded heaps, no full
    * sort, no window, no single-task stage); PlanSpec pins it. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // u ∈ (0,1) OPEN on both ends via the +0.5 midpoint: with the
    // former +1 mapping a draw of 0xffffffff gave u = 1 exactly,
    // ln(u) = 0 — the maximum possible selection key — so that row
    // entered the sample regardless of its weight (P = 2⁻³² per row:
    // near-certain somewhere at billions of rows). The oracle SQL
    // applies the identical midpoint.
    val u = (conv(substring(draw(col(keyCol)), 1, 8), 16, 10).cast("long")
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    df.filter(col(weightCol) > 0)
      .withColumn("es_fp",
        round(log(u) / col(weightCol).cast("double") * lit(1048576.0))
          .cast("long"))
      .orderBy(col("es_fp").desc, col(keyCol).asc)
      .limit(n)
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
    * One partial-agg'd aggregation over the corpus, a broadcast join
    * with the target table, and a driver collect of at most |targets|
    * stat rows (strata are few by construction — languages, sources):
    * nothing here grows with corpus size, and the corpus is scanned
    * exactly once however the returned plan is consumed. Strata with
    * non-positive token counts are rejected eagerly (an infinite or
    * negative epochs must fail here, not inside a downstream explode).
    * Deterministic: the only non-integer arithmetic is one double
    * multiply and divide, bit-identical across engines. */
  def mixturePlan(df: DataFrame, stratumCol: String, tokens: Column,
      targets: Seq[(String, Double)]): DataFrame = {
    require(targets.nonEmpty, "empty target mixture")
    val spark = df.sparkSession
    import spark.implicits._
    // ONE corpus scan: the per-stratum stats collect to the driver
    // (bounded — at most |targets| rows survive the join) and the plan
    // is built locally, so consuming the returned frame does not
    // re-aggregate the corpus and the totals can be validated eagerly.
    val rows = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokens.cast("long")).as("n_tokens"))
      .join(broadcast(targets.toDF("stratum", "target_w")), "stratum")
      .collect()
    rows.foreach { r =>
      require(!r.isNullAt(2) && r.getLong(2) > 0,
        s"stratum ${r.getString(0)} has non-positive token count " +
          s"${if (r.isNullAt(2)) "null" else r.getLong(2)} — epochs would be " +
          "infinite or negative; fix the tokens column or drop the stratum")
    }
    val total = rows.map(_.getLong(2)).sum
    // math.round = floor(x+0.5) — HALF_UP for positives, matching both
    // the former Column round() and DuckDB's away-from-zero round.
    rows.toSeq.map { r =>
      val w = r.getDouble(3)
      (r.getString(0), r.getLong(1), r.getLong(2), w,
        math.round(w * total), w * total / r.getLong(2))
    }.toDF("stratum", "n_docs", "n_tokens", "target_w", "budget_tokens", "epochs")
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
    executePlan(df, stratumCol, keyCol,
      mixturePlan(df, stratumCol, tokens, targets))
  }

  /** [[executeMixture]]'s materialization half over an ALREADY-BUILT
    * plan frame (`stratum`, `epochs`, any other columns ignored) — so
    * a plan from any planner ([[mixturePlan]],
    * [[temperatureMixturePlan]], [[doremiReweight]]) executes through
    * one implementation. Plan rows with `epochs <= 0` are FILTERED
    * OUT here (a zero-weight stratum contributes zero copies) — the
    * contract is enforced, not trusted, because `sequence` on a
    * non-positive ceil would DESCEND (emitting a bogus `rep = -1`
    * copy), not empty out. Same per-row cost and determinism contract
    * as [[executeMixture]]: the plan broadcasts, the keep decision is
    * a scan-side md5 predicate, and the copy set is a pure function
    * of the data. */
  def executePlan(df: DataFrame, stratumCol: String, keyCol: String,
      plan: DataFrame): DataFrame = {
    val p = plan.select(col("stratum").as(stratumCol), col("epochs"))
      .filter(col("epochs") > 0)
    val frac = col("epochs") - floor(col("epochs"))
    val drawNum = conv(substring(
      draw(concat(col(keyCol).cast("string"), lit("#"), col("rep").cast("string"))),
      1, 8), 16, 10).cast("long")
    df.join(broadcast(p), stratumCol)
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

  /** Token-budget corpus selection — the assembly step that turns a
    * scored corpus into a training set: rank every document by
    * (`qualityCol` desc, `idCol` asc), lay token counts out in that
    * order with a distributed prefix sum, and keep exactly the
    * documents that fit ENTIRELY within `tokenBudget` (greedy
    * best-first selection — the quality-filter analog of mixture
    * execution's per-stratum budgets). Emits the full decision frame
    * `(idCol, n_tokens, cum_before, kept)` so the cut line is
    * auditable, not just the survivors.
    *
    * Scale shape: ranking is [[Packing.globalRank]] (range partition +
    * zipWithIndex — never a single-task window) and the running total
    * is [[Packing.packChunks]]'s distributed prefix sum over the rank
    * order, so the whole selection is two range-shuffles' worth of
    * work with driver state bounded by #partitions Longs — at 100 TB
    * the budget line lands without any node ever holding the corpus.
    * Determinism: the order key is (quality desc, id), exact IEEE
    * arithmetic identical across engines, so the kept set is a pure
    * function of the corpus. */
  def selectByBudget(df: DataFrame, idCol: String, qualityCol: String,
                     tokenCol: String, tokenBudget: Long): DataFrame = {
    require(tokenBudget >= 0, s"tokenBudget must be >= 0, got $tokenBudget")
    val base = df.select(col(idCol), col(qualityCol),
      col(tokenCol).cast("long").as("__tok"))
    // Negated quality ranks descending; id breaks ties totally.
    val ranked = Packing.globalRank(
      base, Seq(-col(qualityCol), col(idCol)), "__rk")
    val placed = Packing.packChunks(
      ranked, "__rk", "__tok", math.max(tokenBudget, 1L))
      .select(col("__rk"), col("start_off"))
    ranked.join(placed, "__rk")
      .select(col(idCol), col("__tok").as("n_tokens"),
        col("start_off").as("cum_before"),
        (col("start_off") + col("__tok") <= tokenBudget)
          .cast("long").as("kept"))
  }

  /** DSIR-style importance selection (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): score
    * every document by the log importance ratio of a TARGET
    * distribution (rows matching `targetPred` — e.g. curated/wiki-like
    * text) against the full-corpus SOURCE distribution, over hashed
    * token features, and keep the top `n`. This is the
    * distribution-matching selector that complements the quality-rank
    * selector ([[selectByBudget]]): it pulls documents that LOOK LIKE
    * the target domain rather than documents that score well in
    * isolation. (Plain deterministic top-n of the weights; the paper's
    * Gumbel resampling variant is one seeded perturbation away.)
    *
    * Features are tokens hashed to 256 buckets via the first two hex
    * chars of md5 — the portable cross-engine draw ([[draw]]'s
    * argument), so the DuckDB twin is bit-exact with no numeric hex
    * conversion. Bucket log-ratios are Laplace-smoothed and
    * fixed-pointed (`round(llr·2^20)` as BIGINT, the unigram-LM
    * pattern) before the per-document Long sum.
    *
    * Scale shape: ONE pass over the token stream computes both
    * distributions (a 256-key partial agg — the target side is a
    * conditional sum in the same aggregate, not a second scan); the
    * ≤256-row log-ratio table broadcasts; per-document sums partial-agg
    * to ~1 row/doc/partition; the top-n plans as
    * TakeOrderedAndProject. The corpus never shuffles by content.
    */
  def dsirSelect(df: DataFrame, targetPred: Column, idCol: String = "doc_id",
                 textCol: String = "text", n: Int = 100): DataFrame = {
    require(n >= 1, s"bad n=$n")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(col(idCol).as("id"), targetPred.as("is_t"),
        explode(split(col(textCol), " ")).as("term"))
      .select(col("id"), col("is_t"),
        substring(md5(col("term").cast("binary")), 1, 2).as("bucket"))
    // Distribution pass: ONE 256-key aggregate yields both bucket
    // counts AND (as its column sums) the corpus totals — a bounded
    // ≤256-row collect, no separate totals scan.
    val counts = toks.groupBy("bucket")
      .agg(count(lit(1)).as("cs"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ns = counts.map(_._2).sum
    val nt = counts.map(_._3).sum
    // The log-ratio table is computed from the collected counts but
    // THROUGH the same Catalyst expressions the oracle mirrors, so
    // round semantics stay engine-identical.
    val llr = counts.toSeq.toDF("bucket", "cs", "ct")
      .select(col("bucket"),
        round((log((col("ct") + 1).cast("double") / lit((nt + 256).toDouble))
          - log((col("cs") + 1).cast("double") / lit((ns + 256).toDouble)))
          * lit(1048576.0)).cast("long").as("llr_fp"))
    toks.join(broadcast(llr), Seq("bucket"))
      .groupBy("id")
      .agg(sum(col("llr_fp")).as("weight_fp"), count(lit(1)).as("n_tokens"))
      .orderBy(col("weight_fp").desc, col("id").asc)
      .limit(n)
      .select(col("id").as(idCol), col("weight_fp"), col("n_tokens"))
  }

  /** Temperature-based mixture plan: derives the per-stratum target
    * weights FROM the corpus itself as `w_i ∝ n_i^α` (α = 0.5 here —
    * the standard multilingual temperature-sampling exponent, e.g.
    * XLM-R) and emits the same plan shape as [[mixturePlan]] — the
    * form used when no hand-curated mixture exists: big strata are
    * downweighted, small ones upweighted, smoothly.
    *
    * Determinism across engines: α = 0.5 is computed with `sqrt`,
    * which IEEE-754 requires to be CORRECTLY ROUNDED (bit-identical
    * everywhere) — unlike `pow`, which carries no such guarantee; and
    * each stratum's √n is fixed-pointed to 2⁻²⁰ BEFORE the
    * normalizing sum, so the partition function is an exact BIGINT and
    * no float accumulation order can leak in (the t19 pattern).
    * One corpus scan; per-stratum stats collect bounded by |strata|. */
  def temperatureMixturePlan(df: DataFrame, stratumCol: String,
      tokens: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_docs"), sum(tokens.cast("long")).as("n_tokens"))
      .select(col("stratum"), col("n_docs"), col("n_tokens"),
        round(sqrt(col("n_tokens").cast("double")) * lit(1048576.0))
          .cast("long").as("sq_fp"))
      .collect()
    // isNullAt guard first: Row.getLong on a NULL sum (all-null tokens in a
    // stratum) would NPE before the require could raise the intended error.
    require(rows.forall(r => !r.isNullAt(2) && r.getLong(2) > 0),
      "stratum with null or non-positive token count")
    val z = rows.map(_.getLong(3)).sum
    val total = rows.map(_.getLong(2)).sum
    rows.toSeq.map { r =>
      val w = r.getLong(3).toDouble / z.toDouble
      (r.getString(0), r.getLong(1), r.getLong(2), w,
        math.round(w * total), w * total / r.getLong(2))
    }.toDF("stratum", "n_docs", "n_tokens", "target_w", "budget_tokens", "epochs")
  }

  /** DoReMi-style LEARNED mixture plan (Xie et al. 2023,
    * arXiv:2305.10429, "Doremi: Optimizing Data Mixtures Speeds Up
    * Language Model Pretraining" — the iterated-reweighting shape,
    * with the paper's trained proxy/reference models stood in by the
    * engine's own LM scorers): per-domain weights are NOT hand-curated
    * (t17) or a closed-form function of counts (t29) but ITERATED
    * against each domain's EXCESS LOSS — how much a stronger reference
    * model improves on a weak proxy, the paper's signal for "this
    * domain has learnable structure left". Proxy = the t19 unigram LM,
    * reference = the t25 bigram LM (order-sensitive, strictly more
    * expressive); excess_d = max(nll_proxy(d) − nll_reference(d), 0)
    * per token. The multiplicative-weights loop is the paper's
    * exponentiated-gradient update with uniform smoothing:
    * w ← normalize(w · exp(η · excess)), then
    * w ← normalize((1 − c) · w + c · uniform).
    *
    * Determinism: scoring is the scorers' own exact-BIGINT fixed point;
    * the driver loop is pure integer 2⁻²⁰ fixed-point arithmetic — the
    * only float op is |domains|·iters calls to `StrictMath.exp`
    * (bit-identical across JVMs by spec, unlike `math.exp`) on
    * fixed-point-quantized arguments, each immediately re-quantized.
    * Normalization floors to sum EXACTLY 2²⁰ and hands the remainder
    * out +1 at a time in (weight desc, domain asc) order — no float
    * renormalization anywhere, so the final weights are a pure integer
    * function of the per-domain fixed-point NLLs.
    *
    * Scale shape: two corpus passes (one per scorer, each the scorer's
    * own declared broadcast-model plan) plus a narrow id-keyed domain
    * projection; the iteration itself touches ≤ |domains| driver rows
    * (domains are languages/sources — tens, not data-sized) for a
    * bounded `iters` rounds. Nothing in the loop grows with the
    * corpus. `n_tokens` in the emitted plan is the scorers' own
    * whitespace tokenization (= t17's `size(split(text, ' '))`).
    *
    * @return the [[mixturePlan]] plan-frame contract — `(stratum,
    *         n_docs, n_tokens, target_w, budget_tokens, epochs)` —
    *         plus the learned `weight_fp` and its driving `excess_fp`
    *         (2⁻²⁰ fixed point) for auditability. */
  def doremiReweight(df: DataFrame, domainCol: String,
      idCol: String = "doc_id", textCol: String = "text",
      iters: Int = 10, etaFp: Long = 1048576L,
      smoothFp: Long = 131072L): DataFrame = {
    val S = 1048576L
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(etaFp >= 0, s"etaFp must be >= 0, got $etaFp")
    require(smoothFp >= 0 && smoothFp <= S,
      s"smoothFp must be a fixed-point fraction in [0, 2^20], got $smoothFp")
    val spark = df.sparkSession
    import spark.implicits._

    val dom = df.select(col(idCol).as("id"), col(domainCol).as("stratum"))
    val uni = TextAnalysis.unigramLogProb(df, idCol, textCol)
      .select(col(idCol).as("id"), col("n_tokens"),
        col("logprob_fp").as("uni_fp"))
    val bi = TextAnalysis.bigramLogProb(df, idCol, textCol)
      .select(col(idCol).as("id"), col("n_bigrams"),
        col("logprob_fp").as("bi_fp"))
    // Left join on the bigram side: documents under two tokens have no
    // bigrams and must still count toward their domain's plan stats.
    val rows = dom.join(uni, "id").join(bi, Seq("id"), "left_outer")
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("uni_fp")).as("uni_fp"),
        coalesce(sum(col("n_bigrams")), lit(0L)).as("n_bigrams"),
        coalesce(sum(col("bi_fp")), lit(0L)).as("bi_fp"))
      .collect()
      .sortBy(_.getString(0))
    require(rows.nonEmpty, "empty corpus")
    rows.foreach(r => require(!r.isNullAt(2) && r.getLong(2) > 0,
      s"stratum ${r.getString(0)} has no tokens"))
    val names = rows.map(_.getString(0))
    val nDomains = names.length

    // Per-token mean NLL in 2^-20 fixed point (floorDiv: the scorers'
    // log-prob sums are negative, so −sum is positive and floorDiv is
    // plain integer division). A domain whose every document is a
    // single token has no bigram evidence: excess 0 (no signal), never
    // a division by zero.
    val excess = rows.map { r =>
      val nllU = Math.floorDiv(-r.getLong(3), r.getLong(2))
      val nllB =
        if (r.getLong(4) == 0L) nllU
        else Math.floorDiv(-r.getLong(5), r.getLong(4))
      math.max(nllU - nllB, 0L)
    }

    // Floor-normalize to sum EXACTLY S; the remainder (< |domains|)
    // goes out +1 at a time in (weight desc, domain asc) order — a
    // total order, so the result is deterministic. BigInt for the
    // scale multiply only (post-update magnitudes × 2^20 can exceed
    // Long); everything stored stays Long.
    def normalize(v: Array[Long]): Array[Long] = {
      val s = v.map(BigInt(_)).sum
      val q =
        if (s <= 0) Array.fill(nDomains)(S / nDomains)
        else v.map(x => (BigInt(x) * S / s).toLong)
      val deficit = (S - q.sum).toInt
      val order = q.zipWithIndex
        .sortBy { case (wgt, i) => (-wgt, names(i)) }.map(_._2)
      val out = q.clone()
      var i = 0
      while (i < deficit) { out(order(i)) += 1L; i += 1 }
      out
    }

    var w = normalize(Array.fill(nDomains)(1L))
    var it = 0
    while (it < iters) {
      val stepped = Array.tabulate(nDomains) { i =>
        // η·excess is capped at 10 nats: far beyond any real LM excess
        // (fixture regime ~0.03), and keeps w·factor inside Long.
        val arg = math.min(
          etaFp.toDouble / S * excess(i).toDouble / S, 10.0)
        w(i) * math.round(StrictMath.exp(arg) * S) / S
      }
      val n = normalize(stepped)
      w = normalize(Array.tabulate(nDomains)(i =>
        (S - smoothFp) * n(i) / S + smoothFp / nDomains))
      it += 1
    }

    val total = rows.map(_.getLong(2)).sum
    names.indices.map { i =>
      val r = rows(i)
      val tw = w(i).toDouble / S
      (names(i), r.getLong(1), r.getLong(2), excess(i), w(i), tw,
        math.round(tw * total), tw * total / r.getLong(2))
    }.toDF("stratum", "n_docs", "n_tokens", "excess_fp", "weight_fp",
      "target_w", "budget_tokens", "epochs")
  }

  /** Per-group quantile threshold filter: flags every row whose value
    * reaches its group's q-quantile — "keep documents at or above the
    * p25 quality within their source", the standard per-domain
    * relative quality cut (an absolute threshold over-prunes clean
    * domains and under-prunes noisy ones).
    *
    * The threshold is the EXACT discrete order statistic: the
    * k = ceil(q·n)-th smallest value in the group, ties broken by
    * `idCol` — an element of the data, not an interpolation, so the
    * result is bit-exact across engines (no float midpoint math) and
    * the whole query has a bit-exact SQL twin. Emits the input rows
    * plus the group threshold and the keep flag; callers filter on
    * `keep`.
    *
    * Scale: one shuffle by `groupCol` + per-group sort (the window
    * rank); the threshold extraction is `max(value | rn ≤ k)` over the
    * same window — no second shuffle, no self-join. At extreme
    * per-group row counts use [[quantileFilterApprox]] (sketch-based,
    * sort-free, broadcast thresholds); the exact form is preferred
    * wherever a group fits a sort (it is also what the oracle can
    * verify). */
  def quantileFilter(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String, q: Double): DataFrame = {
    require(q > 0 && q <= 1, s"quantile out of (0,1]: $q")
    val byGroup = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    // Null values are UNRANKABLE, not lowest: they sort last, the group
    // size counts only non-null values (count(valueCol)), and their
    // keep is an explicit false. Under Spark's default NULLS FIRST a
    // null-bearing group would put nulls at ranks 1..k, yielding a
    // null threshold that silently drops the WHOLE group (and shifts
    // the statistic otherwise). Null-free groups are byte-identical to
    // the previous form, which is what the oracle mirrors.
    val ranked = byGroup.orderBy(col(valueCol).asc_nulls_last, col(idCol).asc)
    // k = ceil(q·n) with a 1e-9 backoff before the ceil: q·n that is
    // mathematically integral can land just ABOVE the integer in IEEE
    // doubles (0.07·100 = 7.000000000000001), silently selecting the
    // k+1-th order statistic. The oracle SQL applies the identical
    // backoff, and the floor at 1 keeps sub-epsilon q·n well-defined.
    val k = greatest(
      ceil(lit(q) * col("n_group") - lit(1e-9)).cast("long"), lit(1L))
    df.withColumn("rn", row_number().over(ranked))
      .withColumn("n_group", count(col(valueCol)).over(byGroup))
      .withColumn("thr",
        max(when(col("rn") <= k, col(valueCol))).over(byGroup))
      .withColumn("keep", coalesce(col(valueCol) >= col("thr"), lit(false)))
      .drop("rn", "n_group")
  }

  /** [[quantileFilter]]'s sort-free path for EXTREME per-group row
    * counts — the fallback that scaladoc promises: per-group
    * thresholds via `approx_percentile` (one map-side-mergeable sketch
    * aggregation, group cardinality rows out), broadcast back onto the
    * input for the keep flag. No per-group sort ever happens, so a
    * single group holding a trillion rows costs a sketch merge, not a
    * single-task sort. Same keep contract ("value reaches the group's
    * q-quantile"); the threshold is the sketch's order statistic,
    * which (a) for groups smaller than 1/`accuracy` retains every
    * sample and is exact, and (b) targets the nearest-rank
    * `floor(q·(n−1))+1` statistic, which can sit one order statistic
    * from [[quantileFilter]]'s `ceil(q·n)` at rank boundaries — the
    * exact form stays the declared/oracle-checked path wherever a
    * group fits a sort. */
  // No idCol: the sketch path has no rank tie-break to key on (that is
  // the exact variant's contract); the column resolves through col()
  // so names needing quoting work like everywhere else.
  def quantileFilterApprox(df: DataFrame, groupCol: String,
      valueCol: String, q: Double, accuracy: Int = 10000): DataFrame = {
    require(q > 0 && q <= 1, s"quantile out of (0,1]: $q")
    val thr = df.groupBy(col(groupCol))
      .agg(percentile_approx(col(valueCol), lit(q), lit(accuracy)).as("thr"))
    df.join(broadcast(thr), Seq(groupCol))
      .withColumn("keep", col(valueCol) >= col("thr"))
  }

  /** Soft-dedup reweighting (He et al., ACL 2024 "SoftDedup" — the
    * reweight-don't-drop alternative to destructive dedup): instead of
    * deleting near-duplicates, every document gets a sampling/loss
    * weight inversely proportional to its data COMMONNESS, here
    * instantiated as the size of its near-dup cluster
    * ([[graft.ops.Dedup.clusterNearDups]]'s components — MinHash-LSH
    * candidates, exact Jaccard verify, min-id components), so k copies
    * of one page carry the same total mass one copy would, without the
    * hard-dedup cliff at the similarity threshold. Weights are EXACT
    * 2⁻²⁰ fixed point: `weight_fp = 2²⁰ div cluster_size` (integer
    * division — the t19/t47 discipline, no float in the metric), every
    * member of a cluster reads the identical weight, singletons read
    * exactly 2²⁰. Emits (idCol, component, cluster_size, weight_fp).
    * Downstream: feed `weight_fp` to a loss-weighting column, or thin
    * with any of this file's deterministic md5-draw samplers at
    * probability weight_fp/2²⁰ (expected one surviving copy per
    * cluster).
    *
    * Scale shape: the cluster build is the audited d06 path (LSH
    * candidate generation linear in the corpus, verify on the
    * candidate sliver, pointer-doubling components on the dup-pair
    * graph — every stage partial-aggs); on top of it this adds ONE
    * component-keyed count with map-side combine and one co-keyed join
    * of that count back onto the assignment (cluster ids are already
    * hash-distributed; the join's big side shuffles once on the same
    * key). The weight arithmetic is a codegen'd integer projection. No
    * reference analog (vectors-only, `NND.scala:62-66`); extends the
    * §2.9 sampling family. */
  def softDedupWeights(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, useLsh: Boolean = true): DataFrame =
    softDedupWeightsFrom(
      Dedup.clusterNearDups(df, idCol, textCol, threshold, useLsh = useLsh)
        .select(col("id"), col("component")), idCol)

  /** [[softDedupWeights]]'s arithmetic half over an ALREADY-BUILT
    * (id, component) assignment — so a pipeline that materializes the
    * d06 clusters once (p11 prices hard and soft policies on the SAME
    * assignment) never pays the cluster build twice. One
    * component-keyed partial-agg count + one co-keyed join + the
    * codegen'd integer division. */
  def softDedupWeightsFrom(cl: DataFrame, idCol: String): DataFrame = {
    val sizes = cl.groupBy("component")
      .agg(count(lit(1)).as("cluster_size"))
    cl.join(sizes, Seq("component"))
      .select(col("id").as(idCol), col("component"), col("cluster_size"),
        expr("CAST(1048576 AS BIGINT) div cluster_size").as("weight_fp"))
  }
}
