package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents whose word
  * n-grams overlap an evaluation/benchmark set (the train-test-overlap
  * scrub every LLM pretraining pipeline runs before training).
  *
  * Scale shape (the 100 TB story): the benchmark side is always tiny
  * relative to the corpus (eval suites are thousands of documents;
  * the corpus is billions), so the benchmark n-gram set is built once,
  * hashed to 8-byte keys, and BROADCAST — the corpus streams through a
  * map-side join and the only shuffle is the per-document count
  * aggregation (partial-agg combines to ~1 row per document per
  * partition because a document's grams are generated co-located from
  * its row). The corpus is never shuffled by content.
  *
  * When the benchmark gram set outgrows comfortable broadcast (~100s
  * of MB), [[overlapCountsBloom]] keeps the same plan with a Bloom
  * filter as the broadcast carrier: a few bits per gram instead of 8+
  * bytes, a map-side pre-filter whose false positives are removed by
  * an exact join over the (tiny) surviving gram stream — output is
  * identical to [[overlapCounts]] (asserted in DecontaminateSpec).
  *
  * No reference analog (`/root/reference/.../NND.scala` has no text
  * surface); this extends the §2.9 training-pipeline family. Both
  * paths are `functions._` compositions except the Bloom membership
  * probe, for which no built-in expression exists.
  */
object Decontaminate {

  /** Per-corpus-document overlap counts against the benchmark set:
    * `(idCol, n_grams, n_contaminated, contaminated_frac)` where
    * `n_grams` is the document's distinct n-gram count and
    * `n_contaminated` how many of those appear anywhere in `bench`.
    * Grams are xxhash64'd before the join (8-byte probes; collision
    * odds ~d²/2⁶⁵, the same argument as [[Dedup.hashedShingleSet]]). */
  def overlapCounts(corpus: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int = 3): DataFrame = {
    val corpusGrams = gramSet(corpus, idCol, textCol, n)
    val benchGrams = gramSet(bench, idCol, textCol, n)
      .select(col("g")).distinct().withColumn("hit", lit(1L))
    countOverlap(corpusGrams, broadcast(benchGrams), idCol)
  }

  /** [[overlapCounts]] with a Bloom filter as the broadcast carrier:
    * the corpus gram stream is pre-filtered map-side (no shuffle, a
    * few bits per benchmark gram), and only the survivors — true
    * overlaps plus the `fpp` false-positive sliver — are exactly
    * verified against the benchmark gram table. Total counts
    * (`n_grams`) are taken before the filter, so the output equals the
    * exact path's bit-for-bit. */
  def overlapCountsBloom(corpus: DataFrame, bench: DataFrame, idCol: String,
                         textCol: String, n: Int = 3,
                         fpp: Double = 0.01): DataFrame = {
    val corpusGrams = gramSet(corpus, idCol, textCol, n)
    // Recomputed for each of the two eager actions here (count, bloom
    // build) and the lazy verify join in the returned plan — all three
    // passes are over the BENCH set, so recompute beats a persist the
    // lazy return could never safely release (a cache entry per call
    // would outlive the session's interest in it).
    val benchGrams = gramSet(bench, idCol, textCol, n)
      .select(col("g")).distinct()
    val nBench = math.max(benchGrams.count(), 1L) // bounded: bench is small
    val bloom = benchGrams.stat.bloomFilter("g", nBench, fpp)
    val bc = corpus.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((g: Long) => bc.value.mightContainLong(g))
    // Candidates are a sliver of the corpus stream, so the exact
    // verify join is small even without broadcasting benchGrams.
    val verified = corpusGrams.filter(mightContain(col("g")))
      .join(benchGrams.withColumn("hit", lit(1L)), Seq("g"), "left")
    val totals = corpusGrams.groupBy("id")
      .agg(count(lit(1)).as("n_grams"))
    val hits = verified.groupBy("id")
      .agg(coalesce(sum(col("hit")), lit(0L)).as("n_contaminated"))
    totals.join(hits, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contaminated_frac",
        col("n_contaminated").cast("double") / col("n_grams"))
  }

  /** Distinct xxhash64'd word n-grams per document: `(id, g)`. The
    * per-document dedup happens INSIDE the row (`array_distinct`
    * before the explode), so producing the gram stream is a pure
    * projection — no shuffle. (Contrast [[Dedup.shingleSet]], whose
    * cross-row `distinct` is fine there because its consumers shuffle
    * on the gram key anyway; here the corpus must stay unshuffled.) */
  private def gramSet(df: DataFrame, idCol: String, textCol: String,
                      n: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(array_distinct(Dedup.shingles(col(textCol), n))).as("s"))
      // A null text yields the [null] shingle, and xxhash64(null) is
      // the bare seed CONSTANT — one null-text bench row would then
      // collide with every null-text corpus doc and flag it 100%
      // contaminated. Null grams carry no content; drop them (a
      // null-text doc simply has zero grams).
      .filter(col("s").isNotNull)
      .select(col("id"), xxhash64(col("s")).as("g"))

  private def countOverlap(corpusGrams: DataFrame, benchGrams: DataFrame,
                           idCol: String): DataFrame =
    corpusGrams.join(benchGrams, Seq("g"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(col("hit")), lit(0L)).as("n_contaminated"))
      .select(col("id").as(idCol), col("n_grams"), col("n_contaminated"),
        (col("n_contaminated").cast("double") / col("n_grams"))
          .as("contaminated_frac"))
}
