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

  /** SEMANTIC (embedding-level) benchmark decontamination — the scrub
    * [[overlapCounts]]' n-gram test cannot do: a paraphrase of a
    * benchmark item shares almost no trigrams with it but sits at
    * high cosine in embedding space. Flags every corpus document
    * whose embedding reaches cosine ≥ `tau` against ANY benchmark
    * vector: `(idCol, n_candidates, n_hits, max_cosine)` per corpus
    * row (`n_hits > 0` ⇔ contaminated; `n_candidates` is the number
    * of benchmark vectors actually compared — the blocking's scan
    * census; `max_cosine` is null when no benchmark vector shared a
    * probed cell).
    *
    * Scale shape (the d09 broadcast-benchmark contract at the
    * embedding level, blocked by the d11/s04 recipe): the benchmark
    * is always tiny relative to the corpus, so the cell geometry is
    * trained ON THE BENCHMARK (a driver-local fit over ≤ `sampleSize`
    * collected vectors — the regions where decisions happen are
    * exactly the benchmark's neighborhoods), each benchmark vector is
    * replicated to its `nProbe` nearest cells and BROADCAST, and the
    * corpus streams through one codegen'd nearest-cell projection +
    * a broadcast-hash join — the corpus is NEVER shuffled by content;
    * the only shuffle is the per-document aggregation, which
    * partial-combines to ~1 row per doc per partition because a
    * document's candidates are generated co-located from its row.
    *
    * Blocked hits are a SUBSET of the exact scan's by construction
    * (candidates ⊆ all pairs, identical cosine expression tree), so
    * the blocking can only lower recall, never flag a clean doc —
    * recall vs [[semanticOverlapExact]] is a measured, pinned fact
    * (d23), not a claim. Misses happen only when a corpus doc's
    * single nearest cell is outside its benchmark twin's `nProbe`
    * probe set — raise `nProbe`/`nCells` per corpus as usual (IVF
    * dials). Deterministic end to end: seeded driver fit, stateless
    * assignment, max over doubles — partition/retry-stable, pinnable.
    *
    * No reference analog (`/root/reference/.../NND.scala:62-66` is a
    * vectors-only K-NN build with no curation surface). */
  def semanticOverlap(corpus: DataFrame, bench: DataFrame, idCol: String,
                      vecCol: String, tau: Double, nCells: Int = 8,
                      nProbe: Int = 2, seed: Long = 42L): DataFrame = {
    require(nCells >= 1 && nProbe >= 1, s"bad nCells=$nCells/nProbe=$nProbe")
    val b0 = bench.select(col(idCol).as("id"), col(vecCol).as("features"))
    val c0 = corpus.select(col(idCol).as("id"), col(vecCol).as("features"))
    // An EMPTY benchmark means nothing can be contaminated — return
    // every corpus doc unflagged instead of letting the centroid fit
    // throw (a pipeline pointed at a not-yet-released eval suite must
    // degrade to a no-op scrub, not crash). The probe is one ≤1-row
    // collect against the tiny side.
    if (b0.isEmpty) {
      return c0.select(col("id").as(idCol),
        lit(0L).as("n_candidates"), lit(0L).as("n_hits"),
        lit(null).cast("double").as("max_cosine"))
    }
    val centroids = SimilaritySearch.trainIvfCentroids(b0, nCells, seed = seed)
    val probes = SimilaritySearch.probeCells(b0, centroids, nProbe)
    SimilaritySearch.cellAssign(c0, centroids)
      .join(broadcast(probes), Seq("cell"), "left")
      .withColumn("cosine",
        graft.functions.VectorFunctions.vector_dot(col("v_q"), col("v_c")) /
          (col("n_q") * col("n_c")))
      .groupBy(col("nbr_id").as(idCol))
      .agg(count(col("query_id")).as("n_candidates"),
        sum(when(col("cosine") >= tau, 1L).otherwise(0L)).as("n_hits"),
        max(col("cosine")).as("max_cosine"))
  }

  /** [[semanticOverlap]]'s exact-scan truth: every corpus vector
    * against EVERY benchmark vector — the degenerate blocking
    * (one cell, one probe), so the cosine expression tree and output
    * shape are [[semanticOverlap]]'s bit-for-bit and blocked hits are
    * provably a subset. The right tool outright whenever
    * |bench| · per-row cost is affordable (it prices one broadcast
    * cross per corpus row); the blocked form exists for when it
    * isn't. */
  def semanticOverlapExact(corpus: DataFrame, bench: DataFrame,
                           idCol: String, vecCol: String,
                           tau: Double): DataFrame =
    semanticOverlap(corpus, bench, idCol, vecCol, tau,
      nCells = 1, nProbe = 1)

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
