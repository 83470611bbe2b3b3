package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic-tier generator for the scale rehearsal:
  * writes `documents.parquet` + `embeddings.parquet` in the driver
  * fixture schemas (TESTDATA.md) at an integer multiple of the sf0.1
  * row counts (5,000 docs / 2,000 vectors per 1x), so every
  * documents/embeddings-driven operator runs unchanged at 10-50x and
  * the per-phase scaling exponents are measurable instead of argued
  * (VERDICT r14 "Next round" #1).
  *
  * Everything derives from xxhash64 over (id, salt) literals — pure
  * column expressions, no driver-side data, no RNG state — so the
  * tier is bit-reproducible at any partitioning and costs one
  * projection per table to produce. The content mirrors the fixture's
  * statistical shape where the heavy phases depend on it:
  *
  *  - documents: 40-60 words from a 30-word vocabulary (the fixture's
  *    word-salad regime, which drives d13's df>=2 trigram density and
  *    t32's n-gram langid work); ids with doc_id % 10 == 7 duplicate
  *    their 70-block seed doc EXACTLY (d01/d06/d24 exact+near dup
  *    structure) and % 10 == 8 duplicate it with one appended word
  *    (MinHash-LSH near-dup candidates at Jaccard ~0.97);
  *    lang/source/n_chars columns as in the fixture (5 langs, 20
  *    sources).
  *  - embeddings: 64-dim float vectors in 10 hash-placed clusters
  *    (centroid coordinates in [-2,2], per-vector noise in
  *    [-0.5,0.5]) — cluster-dominated neighborhoods, so NND/IVF/PQ
  *    phases do real navigation work rather than degenerate uniform
  *    scans; `label` = cluster id as in the fixture.
  *
  * Usage: runMain graft.tools.ScaleGen <outDir> <multiplier> [dims]
  */
object ScaleGen {

  private val vocabWords = Seq(
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "join", "scale", "shard", "block", "cache")

  def documents(spark: SparkSession, nDocs: Long, parts: Int): DataFrame = {
    val vocab = array(vocabWords.map(lit): _*)
    val base = spark.range(0L, nDocs, 1L, parts).select(col("id").as("doc_id"))
    // Exact/near dups share their 70-block seed's content: within each
    // block of 70 consecutive ids, the 14 ids with doc_id % 10 in
    // {7, 8} regenerate the block head's text (then %10==8 appends one
    // id-specific word) — 20% of the corpus is dup-structured, the
    // regime the dedup chains price.
    val isDup = pmod(col("doc_id"), lit(10L)) === 7L ||
      pmod(col("doc_id"), lit(10L)) === 8L
    val seed = when(isDup, col("doc_id") - pmod(col("doc_id"), lit(70L)))
      .otherwise(col("doc_id"))
    val nWords = (lit(40L) + pmod(xxhash64(seed, lit(7)), lit(21L))).cast("int")
    val words = transform(sequence(lit(1), nWords), i =>
      element_at(vocab,
        (pmod(xxhash64(seed, i, lit(5)), lit(vocabWords.size)) + 1).cast("int")))
    val text0 = array_join(words, " ")
    val text = when(pmod(col("doc_id"), lit(10L)) === 8L,
      concat(text0, lit(" "), element_at(vocab,
        (pmod(xxhash64(col("doc_id"), lit(99)), lit(vocabWords.size)) + 1)
          .cast("int"))))
      .otherwise(text0)
    base.select(col("doc_id"), text.as("text"),
      element_at(array(lit("en"), lit("de"), lit("fr"), lit("es"), lit("zh")),
        (pmod(xxhash64(col("doc_id"), lit(13)), lit(5L)) + 1).cast("int"))
        .as("lang"),
      concat(lit("src"), pmod(xxhash64(col("doc_id"), lit(19)), lit(20L)))
        .as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  def embeddings(spark: SparkSession, nVecs: Long, parts: Int,
      dims: Int = 64, nClusters: Int = 10): DataFrame =
    spark.range(0L, nVecs, 1L, parts)
      .select(col("id").as("vec_id"),
        pmod(xxhash64(col("id"), lit(3)), lit(nClusters.toLong)).cast("int")
          .as("label"))
      .withColumn("embedding",
        transform(sequence(lit(0), lit(dims - 1)), d =>
          (((pmod(xxhash64(col("label"), d, lit(17)), lit(2001L)) - 1000L)
              / lit(500.0)) +
            ((pmod(xxhash64(col("vec_id"), d, lit(101)), lit(2001L)) - 1000L)
              / lit(2000.0))).cast("float")))
      .select("vec_id", "embedding", "label")

  def generate(spark: SparkSession, outDir: String, mult: Int,
      dims: Int = 64): Unit = {
    require(mult >= 1, s"multiplier must be >= 1, got $mult")
    require(dims >= 2, s"dims must be >= 2, got $dims")
    val parts = math.max(16, 4 * mult)
    documents(spark, 5000L * mult, parts)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    embeddings(spark, 2000L * mult, parts, dims = dims)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    // Optional dims (default 64, the fixture's): production embedding
    // pipelines run 384-1024-d, which multiplies the similarity-kernel
    // and features-join BYTES by 6-16x at unchanged row counts — the
    // dim-scaling tier the round-15 VERDICT asked to measure instead
    // of argue (SCALE_BENCH.md dim addendum).
    require(args.length == 2 || args.length == 3,
      "usage: ScaleGen <outDir> <multiplier> [dims]")
    val dims = if (args.length == 3) args(2).toInt else 64
    val spark = graft.Bench.session()
    generate(spark, args(0), args(1).toInt, dims)
    println(s"[scalegen] wrote ${args(0)} at ${args(1)}x " +
      s"(${5000L * args(1).toInt} docs, ${2000L * args(1).toInt} vectors, " +
      s"$dims-d)")
    spark.stop()
  }
}
