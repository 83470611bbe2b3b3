package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Streaming BM25 serving — the sparse twin of [[AnnServe]]: a
  * continuous stream of queries answered against a STATIC impact index
  * ([[TextAnalysis.bm25Impacts]]: per-(term, doc) fixed-point scores,
  * built once from the corpus). Queries here are documents —
  * "more-like-this" retrieval: each streamed document's distinct terms
  * form its query, the standard related-content serving shape.
  *
  * Scale shape, piece by piece:
  *  - The impact index is built ONCE and persisted — tf, df, dl and the
  *    corpus scalars are corpus properties, so nothing recomputes per
  *    micro-batch. Postings can be impact-truncated at build time
  *    (`maxPostings`) to bound stop-word fan-out.
  *  - Per query-batch work is a stateless distinct-term explode (pure
  *    projection) and a stream-static equi-join on `term` — no stream
  *    state, exactly the batch plan with the query side swapped for
  *    the stream.
  *  - The ONE streaming aggregation sums matched impacts per
  *    (query, doc): its state is one Long per candidate pair — the
  *    irreducible serving cost (you cannot rank without the per-doc
  *    totals), bounded by Σ_t∈q df(t) and by `maxPostings`·|q| under
  *    truncation. Each (query, term, doc) contribution arrives exactly
  *    once (a query row appears once; the static side is fixed), so
  *    the final totals equal the batch computation's.
  *  - Ranking runs on the DRAINED totals — a per-query window over the
  *    bounded candidate sets, batch-side, never streaming state.
  *
  * Determinism: every float op lives inside the static index build
  * (the [[TextAnalysis.bm25TopK]] fixed-point parity pattern); the
  * stream only sums Longs, so the drained rows are bit-identical to
  * the batch twin — st13's DuckDB oracle is full SQL, not pins.
  * (No reference counterpart: the reference is batch-only,
  * `/root/reference/src/main/scala/com/github/fvictorio/nnd/NND.scala`.)
  */
object Bm25Serve {

  /** Drains the documents fixture as a query stream (`doc_id <
    * maxQueryId`) against the static impact index of the same corpus;
    * returns per-query top-`k` rows `(query_id, rank, doc_id,
    * score_fp)`, self-matches excluded. */
  def bm25ServeTopK(spark: SparkSession, dir: String, k: Int = 10,
                    maxQueryId: Long = 3,
                    maxPostings: Int = Int.MaxValue): DataFrame = {
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
    // The resident serving index: built once, reused by every batch.
    val index = TextAnalysis.bm25Impacts(corpus, maxPostings = maxPostings)
      .persist()
    try {
      index.count() // materialize before the stream starts
      val drained = EventsStream.runDrainedOn(
        spark, dir, "documents", EventsStream.documentsSchema,
        "bm25serve") { src =>
        val q = src.filter(col("doc_id") < maxQueryId)
          .select(col("doc_id").as("query_id"),
            explode(array_distinct(TextAnalysis.tokens(col("text"))))
              .as("term"))
        q.join(index, Seq("term")) // stream-static: no stream state
          .filter(col("id") =!= col("query_id"))
          .groupBy(col("query_id"), col("id"))
          .agg(sum(col("s_fp")).as("score_fp"))
      }
      val w = Window.partitionBy("query_id")
        .orderBy(col("score_fp").desc, col("id").asc)
      drained.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("id").as("doc_id"), col("score_fp"))
    } finally {
      index.unpersist(): Unit
    }
  }
}
