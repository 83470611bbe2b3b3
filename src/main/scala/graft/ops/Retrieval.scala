package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion: combining the ranked outputs of multiple
  * retrievers (dense ANN, sparse BM25, ...) into one list. The engine's
  * dense family ([[SimilaritySearch]], [[GraphSearch]]) and sparse
  * scoring ([[TextAnalysis.bm25TopK]]) produce the per-retriever lists;
  * this operator is the standard way to merge them. (No reference
  * counterpart: the reference's surface stops at the K-NN graph,
  * `/root/reference/src/main/scala/com/github/fvictorio/nnd/NND.scala:57-64`.)
  */
object Retrieval {

  /** Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    * each list contributes `1/(kConst + rank)` per document; documents
    * are re-ranked by the summed contribution. Rank-based, so it needs
    * no score calibration between retrievers — the reason it is the
    * default hybrid-search combiner.
    *
    * Every input must carry (`idCol`, `rankCol`) with 1-based
    * deterministic ranks. A rank's contribution is fixed-pointed
    * (`round(2^20/(kConst+rank))` as BIGINT — one IEEE division and one
    * round, mirrored in the DuckDB twin) before the Long sum, so the
    * fused ordering is bit-stable across engines and partitionings.
    * Output: top `k` rows of (`idCol`, rrf_fp, n_lists) ordered by
    * (rrf_fp desc, id asc).
    *
    * 100 TB shape: inputs are per-query top-k lists, so the union is
    * bounded by Σ|lists|; the sum partial-aggs map-side; the final
    * top-k plans as TakeOrderedAndProject (bounded per-partition heap,
    * never a global sort — PlanSpec-pinned). Fusing millions of
    * queries' lists in one pass is the same plan with the query id
    * prepended to the grouping and a per-key top-k aggregator in place
    * of the global TakeOrdered.
    */
  def rrfFuse(lists: Seq[DataFrame], idCol: String = "doc_id",
      rankCol: String = "rank", kConst: Int = 60, k: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(kConst >= 0 && k >= 1, s"bad kConst=$kConst/k=$k")
    val contribs = lists.map(_.select(col(idCol).as("id"),
      round(lit(1048576.0) / (lit(kConst) + col(rankCol)))
        .cast("long").as("c_fp")))
    contribs.reduce(_ unionByName _)
      .groupBy("id")
      .agg(sum(col("c_fp")).as("rrf_fp"), count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_fp").desc, col("id").asc)
      .limit(k)
      .select(col("id").as(idCol), col("rrf_fp"), col("n_lists"))
  }
}
