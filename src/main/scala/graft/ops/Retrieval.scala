package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

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

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    * SIGIR 1998) — RESULT DIVERSIFICATION, the retrieval family's
    * post-processing step none of the rankers cover: a near-dup-heavy
    * corpus makes every top-k list k copies of one document, and MMR
    * greedily trades relevance against redundancy:
    *
    *   pick argmax over remaining candidates of
    *     λ·sim(q, d) − (1−λ)·max_{s ∈ selected} sim(d, s)
    *
    * `candidates` is any per-query ranked list of the family's shape
    * (`query_id`, `nbr_id`, `cosine` — [[SimilaritySearch.bruteForceTopK]]
    * or the IVF/LSH/graph serves), truncated to the re-rank pool `m`
    * per query; `corpus` (`id`, `features`) supplies candidate vectors.
    * Output: (`query_id`, `rank` 1..k, `nbr_id`, `mmr_fp`).
    *
    * Determinism: relevance and pairwise cosines are quantized to a
    * 2^-20 fixed point BEFORE the λ combination, which is then exact
    * Long algebra (λ_fp·rel_fp − (2^20−λ_fp)·div_fp, |·| < 2^41).
    * Relevance quantizes with Spark's `round` (HALF_UP — the form a
    * SQL twin mirrors with ROUND); the pairwise cosines, which exist
    * only inside the JVM kernel, use HALF_EVEN `rint` (the
    * PropertiesSpec in-memory reference mirrors both exactly). Ties
    * break by nbr_id asc; candidates are sorted (rel_fp desc, id asc)
    * before the greedy loop — so the output is bit-stable under any
    * partitioning or candidate arrival order (OpsSpec asserts).
    * λ = 2^20 (1.0) reduces exactly to the relevance ranking.
    *
    * 100 TB shape: the greedy loop is per-query independent —
    * `groupByKey(query_id).flatMapGroups` with per-group state of at
    * most m vectors and the O(k·m) pairwise pass (m defaults to tens;
    * k ≤ m), so queries scale out embarrassingly. The vector-fetch
    * join ships only (query_id, nbr_id, rel_fp) ids against the
    * id-keyed corpus (at scale: the corpus bucketed on id makes it a
    * co-located join; the candidate side is |Q|·m rows, never the
    * corpus). Nothing global, nothing driver-side. */
  def mmrDiversify(candidates: DataFrame, corpus: DataFrame, k: Int = 10,
      m: Int = 50, lambdaFp: Long = 734003L /* rint(0.7·2^20) */,
      idCol: String = "id", vecCol: String = "features"): DataFrame = {
    require(k >= 1 && m >= k, s"need m >= k >= 1: k=$k m=$m")
    require(lambdaFp >= 0L && lambdaFp <= 1048576L, s"bad lambdaFp=$lambdaFp")
    val spark = candidates.sparkSession
    import spark.implicits._
    // Truncate to the m-sized re-rank pool BEFORE the vector-fetch
    // join: a caller handing per-query top-1000 lists should ship
    // |Q|·m vectors across the join, not |Q|·1000. The window uses the
    // same (rel_fp desc, id asc) order as the in-group sort, so the
    // selected pool is identical to truncating after.
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("rel_fp"), asc("nbr_id"))
    val pool = candidates.select(col("query_id"), col("nbr_id"),
      round(col("cosine") * lit(1048576.0), 0).cast("long").as("rel_fp"))
      .withColumn("pr", row_number().over(pw))
      .filter(col("pr") <= m)
      .drop("pr")
    val withVec = pool.join(
      corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("v")), "nbr_id")
    val lam = lambdaFp
    val oneMinusLam = 1048576L - lambdaFp
    val kk = k
    val mm = m
    withVec.select(col("query_id"), col("nbr_id"), col("rel_fp"), col("v"))
      .as[(Long, Long, Long, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        // Pool order is (rel desc, id asc): deterministic regardless of
        // arrival order; truncation to m happens on the sorted pool.
        val cands = it.toArray.sortBy(t => (-t._3, t._2)).take(mm)
        val n = cands.length
        def cosFp(a: Array[Float], b: Array[Float]): Long = {
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < a.length) {
            dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
            nb += b(i).toDouble * b(i); i += 1
          }
          val c = if (na == 0.0 || nb == 0.0) 0.0
                  else dot / (math.sqrt(na) * math.sqrt(nb))
          math.rint(c * 1048576.0).toLong
        }
        val selected = ArrayBuffer.empty[Int]
        val maxDiv = Array.fill(n)(Long.MinValue)
        val taken = Array.fill(n)(false)
        val out = ArrayBuffer.empty[(Long, Int, Long, Long)]
        var r = 1
        while (r <= kk && selected.length < n) {
          val pick =
            if (selected.isEmpty) 0 // highest relevance seeds the list
            else {
              val last = cands(selected.last)._4
              var best = -1; var bestScore = Long.MinValue; var bestId = Long.MaxValue
              var i = 0
              while (i < n) {
                if (!taken(i)) {
                  val d = cosFp(cands(i)._4, last)
                  if (d > maxDiv(i)) maxDiv(i) = d
                  val s = lam * cands(i)._3 - oneMinusLam * maxDiv(i)
                  if (s > bestScore || (s == bestScore && cands(i)._2 < bestId)) {
                    best = i; bestScore = s; bestId = cands(i)._2
                  }
                }
                i += 1
              }
              best
            }
          taken(pick) = true
          selected += pick
          val score = if (r == 1) lam * cands(pick)._3
                      else lam * cands(pick)._3 - oneMinusLam * maxDiv(pick)
          out += ((qid, r, cands(pick)._2, score))
          r += 1
        }
        out.iterator
      }
      .toDF("query_id", "rank", "nbr_id", "mmr_fp")
  }

  /** Fixed-point DCG rank discounts for [[rankedEval]]:
    * `round(2²⁰ / log₂(r+1))` for ranks 1..k. Computed ONCE on the
    * driver with StrictMath and injected as literals into both the
    * Spark plan and the DuckDB twin (single source — the bm25Query
    * discipline), so no cross-engine transcendental ever evaluates:
    * the measured margin of every table value from its .5 rounding
    * boundary is ≥ 0.055, nine orders above any libm-vs-fdlibm ulp. */
  def dcgGainFp(k: Int): Seq[Long] = (1 to k).map(r =>
    math.round(1048576.0 / (StrictMath.log(r + 1.0) / StrictMath.log(2.0))))

  /** Ideal-DCG prefix sums of [[dcgGainFp]]: `idcgPrefixFp(k)(m-1)` is
    * the DCG of m relevant docs ranked 1..m — the normalizer for a
    * query with m relevant docs (capped at k). */
  def idcgPrefixFp(k: Int): Seq[Long] = dcgGainFp(k).scanLeft(0L)(_ + _).tail

  /** Fixed-point reciprocal ranks `round(2²⁰ / r)`, r = 1..k. */
  def rrFp(k: Int): Seq[Long] = (1 to k).map(r => math.round(1048576.0 / r))

  /** Ranked-retrieval evaluation (t50) — MRR@k and nDCG@k over a run
    * frame vs a binary relevance frame, the standard ranked-run-vs-
    * qrels grading a pipeline that ships an index runs per release
    * (every serving exhibit here graded itself with an ad-hoc recall
    * scaffold until this operator; OpsSpec re-derives one exhibit's
    * recall through it).
    *
    * Inputs: `run` carries (`queryCol`, `docCol`, `rankCol`) with
    * 1-based per-query ranks (any of the family's serves); `qrels`
    * carries (`queryCol`, `docCol`) — the relevant set, deduplicated
    * here. Output, one row per run query:
    *  - `n_rel`: the query's total relevant count (0 if none — the
    *    query still evaluates: rr/dcg/ndcg read 0, and the caller can
    *    exclude zero-rel queries from a mean, the trec_eval
    *    convention).
    *  - `n_hits`: relevant docs inside the top-k.
    *  - `rr_fp = round(2²⁰/first_hit_rank)` (0 if no hit) — MRR@k is
    *    `avg(rr_fp)/2²⁰`.
    *  - `dcg_fp = Σ_hits round(2²⁰/log₂(rank+1))` (binary gains);
    *    `idcg_fp` = the same mass for a perfect ranking of
    *    `min(n_rel, k)` docs; `ndcg_fp = (dcg_fp · 2²⁰) div idcg_fp`
    *    — exact BIGINT arithmetic end to end (the t19 discipline:
    *    every per-item term is quantized BEFORE summation, so sums
    *    are order-independent integer adds and the whole row pins; a
    *    perfect ranking reads exactly 2²⁰).
    *  - `ap_fp`: average precision at k, trec_eval's form —
    *    `(Σ_{i-th hit at rank rᵢ} round(2²⁰·i/rᵢ)) div n_rel` — MAP@k
    *    is `avg(ap_fp)/2²⁰`. The per-hit precision quantizes by PURE
    *    integer half-up rounding, `(2²¹·i + r) div (2r)` — no float
    *    touches this metric anywhere, so the twin needs no table.
    *
    * 100 TB shape: runs are per-query top-k lists (|Q|·k rows) and
    * qrels are eval-suite-sized — both tiny next to a corpus; the
    * plan is one equi-join on (query, doc) + two partial-agg'd
    * per-query aggregations + the literal-array rank lookups
    * (codegen'd projections). Nothing global, nothing driver-side
    * beyond the k-entry tables; millions of queries scale out on the
    * query key. */
  def rankedEval(run: DataFrame, qrels: DataFrame, k: Int,
      queryCol: String = "query_id", docCol: String = "doc_id",
      rankCol: String = "rank"): DataFrame = {
    require(k >= 1, s"bad k=$k")
    val gains = dcgGainFp(k)
    val prefix = idcgPrefixFp(k)
    val rrs = rrFp(k)
    val r = run.select(col(queryCol).as("q"), col(docCol).as("d"),
        col(rankCol).cast("int").as("rk"))
      .filter(col("rk") >= 1 && col("rk") <= k)
    val rel = qrels.select(col(queryCol).as("q"), col(docCol).as("d"))
      .distinct()
    // hit_i = how many hits rank at or above this one — the running
    // numerator of precision@rank. The window runs over the HITS
    // frame (≤ |Q|·k rows), never the run or the corpus.
    val hw = org.apache.spark.sql.expressions.Window
      .partitionBy("q").orderBy(col("rk"))
    val hits = r.join(rel, Seq("q", "d"))
      .withColumn("hit_i", row_number().over(hw))
      .groupBy("q")
      .agg(min(col("rk")).as("first_rk"),
        sum(element_at(typedlit(gains), col("rk"))).as("dcg_hits_fp"),
        count(lit(1)).as("hit_cnt"),
        sum(expr("(CAST(2097152 AS BIGINT) * hit_i + rk) div " +
          "(2 * CAST(rk AS BIGINT))")).as("ap_num_fp"))
    val nrel = rel.groupBy("q").agg(count(lit(1)).as("rel_cnt"))
    r.select("q").distinct()
      .join(nrel, Seq("q"), "left")
      .join(hits, Seq("q"), "left")
      .select(col("q").as(queryCol),
        coalesce(col("rel_cnt"), lit(0L)).as("n_rel"),
        coalesce(col("hit_cnt"), lit(0L)).as("n_hits"),
        // Explicit null short-circuit, NOT coalesce-over-lookup: the
        // codegen'd element_at does not contract to null-in/null-out
        // on a null index (observed reading an arbitrary slot), so
        // the guard must run before the lookup.
        when(col("first_rk").isNull, lit(0L))
          .otherwise(element_at(typedlit(rrs), col("first_rk")))
          .as("rr_fp"),
        coalesce(col("dcg_hits_fp"), lit(0L)).as("dcg_fp"),
        // least() skips nulls in Spark (least(null, k) = k), so a
        // zero-rel query must short-circuit BEFORE the lookup or it
        // would read a full-k ideal mass.
        when(col("rel_cnt").isNull, lit(0L))
          .otherwise(element_at(typedlit(prefix),
            least(col("rel_cnt"), lit(k.toLong)).cast("int")))
          .as("idcg_fp"),
        coalesce(col("ap_num_fp"), lit(0L)).as("ap_num_fp"))
      .withColumn("ndcg_fp", expr(
        "CASE WHEN idcg_fp > 0 THEN (dcg_fp * CAST(1048576 AS BIGINT)) div idcg_fp " +
          "ELSE CAST(0 AS BIGINT) END"))
      .withColumn("ap_fp", expr(
        "CASE WHEN n_rel > 0 THEN ap_num_fp div n_rel " +
          "ELSE CAST(0 AS BIGINT) END"))
      .drop("ap_num_fp")
  }

  /** [[rankedEval]] for GRADED relevance (the TREC qrels shape: `rel`
    * grades 0..maxGrade per (query, doc), 0 = judged-irrelevant):
    * nDCG uses the standard exponential gain `(2^rel − 1)` per rank —
    * as exact integer scaling of the same fixed-point discount table,
    * `(2^rel − 1) · round(2²⁰/log₂(r+1))`, so the whole metric stays
    * in BIGINT — and the ideal ranking places the query's grades in
    * descending order at ranks 1..k (ties broken by doc for
    * determinism; any tie order yields the same ideal mass). The
    * binary metrics (rr/ap/n_hits, with "relevant" = rel > 0) come
    * from [[rankedEval]] itself — one definition, the graded columns
    * replace only the gain family. Duplicate qrel rows keep the MAX
    * grade. Same row contract: one row per run query,
    * `(queryCol, n_rel, n_hits, rr_fp, ap_fp, dcg_fp, idcg_fp,
    * ndcg_fp)`; a perfectly graded ranking reads ndcg_fp = 2²⁰
    * exactly. Same scale shape as [[rankedEval]] plus one window over
    * the QRELS (eval-suite-sized, never the run or corpus). */
  def rankedEvalGraded(run: DataFrame, qrels: DataFrame, k: Int,
      queryCol: String = "query_id", docCol: String = "doc_id",
      rankCol: String = "rank", relCol: String = "rel",
      maxGrade: Int = 15): DataFrame = {
    require(k >= 1 && maxGrade >= 1 && maxGrade <= 30,
      s"bad k=$k/maxGrade=$maxGrade")
    val gains = dcgGainFp(k)
    val g = qrels.select(col(queryCol).as("q"), col(docCol).as("d"),
        col(relCol).cast("int").as("rel"))
      .filter(col("rel") > 0 && col("rel") <= maxGrade)
      .groupBy("q", "d").agg(max(col("rel")).as("rel"))
    val gainOf = expr("(CAST(1 AS BIGINT) << rel) - 1")
    val r = run.select(col(queryCol).as("q"), col(docCol).as("d"),
        col(rankCol).cast("int").as("rk"))
      .filter(col("rk") >= 1 && col("rk") <= k)
    val dcg = r.join(g, Seq("q", "d"))
      .groupBy("q")
      .agg(sum(gainOf * element_at(typedlit(gains), col("rk")))
        .as("gdcg_fp"))
    val iw = org.apache.spark.sql.expressions.Window
      .partitionBy("q").orderBy(col("rel").desc, col("d"))
    val idcg = g.withColumn("irk", row_number().over(iw))
      .filter(col("irk") <= k)
      .groupBy("q")
      .agg(sum(gainOf * element_at(typedlit(gains), col("irk")))
        .as("gidcg_fp"))
    rankedEval(run, g.select(col("q").as(queryCol), col("d").as(docCol)),
        k, queryCol, docCol, rankCol)
      .drop("dcg_fp", "idcg_fp", "ndcg_fp")
      .join(dcg.select(col("q").as(queryCol), col("gdcg_fp")),
        Seq(queryCol), "left")
      .join(idcg.select(col("q").as(queryCol), col("gidcg_fp")),
        Seq(queryCol), "left")
      .withColumn("dcg_fp", coalesce(col("gdcg_fp"), lit(0L)))
      .withColumn("idcg_fp", coalesce(col("gidcg_fp"), lit(0L)))
      .withColumn("ndcg_fp", expr(
        "CASE WHEN idcg_fp > 0 THEN (dcg_fp * CAST(1048576 AS BIGINT)) div idcg_fp " +
          "ELSE CAST(0 AS BIGINT) END"))
      .drop("gdcg_fp", "gidcg_fp")
  }
}
