package graft.ops

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the
  * domain-discovery / data-mixture clustering step of a training
  * pipeline (SemDeDup-style semantic grouping, mixture reweighting),
  * built to be DETERMINISTIC at any scale:
  *
  *  - INIT: the k rows with the smallest `(xxhash64(id, seed), id)` —
  *    a bounded partial top-k (TakeOrderedAndProject), k rows to the
  *    driver, no corpus sort.
  *  - ASSIGN: nearest-centroid argmin as the native codegen'd
  *    [[graft.functions.NearestCentroid]] expression — the centroid
  *    matrix rides the expression as a task-binary reference object
  *    (O(1) generated code for any k; Euclidean form:
  *    `argmin ‖v−c‖² = argmax (v·c − ‖c‖²/2)` — the row's own norm is
  *    constant per row and cannot move the argmax). The corpus is
  *    never shuffled for assignment.
  *  - UPDATE: per-dimension FIXED-POINT sums — every component rounds
  *    to `round(x · 2²⁰)` Long before aggregation, so the per-cluster
  *    sum is exact integer arithmetic: associative, commutative,
  *    independent of partitioning, task order, and retries. A plain
  *    double sum's value depends on combine order, which jitters
  *    centroids run-to-run and flips boundary assignments — the
  *    classic determinism hole in distributed k-means. Precision cost
  *    is ≤ 2⁻²¹ per component per point (unit-scale inputs), far
  *    below any assignment boundary that matters. Overflow bound:
  *    |Σ| < n_cluster · max|x| · 2²⁰ — safe to ~10¹¹ unit-scale
  *    points per cluster.
  *
  * Per iteration: one codegen'd projection pass + one aggregation
  * whose shuffle is ≤ partitions · k · d partial rows of
  * `(cluster, pos, sum, n)` — the corpus itself never shuffles.
  * Driver state: k·d Longs. Iterations are a fixed count (Lloyd's
  * descends monotonically; fixed-point rounding bounds the residual
  * drift below 2⁻²⁰ per component).
  */
object Clustering {

  /** Euclidean nearest-centroid id: `argmax (v·cᵢ − ‖cᵢ‖²/2)` with
    * index tie-break to the lowest id, as the native
    * [[graft.functions.NearestCentroid]] expression. The former
    * array-sort-of-structs Column form inlined k dot loops into the
    * generated method — O(k·d) Java source, Janino-fatal past
    * k·d ≈ 16k — while the native kernel is O(1) generated code for
    * any k with bit-identical arithmetic (parity pinned in
    * VectorExpressionsSpec; ClusteringSpec exercises k=256, d=64). */
  def nearestCentroid(vec: Column, centroids: Array[Array[Float]]): Column =
    VectorFunctions.nearest_centroid(vec, centroids)

  private val Scale = 1L << 20

  /** Trained centroids after `iterations` Lloyd rounds (k × d doubles).
    * Empty clusters keep their previous centroid. */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int,
                      iterations: Int = 5, seed: Long = 42L): Array[Array[Float]] = {
    require(k >= 1 && iterations >= 0, s"bad k=$k/iterations=$iterations")
    val pts = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    var centroids: Array[Array[Float]] = pts
      .orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      .limit(k)
      .select(col("v")).collect()
      .map(_.getSeq[Float](0).toArray)
    require(centroids.nonEmpty, "empty input")
    val dim = centroids.head.length
    var it = 0
    while (it < iterations) {
      // (cluster, pos) → exact fixed-point sum + count; ≤ k·d rows back.
      val rows = pts
        .withColumn("cluster", nearestCentroid(col("v"), centroids))
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos")
        .agg(sum(round(col("x") * Scale).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone())
      rows.foreach { r =>
        val (c, p) = (r.getInt(0), r.getInt(1))
        next(c)(p) = (r.getLong(2).toDouble / Scale / r.getLong(3)).toFloat
      }
      centroids = next
      it += 1
    }
    centroids
  }

  /** Model-apply projection against a FITTED centroid matrix: adds
    * `cluster` (int) and the fixed-point squared distance
    * `dist_fp = round(‖v−c‖² · 2¹²)` to every row. Stateless and
    * codegen'd, so it runs unchanged on a STREAM (st12's ingest-time
    * filter) — the shared tail of [[kmeansAssign]] and
    * [[graft.streaming.EventsStream.outlierPruneCounts]]. */
  def assignDistance(df: DataFrame, vecCol: String,
                     centroids: Array[Array[Float]]): DataFrame = {
    val v = col(vecCol)
    val withC = df.withColumn("cluster", nearestCentroid(v, centroids))
    // ‖v−c‖² = ‖v‖² − 2 v·c + ‖c‖² via the same dot kernel.
    val normSq = centroids.map(c => c.map(x => x.toDouble * x).sum)
    val cNormSq = element_at(
      typedlit(normSq.toSeq), col("cluster") + 1)
    val vNormSq = VectorFunctions.vector_dot(v, v)
    // Dot with the assigned centroid via the native row-indexed kernel
    // (the element_at-over-k-dot-columns form was the other O(k·d)
    // codegen site).
    val vDotC = VectorFunctions.centroid_dot(v, col("cluster"), centroids)
    withC.withColumn("dist_fp",
      round((vNormSq - lit(2.0) * vDotC + cNormSq) * (1L << 12)).cast("long"))
  }

  /** Cluster assignment of every row: `(idCol, cluster)` plus the
    * fixed-point squared distance `dist_fp = round(‖v−c‖² · 2¹²)` to
    * its centroid (an exactly-summable inertia contribution). */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String, k: Int,
                   iterations: Int = 5, seed: Long = 42L): DataFrame = {
    val centroids = kmeansCentroids(df, idCol, vecCol, k, iterations, seed)
    assignDistance(df.select(col(idCol), col(vecCol).as("v")), "v", centroids)
      .select(col(idCol), col("cluster").cast("long").as("cluster"), col("dist_fp"))
  }

  /** D4-style semantic outlier pruning (Tirumala et al.,
    * arXiv:2308.12284 — drop the least prototypical points per
    * cluster): survivors of [[kmeansAssign]] whose fixed-point squared
    * distance to their assigned centroid is ≤ `maxDistFp` (2⁻¹²
    * units). Embedding-space curation's third leg next to near-dup
    * removal (d05/d11) and text-quality filtering (t02/t19): far-from-
    * every-centroid points are off-manifold — encoding junk, OCR
    * noise, out-of-domain fragments.
    *
    * Everything downstream of the (driver-bounded) centroid fit is a
    * codegen'd per-row projection + filter — the corpus is never
    * shuffled, and because `dist_fp` is fixed-point over deterministic
    * centroids, the survivor SET is a pure function of the corpus:
    * retry-stable, partitioning-invariant, pinnable. */
  def pruneOutliers(df: DataFrame, idCol: String, vecCol: String, k: Int,
                    maxDistFp: Long, iterations: Int = 5,
                    seed: Long = 42L): DataFrame =
    kmeansAssign(df, idCol, vecCol, k, iterations, seed)
      .filter(col("dist_fp") <= maxDistFp)

  /** Embedding-space drift monitor (s21) — [[graft.ops.TextAnalysis
    * .corpusDrift]]'s analogue for the vector modality: a new
    * embedding-model version, a crawler shift, or an encoder bug moves
    * the EMBEDDING distribution in ways no text statistic sees. Two
    * snapshots are compared per Voronoi cell of ONE shared geometry
    * (centroids fit on the union — the IVF index contract: the cells
    * must not depend on which snapshot a point came from):
    *
    *  - `n_a`/`n_b`: the cell's occupancy per snapshot — mass
    *    MOVEMENT between cells (the signal when a cell empties out,
    *    which the mean test below cannot price: with one side absent
    *    there is no mean to compare and `drift_fp` reads 0).
    *  - `drift_fp`: the cross-multiplied L1 mean shift
    *    Σ_d |sa_d·n_b − sb_d·n_a| over 2⁻²⁰-fixed-point component
    *    sums — exactly 0 iff the per-cell snapshot means are equal
    *    (it is |meanA−meanB|·n_a·n_b in fixed point, division-free so
    *    the whole monitor stays in exact BIGINT arithmetic and pins).
    *
    * Scale shape: one driver-bounded centroid fit (kmeansCentroids'
    * own ≤ k·d-row collects), then a stateless codegen'd assignment
    * and ONE (cluster, pos)-keyed partial-agg'd aggregation of the
    * exploded components — shuffle bounded by k·dim rows, never the
    * corpus. Deterministic end to end (fixed-point sums, seeded fit),
    * so the per-cell table is a pure function of the two snapshots. */
  def embeddingDrift(a: DataFrame, b: DataFrame, idCol: String = "id",
      vecCol: String = "features", k: Int = 8, iterations: Int = 5,
      seed: Long = 42L): DataFrame = {
    val all = a.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("snap", lit(0))
      .unionByName(b.select(col(idCol).as("id"), col(vecCol).as("v"))
        .withColumn("snap", lit(1)))
    val centroids = kmeansCentroids(all, "id", "v", k, iterations, seed)
    all.withColumn("cluster", nearestCentroid(col("v"), centroids))
      .select(col("cluster"), col("snap"),
        posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cluster", "pos")
      .agg(
        coalesce(sum(when(col("snap") === 0,
          round(col("x") * Scale).cast("long"))), lit(0L)).as("sa"),
        coalesce(sum(when(col("snap") === 1,
          round(col("x") * Scale).cast("long"))), lit(0L)).as("sb"),
        sum(when(col("snap") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("snap") === 1, 1L).otherwise(0L)).as("nb"))
      .groupBy("cluster")
      .agg(
        sum(abs(col("sa") * col("nb") - col("sb") * col("na")))
          .as("drift_fp"),
        max(col("na")).as("n_a"),
        max(col("nb")).as("n_b"))
  }
}
