package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Similarity
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k via a broadcast join of the
  *    (small) query set against the corpus — the baseline and the oracle
  *    for recall tests. Scales linearly in corpus size with no shuffle of
  *    the corpus (queries are broadcast).
  *  - [[lshTopK]]: random-hyperplane LSH bucketing with multiprobe —
  *    the 100 TB path: corpus is bucketed once (one narrow shuffle),
  *    queries probe their own bucket plus all hamming-1 neighbors, and
  *    only in-bucket candidates are scored.
  */
object SimilaritySearch {

  /** Exact top-k by cosine: every (query, corpus) pair via broadcast of
    * the query side, ranked per query with a deterministic id tie-break. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    cosineTopK(corpus, queries, k, Nil)
      .select("query_id", "rank", "nbr_id", "cosine")

  /** THE exact cosine top-k scaffold — one definition of the
    * broadcast-join / hoisted-norm / (cosine desc, id asc) ranking
    * shared by [[bruteForceTopK]] and [[hardNegatives]], so the
    * documented bit-parity of the cosine expression tree and the
    * deterministic tie-break cannot drift between them. `carry` names
    * extra corpus/query columns to select through (they may also be
    * referenced by `extraPred`); the join always excludes self-pairs.
    * Norms hoisted to one pass per row; dot/(nq*nc) is the same
    * expression tree as cosineCol, so values are bit-identical. */
  private def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      carry: Seq[(String, String)],
      extraPred: Column = lit(true)): DataFrame = {
    val c = corpus.select(Seq(col("id").as("nbr_id"),
      col("features").as("v_c"),
      graft.functions.VectorFunctions.vector_norm(col("features")).as("n_c")) ++
      carry.map { case (in, out) => col(in).as("nbr_" + out) }: _*)
    val q = queries.select(Seq(col("id").as("query_id"),
      col("features").as("v_q"),
      graft.functions.VectorFunctions.vector_norm(col("features")).as("n_q")) ++
      carry.map { case (in, out) => col(in).as("query_" + out) }: _*)
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("nbr_id"))
    c.join(broadcast(q), col("query_id") =!= col("nbr_id") && extraPred)
      .withColumn("cosine",
        graft.functions.VectorFunctions.cosine_ranked(
          graft.functions.VectorFunctions.vector_dot(col("v_q"), col("v_c")),
          col("n_q"), col("n_c")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Hard-negative mining for contrastive / dense-retrieval training
    * (the DPR/ANCE recipe — Karpukhin et al. 2020, Xiong et al. 2021):
    * per anchor, the top-k most-SIMILAR corpus points with a DIFFERENT
    * label — close in embedding space, wrong by supervision, exactly
    * the negatives that move a contrastive loss (random negatives are
    * trivially separated and teach nothing). Same broadcast shape as
    * [[bruteForceTopK]] with the label inequality fused into the join
    * condition: the corpus never shuffles, anchors broadcast, one
    * codegen'd dot per surviving pair, per-anchor top-k with the
    * deterministic id tie-break. This exact form is the oracle/
    * fixture path; at corpus scale mine through an ANN front instead —
    * retrieve top-(c·k) via [[ivfTopK]] / the graph serve, drop
    * same-label hits, keep k (the standard over-retrieve-and-filter
    * recipe; OpsSpec pins its equivalence to this exact form at full
    * retrieval depth). [[cosineTopK]]'s scaffold with the label
    * inequality as the extra join predicate. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    cosineTopK(corpus, queries, k, Seq("label" -> "label"),
      extraPred = col("query_label") =!= col("nbr_label"))
      .select("query_id", "query_label", "rank", "nbr_id", "nbr_label",
        "cosine")

  /** Exact top-k by MAX INNER PRODUCT (MIPS) — the retrieval scoring a
    * two-tower recommender / dense-retrieval model uses (query·item,
    * NOT angle: a longer item vector legitimately scores higher, so
    * cosine ANN is the wrong op). Same broadcast shape as
    * [[bruteForceTopK]]: corpus never shuffles, queries broadcast, one
    * codegen'd `VectorDot` per pair, per-query top-k with a
    * deterministic id tie-break. The standard reduction to cosine ANN
    * (augment items with sqrt(M²−‖x‖²), unit-normalize) plugs this
    * into [[lshTopK]]/[[ivfTopK]] at corpus scale. */
  def mipsTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("id").as("nbr_id"), col("features").as("v_c"))
    val q = queries.select(col("id").as("query_id"), col("features").as("v_q"))
    val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("nbr_id"))
    c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .withColumn("score",
        graft.functions.VectorFunctions.vector_dot(col("v_q"), col("v_c")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "nbr_id", "score")
  }

  /** Approximate MIPS at corpus scale: the standard reduction to
    * cosine ANN (Bachrach et al. '14 / Shrivastava & Li '14) made
    * concrete over [[ivfTopK]] — item `x` augments to
    * `[x, √(M²−‖x‖²)]` (M = max corpus norm, one driver scalar),
    * query `q` to `[q, 0]`; then `cos(q', x') = q·x / (‖q‖·M)` whose
    * denominator is constant per query, so the cosine ranking IS the
    * inner-product ranking and every IVF scale property (corpus
    * shuffles once on cell id, queries broadcast, nProbe/nCells scan
    * fraction) carries over unchanged. The augmented component is
    * clamped at 0 before the sqrt — float rounding would otherwise
    * send the max-norm item to NaN and silently drop it from every
    * cell. Quality is pinned as s09 against the exact [[mipsTopK]]. */
  def mipsTopKIvf(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nCells: Int = 32,
      nProbe: Int = 16,
      seed: Long = 42L): DataFrame = {
    val m = corpus
      .agg(max(VectorFunctions.vector_norm(col("features")))).head().getDouble(0)
    require(m > 0, "corpus has no non-zero vector")
    def augmented(df: DataFrame, tail: Column): DataFrame =
      df.select(col("id"),
        concat(col("features"), array(tail.cast("float"))).as("features"))
    val c = augmented(corpus, sqrt(greatest(lit(0.0),
      lit(m * m) - VectorFunctions.vector_dot(col("features"), col("features")))))
    val q = augmented(queries, lit(0.0))
    ivfTopK(c, q, k, nCells, nProbe, seed)
  }

  /** Johnson–Lindenstrauss dimensionality REDUCTION of an embedding
    * column: replaces `vecCol` with its `outDim`-dimensional seeded
    * Rademacher projection ([[graft.functions.RandomProject]],
    * Achlioptas '01). The workhorse preprocessing step when the
    * downstream ANN / dedup / clustering cost is dominated by vector
    * width: distances survive with distortion ~1/√outDim, so top-k
    * neighbor sets are approximately preserved at a `outDim/d` cost and
    * memory factor — and, unlike PCA or OPQ, the map needs NO training
    * pass, NO fitted model to ship, and is data-independent, which at
    * 100 TB means: one codegen'd map over the corpus (no shuffle, no
    * driver state, no second pass), any executor can project any row at
    * any time (streaming ingest included), and the same seed projects
    * tomorrow's increment identically — the reduced corpus composes
    * directly with [[bruteForceTopK]]/[[lshTopK]]/[[ivfTopK]] and the
    * incremental-dedup paths. Quality on the isotropic fixture is
    * pinned as s10 (isotropy is the WORST case: true neighbors sit at
    * cosine ≈ 0.45, inside one distortion σ of background at
    * outDim=32); on clustered corpora — real embedding geometry —
    * recall survives halving the dimension (measured in OpsSpec on the
    * planted-50-cluster corpus). Dial `outDim` by the JL bound
    * ε ≈ √(8·ln N / outDim). */
  def rpReduce(df: DataFrame, vecCol: String, outDim: Int, seed: Long = 42L): DataFrame =
    df.withColumn(vecCol, VectorFunctions.random_project(col(vecCol), outDim, seed))

  /** ANN top-k with [[rpReduce]] as the candidate generator and exact
    * full-dimension re-rank — the width-reduction twin of
    * [[quantizedTopK]] (which shrinks bytes-per-component; this shrinks
    * components): candidate scoring runs at `outDim/d` of the float
    * traffic, then only `k·refine` survivors per query touch the
    * full-width vectors. Distortion ~1/√outDim decides what `refine`
    * buys: on the isotropic fixture — the worst case, true neighbors
    * within one distortion σ of background — recall is pinned as s10;
    * on clustered corpora the projected space preserves neighborhoods
    * at half the width (OpsSpec planted exhibit). At corpus scale the
    * projected scan composes with [[ivfTopK]]/[[lshTopK]] over the
    * reduced vectors instead of this brute scan — [[rpReduce]] is the
    * map, the index choice is orthogonal. */
  def rpTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      outDim: Int = 32,
      refine: Int = 16,
      seed: Long = 42L): DataFrame =
    projectedTopK(corpus, queries, k, refine,
      v => VectorFunctions.random_project(v, outDim, seed))

  /** ANN top-k with a FITTED [[Pca]] basis as the candidate generator
    * and exact full-dimension re-rank — the data-dependent twin of
    * [[rpTopK]]: same half-width candidate scan, same k·refine exact
    * re-rank tail, but the projection is the top-`outDim` principal
    * directions of the corpus itself, trained in one shuffle-free
    * fixed-point pass ([[Pca.fit]]) and shipped as a
    * [[graft.functions.MatrixProject]] reference object. On isotropic
    * data PCA has nothing to find — the spectrum is flat and recall
    * matches JL (pinned as s12 next to s10, the honest worst case); on
    * clustered/anisotropic corpora — real embedding geometry — the
    * fitted basis concentrates the neighborhood signal the random map
    * spreads thin (measured against RP on the planted corpus in
    * OpsSpec). Same composition rule as [[rpReduce]]: at corpus scale
    * the projected vectors feed [[ivfTopK]]/[[lshTopK]], the basis
    * choice is orthogonal to the index. */
  def pcaTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      outDim: Int = 32,
      refine: Int = 16): DataFrame = {
    val basis = Pca.fit(corpus, "features", outDim)
    projectedTopK(corpus, queries, k, refine,
      v => VectorFunctions.matrix_project(v, basis))
  }

  /** All XOR masks with at most `radius` bits set among `numPlanes` bits
    * (multiprobe neighborhood of a bucket). */
  def probeMasks(numPlanes: Int, radius: Int): Seq[Long] = {
    def combos(bits: List[Int], choose: Int): Seq[Long] =
      if (choose == 0) Seq(0L)
      else bits match {
        case Nil => Seq.empty
        case b :: rest =>
          combos(rest, choose - 1).map(_ | (1L << b)) ++ combos(rest, choose)
      }
    (0 to radius).flatMap(r => combos((0 until numPlanes).toList, r))
  }

  /** Train IVF coarse centroids with a few SPHERICAL k-means iterations
    * over a deterministic sample (driver-side on the sample only — the
    * corpus itself is never collected). Sample vectors are
    * unit-normalized and centroids re-normalized after every mean step,
    * with assignment by max dot product — the quantizer whose Voronoi
    * cells are cones about the origin, i.e. the partition that respects
    * the COSINE metric the search ranks by (plain L2 k-means cells cut
    * across cosine neighborhoods whenever vector norms vary). Returns
    * `nCells` unit-norm centroids. */
  def trainIvfCentroids(
      corpus: DataFrame,
      nCells: Int,
      sampleSize: Int = 2048,
      iterations: Int = 5,
      seed: Long = 42L): Array[Array[Float]] = {
    val sample = corpus
      .orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      .limit(sampleSize)
      .select(col("features")).collect()
      .map(_.getSeq[Float](0).toArray)
      .map { v =>
        val n = math.sqrt(Similarity.dot(v, v))
        if (n > 0) v.map(x => (x / n).toFloat) else v
      }
    require(sample.nonEmpty, "empty corpus")
    val dim = sample.head.length
    // deterministic init: first nCells sample points (hash-shuffled order)
    var centroids = sample.take(nCells).map(_.clone())
    var it = 0
    while (it < iterations) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      sample.foreach { v =>
        var best = 0; var bestS = Double.MinValue
        var c = 0
        while (c < centroids.length) {
          val s = Similarity.dot(v, centroids(c))
          if (s > bestS) { bestS = s; best = c }
          c += 1
        }
        counts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else {
          val m = sums(c)
          val n = math.sqrt(m.map(x => x * x).sum)
          if (n > 0) m.map(x => (x / n).toFloat) else old
        }
      }
      it += 1
    }
    centroids
  }

  /** Nearest-centroid cell id of a vector column (pure Column expression
    * over the broadcast-as-literals centroid set): argmax of dot against
    * the unit centroids — for unit centroids, max dot == max cosine ==
    * the spherical-k-means assignment rule, and the row vector's own
    * norm is a constant factor that can't change the argmax, so no
    * per-row normalization is needed. Implemented as an array sort on
    * (−dot, cell) — a conditional fold would reference its accumulator
    * twice per centroid and blow the expression tree up exponentially. */
  def cellOf(vec: Column, centroids: Array[Array[Float]]): Column = {
    val dists = centroids.indices.map { i =>
      struct((-VectorFunctions.vector_dot(vec, typedlit(centroids(i).toSeq))).as("d"),
        lit(i).as("cell"))
    }
    element_at(array_sort(array(dists: _*)), 1).getField("cell")
  }

  /** ANN top-k via IVF: the corpus is partitioned into Voronoi cells of
    * trained coarse centroids; each query scans only its `nProbe`
    * nearest cells. The centroid set is tiny (driver-trained on a
    * deterministic sample) and ships as literals, so cell assignment is
    * a codegen'd projection — the corpus shuffles once, on cell id.
    *
    * Default `nProbe/nCells = 16/32` scans half the corpus for measured
    * recall 0.85 on the synthetic fixture — which is ISOTROPIC (vectors
    * near-uniform on the sphere), the adversarial case for any
    * partition-based ANN: cosine neighborhoods barely cluster, so cells
    * fragment every query's true top-k. On clustered data — the shape
    * of real embedding corpora — the same construction prunes hard:
    * MEASURED (OpsSpec planted-50-cluster corpus, via
    * [[ivfCandidatePairs]]) recall 1.0 at 64 cells / 8 probes scanning
    * 12.5% of the corpus. The scan fraction is nProbe/nCells by
    * construction, tunable per corpus. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nCells: Int = 32,
      nProbe: Int = 16,
      seed: Long = 42L): DataFrame =
    rankTopK(ivfCandidatePairs(corpus, queries, nCells, nProbe, seed), k)

  /** FILTERED ANN — [[ivfTopK]] under a metadata predicate (the
    * vector-store "filtered search" contract: allowed-subset
    * restriction at query time over an index built once on the full
    * corpus). The predicate applies as a PRE-filter on the indexed
    * rows — pushed to the corpus scan, before any distance math — so
    * selective filters make the search CHEAPER, never a post-filter
    * that silently returns < k survivors. Recall degrades gracefully:
    * the probe set is computed against the unfiltered cell geometry,
    * so a highly selective filter thins cells uniformly (raise
    * `nProbe` to compensate — scan fraction stays nProbe/nCells of the
    * SURVIVING rows). */
  def ivfTopKFiltered(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      restrict: Column,
      nCells: Int = 32,
      nProbe: Int = 16,
      seed: Long = 42L): DataFrame =
    rankTopK(
      ivfCandidatePairs(corpus, queries, nCells, nProbe, seed, Some(restrict)), k)

  /** The scored candidate stream of [[ivfTopK]] before the per-query
    * rank: every (query, corpus) pair sharing a probed cell, exactly
    * once (cells partition the corpus, so a neighbor lives in one cell).
    * Exposed so tests can MEASURE the scanned fraction —
    * `count / (|Q|·(N−1))` — rather than quote the nominal
    * nProbe/nCells. */
  def ivfCandidatePairs(
      corpus: DataFrame,
      queries: DataFrame,
      nCells: Int = 32,
      nProbe: Int = 16,
      seed: Long = 42L,
      restrict: Option[Column] = None): DataFrame = {
    // Centroids always train on the FULL corpus: the index is built
    // once, `restrict` varies per query batch (the filtered-search
    // contract) — so the cell geometry must not depend on the filter.
    val centroids = trainIvfCentroids(corpus, nCells, seed = seed)

    val c = cellAssign(restrict.map(corpus.filter).getOrElse(corpus), centroids)
    val q = probeCells(queries, centroids, nProbe)
    c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cosine",
        VectorFunctions.cosine_ranked(
          VectorFunctions.vector_dot(col("v_q"), col("v_c")),
          col("n_q"), col("n_c")))
      .select("query_id", "nbr_id", "cosine")
  }

  /** The IVF index side: `(cell, nbr_id, v_c, n_c)` — every corpus row
    * under its Voronoi cell id (a codegen'd projection over the
    * broadcast-as-literals centroids). This IS the serving index; the
    * streaming serve path ([[graft.streaming.AnnServe]]) persists it
    * once and joins query micro-batches against it. */
  def cellAssign(corpus: DataFrame, centroids: Array[Array[Float]]): DataFrame =
    corpus
      .select(col("id").as("nbr_id"), col("features").as("v_c"),
        VectorFunctions.vector_norm(col("features")).as("n_c"))
      .withColumn("cell", cellOf(col("v_c"), centroids))

  /** The query side of the IVF search: each query exploded to its
    * `nProbe` nearest cells — `(cell, query_id, v_q, n_q)`. Uses the
    * same −dot ordering as the corpus-side assignment, so probe #1 is
    * the home cell. A stateless per-row projection (no shuffle), which
    * is what makes it legal on a STREAMING query frame unchanged. */
  def probeCells(queries: DataFrame, centroids: Array[Array[Float]],
                 nProbe: Int): DataFrame = {
    val qBase = queries.select(col("id").as("query_id"), col("features").as("v_q"),
      VectorFunctions.vector_norm(col("features")).as("n_q"))
    val cellDists = centroids.indices.map { i =>
      struct((-VectorFunctions.vector_dot(col("v_q"), typedlit(centroids(i).toSeq))).as("d"),
        lit(i).as("cell"))
    }
    qBase
      .withColumn("probe", slice(array_sort(array(cellDists: _*)), 1, nProbe))
      .withColumn("pc", explode(col("probe")))
      .select(col("query_id"), col("v_q"), col("n_q"), col("pc.cell").as("cell"))
  }

  /** Persists the IVF serving index as on-disk parquet artifacts under
    * `path`: `centroids/` (cell → unit centroid vector, nCells rows)
    * and `index/` — the [[cellAssign]] table written PARTITIONED BY
    * CELL, so the index directory layout IS the inverted-file
    * structure: one directory per Voronoi cell. At serve time a probe
    * of p cells reads exactly p directories — partition pruning in the
    * file scan itself, which is the at-scale point of an IVF layout
    * (the query never pays I/O for the 1 − p/C unprobed corpus
    * fraction). Build once (one corpus pass + one shuffle on cell),
    * serve many — the offline half of the serving lifecycle, the
    * online half being [[ivfTopKFromIndex]] /
    * [[graft.streaming.AnnServe]]. */
  def saveIvfIndex(corpus: DataFrame, path: String, nCells: Int = 32,
                   seed: Long = 42L): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = trainIvfCentroids(corpus, nCells, seed = seed)
    centroids.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .repartition(1) // nCells rows — one tiny artifact file
      .write.mode("overwrite").parquet(s"$path/centroids")
    cellAssign(corpus, centroids)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/index")
  }

  /** Incremental append to a persisted IVF index — the serving
    * index's daily-ingest path: new vectors are cell-assigned with
    * the SAVED centroids (loaded, never retrained — the cell geometry
    * is the index's contract with its existing contents) and appended
    * to the inverted file. No rebuild, no touch of existing rows: the
    * write is one codegen'd projection over the increment, appended
    * into the cell directories. Because assignment is a pure function
    * of (vector, centroids), the appended index is BIT-IDENTICAL to
    * an index built from scratch over the union with the same
    * centroids (OpsSpec-asserted) — so serve quality after N appends
    * equals a fresh build's, with recall drifting only as the data
    * distribution drifts from the trained geometry (re-train + rebuild
    * being the explicit, operator-controlled event). */
  def appendToIvfIndex(newRows: DataFrame, path: String): Unit = {
    val centroids = loadIvfIndex(newRows.sparkSession, path)._1
    cellAssign(newRows, centroids)
      .write.mode("append").partitionBy("cell").parquet(s"$path/index")
  }

  /** Loads the [[saveIvfIndex]] artifacts: the centroid matrix (cell
    * order restored — partitioned writes don't preserve it) and the
    * cell-partitioned index frame, scan-pruned per probe at read. */
  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession,
                   path: String): (Array[Array[Float]], DataFrame) = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .orderBy("cell").collect()
      .map(_.getSeq[Float](1).toArray)
    (centroids, spark.read.parquet(s"$path/index"))
  }

  /** [[ivfTopK]] against a loaded on-disk index: queries probe their
    * `nProbe` nearest cells and the probed cell set — bounded by
    * |Q|·nProbe, collected ONLY to prune the scan — is pushed into the
    * index read as a partition filter, so the file source lists and
    * reads just those cell directories (PlanSpec-style pruning is
    * asserted in OpsSpec via the input-file count). Identical output
    * to [[ivfTopK]] over the same corpus/centroids: same candidates,
    * same rank, same tie-break. */
  def ivfTopKFromIndex(centroids: Array[Array[Float]], index: DataFrame,
                       queries: DataFrame, k: Int,
                       nProbe: Int = 16): DataFrame = {
    val q = probeCells(queries, centroids, nProbe)
    // Static partition pruning: for a bounded query batch (the serving
    // shape) the probed cells are a small driver-known set; `isin` on
    // the partition column prunes directories at file-listing time.
    // For unbounded query sets, skip the filter — the join alone is
    // still correct, just unpruned.
    val probed = q.select("cell").distinct().collect().map(_.getInt(0))
    index.filter(col("cell").isin(probed.toIndexedSeq: _*))
      .join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cosine",
        VectorFunctions.cosine_ranked(
          VectorFunctions.vector_dot(col("v_q"), col("v_c")),
          col("n_q"), col("n_c")))
      .select("query_id", "nbr_id", "cosine")
      .transform(rankTopK(_, k))
  }

  /** Per-query exact top-k over a scored (query_id, nbr_id, cosine)
    * candidate stream, deterministic id tie-break. */
  private def rankTopK(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("nbr_id"))
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "nbr_id", "cosine")
  }

  /** The shared exact-re-rank tail of every candidate-generating ANN
    * path ([[quantizedTopK]]/[[rpTopK]]/[[pcaTopK]]/[[pqTopK]]/
    * [[pqTopKIvf]]): the `(query_id, nbr_id)` survivors join back to
    * the full-width floats — |Q|·k·refine rows, never the corpus — and
    * rank by exact cosine with the deterministic id tie-break. */
  private def exactRerank(cands: DataFrame, corpus: DataFrame,
                          queries: DataFrame, k: Int): DataFrame = {
    val cf = corpus.select(col("id").as("nbr_id"), col("features").as("v_c"),
      VectorFunctions.vector_norm(col("features")).as("n_c"))
    val qf = broadcast(queries.select(col("id").as("query_id"), col("features").as("v_q"),
      VectorFunctions.vector_norm(col("features")).as("n_q")))
    rankTopK(
      cands.join(cf, "nbr_id").join(qf, "query_id")
        .withColumn("cosine",
          VectorFunctions.cosine_ranked(
            VectorFunctions.vector_dot(col("v_q"), col("v_c")),
            col("n_q"), col("n_c")))
        .select("query_id", "nbr_id", "cosine"),
      k)
  }

  /** Shared candidate stage of the projection-based ANN paths: score
    * every pair in the PROJECTED space (approximate cosine over
    * `proj(features)`), keep `k·refine` per query, re-rank exact. */
  private def projectedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                            refine: Int, proj: Column => Column): DataFrame = {
    val c = corpus.select(col("id").as("nbr_id"), proj(col("features")).as("pv"))
      .withColumn("pn", VectorFunctions.vector_norm(col("pv")))
    val q = queries.select(col("id").as("query_id"), proj(col("features")).as("pq"))
      .withColumn("qn", VectorFunctions.vector_norm(col("pq")))
    val wApprox = Window.partitionBy("query_id").orderBy(desc("pscore"), asc("nbr_id"))
    val cands = c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .withColumn("pscore",
        VectorFunctions.vector_dot(col("pq"), col("pv")) / (col("qn") * col("pn")))
      .withColumn("rk", row_number().over(wApprox))
      .filter(col("rk") <= k * refine)
      .select("query_id", "nbr_id")
    exactRerank(cands, corpus, queries, k)
  }

  /** ANN top-k via int8 scalar quantization with exact re-rank — the
    * memory-bandwidth scale path: candidate scoring streams 1-byte
    * components (4× less than float32) through the pure-integer
    * [[graft.functions.QuantizedDot]] kernel, then only the top
    * `k·refine` candidates per query are re-ranked with exact float
    * cosine. The refine join touches |Q|·k·refine rows — the corpus
    * floats never enter the scoring scan.
    *
    * The quantization scale (corpus max-|component|) is trained on a
    * deterministic hash-ordered sample, like the IVF centroids. Ranking
    * by integer dot is rank-equivalent to dequantized dot; the re-rank
    * stage restores exact cosine order, so recall loss comes only from
    * true neighbors quantizing out of the top k·refine (measured in
    * OpsSpec). */
  def quantizedTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      refine: Int = 4,
      sampleSize: Int = 2048,
      seed: Long = 42L): DataFrame = {
    val scale = corpus
      .orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      .limit(sampleSize)
      .agg(max(greatest(abs(array_max(col("features"))), abs(array_min(col("features"))))))
      .first().getFloat(0).toDouble
    require(scale > 0, "degenerate corpus: all-zero sampled vectors")

    val qz = (v: Column) => VectorFunctions.vector_quantize(v, lit(scale))
    val c = corpus.select(col("id").as("nbr_id"), qz(col("features")).as("qv"))
    val q = queries.select(col("id").as("query_id"), qz(col("features")).as("qq"))

    val wApprox = Window.partitionBy("query_id").orderBy(desc("qscore"), asc("nbr_id"))
    val cands = c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .withColumn("qscore", VectorFunctions.quantized_dot(col("qq"), col("qv")))
      .withColumn("rk", row_number().over(wApprox))
      .filter(col("rk") <= k * refine)
      .select("query_id", "nbr_id")

    exactRerank(cands, corpus, queries, k)
  }

  /** Train per-subspace PQ codebooks (standard Lloyd L2 k-means, one
    * independent run per subspace) on a deterministic hash-ordered
    * sample — the same driver-side training discipline as
    * [[trainIvfCentroids]]: the corpus itself is never collected, and
    * the fitted model (m·k·(d/m) floats = k·d total, ~64 KB at the
    * defaults) ships as an expression reference object. Subvectors are
    * NOT normalized: PQ quantizes raw coordinates so the ADC sum
    * reconstructs the raw inner product. Empty clusters keep their old
    * codeword (same rule as IVF training), so training is a pure
    * function of (corpus, params). */
  def trainPqCodebooks(
      corpus: DataFrame,
      numSub: Int = 8,
      bookSize: Int = 256,
      sampleSize: Int = 2048,
      iterations: Int = 5,
      seed: Long = 42L): Array[Array[Array[Float]]] = {
    val sample = corpus
      .orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      .limit(sampleSize)
      .select(col("features")).collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "empty corpus")
    val dim = sample.head.length
    require(dim % numSub == 0, s"dim $dim not divisible by numSub $numSub")
    val subDim = dim / numSub

    Array.tabulate(numSub) { sub =>
      val off = sub * subDim
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, off, off + subDim))
      var centroids = pts.take(bookSize).map(_.clone())
      // fewer sample points than codewords: pad with repeats (degenerate
      // but well-defined; duplicates never win an argmin over the first)
      if (centroids.length < bookSize)
        centroids = Array.tabulate(bookSize)(i => pts(i % pts.length).clone())
      var it = 0
      while (it < iterations) {
        val sums = Array.fill(bookSize)(new Array[Double](subDim))
        val counts = new Array[Long](bookSize)
        pts.foreach { p =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < bookSize) {
            val row = centroids(c)
            var d2 = 0.0
            var j = 0
            while (j < subDim) {
              val d = p(j).toDouble - row(j); d2 += d * d; j += 1
            }
            if (d2 < bestD) { bestD = d2; best = c }
            c += 1
          }
          counts(best) += 1
          var j = 0
          while (j < subDim) { sums(best)(j) += p(j); j += 1 }
        }
        centroids = centroids.zipWithIndex.map { case (old, c) =>
          if (counts(c) == 0) old
          else sums(c).map(x => (x / counts(c)).toFloat)
        }
        it += 1
      }
      centroids
    }
  }

  /** ANN top-k via product quantization with asymmetric distance
    * computation and exact re-rank — the BYTES-PER-ROW scale path taken
    * to its limit: [[quantizedTopK]] stores 1 byte per component
    * (d bytes/row); PQ stores 1 byte per SUBSPACE (m bytes/row — 8
    * bytes + a 4-byte norm for a 64-dim vector, 21× less than float32),
    * and scoring a candidate costs m table reads ([[graft.functions.PqAdc]])
    * instead of d multiply-adds, after a once-per-query m·k-entry LUT
    * ([[graft.functions.PqLut]]). This is the memory layout and kernel
    * of a billion-vector IVF-PQ system (Jégou et al. '11; FAISS
    * `IndexIVFPQ`): compose with [[ivfCandidatePairs]]' cell routing for
    * the scan-fraction cut — the two are orthogonal, and this operator
    * exhibits the PQ half over the full corpus so its quality is
    * attributable to quantization alone (pinned as s11).
    *
    * Approximate ranking divides the ADC dot by the exact stored corpus
    * norm — approximate COSINE, constant query norm dropped — then only
    * `k·refine` survivors per query touch full-width floats for the
    * exact re-rank (identical tail to [[quantizedTopK]]/[[rpTopK]]).
    * Codebooks train driver-side on a deterministic sample; encode, LUT
    * and ADC are all codegen'd projections, so the corpus never
    * shuffles and the scan is one whole-stage-codegen pass over
    * (id, codes, norm). */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      numSub: Int = 8,
      bookSize: Int = 256,
      refine: Int = 16,
      sampleSize: Int = 2048,
      seed: Long = 42L): DataFrame = {
    val books = trainPqCodebooks(corpus, numSub, bookSize, sampleSize, seed = seed)

    val c = corpus.select(col("id").as("nbr_id"),
      VectorFunctions.pq_encode(col("features"), books).as("codes"),
      VectorFunctions.vector_norm(col("features")).as("n_c"))
    val q = queries.select(col("id").as("query_id"),
      VectorFunctions.pq_lut(col("features"), books).as("lut"))

    val wApprox = Window.partitionBy("query_id").orderBy(desc("pscore"), asc("nbr_id"))
    val cands = c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .withColumn("pscore",
        VectorFunctions.pq_adc(col("lut"), col("codes")) / col("n_c"))
      .withColumn("rk", row_number().over(wApprox))
      .filter(col("rk") <= k * refine)
      .select("query_id", "nbr_id")

    exactRerank(cands, corpus, queries, k)
  }

  /** The full IVF-PQ composition (FAISS `IndexIVFPQ`): coarse
    * centroids route each query to its `nProbe` nearest cells
    * (scan-fraction cut, [[ivfCandidatePairs]]' geometry) and the
    * in-cell candidates are scored from their m-byte PQ codes by ADC
    * table lookup ([[pqTopK]]'s kernel) — the scan touches
    * `nProbe/nCells` of the corpus at m bytes + one stored norm per
    * row, and the full-width floats appear only in the `k·refine`
    * exact re-rank. This is the memory-traffic shape of a
    * billion-vector serving index: at the defaults the candidate scan
    * streams 6/256ths of the bytes a brute float scan would
    * (16/32 of the rows × 12/256 bytes each).
    *
    * Both models train driver-side on deterministic samples of the
    * FULL corpus (cells must not depend on the query batch, codebooks
    * not on the cells — index built once, probed forever). Quality is
    * pinned as s13; the isotropic fixture stacks IVF's worst case
    * (fragmented neighborhoods) on PQ's (no subspace structure), so
    * the pins sit at the IVF operating point with a small PQ haircut —
    * the clustered exhibit in OpsSpec shows the production geometry. */
  def pqTopKIvf(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nCells: Int = 32,
      nProbe: Int = 16,
      numSub: Int = 8,
      bookSize: Int = 256,
      refine: Int = 16,
      sampleSize: Int = 2048,
      seed: Long = 42L): DataFrame = {
    val centroids = trainIvfCentroids(corpus, nCells, sampleSize, seed = seed)
    val books = trainPqCodebooks(corpus, numSub, bookSize, sampleSize, seed = seed)

    val c = corpus.select(col("id").as("nbr_id"),
      cellOf(col("features"), centroids).as("cell"),
      VectorFunctions.pq_encode(col("features"), books).as("codes"),
      VectorFunctions.vector_norm(col("features")).as("n_c"))

    val cellDists = centroids.indices.map { i =>
      struct((-VectorFunctions.vector_dot(col("features"), typedlit(centroids(i).toSeq))).as("d"),
        lit(i).as("cell"))
    }
    // Probe pairs are tiny (query_id, cell) rows; the m·k-entry LUT —
    // the dominant per-query payload (16 KB at the defaults) — joins
    // once per query AFTER the cell routing, so it never rides the
    // nProbe-fold probe explode through the broadcast.
    val probes = queries
      .withColumn("probe", slice(array_sort(array(cellDists: _*)), 1, nProbe))
      .select(col("id").as("query_id"), explode(col("probe")).as("pc"))
      .select(col("query_id"), col("pc.cell").as("cell"))
    val luts = queries.select(col("id").as("query_id"),
      VectorFunctions.pq_lut(col("features"), books).as("lut"))

    val wApprox = Window.partitionBy("query_id").orderBy(desc("pscore"), asc("nbr_id"))
    val cands = c.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("nbr_id"))
      .join(broadcast(luts), Seq("query_id"))
      .withColumn("pscore",
        VectorFunctions.pq_adc(col("lut"), col("codes")) / col("n_c"))
      .withColumn("rk", row_number().over(wApprox))
      .filter(col("rk") <= k * refine)
      .select("query_id", "nbr_id")

    exactRerank(cands, corpus, queries, k)
  }

  /** ANN top-k via multi-table random-hyperplane LSH (OR-construction)
    * with hamming-`probeRadius` multiprobe within each table.
    *
    * Each of `numTables` independent tables hashes the corpus to
    * 2^numPlanes buckets ([[graft.functions.LshBuckets]] computes every
    * table's bucket id in one codegen pass); a query probes its own
    * bucket plus all hamming-≤`probeRadius` neighbors IN EACH TABLE, and
    * a candidate survives if it collides in ANY table. The
    * OR-construction is what makes sign-LSH usable on weakly clustered
    * corpora: per-table collision probability p for a true neighbor is
    * modest, but 1−(1−p)^L approaches 1 while the probed fraction grows
    * only linearly in L.
    *
    * Defaults (8 planes × 24 tables, radius 1): measured recall 0.95 on
    * the synthetic fixture with a distinct-candidate fraction of
    * ~1−(1−9/256)^24 ≈ 0.58 of the corpus per query (background pairs
    * dedup across tables). The fixture is ISOTROPIC — near-uniform
    * directions, the worst case for sign-LSH, where true top-10
    * neighbors sit at cosine ≈ 0.45 and collide little better than
    * background. Clustered real embeddings separate the two collision
    * probabilities sharply and prune far harder at equal recall with
    * cluster-tuned params (more planes, fewer tables): MEASURED
    * (OpsSpec planted-50-cluster corpus, via [[lshCandidatePairs]])
    * recall 1.0 at 10 planes × 8 tables scanning 12.6% of the corpus.
    *
    * Scale shape: the corpus never shuffles — bucket ids are a codegen'd
    * projection, the probe side is broadcast, and candidate pairs leave
    * the join as narrow (query_id, nbr_id, cosine) triples that dedup
    * across tables map-side before the per-query top-k. Index cost is
    * the standard L× bucket-row replication, paid in the join stream,
    * not in storage or shuffle.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      numPlanes: Int = 8,
      numTables: Int = 24,
      probeRadius: Int = 1,
      seed: Long = 42L): DataFrame =
    rankTopK(
      lshCandidatePairs(corpus, queries, numPlanes, numTables, probeRadius, seed), k)

  /** The deduped scored candidate stream of [[lshTopK]] before the
    * per-query rank: every (query, corpus) pair colliding in ≥ 1 table,
    * exactly once. Exposed so tests can MEASURE the distinct-candidate
    * fraction — `count / (|Q|·(N−1))` — rather than quote the
    * 1−(1−p)^L estimate. */
  def lshCandidatePairs(
      corpus: DataFrame,
      queries: DataFrame,
      numPlanes: Int = 8,
      numTables: Int = 24,
      probeRadius: Int = 1,
      seed: Long = 42L): DataFrame = {
    val c = corpus.select(col("id").as("nbr_id"), col("features").as("v_c"),
        VectorFunctions.vector_norm(col("features")).as("n_c"),
        posexplode(VectorFunctions.lsh_buckets(col("features"), numPlanes, numTables, seed))
          .as(Seq("tbl", "bucket")))
    val probes = probeMasks(numPlanes, probeRadius)
      .map(m => col("qb").bitwiseXOR(lit(m)))
    val q = queries.select(col("id").as("query_id"), col("features").as("v_q"),
        VectorFunctions.vector_norm(col("features")).as("n_q"),
        posexplode(VectorFunctions.lsh_buckets(col("features"), numPlanes, numTables, seed))
          .as(Seq("tbl", "qb")))
      .withColumn("bucket", explode(array(probes: _*)))
      .select(col("query_id"), col("v_q"), col("n_q"), col("tbl"), col("bucket"))

    c.join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cosine",
        VectorFunctions.cosine_ranked(
          VectorFunctions.vector_dot(col("v_q"), col("v_c")),
          col("n_q"), col("n_c")))
      // A pair colliding in several tables appears once per collision;
      // the values are identical, so max() is a pure dedup — done BEFORE
      // the downstream rank window so the shuffle carries unique narrow
      // triples (and the partial agg dedups map-side).
      .groupBy(col("query_id"), col("nbr_id"))
      .agg(max(col("cosine")).as("cosine"))
  }
}
