package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-centrality scoring of the K-NN serving graph — the corpus-
  * selection signal on top of the engine's core artifact (the built
  * graph is the reference's sole product, `/root/reference/src/main/
  * scala/com/github/fvictorio/nnd/NND.scala:282`): a document central
  * in the similarity graph is similar to many documents that are
  * themselves similar to many — the "representativeness" axis coreset-
  * selection pipelines rank by, complementing the per-document quality
  * gates (t37/t42/t43) and the diversity selectors (MMR s17, occlusion
  * n08) with a GLOBAL structural signal.
  *
  * PageRank (Page et al. 1999) by power iteration, in EXACT FIXED-POINT
  * integer arithmetic: ranks are BIGINT multiples of 2⁻²⁰ (the repo's
  * pin-rounding convention), every per-edge contribution and the
  * damping blend are integer multiply-then-floor-divide, so the result
  * is bit-deterministic regardless of partitioning, aggregation order,
  * or cluster size — a double-precision power iteration would make the
  * per-node in-sums order-dependent and the pinned oracle unstable.
  * Floor division loses at most one 2⁻²⁰ unit per edge per iteration
  * (≤ outdeg units per node), a relative drift < 2⁻¹⁴ at k ≤ 64 —
  * priced and bounded, never nondeterministic.
  */
object Centrality {

  /** Fixed-point scale: ranks are multiples of 2⁻²⁰ of one unit mass. */
  val Scale: Long = 1L << 20

  /** Damped PageRank over a neighbor-list graph.
    *
    * @param graph       `(id BIGINT, neighbors ARRAY<STRUCT<id, …>>)` —
    *                    the serving-graph shape; a NULL or empty list is
    *                    a dangling node (its mass redistributes
    *                    uniformly, the standard treatment). Out-edges
    *                    are UNWEIGHTED (each neighbor receives
    *                    rank ÷ outdeg): centrality here measures the
    *                    graph's structure, which already encodes
    *                    similarity through membership. Contributions to
    *                    ids absent from the node set are dropped (the
    *                    serving artifact has none — `pruneGraph`
    *                    row-preserves and `graphHealth` audits; an
    *                    append-stale graph loses that mass, documented
    *                    not redistributed).
    * @param iterations  fixed power-iteration count — a FIXED count,
    *                    not a convergence test, so the output is a
    *                    deterministic function of the graph.
    * @param dampingNum/dampingDen the damping factor as an exact
    *                    rational (default 85/100).
    * @return `(id BIGINT, rank BIGINT)` — rank in 2⁻²⁰ units; total
    *         mass ≈ N·2²⁰ minus the bounded floor drift.
    *
    * Scale shape: the edge table (one explode of the adjacency, N·k
    * rows) is checkpointed once and re-joined each iteration — the
    * NND C1/C2 idiom: per iteration ONE edge-sized hash join (ranks ⋈
    * edges on src), ONE map-side-combining groupBy(dst), one 1-row
    * dangling aggregate, and a left join back over the node set; per-
    * iteration checkpoint + release keeps lineage and executor blocks
    * flat across iterations. No per-node driver state, no collect of
    * anything wider than one row — but that 1-row dangling aggregate IS
    * a synchronous driver action per iteration, so total driver latency
    * grows as iterations × round-trip; at the default 10 iterations
    * it is noise, at hundreds of iterations it would dominate wall and
    * the dangling mass should move into the joined plan instead.
    */
  def pageRank(graph: DataFrame, iterations: Int = 10,
      dampingNum: Long = 85L, dampingDen: Long = 100L): DataFrame =
    pprImpl(graph, None, iterations, dampingNum, dampingDen,
      weighted = false)._1

  /** Edge-weighted PageRank: each out-edge receives rank in proportion
    * to its stored `similarity` instead of uniformly — on the K-NN
    * serving graph this measures similarity MASS, not just membership
    * (a node kept at distance ~0 by its neighbors pulls more rank than
    * one kept at the list tail), the natural refinement when edge
    * strengths are trusted.
    *
    * Exactness is preserved: weights quantize once to BIGINT 2⁻²⁰
    * units (floored to ≥ 1 so a sub-ulp similarity still conducts),
    * per-source weight sums are exact BIGINTs, and each contribution
    * is (rank·w) DIV wsum computed through an exact DECIMAL(38,0)
    * product — no overflow to any realistic corpus, no reassociation,
    * bit-deterministic like the uniform kernel. Degeneracy contract:
    * EQUAL weights reduce to (rank·w) DIV (k·w) = rank DIV k, so a
    * constant-similarity graph is BIT-IDENTICAL to [[pageRank]]
    * (OpsSpec pins it — the same cannot-drift argument the
    * personalized variant carries for its teleport).
    */
  def weightedPageRank(graph: DataFrame, iterations: Int = 10,
      dampingNum: Long = 85L, dampingDen: Long = 100L): DataFrame =
    pprImpl(graph, None, iterations, dampingNum, dampingDen,
      weighted = true)._1

  /** Personalized PageRank (the seeded-teleport variant, Page et al.
    * 1999 §6 / Haveliwala 2002 topic-sensitive PageRank): the teleport
    * mass — the (1−d) restart AND every dangling node's redistributed
    * rank — flows only to `seeds` instead of uniformly, so rank
    * concentrates around the seed set: the seed-expansion signal
    * curation pipelines rank by when a small trusted set ("documents
    * like these") should pull in its graph neighborhood, complementing
    * [[pageRank]]'s global representativeness.
    *
    * Same exact fixed-point arithmetic as [[pageRank]] (BIGINT 2⁻²⁰
    * units, integer multiply/floor-divide, bit-deterministic under any
    * partitioning): each in-graph seed's per-iteration restart is
    * (N·2²⁰·(den−num)) DIV (den·|S|) — when `seeds` covers every node
    * the rational equals the uniform base exactly, so PPR(all nodes)
    * is BIT-IDENTICAL to [[pageRank]] (OpsSpec pins it). Ranks
    * initialize uniformly at 2²⁰ (any fixed init converges to the same
    * stationary neighborhood; uniform keeps zero-iteration behavior
    * identical across both variants). Total mass stays ≈ N·2²⁰ minus
    * the same bounded floor drift.
    *
    * @param seeds one `id` column; ids absent from the graph are
    *              ignored (the teleport targets are the INTERSECTION —
    *              at least one must be present). Duplicates collapse.
    */
  def personalizedPageRank(graph: DataFrame, seeds: DataFrame,
      iterations: Int = 10, dampingNum: Long = 85L,
      dampingDen: Long = 100L, weighted: Boolean = false): DataFrame =
    pprImpl(graph, Some(seeds), iterations, dampingNum, dampingDen,
      weighted)._1

  /** Any of the three variants plus the CONVERGENCE RESIDUAL: the exact
    * BIGINT L1 distance `Σ|rank_T − rank_{T−1}|` (in 2⁻²⁰ units)
    * between the final two iterations — evidence that the fixed
    * iteration count actually converged, not a convention (power
    * iteration contracts geometrically at rate ≈ d·|λ₂|, so a small
    * residual bounds the remaining distance to the stationary vector by
    * residual/(1−d)). Exact integer arithmetic like the ranks
    * themselves, so the residual is a pinnable bit-deterministic fact.
    * Zero iterations have no two iterates to difference — residual 0 by
    * convention (the init IS the output). Costs one extra N-row join +
    * 1-row aggregate over [[pageRank]]; the residual-free entry points
    * skip it. */
  def pageRankWithResidual(graph: DataFrame, seeds: Option[DataFrame] = None,
      iterations: Int = 10, dampingNum: Long = 85L,
      dampingDen: Long = 100L, weighted: Boolean = false): (DataFrame, Long) =
    pprImpl(graph, seeds, iterations, dampingNum, dampingDen, weighted,
      withResidual = true)

  private def pprImpl(graph: DataFrame, seeds: Option[DataFrame],
      iterations: Int, dampingNum: Long, dampingDen: Long,
      weighted: Boolean, withResidual: Boolean = false): (DataFrame, Long) = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(dampingDen > 0 && dampingNum >= 0 && dampingNum <= dampingDen,
      s"damping must satisfy 0 <= num <= den, got $dampingNum/$dampingDen")
    val spark = graph.sparkSession
    import spark.implicits._

    import graft.core.Checkpoints.{truncate, release}

    val nodes = truncate(graph.select(col("id").cast("long").as("id"),
      coalesce(col("neighbors.id"), array().cast("array<bigint>"))
        .as("out")))
    val n = nodes.count()
    if (n == 0L || iterations == 0) {
      // The returned frame maps over the checkpointed node set — its
      // (at most N-row) blocks stay with the caller's lifecycle. No
      // second iterate exists to difference: residual 0 by convention.
      return (nodes.select(col("id"), lit(Scale).as("rank")), 0L)
    }

    // Static per-iteration operands, checkpointed once: the edge table
    // with its source outdegree, the dangling-node id set, and the
    // per-node teleport table (id, base, tgt) — base the node's restart
    // mass, tgt whether dangling mass lands on it. Uniform PageRank is
    // the degenerate case where every node is a target; the seeded
    // case restricts both flows to the (in-graph, deduplicated) seeds.
    // (N·Scale·(den−num)) DIV (den·|S|) reduces to the uniform base
    // exactly when |S| = N — the two variants share one loop with no
    // value drift.
    // The weighted edge table carries each edge's quantized weight and
    // its source's exact weight sum (one edge-sized window shuffle at
    // setup, checkpointed once — never repeated per iteration); the
    // uniform table carries only the outdegree. Weights floor to >= 1
    // unit so a sub-ulp similarity still conducts (and wsum > 0 by
    // construction).
    val edges = truncate(
      if (!weighted)
        nodes.filter(size(col("out")) > 0)
          .select(col("id").as("src"),
            size(col("out")).cast("long").as("outdeg"),
            explode(col("out")).as("dst"))
      else {
        val sw = org.apache.spark.sql.expressions.Window.partitionBy("src")
        graph
          .filter(col("neighbors").isNotNull && size(col("neighbors")) > 0)
          .select(col("id").cast("long").as("src"),
            explode(col("neighbors")).as("nb"))
          .select(col("src"), col("nb.id").cast("long").as("dst"),
            greatest(bround(col("nb.similarity") * lit(Scale.toDouble), 0)
              .cast("long"), lit(1L)).as("w"))
          .withColumn("wsum", sum(col("w")).over(sw))
      })
    val dangling = truncate(nodes.filter(size(col("out")) === 0)
      .select(col("id")))
    val (teleport, tgtCount) = seeds match {
      case None =>
        val base = (Scale * (dampingDen - dampingNum)) / dampingDen
        (truncate(nodes.select(col("id"), lit(base).as("base"),
          lit(true).as("tgt"))), n)
      case Some(sd) =>
        val inGraph = nodes.select("id").join(
          sd.select(col("id").cast("long").as("id")).distinct(), "id")
        val c = inGraph.count()
        require(c > 0, "personalizedPageRank: no seed id is in the graph")
        val baseSeed =
          (n * Scale * (dampingDen - dampingNum)) / (dampingDen * c)
        (truncate(nodes.select("id")
          .join(inGraph.withColumn("s", lit(true)), Seq("id"), "left")
          .select(col("id"),
            when(col("s"), lit(baseSeed)).otherwise(lit(0L)).as("base"),
            coalesce(col("s"), lit(false)).as("tgt"))), c)
    }

    var ranks = truncate(nodes.select(col("id"), lit(Scale).as("rank")))
    var residual = 0L
    var iter = 0
    while (iter < iterations) {
      // Dangling mass rides IN-PLAN as a broadcast 1-row aggregate
      // instead of a synchronous driver head() per iteration — the
      // move the original scaladoc prescribed for high iteration
      // counts, taken now because the round-trip was HALF of every
      // iteration's actions (2 jobs -> 1). `dm DIV tgtCount` is the
      // identical floor division the driver did (both operands
      // non-negative), so ranks are bit-unchanged.
      val dangShareDf = broadcast(ranks.join(dangling, Seq("id"), "left_semi")
        .agg(coalesce(sum(col("rank")), lit(0L)).as("dm"))
        .select(expr(s"dm DIV ${tgtCount}L").as("dang_share")))
      val contrib =
        if (!weighted) expr("rank DIV outdeg")
        else expr(
          "CAST((CAST(rank AS DECIMAL(38,0)) * w) DIV wsum AS BIGINT)")
      val inSum = ranks.join(edges, col("id") === col("src"))
        .select(col("dst").as("id"), contrib.as("c"))
        .groupBy("id").agg(sum(col("c")).as("in_sum"))
      val next = truncate(teleport
        .join(inSum, Seq("id"), "left")
        .crossJoin(dangShareDf)
        .select(col("id"),
          (col("base") +
            expr(s"(${dampingNum}L * (coalesce(in_sum, 0L) +" +
              s" (CASE WHEN tgt THEN dang_share ELSE 0L END)))" +
              s" DIV ${dampingDen}L")).as("rank")))
      val prev = ranks
      ranks = next
      iter += 1
      // The final iteration's predecessor stays alive when the caller
      // asked for the residual — it is one of the two iterates being
      // differenced; every earlier predecessor releases as before.
      if (withResidual && iter == iterations) {
        residual = ranks.select(col("id"), col("rank").as("r1"))
          .join(prev.select(col("id"), col("rank").as("r0")), "id")
          .agg(coalesce(sum(abs(col("r1") - col("r0"))), lit(0L)))
          .as[Long].head()
      }
      release(prev)
    }
    release(edges); release(dangling); release(teleport); release(nodes)
    (ranks, residual)
  }
}
