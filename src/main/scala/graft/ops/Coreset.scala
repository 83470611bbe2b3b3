package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Similarity

/** K-center greedy coreset selection (Gonzalez 1985 farthest-point
  * traversal — the 2-approximation to the metric k-center problem, and
  * the selection rule of Sener & Savarese 2018's coreset active
  * learning): pick the point FARTHEST from everything chosen so far,
  * repeat. The result is a size-t subset whose covering radius is
  * within 2× of the optimal t-subset's — the GLOBAL diversity
  * guarantee the query-relative MMR re-ranker (s17) and the
  * list-local occlusion rule (n08) don't give: every corpus point is
  * provably within the returned radius of some center, so the coreset
  * is a faithful skeleton for curriculum seeding, eval-set selection,
  * or cluster initialization.
  *
  * Deterministic by construction: the first center is the minimum id,
  * every later round picks (max distance, then min id) — a total
  * order, so the selected sequence is a pure function of the corpus
  * regardless of partitioning or arrival order. Distances are
  * [[Similarity.l2]] doubles (each a fixed function of two vectors —
  * no accumulation, so no float reassociation anywhere).
  *
  * Scale shape: t − 1 rounds, each ONE narrow map over the corpus
  * (update the running min-distance against the single new broadcast
  * center — the codegen'd `l2Col` kernel) plus ONE 1-row max-struct
  * aggregate (partial aggs map-side; only 32 candidate rows reach the
  * driver-side reduce). Driver state = t (id, vector) pairs, bounded
  * by the argument. The running state (id, features, min-dist) is
  * localCheckpoint'ed per round with the previous round released — at
  * any instant exactly ONE corpus-sized copy is resident
  * (MEMORY_AND_DISK, spills), the NND C1/C2 idiom. Total work
  * O(t·N·dim), the textbook bound; no shuffle of the corpus, ever.
  */
object Coreset {

  /** Fixed-point scale for pinned distances: 2⁻²⁰ units. */
  val Scale: Long = 1L << 20

  /** Greedy k-center selection.
    *
    * @return `(round INT, id BIGINT, sel_dist_fp BIGINT)` — one row per
    *         selected center in selection order. `sel_dist_fp` is the
    *         center's distance to the nearest EARLIER center at the
    *         moment it was picked (rint(d·2²⁰); 0 for round 0) — the
    *         covering radius of the prefix before it, so the column is
    *         nonincreasing from round 1 (the Gonzalez invariant,
    *         OpsSpec-pinned). Fewer than `t` rows come back only when
    *         the corpus is smaller than `t`.
    */
  def kCenters(corpus: DataFrame, t: Int, idCol: String = "id",
      vecCol: String = "features"): DataFrame = {
    require(t >= 1, s"t must be >= 1, got $t")
    val spark = corpus.sparkSession
    import spark.implicits._

    import graft.core.Checkpoints.{truncate, release}

    // Round 0: the minimum id — deterministic without any distance.
    // min(struct(id, features)) resolves on id alone (ids unique); the
    // features ride along so no second fetch is needed. Row-decoded
    // like the per-round pick: on an empty corpus the 1-row aggregate
    // carries a NULL struct, which a non-nullable tuple encoder would
    // reject before the emptiness guard could see it.
    val first = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .agg(min(struct(col("id"), col("v"))).as("m"))
      .select(col("m.id"), col("m.v"))
      .collect()(0)
    if (first.isNullAt(0)) {
      return spark.emptyDataset[(Int, Long, Long)]
        .toDF("round", "id", "sel_dist_fp")
    }
    val firstId = first.getLong(0)
    val centers = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)](
      (0, firstId, 0L))

    // Running state: every not-yet-picked point with its distance to
    // the nearest chosen center. Each round: one narrow map against
    // the single new center (no join — the center is a literal), one
    // 1-row argmax.
    var cVec = first.getSeq[Float](1).toArray
    var state = truncate(corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .filter(col("id") =!= firstId)
      .withColumn("d", Similarity.l2Col(col("v"), typedLit(cVec))))
    var round = 1
    var exhausted = false
    while (round < t && !exhausted) {
      // argmax by (d desc, id asc): max(struct(d, -id, ...)) — ids are
      // unique so the features slot never participates in ordering.
      // Row-decoded (not a typed Dataset): on an exhausted state the
      // 1-row aggregate carries a NULL struct, which a non-nullable
      // tuple encoder would reject before the guard could see it.
      val pick = state
        .agg(max(struct(col("d"), (-col("id")).as("nid"), col("id").as("pid"),
          col("v"))).as("m"))
        .select(col("m.pid"), col("m.d"), col("m.v"))
        .collect()(0)
      if (pick.isNullAt(0)) exhausted = true
      else {
        val cid = pick.getLong(0)
        val dist = pick.getDouble(1)
        val vec = pick.getSeq[Float](2).toArray
        centers += ((round, cid, math.rint(dist * Scale.toDouble).toLong))
        cVec = vec
        val next = truncate(state
          .filter(col("id") =!= cid)
          .withColumn("d",
            least(col("d"), Similarity.l2Col(col("v"), typedLit(cVec)))))
        release(state)
        state = next
        round += 1
      }
    }
    release(state)
    spark.createDataset(centers.toSeq).toDF("round", "id", "sel_dist_fp")
  }

  /** Assign every corpus point to its nearest center — the coreset's
    * cluster structure (and its exact covering radius, the max of the
    * returned distances).
    *
    * The centers' vectors are fetched by one id-join and collected —
    * bounded by t, the same t-sized driver state [[kCenters]] already
    * holds — then folded into the projection as LITERALS: the
    * assignment is one zero-exchange map over the corpus (an
    * `array_min` over t codegen'd distance kernels; nearest-center
    * ties resolve to the earliest round via `array_position`, a total
    * order). No join against the corpus, no shuffle, no per-row UDF.
    * Capped at 256 centers — past that the folded expression falls out
    * of codegen and a join-based plan wins (the require below).
    *
    * @param centers [[kCenters]] output (`round`, `id`).
    * @return `(id BIGINT, center_id BIGINT, dist_fp BIGINT)`.
    */
  def assign(corpus: DataFrame, centers: DataFrame, idCol: String = "id",
      vecCol: String = "features"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val rc: Array[(Int, Long)] = centers
      .select(col("round").cast("int"), col("id").cast("long"))
      .as[(Int, Long)].collect().sortBy(_._1)
    require(rc.nonEmpty, "assign: no centers")
    // The literal-folded plan is only right while the generated
    // expression stays inside codegen limits: each center contributes a
    // full L2 kernel to ONE projection, and past a few hundred centers
    // Janino splits/overflows and Spark falls back to INTERPRETED
    // per-row evaluation of t kernels — silently, at corpus scale. Gate
    // rather than degrade (the packBins capacity-guard precedent); a
    // t-in-the-thousands assignment wants a (corpus x centers)
    // broadcast-join plan, which no current caller needs (declared t is
    // 8-32).
    require(rc.length <= 256,
      s"assign: ${rc.length} centers exceeds the literal-folding cap " +
        "(256); a center set this large needs a join-based assignment, " +
        "not a folded projection")
    val vecs: Map[Long, Array[Float]] = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .join(spark.createDataset(rc.map(_._2).toSeq).toDF("id"), "id")
      .as[(Long, Array[Float])].collect().toMap
    require(rc.forall(c => vecs.contains(c._2)),
      "assign: a center id is not in the corpus")
    val dists: Column = array(rc.map(c =>
      Similarity.l2Col(col("v"), typedLit(vecs(c._2)))): _*)
    val ids: Column = array(rc.map(c => lit(c._2)): _*)
    corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("ds", dists)
      .withColumn("dmin", array_min(col("ds")))
      .select(col("id"),
        element_at(ids, array_position(col("ds"), col("dmin")).cast("int"))
          .as("center_id"),
        bround(col("dmin") * lit(Scale.toDouble), 0).cast("long")
          .as("dist_fp"))
  }
}
