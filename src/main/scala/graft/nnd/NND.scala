package graft.nnd

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.{Edge, Neighbor, NeighborList, Similarity}

import scala.collection.mutable
import scala.util.Random

/** Distributed approximate K-nearest-neighbor graph construction
  * (NN-Descent), Spark-SQL-native.
  *
  * Same capability as the reference `NND.buildGraph` (`/root/reference/
  * src/main/scala/com/github/fvictorio/nnd/NND.scala:66`): blocked random
  * initialization, iterative local-join refinement with reverse-edge
  * ρ-sampling, δ early termination, partition-gated similarity, and
  * finished-row passthrough — but declared as DataFrame transforms so
  * Catalyst handles column pruning / AQE, with typed per-group logic only
  * for the two genuinely imperative steps (random in-bucket draws, the
  * Av×Av local join).
  *
  * Scale design notes (vs the reference's hand-rolled RDD rounds):
  *  - The reference's light/heavy message split (features shuffled only to
  *    consumers that need them, `NND.scala:40-60`) becomes an explicit
  *    two-table layout: a narrow edge table `(src, dst, sim)` plus one
  *    features join per iteration. Features cross the wire exactly once
  *    per iteration (the adjacency build), like the reference's G3/G4.
  *  - All randomness is seeded per (node, iteration) — the reference used
  *    global unseeded `Random` in two places (`NND.scala:98,148`), which
  *    is nondeterministic under task retries; ours is retry-safe.
  *  - Each iteration's graph is `localCheckpoint`ed: under Catalyst,
  *    unbounded lineage growth (plan analysis cost) is the iterative
  *    killer; truncating per iteration keeps round cost flat.
  */
// Internal row shapes: top-level (not object-nested private) because
// Catalyst's generated (de)serializer code must be able to access them.
private[nnd] final case class NodeRow(id: Long, features: Array[Float], partition: Long)
private[nnd] final case class BucketedNode(bucket: Long, id: Long, features: Array[Float], partition: Long)
/** A candidate edge; `isOld` marks members of the previous iteration's
  * list (the reference's B flag — old entries win dedup and don't count
  * as updates, `NND.scala:228-246`). `private[graft]` (not `[nnd]`): the
  * streaming ANN serve reuses [[TopKAggregator]]'s bounded-state merge
  * as its per-query top-k state. */
private[graft] final case class Cand(src: Long, dst: Long, sim: Double, isOld: Boolean)
private[nnd] final case class AdjRow(
    src: Long, dst: Long, features: Array[Float], partition: Long, isNew: Boolean)
/** Neighbor list with per-entry new flags (true = entered the list this
  * iteration) — the state the incremental local join needs. */
private[nnd] final case class FlaggedList(id: Long, neighbors: Seq[Neighbor], isNew: Seq[Boolean])
private[nnd] final case class FlaggedEdge(src: Long, dst: Long, sim: Double, isNew: Boolean)

object NND {

  /** Reference parameter regime (`/root/reference/README.md:43-48`) plus
    * `expansion`: the graph is built internally at k' = ceil(k·expansion)
    * and truncated to k on output. K-expansion is the standard NN-descent
    * quality lever (wider lists → denser neighbor-of-neighbor exploration
    * → faster convergence to a better optimum): on the uniform-random
    * sf0.1 fixture it lifts recall@10 from 0.57 to 0.95 at comparable
    * wall time. Set expansion = 1.0 for strict reference behavior. */
  /** `checkpointDir`: when set, per-iteration lineage truncation uses a
    * DURABLE `checkpoint` to this (DFS) path instead of
    * `localCheckpoint` — localCheckpoint blocks live on executors and
    * die with them, which on a real cluster turns one lost executor
    * into a failed job; the durable form survives executor loss at the
    * cost of one DFS write per iteration. Two caveats the caller owns:
    * Spark does not delete reliable checkpoints (retention = clean the
    * directory after the result is consumed, or run with
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true`), and the
    * checkpoint dir is GLOBAL SparkContext state — concurrent builds in
    * one session should share a single directory. */
  /** `pruneAlpha`/`pruneMaxDegree`: when `pruneAlpha` is set, every
    * merged neighbor list is occlusion-pruned IN-LOOP with the shared
    * RobustPrune kernel ([[graft.core.Occlusion]]) — DiskANN's
    * construction shape (prune while building, not post-hoc), bounding
    * list degree to `pruneMaxDegree` DURING construction so each
    * iteration's adjacency join moves fewer edges. Trade-offs the
    * caller owns: (1) pruned lists explore fewer neighbor-of-neighbor
    * pairs AND keep fewer than k entries, so direct list recall
    * converges lower than build-then-
    * [[graft.ops.GraphSearch.pruneGraph]] at equal k — measured on the
    * sf0.001 fixture: 0.94 at the DiskANN α = 1.2 operating point vs
    * 0.997 unpruned, collapsing to 0.68 at strict-RNG α = 1.0
    * (NNDSpec prices it; the artifact's value is navigability at low
    * degree, not raw list recall); (2) a pruned-away candidate can be
    * re-proposed by a later
    * local join and re-counted as an update, so the δ-termination
    * ratio may stay above threshold and the loop run to
    * `maxIterations` — the iteration cap, not δ, is the bound under
    * aggressive pruning. `pruneAlpha = None` (default) is bit-exact
    * legacy behavior. */
  final case class Params(
      k: Int = 10,
      maxIterations: Int = 5,
      earlyTermination: Double = 0.01,
      sampleRate: Double = 1.0,
      bucketsPerInstance: Int = 4,
      seed: Long = 42L,
      expansion: Double = 2.0,
      checkpointDir: Option[String] = None,
      pruneAlpha: Option[Double] = None,
      pruneMaxDegree: Int = Int.MaxValue)

  /** Build the approximate K-NN graph.
    *
    * @param input DataFrame with columns `id: LONG`, `features:
    *   ARRAY<FLOAT>`; optional `partition: LONG` (logical grouping — the
    *   graph is built independently per partition) and `finished: BOOLEAN`
    *   (excluded from construction, passed through with null neighbors).
    *   Extra columns (e.g. `label`) pass through untouched.
    * @return the input columns plus `neighbors: ARRAY<STRUCT<id LONG,
    *   similarity DOUBLE>>` sorted by descending similarity (null for
    *   finished/isolated rows).
    */
  def buildGraph(input: DataFrame, p: Params = Params()): DataFrame = {
    require(input.columns.contains("id") && input.columns.contains("features"),
      s"buildGraph input needs 'id' and 'features' columns; got [${input.columns.mkString(", ")}]")
    gateParams(p)
    val spark = input.sparkSession
    import spark.implicits._

    p.checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    // Durable lineage truncation when a checkpoint dir is configured;
    // executor-local blocks otherwise (fastest, fine for local mode).
    def truncate[T](ds: Dataset[T]): Dataset[T] =
      if (p.checkpointDir.isDefined) ds.checkpoint() else ds.localCheckpoint(true)

    val base = withDefaultCols(input)

    // Persisted pre-partitioned on id: every per-iteration features join
    // (adjacency build) then reuses this partitioning, so the feature
    // table itself is never re-shuffled across iterations — only the
    // narrow id-pair side moves.
    val nodes = base
      .filter(!col("finished"))
      .select(col("id").cast("long").as("id"),
        col("features").cast("array<float>").as("features"),
        col("partition").cast("long").as("partition"))
      .repartition(col("id"))
      .as[NodeRow]
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Per-logical-partition counts: cardinality = number of logical
    // partitions (small by construction), so a driver map + broadcast is
    // the right shape even at 100 TB (reference closure-captures the same
    // map, NND.scala:77-90).
    val counts: Map[Long, Long] =
      nodes.groupBy($"partition").count().as[(Long, Long)].collect().toMap

    if (counts.isEmpty) {
      nodes.unpersist()
      return base.withColumn("neighbors",
        lit(null).cast("array<struct<id:bigint,similarity:double>>"))
    }

    val n = counts.values.sum
    val bcCounts = spark.sparkContext.broadcast(counts)
    // Internal build width k' (K-expansion; output truncates to p.k).
    val k = math.max(p.k, math.ceil(p.k * p.expansion).toInt)
    val bpi = p.bucketsPerInstance
    val seed = p.seed
    val maxBuckets =
      math.max(1L, math.ceil(counts.values.max.toDouble * bpi / (2.0 * k)).toLong)

    // --- Blocked random init (reference G1, NND.scala:87-102) ---
    // [[drawBuckets]] bucket choice, namespaced per logical partition so
    // initial candidates never cross partitions.
    val bucketed: Dataset[BucketedNode] = nodes.flatMap { nd =>
      drawBuckets(seed, nd.features, bcCounts.value(nd.partition), bpi, k)
        .map(b => BucketedNode(maxBuckets * nd.partition + b, nd.id, nd.features, nd.partition))
        .toSeq
    }

    val initCands: Dataset[Cand] = bucketed
      .groupByKey(_.bucket)
      .flatMapGroups { (bucket, it) =>
        val members = dedupById(it)
        members.iterator.flatMap(nd => inBucketDraws(seed, bucket, nd, members, k))
      }

    var graph: Dataset[FlaggedList] = truncate(
      mergeTopK(initCands, k)
        .map(g => FlaggedList(g._1, g._2.neighbors, g._2.old.map(!_))))
    // The checkpoint BACKING `graph`: from iteration 1 on, `graph` is a
    // map over the checkpointed `merged`, and release() must target the
    // checkpointed frame itself (the bridge frees only a checkpoint-
    // ROOTED plan — walking arbitrary plans for LogicalRDD leaves would
    // also free checkpoints a caller composed in).
    var graphCk: Dataset[_] = graph
    // In-loop occlusion prune (DiskANN construction shape): the init
    // lists are pruned like every later merge, so degree is bounded
    // from the first adjacency join on.
    p.pruneAlpha.foreach { a =>
      val pruned = truncate(pruneFlagged(graph, nodes, a, p.pruneMaxDegree))
      release(graphCk)
      graph = pruned
      graphCk = pruned
    }

    // --- Iterative refinement (reference C1 loop, NND.scala:111-263) ---
    var finished = false
    var iter = 0
    while (!finished && iter < p.maxIterations) {
      val edges: Dataset[FlaggedEdge] =
        graph.flatMap(nl => nl.neighbors.iterator.zip(nl.isNew.iterator)
          .map { case (nb, fresh) => FlaggedEdge(nl.id, nb.id, nb.similarity, fresh) })

      val sampledRev = sampleReverse(edges, p.sampleRate, iter, seed)

      // Adjacency set Av = Bv ∪ sample(Rv) (reference G4): the ONLY place
      // features are shuffled — one narrow-ids union, one join against the
      // node table (reference sends features point-to-point in G3/G4; a
      // shuffle join on dst is the relational equivalent). `nodes` is
      // persisted pre-partitioned on id, so only the narrow id-pairs side
      // shuffles here — features leave their partition exactly once, into
      // the adjacency grouping. Duplicate (src,dst) pairs (a node both a
      // forward and sampled-reverse neighbor) are deduped inside the
      // per-group array instead of a dedicated dropDuplicates shuffle.
      val adj: Dataset[AdjRow] = edges.select($"src", $"dst", $"isNew")
        .union(sampledRev)
        .join(nodes.toDF().select($"id".as("dst"), $"features", $"partition"), "dst")
        .select($"src", $"dst", $"features", $"partition", $"isNew")
        .as[AdjRow]

      val pairCands: Dataset[Cand] = adj
        .groupByKey(_.src)
        .flatMapGroups((_, it) => localJoinPairs(it))

      val oldCands: Dataset[Cand] = edges.map(e => Cand(e.src, e.dst, e.sim, isOld = true))

      // Merge with map-side partial aggregation; the per-node updated
      // count rides in the merged result, so convergence needs no
      // accumulator (deterministic under task retries).
      val merged = truncate(mergeTopK(pairCands.unionByName(oldCands), k))
      val updates = merged.map(_._2.updated.toLong).toDF("u")
        .agg(coalesce(sum($"u"), lit(0L))).as[Long].head()
      // Update counting happens on the UNPRUNED merge (an entry that
      // made the top-k' is an update whether or not occlusion then
      // drops it) — the δ semantics stay identical to the unpruned
      // path; the Params scaladoc documents the re-proposal caveat.
      val (newGraph, newCk): (Dataset[FlaggedList], Dataset[_]) =
        p.pruneAlpha match {
          case None =>
            (merged.map(g => FlaggedList(g._1, g._2.neighbors, g._2.old.map(!_))),
              merged)
          case Some(a) =>
            val pruned = truncate(pruneFlagged(
              merged.map(g => FlaggedList(g._1, g._2.neighbors, g._2.old.map(!_))),
              nodes, a, p.pruneMaxDegree))
            release(merged) // pruned is materialized; merged has no other reader
            (pruned, pruned)
        }

      val prev = graphCk
      graph = newGraph
      graphCk = newCk
      release(prev)
      iter += 1

      // δ-convergence (Dong et al.; reference C3, NND.scala:259-262).
      val ratio = updates.toDouble / (k.toDouble * n.toDouble)
      if (ratio <= p.earlyTermination) finished = true
    }

    // Final reassembly (reference J1 left outer join, NND.scala:274-278).
    val result = base.join(
      graph.map(nl => NeighborList(nl.id, nl.neighbors.take(p.k)))
        .toDF().select($"id", $"neighbors"),
      Seq("id"), "left_outer")

    nodes.unpersist()
    result
  }

  /** Incrementally extend an existing K-NN graph with NEW points —
    * the production daily-append: yesterday's graph plus today's
    * embeddings, without rebuilding from scratch. (The reference
    * declared this capability — `IncSearchAttributeO`,
    * `/root/reference/.../NND.scala:49-51` — but never constructed it;
    * the new/old candidate flags that power the incremental local join
    * make it natural here.)
    *
    * @param input the FULL point set (old + new), same schema as
    *   [[buildGraph]]'s input.
    * @param existing prior output: `id` + `neighbors` (extra columns
    *   ignored; null-neighbor rows treated as new). Lists may be the
    *   truncated k-wide output of a previous build — they re-expand to
    *   the internal k' during refinement.
    * @return same shape as [[buildGraph]] over the full input.
    *
    * Cost model — what the carve-outs bound, and what they can't:
    *  - init draws come from the ~|new|·bpi buckets containing a new
    *    point (bucket membership of untouched regions never leaves its
    *    map side);
    *  - forward/reverse edges flow only from ACTIVE lists (those
    *    holding a new entry), so iteration r's features join moves
    *    O(active_r·k') rows;
    *  - untouched lists never enter the merge: nodes receiving
    *    candidates are carved out of the stable set by semi/anti
    *    joins on the target-id set;
    *  - old↔old pairs are never re-evaluated (the local join emits a
    *    pair only when at least one side is a NEW entry), and the
    *    update-count δ (measured against k·|new|) terminates the loop
    *    once the increment has been absorbed.
    * HOWEVER, activation CASCADES: inserting a point re-ranks its
    * neighbors' lists, whose changed entries activate THEIR neighbors
    * — the second-order closure that k-NN correctness genuinely
    * requires — so active_r saturates toward N within a few rounds
    * even for tiny increments, and each saturated iteration's
    * adjacency join then moves ~N·k' feature-carrying rows, the same
    * G4 shape as a full build. Measured at sf0.1 (2 000 pts, k=10):
    * total update shuffle 53/70/84/91 MB for 0.2/1/5/20 % increments
    * vs 97 MB for a from-scratch build — the update's real wins are
    * fewer absorption iterations (δ hits its floor faster), skipped
    * init churn, and the untouched-list merge carve-out, NOT
    * per-iteration shuffle once the cascade saturates. For appends
    * where even that is too much, serve the increment from the
    * persisted graph (n03 + beam search, or the s16 IVF append) and
    * fold it in at the next scheduled rebuild.
    *
    * Finished-point semantics: a point newly marked `finished = true`
    * gets null neighbors for its OWN row, AND entries referencing it
    * inside other nodes' pre-existing lists are purged up front (one
    * narrow edge-table filter with a carve-out — only lists actually
    * holding a finished neighbor regroup; the subtree folds away
    * entirely when nothing is finished), so retirement cannot
    * resurface via old candidates. A purged hole refills when NN-
    * descent touches that list; a list emptied entirely re-enters as
    * a new point. EdgeCasesSpec pins the retire-between-build-and-
    * update case. */
  def updateGraph(input: DataFrame, existing: DataFrame, p: Params = Params()): DataFrame = {
    require(input.columns.contains("id") && input.columns.contains("features"),
      s"updateGraph input needs 'id' and 'features' columns; got [${input.columns.mkString(", ")}]")
    require(existing.columns.contains("id") && existing.columns.contains("neighbors"),
      s"existing graph needs 'id' and 'neighbors' columns; got [${existing.columns.mkString(", ")}]")
    // Same parameter gate as buildGraph: k = 0 would otherwise run all
    // iterations on empty candidate lists (0/0 convergence ratio is
    // NaN, never <= earlyTermination) and return garbage silently.
    gateParams(p)
    val spark = input.sparkSession
    import spark.implicits._

    p.checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def truncate[T](ds: Dataset[T]): Dataset[T] =
      if (p.checkpointDir.isDefined) ds.checkpoint() else ds.localCheckpoint(true)

    val base = withDefaultCols(input)
    val nodes = base
      .filter(!col("finished"))
      .select(col("id").cast("long").as("id"),
        col("features").cast("array<float>").as("features"),
        col("partition").cast("long").as("partition"))
      .repartition(col("id"))
      .as[NodeRow]
      .persist(StorageLevel.MEMORY_AND_DISK)

    val counts: Map[Long, Long] =
      nodes.groupBy($"partition").count().as[(Long, Long)].collect().toMap
    if (counts.isEmpty) {
      nodes.unpersist()
      return base.withColumn("neighbors",
        lit(null).cast("array<struct<id:bigint,similarity:double>>"))
    }
    val bcCounts = spark.sparkContext.broadcast(counts)
    val k = math.max(p.k, math.ceil(p.k * p.expansion).toInt)
    val bpi = p.bucketsPerInstance
    val seed = p.seed
    val maxBuckets =
      math.max(1L, math.ceil(counts.values.max.toDouble * bpi / (2.0 * k)).toLong)

    // Prior lists (all-old flags); ids absent here are the increment.
    val priorListsRaw = existing
      .select(col("id").cast("long").as("id"),
        col("neighbors").cast("array<struct<id:bigint,similarity:double>>").as("neighbors"))
      .filter(col("neighbors").isNotNull)

    // Finished-point purge: a point marked `finished` in THIS update's
    // input gets null neighbors for its own row (it is absent from
    // `nodes`), but entries referencing it inside other nodes' prior
    // lists must also go — stable lists pass through verbatim and
    // re-merged lists re-admit old candidates, so without this filter
    // retirement silently resurfaces. Carve-out shape: one narrow
    // explode locates the affected lists (left_semi on the finished
    // set), only those regroup (sim desc, id asc — the TopKAggregator
    // order); everyone else passes by anti-join untouched. In the
    // common no-finished-column case the filter below folds to an
    // empty relation and Catalyst's PropagateEmptyRelation deletes
    // the whole purge subtree at plan time. A list whose every entry
    // was purged drops out of the prior set entirely and re-enters as
    // a NEW point (fresh init draws) — its old list carried no
    // surviving information.
    // The purge is built ONLY when the input actually carries finished
    // rows: with a finished column present but empty, `finishedIds`
    // is only empty at RUNTIME (not constant-folded), so the purge
    // subtree (edge explode + two joins + regroup) would re-execute
    // for every priorLists consumer — exactly the repetition the
    // truncate exists to prevent, paid for nothing. The one eager
    // isEmpty scan below runs only when a finished column exists (the
    // common append input has none and skips it via the &&).
    val hasFinished = input.columns.contains("finished") &&
      !base.filter(col("finished")).isEmpty
    val priorLists: Dataset[NeighborList] =
      if (!hasFinished) priorListsRaw.as[NeighborList]
      else {
        val finishedIds = base.filter(col("finished"))
          .select(col("id").cast("long").as("fid"))
        val priorEdges = priorListsRaw
          .select(col("id"), explode(col("neighbors")).as("nb"))
        val purgeAffected = priorEdges
          .join(finishedIds, col("nb.id") === col("fid"), "left_semi")
          .select(col("id")).distinct()
        val purgedLists = graft.core.Neighbors.assemble(
          priorEdges
            .join(purgeAffected, Seq("id"), "left_semi")
            .join(finishedIds, col("nb.id") === col("fid"), "left_anti"),
          col("id"), col("nb.id"), col("nb.similarity"))
        // The purge subtree feeds every priorLists consumer (stable
        // init, newIds anti-join, the per-iteration old-candidate
        // reads via stable) — truncate it once.
        truncate(priorListsRaw
          .join(purgeAffected, Seq("id"), "left_anti")
          .unionByName(purgedLists)
          .as[NeighborList])
      }
    var stable: Dataset[FlaggedList] = truncate(
      priorLists.toDF().join(nodes.toDF().select($"id"), Seq("id"), "left_semi")
        .as[NeighborList]
        .map(nl => FlaggedList(nl.id, nl.neighbors, nl.neighbors.map(_ => false))))
    val newIds = nodes.toDF().select($"id")
      .join(priorLists.toDF().select($"id"), Seq("id"), "left_anti")
    val newCount = math.max(1L, newIds.count())

    // Bucket init, increment-restricted: all nodes bucket map-side, but
    // only buckets holding >= 1 new point shuffle; only new members draw.
    val bucketedAll = nodes.toDF()
      .join(newIds.withColumn("is_new", lit(true)), Seq("id"), "left_outer")
      .withColumn("is_new", coalesce($"is_new", lit(false)))
      .as[(Long, Array[Float], Long, Boolean)]
      .flatMap { case (id, features, partition, isNewNode) =>
        drawBuckets(seed, features, bcCounts.value(partition), bpi, k)
          .map(b => (maxBuckets * partition + b, id, features, partition, isNewNode))
          .toSeq
      }
      .toDF("bucket", "id", "features", "partition", "is_new")
    val seedBuckets = bucketedAll.filter($"is_new").select($"bucket").distinct()
    val initCands: Dataset[Cand] = bucketedAll
      .join(seedBuckets, Seq("bucket"), "left_semi")
      .as[(Long, Long, Array[Float], Long, Boolean)]
      .groupByKey(_._1)
      .flatMapGroups { (bucket, it) =>
        val rows = it.toArray
        val seen = new mutable.LongMap[(BucketedNode, Boolean)]()
        rows.foreach { case (b, id, f, part, fresh) =>
          if (!seen.contains(id)) seen.update(id, (BucketedNode(b, id, f, part), fresh))
        }
        val members = seen.values.toArray.sortBy(_._1.id)
        // Plain member array hoisted out of the per-node loop so the
        // draw indices hit the same ordering buildGraph draws from.
        val plain = members.map(_._1)
        members.iterator.filter(_._2).flatMap { case (nd, _) =>
          inBucketDraws(seed, bucket, nd, plain, k)
        }
      }

    val active: Dataset[FlaggedList] = truncate(
      mergeTopK(initCands, k)
        .map(g => FlaggedList(g._1, g._2.neighbors, g._2.old.map(!_))))
    val allLists = refineLoop(nodes, stable, active, k, newCount, p)
    val result = base.join(
      allLists.map(nl => NeighborList(nl.id, nl.neighbors.take(p.k)))
        .toDF().select($"id", $"neighbors"),
      Seq("id"), "left_outer")
    nodes.unpersist()
    result
  }

  /** The NN-descent absorption loop shared by [[updateGraph]] and
    * [[consolidateGraph]] — iterate forward/reverse edge exchange +
    * incremental local join + carved-out top-k re-merge until the
    * update count δ (normalized by k·`newCount`) hits the early-
    * termination floor. Only the INITIALIZATION differs between the
    * two callers (bucket draws for a genuine increment; the appended
    * lists' own fresh flags for consolidation); the loop body is the
    * one the reference's iteration implements (`/root/reference/src/
    * main/scala/com/github/fvictorio/nnd/NND.scala:117-247`),
    * restricted to groups holding a fresh member.
    *
    * @param stable0 lists with NO fresh entries (pass through until a
    *   candidate targets them); `active0` lists holding >= 1 fresh
    *   entry, truncated by the caller. Returns stable ∪ active after
    *   convergence — internal k'-wide lists, flags dropped by the
    *   caller's final projection. */
  private def refineLoop(
      nodes: Dataset[NodeRow],
      stable0: Dataset[FlaggedList],
      active0: Dataset[FlaggedList],
      k: Int,
      newCount: Long,
      p: Params): Dataset[FlaggedList] = {
    val spark = nodes.sparkSession
    import spark.implicits._
    // A §3.2 Bloom pre-filter on the features probe side of the
    // adjacency join was IMPLEMENTED AND MEASURED here in round 18
    // (VERDICT r17 next-round #1), then removed on the evidence: in
    // the sparse regime (daily append / consolidation) the carved
    // edge side is small enough that AQE broadcasts it, so the
    // features side never shuffles and the filter can only save scan
    // work on an already-persisted table — while its build pass ADDS
    // an edge-set scan + semi-join shuffle per early iteration
    // (x50 n20_consolidate_sparse: +14 MB shuffle, no wall win —
    // scale_r18_nnd_{before,after}.json); in the saturated regime the
    // destination set IS ~the corpus and any such filter drops
    // nothing. See OPTIMIZATION_r18.md §6 for the full adjudication.
    def truncate[T](ds: Dataset[T]): Dataset[T] =
      if (p.checkpointDir.isDefined) ds.checkpoint() else ds.localCheckpoint(true)
    val seed = p.seed
    var stable = stable0
    var active = active0
    // Checkpoint backing `active` (buildGraph's graphCk pattern): from
    // iteration 1 on, `active` is a map over the checkpointed `merged`;
    // release() targets the checkpointed frame itself.
    var activeCk: Dataset[_] = active
    // In-loop prune, buildGraph's placement: merged/init ACTIVE lists
    // prune; stable lists from `existing` pass as-is (a pruned prior
    // build's lists re-prune to themselves — Occlusion is idempotent —
    // so update-from-empty-equals-build holds).
    p.pruneAlpha.foreach { a =>
      val pruned = truncate(pruneFlagged(active, nodes, a, p.pruneMaxDegree))
      release(activeCk)
      active = pruned
      activeCk = pruned
    }

    var finished = false
    var iter = 0
    while (!finished && iter < p.maxIterations) {
      // Forward edges from ACTIVE lists only — new entries can only
      // live there; converged old<->old structure stays at rest.
      val edges: Dataset[FlaggedEdge] =
        active.flatMap(nl => nl.neighbors.iterator.zip(nl.isNew.iterator)
          .map { case (nb, fresh) => FlaggedEdge(nl.id, nb.id, nb.similarity, fresh) })

      val sampledRev = sampleReverse(edges, p.sampleRate, iter, seed)

      // Only adjacency groups with a NEW member generate pairs; carve
      // them out before the features join so untouched groups cost
      // nothing.
      // No forced broadcast hints on the carve-out sets: they are
      // increment-sized for a small daily append (AQE broadcasts them on
      // its own) but O(N) when the increment is the whole corpus — a
      // broadcast() hint there would OOM the driver instead of falling
      // back to a shuffle join.
      val adjInput = edges.toDF().select($"src", $"dst", $"isNew").union(sampledRev)
      val activeSrcs = adjInput.filter($"isNew").select($"src").distinct()
      // Dong et al.'s old[v] half of the incremental join: a STABLE
      // node that just received a new reverse edge must bring its own
      // current list into its adjacency group as old-flagged members,
      // or the group is a singleton {new point} — no pairs, the new
      // point never meets the neighborhood it landed in, and a sparse
      // append (the documented daily-append case, down to ONE point)
      // silently keeps nothing but its random init draws while no old
      // node ever gains an edge to it. Active lists already re-emit
      // their old halves via `edges`; this is the stable carve-out's
      // missing counterpart, and it stays cascade-sized: only lists of
      // srcs that actually received a new member are pulled in.
      val stableOldEdges = stable.toDF()
        .join(activeSrcs.select($"src".as("id")), Seq("id"), "left_semi")
        .as[FlaggedList]
        .flatMap(nl => nl.neighbors.iterator.map(nb => (nl.id, nb.id, false)))
        .toDF("src", "dst", "isNew")
      val adj: Dataset[AdjRow] = adjInput
        .union(stableOldEdges)
        .join(activeSrcs, Seq("src"), "left_semi")
        .join(nodes.toDF().select($"id".as("dst"), $"features", $"partition"), "dst")
        .select($"src", $"dst", $"features", $"partition", $"isNew")
        .as[AdjRow]

      val pairCandsRaw: Dataset[Cand] = adj
        .groupByKey(_.src)
        .flatMapGroups((_, it) => localJoinPairs(it))

      // The O(|Av|²) local join is the iteration's dominant compute and
      // feeds THREE consumers (merge input, targets for the carve-outs,
      // and — via targets — the stable/retired rebuild in a separate
      // job); materialize it once instead of re-running the similarity
      // loop per consumer (cross-action exchange reuse does not exist).
      val pairCands = truncate(pairCandsRaw)

      // Re-merge ONLY nodes that received candidates; everyone else's
      // list is carried untouched via semi/anti joins on the
      // (typically increment-sized) target set.
      val targets = pairCands.toDF().select($"src".as("id")).distinct()
      val touchedOld = stable.toDF().join(targets, Seq("id"), "left_semi")
        .as[FlaggedList]
        .unionByName(active.toDF().join(targets, Seq("id"), "left_semi")
          .as[FlaggedList])
      val oldCands: Dataset[Cand] = touchedOld.flatMap(nl =>
        nl.neighbors.iterator.map(nb => Cand(nl.id, nb.id, nb.similarity, isOld = true)))

      // Untouched actives have been fully exploited — retire to stable
      // with flags dropped; stable loses any node the merge re-emitted.
      val retired = active.toDF().join(targets, Seq("id"), "left_anti")
        .as[FlaggedList]
        .map(nl => FlaggedList(nl.id, nl.neighbors, nl.neighbors.map(_ => false)))
      val prevStable = stable
      val prevActive = activeCk
      // The merge and the stable-set rebuild read only the ALREADY
      // materialized pairCands/stable/active checkpoints and are
      // independent of each other — overlap their truncation jobs
      // (guide §2.6; per-frame contents unchanged).
      val (merged, newStable) = graft.core.Par.pair(
        truncate(mergeTopK(pairCands.unionByName(oldCands), k)),
        truncate(
          stable.toDF().join(targets, Seq("id"), "left_anti").as[FlaggedList]
            .unionByName(retired)))
      val updates = merged.map(_._2.updated.toLong).toDF("u")
        .agg(coalesce(sum($"u"), lit(0L))).as[Long].head()
      stable = newStable
      val (newActive, newActiveCk): (Dataset[FlaggedList], Dataset[_]) =
        p.pruneAlpha match {
          case None =>
            (merged.map(g => FlaggedList(g._1, g._2.neighbors, g._2.old.map(!_))),
              merged)
          case Some(a) =>
            val pruned = truncate(pruneFlagged(
              merged.map(g => FlaggedList(g._1, g._2.neighbors, g._2.old.map(!_))),
              nodes, a, p.pruneMaxDegree))
            release(merged)
            (pruned, pruned)
        }
      active = newActive
      activeCk = newActiveCk
      release(prevStable)
      release(prevActive)
      release(pairCands)
      iter += 1

      val ratio = updates.toDouble / (k.toDouble * newCount.toDouble)
      if (ratio <= p.earlyTermination) finished = true
    }

    stable.unionByName(active)
  }

  /** Consolidation refinement of an APPENDED graph — the scheduled
    * maintenance pass between per-point serving appends and a full
    * rebuild (the FreshDiskANN StreamingMerge role, Singh et al.
    * 2021, realized with NN-descent instead of a disk merge). Runs
    * [[refineLoop]] over the appended lists with every edge INCIDENT
    * TO THE BATCH flagged fresh — the batch members' own lists, and
    * the reverse-patch arrivals inside touched old lists — so the
    * first local joins happen exactly where the append left structure
    * stale: two same-batch points that share an old neighbor meet in
    * that neighbor's adjacency group on iteration 1 (the new<->new
    * edge a per-point append structurally cannot create, because each
    * inserted point beam-searched the PRIOR graph only), and the
    * cascade then propagates second-order re-rankings exactly as
    * [[updateGraph]] does. No bucket re-init: the appended lists are
    * already high-quality in the old corpus, so they ARE the init —
    * the refinement pays only the absorption iterations, restricted
    * to groups holding a fresh member (untouched old lists pass
    * through stable until a candidate targets them).
    *
    * @param input    (id, features) for EVERY graph member, new
    *                 points included (same schema as [[buildGraph]])
    * @param appended (id, neighbors) — the appended graph, e.g. one
    *                 layer of
    *                 [[graft.ops.GraphSearch.appendToGraphStack]]
    * @param freshIds one `id` column: the appended batch
    * @return same shape as [[buildGraph]] over `input`
    */
  def consolidateGraph(input: DataFrame, appended: DataFrame,
      freshIds: DataFrame, p: Params = Params()): DataFrame = {
    require(input.columns.contains("id") && input.columns.contains("features"),
      s"consolidateGraph input needs 'id' and 'features' columns; got [${input.columns.mkString(", ")}]")
    require(appended.columns.contains("id") && appended.columns.contains("neighbors"),
      s"appended graph needs 'id' and 'neighbors' columns; got [${appended.columns.mkString(", ")}]")
    gateParams(p)
    val spark = input.sparkSession
    import spark.implicits._
    p.checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def truncate[T](ds: Dataset[T]): Dataset[T] =
      if (p.checkpointDir.isDefined) ds.checkpoint() else ds.localCheckpoint(true)

    val base = withDefaultCols(input)
    val nodes = base
      .filter(!col("finished"))
      .select(col("id").cast("long").as("id"),
        col("features").cast("array<float>").as("features"),
        col("partition").cast("long").as("partition"))
      .repartition(col("id"))
      .as[NodeRow]
      .persist(StorageLevel.MEMORY_AND_DISK)

    val k = math.max(p.k, math.ceil(p.k * p.expansion).toInt)
    val fresh = freshIds.select(col("id").cast("long").as("id"))
    val newCount = math.max(1L, fresh.count())

    val lists = appended
      .select(col("id").cast("long").as("id"),
        col("neighbors").cast("array<struct<id:bigint,similarity:double>>").as("neighbors"))
      .filter(col("neighbors").isNotNull)

    // Carve-out before any wide work: a list is ACTIVE iff its owner
    // is in the batch or it holds an entry referencing the batch (a
    // reverse-patch arrival). The membership probe explodes ONLY the
    // narrow (id, nb.id) projection; every other list passes to
    // stable with all-old flags and is never regrouped.
    val narrowEdges = lists.select(col("id"), explode(col("neighbors.id")).as("nbid"))
    val activeIds = narrowEdges
      .join(fresh.select(col("id").as("nbid")), Seq("nbid"), "left_semi")
      .select("id").distinct()
      .unionByName(lists.select("id").join(fresh, Seq("id"), "left_semi"))
      .distinct()
    val stable0: Dataset[FlaggedList] = truncate(
      lists.join(activeIds, Seq("id"), "left_anti")
        .as[NeighborList]
        .map(nl => FlaggedList(nl.id, nl.neighbors, nl.neighbors.map(_ => false))))

    // Per-entry fresh flags for the active lists, order-preserving
    // (posexplode + sort-by-pos regroup keeps the stored
    // (sim desc, id asc) list order bit-exact).
    val active0: Dataset[FlaggedList] = truncate(
      lists.join(activeIds, Seq("id"), "left_semi")
        .join(fresh.withColumn("owner_fresh", lit(true)), Seq("id"), "left_outer")
        .withColumn("owner_fresh", coalesce(col("owner_fresh"), lit(false)))
        .select(col("id"), col("owner_fresh"),
          posexplode(col("neighbors")).as(Seq("pos", "nb")))
        .join(fresh.select(col("id").as("fid")).withColumn("e_fresh", lit(true)),
          col("nb.id") === col("fid"), "left_outer")
        .select(col("id"), col("pos"), col("nb"),
          (col("owner_fresh") || coalesce(col("e_fresh"), lit(false))).as("fresh"))
        .as[(Long, Int, Neighbor, Boolean)]
        .groupByKey(_._1)
        .mapGroups { (id, it) =>
          val rows = it.toArray.sortBy(_._2)
          FlaggedList(id, rows.map(_._3).toIndexedSeq, rows.map(_._4).toIndexedSeq)
        })

    val allLists = refineLoop(nodes, stable0, active0, k, newCount, p)
    val result = base.join(
      allLists.map(nl => NeighborList(nl.id, nl.neighbors.take(p.k)))
        .toDF().select($"id", $"neighbors"),
      Seq("id"), "left_outer")
    nodes.unpersist()
    result
  }

  /** Bounded top-K neighbor-list merge with dedup-by-id where old (B)
    * entries win — the reference's A4/A7/W1 composite (`NND.scala:104-109,
    * 228-242`) — via [[TopKAggregator]], which (unlike a mapGroups pass)
    * gets map-side partial aggregation like the reference's
    * `reduceByKey`. Tie-break on (sim desc, dst asc) for determinism
    * (the reference's stable sort order is shuffle-order-dependent). */
  private def mergeTopK(cands: Dataset[Cand], k: Int): Dataset[(Long, TopKResult)] = {
    import cands.sparkSession.implicits._
    cands.groupByKey(_.src).agg(new TopKAggregator(k).toColumn)
  }

  private def dedupById(it: Iterator[BucketedNode]): Array[BucketedNode] = {
    val seen = new mutable.LongMap[BucketedNode]()
    it.foreach(n => if (!seen.contains(n.id)) seen.update(n.id, n))
    seen.values.toArray.sortBy(_.id)
  }

  private def dedupByDst(it: Iterator[AdjRow]): Array[AdjRow] = {
    // a node present both as forward and sampled-reverse neighbor keeps
    // the NEW flag if either copy is new (Dong et al.'s new-set priority)
    val seen = new mutable.LongMap[AdjRow]()
    it.foreach { r =>
      seen.get(r.dst) match {
        case None => seen.update(r.dst, r)
        case Some(prev) if r.isNew && !prev.isNew => seen.update(r.dst, r)
        case _ =>
      }
    }
    seen.values.toArray.sortBy(_.dst)
  }

  /** Parameter gate shared by [[buildGraph]] and [[updateGraph]] — one
    * definition so the two entry points cannot drift on what they
    * reject. */
  private def gateParams(p: Params): Unit = {
    require(p.k > 0, s"k must be positive, got ${p.k}")
    require(p.sampleRate > 0, s"sampleRate must be positive, got ${p.sampleRate}")
    require(p.bucketsPerInstance > 0,
      s"bucketsPerInstance must be positive, got ${p.bucketsPerInstance}")
    p.pruneAlpha.foreach(a => require(a >= 1.0,
      s"pruneAlpha must be >= 1.0 (strict RNG prune), got $a"))
    require(p.pruneMaxDegree > 0,
      s"pruneMaxDegree must be positive, got ${p.pruneMaxDegree}")
  }

  /** In-loop occlusion prune of flagged lists (the `pruneAlpha` path):
    * one edge-sized features join against the persisted pre-partitioned
    * node table + the shared bounded RobustPrune kernel per group —
    * exactly [[graft.ops.GraphSearch.pruneGraph]]'s shape, but carrying
    * the new/old flags through so the incremental local join still
    * distinguishes fresh entries. Shared by build and update so the
    * update-from-empty-equals-build contract holds (the kernel is
    * idempotent on its own output — see [[graft.core.Occlusion]]).
    *
    * PRECONDITION (row preservation): every input list must be
    * nonempty and every neighbor id must resolve in `nodes` — an
    * empty list emits no edges and an unresolvable id drops its edge
    * at the features join, so either would silently delete the node
    * from the pruned graph (unlike
    * [[graft.ops.GraphSearch.pruneGraph]], which left-joins rows
    * back). Both hold at every call site by construction: the input
    * is a [[mergeTopK]] output (groups exist only where >= 1
    * candidate arrived) and candidate ids are drawn from the
    * persisted `nodes` table itself. A per-iteration row-preserving
    * left-join would re-pay an id-sized shuffle per loop turn to
    * defend a state the loop cannot produce. */
  private def pruneFlagged(g: Dataset[FlaggedList], nodes: Dataset[NodeRow],
      alpha: Double, maxDegree: Int): Dataset[FlaggedList] = {
    val spark = g.sparkSession
    import spark.implicits._
    val edges = g.flatMap(nl => nl.neighbors.iterator.zip(nl.isNew.iterator)
      .map { case (nb, fresh) => (nl.id, nb.id, nb.similarity, fresh) })
      .toDF("src", "dst", "sim", "isNew")
    edges
      .join(nodes.toDF().select($"id".as("dst"), $"features"), "dst")
      .select($"src", $"dst", $"sim", $"isNew", $"features")
      .as[(Long, Long, Double, Boolean, Array[Float])]
      .groupByKey(_._1)
      .mapGroups { (src, it) =>
        val a = it.toArray.sortBy(c => (-c._3, c._2))
        val keep = graft.core.Occlusion.keepIndices(
          a.map(_._3), a.map(_._5), alpha, maxDegree)
        FlaggedList(src,
          keep.toSeq.map(i => Neighbor(a(i)._2, a(i)._3)),
          keep.toSeq.map(i => a(i)._4))
      }
  }

  /** Default the optional input columns (`partition`, `finished`) —
    * shared input normalization of both entry points. */
  private def withDefaultCols(input: DataFrame): DataFrame = {
    var df = input
    if (!df.columns.contains("partition")) df = df.withColumn("partition", lit(0L))
    if (!df.columns.contains("finished")) df = df.withColumn("finished", lit(false))
    df
  }

  /** Reverse-edge ρ-sample (reference G2+G3, `NND.scala:116-169`),
    * shared by build and update so the xxhash64(src, dst, iter, seed)
    * keep-recipe stays bit-identical between them (the
    * update-from-empty-equals-build contract depends on it). Each node
    * keeps a deterministic ~ceil(ρ·|Rv|) (min 1) subset of its incoming
    * edges. At ρ >= 1 (the reference default regime) the sample is the
    * whole reverse set and nothing extra runs. At ρ < 1 the draw is a
    * count-conditioned hash filter: one narrow partial aggregation
    * computes (|Rv|, min-hash) per dst, then a hash-mod threshold keeps
    * each edge with probability ceil(ρ·|Rv|)/|Rv| and the min-hash edge
    * unconditionally (the >= 1 floor). Unlike a row_number window this
    * needs NO per-iteration full sort of the edge table — at scale the
    * sort, not the shuffle, is the cost. The subset size is ~Binomial
    * around ceil(ρ·|Rv|) rather than exact; NN-descent's ρ-sample is
    * itself a random subsample (Dong et al. §2.3), so expected-size
    * sampling preserves the algorithm (recall bar held in NNDSpec at
    * ρ = 0.5). Reverse edges inherit the forward edge's new/old flag
    * (Dong et al.: new'[v] includes sampled reverse-new, old'[v]
    * reverse-old). */
  private def sampleReverse(edges: Dataset[FlaggedEdge], rate: Double,
      iter: Int, seed: Long): DataFrame = {
    import edges.sparkSession.implicits._
    if (rate >= 1.0)
      edges.toDF().select($"dst".as("src"), $"src".as("dst"), $"isNew")
    else {
      val tagged = edges.toDF()
        .withColumn("h", xxhash64($"src", $"dst", lit(iter), lit(seed)))
      val stats = tagged.groupBy($"dst")
        .agg(count(lit(1)).as("cnt"), min($"h").as("hmin"))
      tagged.join(stats, "dst")
        .filter($"h" === $"hmin" ||
          pmod($"h", $"cnt") < ceil($"cnt" * rate))
        .select($"dst".as("src"), $"src".as("dst"), $"isNew")
    }
  }

  /** Incremental local join over one adjacency group (reference G5 +
    * B flags, `NND.scala:199-242`; Dong et al. §2.3), shared by build
    * and update: within Av, every ordered pair (u, p) with at least one
    * NEW member becomes a candidate edge u→p. Old-old pairs were
    * already evaluated the iteration both entries arrived, so skipping
    * them loses nothing — and as the graph converges the per-iteration
    * pair count decays toward zero instead of staying |Av|² forever. */
  private def localJoinPairs(it: Iterator[AdjRow]): Iterator[Cand] = {
    val a = dedupByDst(it)
    val out = new mutable.ArrayBuffer[Cand]()
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) {
        if (i != j && a(i).dst != a(j).dst && (a(i).isNew || a(j).isNew)) {
          out += Cand(a(i).dst, a(j).dst,
            Similarity.partitionGated(
              a(i).features, a(i).partition, a(j).features, a(j).partition),
            isOld = false)
        }
        j += 1
      }
      i += 1
    }
    out.iterator
  }

  /** Deterministic per-node bucket choice seeded by the feature hash
    * (reference F4, `NND.scala:88-89`), shared by build and update.
    * O(bpi) distinct-draw per node (NOT the reference's full
    * Fisher-Yates over all nb bucket ids, `NND.scala:91`, which is
    * O(nodes-per-partition) work and garbage PER NODE — quadratic total
    * and an overflow at nb > 2^31). Bucket ids are 1-based within the
    * logical partition; callers namespace with
    * `maxBuckets * partition + b`. */
  private def drawBuckets(seed: Long, features: Array[Float],
      partitionCount: Long, bpi: Int, k: Int): Iterator[Long] = {
    val nb = math.max(1L,
      math.ceil(partitionCount.toDouble * bpi / (2.0 * k)).toLong)
    val r = new Random(seed ^ java.util.Arrays.hashCode(features).toLong)
    val picks = mutable.LinkedHashSet.empty[Long]
    val want = math.min(bpi.toLong, nb).toInt
    while (picks.size < want) picks += 1L + math.floorMod(r.nextLong(), nb)
    picks.iterator
  }

  /** K random in-bucket draws with replacement, self excluded
    * (reference `NND.scala:98-99`) — seeded per (bucket, node), shared
    * by build and update so init draws are bit-identical between
    * them. */
  private def inBucketDraws(seed: Long, bucket: Long, nd: BucketedNode,
      members: Array[BucketedNode], k: Int): Iterator[Cand] = {
    val r = new Random(mix(seed, bucket, nd.id))
    Iterator.tabulate(k)(_ => members(r.nextInt(members.length)))
      .filter(_.id != nd.id)
      .map(c => Cand(nd.id, c.id,
        Similarity.partitionGated(nd.features, nd.partition, c.features, c.partition),
        isOld = false))
  }

  /** Release a retired per-iteration table: the CacheManager path
    * (`unpersist`, for persisted plans) plus the localCheckpoint block
    * store (which `Dataset.unpersist` never reaches — without the
    * second call every iteration's checkpoint blocks would stay
    * resident until driver GC; a no-op for reliable `checkpointDir`
    * checkpoints, whose files are the caller's retention). Callers
    * must pass the checkpoint-ROOTED frame itself (graphCk/activeCk
    * track it when the loop variable is a map over the checkpoint) —
    * the bridge deliberately ignores checkpoints buried in derived
    * plans. */
  private def release(ds: Dataset[_]): Unit =
    graft.core.Checkpoints.release(ds)

  /** splitmix64-style mix for per-(bucket,node) deterministic seeds. */
  private def mix(a: Long, b: Long, c: Long): Long = {
    var z = a ^ (b * 0x9E3779B97F4A7C15L) ^ (c * 0xC2B2AE3D27D4EB4FL)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
