package graft

import org.apache.spark.sql.functions._
import graft.ops.Clustering

/** Distributed k-means: determinism, recovery, and fixed-point
  * arithmetic properties. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** 300 points around 3 well-separated centers (seeded, d=8). */
  private def planted = {
    val rnd = new scala.util.Random(7)
    val centers = Array.tabulate(3, 8)((c, j) => if (j == c) 5f else 0f)
    (0 until 300).map { i =>
      val c = i % 3
      (i.toLong, c.toLong,
        centers(c).map(x => x + rnd.nextGaussian().toFloat * 0.1f).toSeq)
    }.toDF("id", "truth", "features")
  }

  private def emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("features"))

  test("kmeans recovers planted clusters exactly (up to label permutation)") {
    val a = Clustering.kmeansAssign(planted, "id", "features", 3, iterations = 5)
      .join(planted.select("id", "truth"), "id")
    val mapping = a.groupBy("truth")
      .agg(countDistinct("cluster").as("nc"), first("cluster").as("c"))
      .collect()
    assert(mapping.forall(_.getLong(1) == 1L), "a truth group split across clusters")
    assert(mapping.map(_.get(2)).distinct.length == 3, "two truth groups merged")
  }

  test("kmeans assignments are invariant to input partitioning") {
    val a = Clustering.kmeansAssign(emb.repartition(1), "id", "features", 8, iterations = 3)
    val b = Clustering.kmeansAssign(emb.repartition(13), "id", "features", 8, iterations = 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("k=1 centroid is the fixed-point mean of the corpus") {
    val got = Clustering.kmeansCentroids(emb, "id", "features", 1, iterations = 1)(0)
    val vecs = emb.select("features").as[Seq[Float]].collect().map(_.toVector).toVector
    val mean = vecs.transpose.map(xs => xs.map(_.toDouble).sum / xs.length)
    got.zip(mean).foreach { case (g, m) =>
      assert(math.abs(g - m) < 1e-4, s"centroid comp $g vs exact mean $m")
    }
  }

  test("k=256 at d=64 compiles and runs (native argmin — no Janino blow-up)") {
    // The former Column-form argmin inlined k dot loops: O(k·d) Java
    // source, Janino-fatal at this size (VERDICT r5 #4). The native
    // NearestCentroid/CentroidDot kernels keep generated code O(1) in
    // k, so an over-provisioned k must just work.
    val a = Clustering.kmeansAssign(emb, "id", "features", 256, iterations = 2)
    val n = a.count()
    assert(n == emb.count(), s"lost rows: $n")
    val range = a.agg(min("cluster"), max("cluster")).head()
    assert(range.getLong(0) >= 0L && range.getLong(1) < 256L,
      s"cluster id out of range: $range")
  }

  test("Lloyd iterations do not increase inertia") {
    def inertia(iters: Int): Long =
      Clustering.kmeansAssign(emb, "id", "features", 8, iterations = iters)
        .agg(sum("dist_fp")).head().getLong(0)
    val i1 = inertia(1)
    val i5 = inertia(5)
    assert(i5 <= i1 + (i1 / 1000), s"inertia rose: $i1 -> $i5")
  }

  test("streaming outlier prune census equals the batch prune") {
    val batchKept = Clustering
      .pruneOutliers(emb, "id", "features", 8, 4050L).count()
    val streamed = graft.streaming.EventsStream
      .outlierPruneCounts(spark, sf0001).head()
    assert(streamed.getLong(0) == batchKept,
      s"streamed kept ${streamed.getLong(0)} != batch $batchKept")
    assert(streamed.getLong(0) + streamed.getLong(1) == streamed.getLong(2))
  }

  test("pruneOutliers drops a planted off-manifold point and only threshold violators") {
    // An off-manifold point far from all three planted centers — but
    // not so extreme that absorbing it drags its cluster's centroid
    // past τ for real members (a 1/100-weight pull of Δ≈5 per dim
    // shifts the centroid ~0.05/dim, ≪ the τ band below).
    val junk = Seq((999L, -1L, Seq.fill(8)(10f).toSeq)).toDF("id", "truth", "features")
    val corpus = planted.unionByName(junk)
    // Real members sit at chi²-noise distance (dist² ≲ 0.3 → fp ≲
    // 1300); the junk point is hundreds of fp-thousands away.
    val tau = 4096L
    val kept = Clustering.pruneOutliers(corpus, "id", "features", 3, tau)
    val keptIds = kept.select("id").collect().map(_.getLong(0)).toSet
    assert(!keptIds.contains(999L), "off-manifold point survived the prune")
    assert(keptIds.size == 300, s"real members pruned: ${300 - keptIds.size}")
    // Survivor semantics: exactly the <= tau subset of the assignment.
    val viaAssign = Clustering.kmeansAssign(corpus, "id", "features", 3)
      .filter(col("dist_fp") <= tau).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(keptIds == viaAssign)
  }

  test("embeddingDrift: identical snapshots read exactly zero; a planted shift reads positive in its cell means") {
    // Identical snapshots: per-cell means are equal by construction,
    // so the cross-multiplied L1 is EXACTLY zero in every cell
    // (division-free fixed point — no epsilon).
    val a = planted.select(col("id"), col("features"))
    val same = Clustering.embeddingDrift(a, a.select((col("id") + 1000L).as("id"), col("features")),
      "id", "features", k = 3)
      .select("drift_fp", "n_a", "n_b").collect()
    assert(same.nonEmpty)
    same.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"occupancy mismatch: $r")
      assert(r.getLong(0) == 0L, s"identical snapshots must read zero drift: $r")
    }
    // Planted shift: +0.5 on dimension 0 of snapshot B moves every
    // cell's B-mean; total drift must be strictly positive and every
    // shared cell must read it.
    val shifted = a.select((col("id") + 1000L).as("id"),
      transform(col("features"), (x, i) =>
        when(i === 0, x + 0.5f).otherwise(x)).as("features"))
    val drift = Clustering.embeddingDrift(a, shifted, "id", "features", k = 3)
      .select("drift_fp", "n_a", "n_b").collect()
    val shared = drift.filter(r => r.getLong(1) > 0 && r.getLong(2) > 0)
    assert(shared.nonEmpty)
    shared.foreach { r =>
      assert(r.getLong(0) > 0L, s"shifted cell read zero drift: $r")
    }
  }
}

