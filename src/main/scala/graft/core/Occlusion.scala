package graft.core

import scala.collection.mutable

/** The Vamana/DiskANN RobustPrune greedy keep-set (Subramanya et al.
  * 2019, Algorithm 2), shared by the post-hoc graph prune
  * ([[graft.ops.GraphSearch.pruneGraph]], n08/n09) and the in-loop
  * construction prune ([[graft.nnd.NND]]'s `pruneAlpha`), so the two
  * paths cannot drift: a list pruned during the build and the same
  * list pruned afterwards run the identical kernel.
  *
  * Contract: `sims`/`feats` are the candidate list sorted
  * (sim desc, id asc) — the repo's deterministic total order. A
  * candidate c (at distance dC = 1/sim − 1, the exact inverse of the
  * build's 1/(1+d) modulo one double rounding) is OCCLUDED when some
  * already-kept k satisfies α·d(k, c) ≤ dC; non-positive sims
  * (-Infinity cross-partition contract violations) map to infinite
  * distance and are occluded by anything already kept. Candidate-
  * candidate distances run [[Similarity.l2]] — the double-subtraction
  * kernel every stored sim was measured with.
  *
  * O(kept·n·dim) time, O(n) space, n = list length (≤ ~100 by
  * construction of NND lists) — the bounded per-group kernel shape.
  *
  * The kernel is IDEMPOTENT on its own output: survivors are pairwise
  * non-occluding, so re-pruning a pruned list keeps everything. The
  * update-from-empty-equals-build contract of the in-loop prune rests
  * on this (untouched lists retire already-pruned; re-pruning them in
  * a later merge is a no-op).
  *
  * @return indices into the input arrays of the kept candidates, in
  *         input (= sim desc) order, at most `maxDegree` of them.
  */
object Occlusion {
  def keepIndices(sims: Array[Double], feats: Array[Array[Float]],
      alpha: Double, maxDegree: Int): Array[Int] = {
    val kept = mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < sims.length && kept.length < maxDegree) {
      val dC =
        if (sims(i) > 0.0) 1.0 / sims(i) - 1.0 else Double.PositiveInfinity
      var occluded = false
      var j = 0
      while (j < kept.length && !occluded) {
        if (alpha * Similarity.l2(feats(kept(j)), feats(i)) <= dC)
          occluded = true
        j += 1
      }
      if (!occluded) kept += i
      i += 1
    }
    kept.toArray
  }
}
