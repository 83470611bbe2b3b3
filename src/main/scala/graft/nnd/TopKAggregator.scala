package graft.nnd

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.core.Neighbor

/** Bounded top-K buffer: parallel arrays sorted by (sim desc, dst asc),
  * deduped by dst with old-entry-wins flag merging, truncated to K. */
final case class TopKBuf(dst: Array[Long], sim: Array[Double], old: Array[Boolean])

/** Merged neighbor list, the per-entry old flags (`old(i)` = neighbor i
  * survived from the previous iteration — the reference's B flag), and
  * how many entries are new this iteration (the reference's per-node
  * `updated` count, `NND.scala:244-246`). The flags drive the
  * incremental local join: only pairs touching a NEW entry need
  * evaluation next round (Dong et al. §2.3; reference NND.scala:228-242). */
final case class TopKResult(neighbors: Seq[Neighbor], old: Seq[Boolean], updated: Int)

/** Typed bounded top-K merge aggregator — the Spark-SQL equivalent of the
  * reference's `reduceByKey` neighbor-list combine (A4/A7/W1,
  * `/root/reference/src/main/scala/com/github/fvictorio/nnd/
  * NND.scala:104-109,228-242`).
  *
  * Being an `Aggregator`, it gets MAP-SIDE PARTIAL AGGREGATION: each map
  * partition pre-merges its candidates down to <= K per key before the
  * shuffle, cutting the candidate shuffle from O(|Av|^2) rows per node to
  * O(K · partitions-touching-the-key) — the same effect as the
  * reference's `reduceByKey` vs `groupByKey`.
  *
  * Truncating partial buffers to K is exact: a candidate dropped from a
  * partial buffer is dominated by K better candidates that all reach the
  * final merge, so it can never belong to the final top-K; and since a
  * duplicate's similarity is identical in both copies, flag loss on a
  * dropped copy cannot change the surviving entry's `old` status for any
  * entry that makes the final list.
  */
final class TopKAggregator(k: Int) extends Aggregator[Cand, TopKBuf, TopKResult] {

  override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty, Array.empty)

  override def reduce(b: TopKBuf, c: Cand): TopKBuf = {
    // Dominant post-convergence case: the buffer is full and the
    // candidate sorts strictly after its last entry — it can neither
    // enter the list nor be a duplicate of anything kept (a duplicate
    // has an IDENTICAL (sim, dst) and so never sorts strictly after
    // the kept copy), so the result is `b` unchanged. Returning it
    // directly skips the merge's six array allocations per input row
    // in NND's hottest aggregation; the outcome is bit-identical.
    val n = b.dst.length
    if (n >= k) {
      val cmp = java.lang.Double.compare(c.sim, b.sim(n - 1))
      if (cmp < 0 || (cmp == 0 && c.dst > b.dst(n - 1))) return b
    }
    merge(b, TopKBuf(Array(c.dst), Array(c.sim), Array(c.isOld)))
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    // Two-pointer merge of (sim desc, dst asc)-sorted runs with dedup by
    // dst (old flag ORs — sim of duplicates is identical by construction).
    // Ordering and the dedup equality go through Double.compare, NOT
    // primitive </==: a NaN similarity (corrupt upstream features — the
    // l2sim paths have no cosine_ranked-style guard) makes every
    // primitive comparison false, which silently breaks the sorted-run
    // invariant and lets duplicates escape dedup. Under compare's IEEE
    // total order NaN sorts as the LARGEST value (first in the list,
    // matching Spark's own sort order and Neighbors.assemble), so
    // corrupt input yields a deterministic, structurally-valid list
    // instead of silent corruption. Sims here are 1/(1+d) or -Inf —
    // never -0.0 — so compare is bit-identical to the primitive ops on
    // every valid input (pins unchanged).
    val n = math.min(a.dst.length + b.dst.length, 2 * k)
    val dst = new Array[Long](n)
    val sim = new Array[Double](n)
    val old = new Array[Boolean](n)
    var i = 0; var j = 0; var o = 0
    while (o < n && (i < a.dst.length || j < b.dst.length)) {
      val takeA =
        j >= b.dst.length || (i < a.dst.length && {
          val cmp = java.lang.Double.compare(a.sim(i), b.sim(j))
          cmp > 0 || (cmp == 0 && a.dst(i) <= b.dst(j))
        })
      val (d, s, ol) =
        if (takeA) { val r = (a.dst(i), a.sim(i), a.old(i)); i += 1; r }
        else { val r = (b.dst(j), b.sim(j), b.old(j)); j += 1; r }
      // dedup: equal (sim, dst) neighbors are adjacent in the merged order
      if (o > 0 && dst(o - 1) == d && java.lang.Double.compare(sim(o - 1), s) == 0) {
        old(o - 1) = old(o - 1) || ol
      } else if (o < k) {
        dst(o) = d; sim(o) = s; old(o) = ol; o += 1
      } else {
        // beyond K and not a duplicate of the last kept entry: dominated
        o = o // no-op; remaining inputs can still dedup against kept tail
      }
    }
    TopKBuf(dst.take(o), sim.take(o), old.take(o))
  }

  override def finish(b: TopKBuf): TopKResult = {
    val nbrs = Array.tabulate(b.dst.length)(i => Neighbor(b.dst(i), b.sim(i))).toSeq
    TopKResult(nbrs, b.old.toSeq, b.old.count(!_))
  }

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKResult] = Encoders.product[TopKResult]
}
