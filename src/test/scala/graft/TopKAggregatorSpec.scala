package graft.nnd

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the bounded top-K merge. Spark's partial
  * aggregation applies `merge` in an arbitrary tree order decided by
  * partitioning and task scheduling, so the NND graph is only
  * deterministic if the merge is associative, commutative, and
  * truncation-stable. These properties ARE the correctness argument for
  * map-side combining (TopKAggregator scaladoc); here they are checked
  * mechanically against 500 randomized inputs each instead of argued.
  */
class TopKAggregatorSpec extends AnyFunSuite {

  private val K = 5
  private val agg = new TopKAggregator(K)
  private val Rounds = 500

  // Small id domain forces heavy dedup and tie-break collisions — the
  // hard cases. Duplicates of a (src,dst) pair always carry the same
  // sim (the algorithm's invariant: similarity is a pure function of
  // the endpoints); a tiny sim grid makes equal-sim ties common.
  private def simOf(dst: Long): Double = 0.1 + (dst % 7).toDouble / 10.0
  private val candGen: Gen[List[Cand]] = Gen.listOf(for {
    dst <- Gen.choose(0L, 15L)
    old <- Gen.oneOf(true, false)
  } yield Cand(0L, dst, simOf(dst), old))

  /** Deterministic sample stream (fixed seed, advanced per draw). */
  private def samples(n: Int): Seq[List[Cand]] = {
    var seed = Seed(42L)
    (1 to n).map { _ =>
      seed = seed.next
      candGen.pureApply(Gen.Parameters.default, seed)
    }
  }

  private def fold(cs: Seq[Cand]): TopKBuf =
    cs.foldLeft(agg.zero)((b, c) => agg.reduce(b, c))

  private def canon(b: TopKBuf): (Seq[Long], Seq[Double], Seq[Boolean]) =
    (b.dst.toSeq, b.sim.toSeq, b.old.toSeq)

  /** Reference semantics: dedup by dst (old-flag ORs), sort by
    * (sim desc, dst asc), truncate to K. */
  private def reference(cs: Seq[Cand]): Seq[(Long, Double, Boolean)] =
    cs.groupBy(_.dst).map { case (d, dup) =>
      (d, dup.head.sim, dup.exists(_.isOld))
    }.toSeq.sortBy { case (d, s, _) => (-s, d) }.take(K)

  test("fold equals the reference semantics (dedup, old-wins, sorted, truncated)") {
    samples(Rounds).foreach { cs =>
      val got = fold(cs)
      val want = reference(cs)
      assert(got.dst.toSeq == want.map(_._1), s"input: $cs")
      assert(got.sim.toSeq == want.map(_._2), s"input: $cs")
      assert(got.old.toSeq == want.map(_._3), s"input: $cs")
    }
  }

  test("merge is commutative") {
    samples(Rounds).grouped(2).collect { case Seq(xs, ys) =>
      assert(canon(agg.merge(fold(xs), fold(ys))) == canon(agg.merge(fold(ys), fold(xs))),
        s"inputs: $xs / $ys")
    }.toList
  }

  test("merge is associative") {
    samples(Rounds * 3 / 2).grouped(3).collect { case Seq(xs, ys, zs) =>
      val left = agg.merge(agg.merge(fold(xs), fold(ys)), fold(zs))
      val right = agg.merge(fold(xs), agg.merge(fold(ys), fold(zs)))
      assert(canon(left) == canon(right), s"inputs: $xs / $ys / $zs")
    }.toList
  }

  test("any split of the input merges to the same result as one pass (partial-agg exactness)") {
    samples(Rounds).zipWithIndex.foreach { case (cs, i) =>
      val cut = if (cs.isEmpty) 0 else i % (cs.length + 1)
      val (a, b) = cs.splitAt(cut)
      assert(canon(agg.merge(fold(a), fold(b))) == canon(fold(cs)),
        s"split at $cut of: $cs")
    }
  }
}
