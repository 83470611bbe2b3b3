package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Frequent-term (heavy-hitter) extraction with a mergeable
  * Misra-Gries sketch and an exact recount — the vocabulary-statistics
  * shape that survives 100 TB.
  *
  * The naive plan (`groupBy(term).count()` then filter) shuffles one
  * row per DISTINCT term — for n-gram vocabularies that is trillions
  * of keys, most of which are dropped by the frequency filter anyway.
  * Here the shuffle is bounded by construction:
  *
  *  1. CANDIDATES: a Misra-Gries summary (bounded `capacity` counters)
  *     runs as a typed `Aggregator` — partial per partition, merged
  *     associatively (Agarwal et al., "Mergeable Summaries": merging
  *     preserves the guarantee). Any term with true count
  *     > N/capacity is guaranteed to survive; with
  *     `capacity > den/num` that is a superset of every term at
  *     frequency ≥ num/den. Shuffled state: `capacity` counters per
  *     partition, never the vocabulary.
  *  2. EXACT RECOUNT: the ≤`capacity` candidates broadcast back; the
  *     token stream is re-scanned map-side and only candidate terms
  *     are counted (partial-agg'd, ≤`capacity` keys cross the wire).
  *
  * The candidate SET can vary with partitioning (Misra-Gries is
  * order-sensitive below the guarantee line), but the OUTPUT cannot:
  * the recount is exact and the guarantee admits no false negatives,
  * so the final filter yields exactly the terms with
  * `count · den ≥ N · num` — a deterministic, SQL-expressible fact
  * (oracle-checked as t12). The threshold is pure integer arithmetic
  * (`n·den ≥ total·num`), so Spark and DuckDB agree bit-exactly —
  * a `count ≥ frac·total` double compare would not (0.01·total differs
  * between IEEE double and DECIMAL at integer boundaries).
  */
object HeavyHitters {

  /** Mutable sketch state: the bounded counter map plus the exact
    * stream length (carried here so candidate generation and N come
    * from ONE scan — `toks.count()` would be a third corpus pass). */
  private[ops] final class MgState(
      val counts: mutable.HashMap[String, Long], var n: Long)
      extends Serializable

  /** One sequential Misra-Gries update step — shared by the batch
    * `Aggregator` and the streaming per-shard state
    * ([[graft.streaming.EventsStream.heavyTerms]]): increment a tracked
    * term, open a counter if one is free, else decrement-all (amortized
    * O(1) per stream element — each decrement pays down a prior
    * increment). */
  private[graft] def mgUpdate(
      b: mutable.HashMap[String, Long], t: String, capacity: Int): Unit =
    b.get(t) match {
      case Some(c) => b(t) = c + 1
      case None if b.size < capacity => b(t) = 1L
      case None =>
        val dead = mutable.ArrayBuffer.empty[String]
        b.keysIterator.foreach { k =>
          val c = b(k) - 1
          if (c == 0L) dead += k else b(k) = c
        }
        dead.foreach(b.remove)
    }

  /** Misra-Gries summary over a token stream: at most `capacity`
    * counters; decrement-on-miss; merge = counter sum followed by a
    * subtract-the-(capacity+1)-th-largest rebalance. Emits the
    * surviving terms (sorted, for stable debugging — order is not
    * semantically relevant) plus the exact stream length. */
  private[ops] class MisraGries(capacity: Int)
      extends Aggregator[String, MgState, (Seq[String], Long)] {
    def zero: MgState = new MgState(mutable.HashMap.empty, 0L)

    def reduce(s: MgState, t: String): MgState = {
      s.n += 1
      mgUpdate(s.counts, t, capacity)
      s
    }

    def merge(x: MgState, y: MgState): MgState = {
      val a = x.counts
      x.n += y.n
      y.counts.foreach { case (k, c) => a(k) = a.getOrElse(k, 0L) + c }
      if (a.size > capacity) {
        // Subtract the (capacity+1)-th largest count from everything;
        // ≤ capacity strictly-positive counters remain.
        val cut = a.values.toArray.sorted(Ordering[Long].reverse)(capacity)
        val dead = mutable.ArrayBuffer.empty[String]
        a.keysIterator.foreach { k =>
          val c = a(k) - cut
          if (c <= 0L) dead += k else a(k) = c
        }
        dead.foreach(a.remove)
      }
      x
    }

    def finish(s: MgState): (Seq[String], Long) = (s.counts.keys.toSeq.sorted, s.n)
    def bufferEncoder = Encoders.kryo[MgState]
    def outputEncoder = Encoders.kryo[(Seq[String], Long)]
  }

  /** Exact heavy hitters: every term of `tokens` whose total count
    * satisfies `count · den ≥ N_tokens · num`, as `(term, n)`.
    * `capacity` must exceed `den/num` for the no-false-negative
    * guarantee; the default doubles it for headroom. Two scans of the
    * token projection (sketch, recount) — no vocabulary-wide shuffle
    * in either. */
  def frequentTerms(df: DataFrame, tokens: Column, num: Long, den: Long,
                    capacity: Int = 0): DataFrame = {
    require(num >= 1 && den >= num, s"need 0 < num/den <= 1, got $num/$den")
    val cap = if (capacity > 0) capacity else (2L * den / num).toInt max 16
    require(cap > den / num,
      s"capacity $cap voids the Misra-Gries guarantee for $num/$den")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(explode(tokens).as("term"))
    val (cands, total) = toks.as[String]
      .select(new MisraGries(cap).toColumn).head()
    toks.join(broadcast(cands.toDF("term")), "term")
      .groupBy("term").agg(count(lit(1)).as("n"))
      .filter(col("n") * lit(den) >= lit(total) * lit(num))
  }
}
