package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for training-data assembly: documents are laid out
  * back-to-back in a deterministic total order and the concatenated
  * token stream is cut into fixed `budget`-token chunks (GPT-style
  * concat-and-chunk packing — documents may straddle chunk
  * boundaries). Each document's placement is fully described by its
  * exclusive prefix sum of token counts.
  *
  * Scale shape (the 100 TB story): the global prefix sum is computed
  * as a DISTRIBUTED SCAN, not a window — a single-partition
  * `Window.orderBy` (Spark's only built-in running total) funnels the
  * whole corpus through one task and is exactly the plan that dies at
  * scale. Instead: range-partition by id (the one unavoidable shuffle,
  * same cost class as any global sort), per-partition token sums
  * (one narrow job emitting #partitions rows), an exclusive scan of
  * those sums on the driver (bounded: one Long per partition), and a
  * final `mapPartitions` pass that adds the broadcast partition offset
  * to a local running sum. Output is independent of the partition
  * count (asserted in PackingSpec), so the same code answers at 32
  * partitions locally and 10⁵ on a cluster.
  *
  * `mapPartitions` is used deliberately: a running scan is genuine
  * per-partition imperative logic (SURVEY §7.3's "last resort" case),
  * and the pass is arithmetic-only on three Long columns.
  */
object Packing {

  /** Chunk placement for every document: `(idCol, n_tokens, start_off,
    * chunk_first, chunk_last, n_chunks)` where `start_off` is the
    * exclusive running sum of `tokenCol` in ascending `idCol` order and
    * chunks are `budget`-token windows of the concatenated stream
    * (`chunk_first = ⌊start/B⌋`, `chunk_last = ⌊(end−1)/B⌋`).
    *
    * `numPartitions` defaults to the session shuffle parallelism; any
    * value ≥ 1 yields identical output. Token counts are clamped to
    * ≥ 1 row-wise for the chunk-span arithmetic (an empty document
    * still occupies a point in the stream). */
  def packChunks(df: DataFrame, idCol: String, tokenCol: String,
                 budget: Long, numPartitions: Int = 0): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // RDD-level persist, deliberately: the sums job (eager, here) and
    // the caller's eventual action over the returned frame must see the
    // same sorted partitions without paying the sort twice, and an RDD
    // cache — unlike a DataFrame cache entry — is reclaimed by the
    // ContextCleaner as soon as the returned frame is garbage, so
    // nothing leaks across calls.
    val sortedRdd = df
      .select(col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("n_tokens"))
      .repartitionByRange(parts, col("id"))
      .sortWithinPartitions("id")
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Job 1: per-partition sums — #partitions Longs to the driver.
    val sums = sortedRdd.mapPartitionsWithIndex { case (i, it) =>
      var s = 0L; it.foreach(s += _._2); Iterator((i, s))
    }.collect().toMap
    // Exclusive scan on the driver (empty partitions contribute 0).
    val offsets = new Array[Long](parts)
    var acc = 0L
    for (p <- 0 until parts) {
      offsets(p) = acc
      acc += sums.getOrElse(p, 0L)
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    // Job 2 (lazy, caller-driven): local running sum + partition offset.
    val placedRdd = sortedRdd.mapPartitionsWithIndex { case (pid, it) =>
      var run = bcOffsets.value(pid)
      it.map { case (id, n) =>
        val start = run
        run += n
        (id, n, start)
      }
    }
    // Integral `div`, not floor(double /): Long/Long divides as
    // DOUBLES in Spark, exact only below 2^53 — past ~9e15 stream
    // offsets (the module's unbounded-corpus pitch) the rounded
    // quotient can land a doc in the wrong chunk, silently
    // disagreeing with chunkManifest's exact Long bounds (and with
    // the oracle's `//`). `div` is exact at any offset.
    spark.createDataFrame(placedRdd)
      .toDF("id", "n_tokens", "start_off")
      .withColumn("chunk_first", expr(s"start_off div ${budget}L"))
      .withColumn("chunk_last",
        expr(s"(start_off + greatest(n_tokens, 1L) - 1) div ${budget}L"))
      .withColumn("n_chunks",
        col("chunk_last") - col("chunk_first") + lit(1L))
      .withColumnRenamed("id", idCol)
  }

  /** Global rank (0-based) of every row in ascending `orderCols` order —
    * a distributed `row_number` for deterministic training-order
    * shuffles: rank by a portable per-row hash draw (e.g.
    * `md5(doc_id)`) and the corpus is pseudo-randomly permuted as a
    * pure function of the data, stable under retries, repartitioning,
    * and engine swaps (the [[Sampling]] determinism argument).
    *
    * Spark's built-in `row_number` needs a `Window.orderBy` WITHOUT
    * partitioning — a single task holding the whole corpus, the same
    * scale trap [[packChunks]] avoids. Here: range-partition on the
    * order key (the one shuffle, same cost class as any global sort),
    * sort within partitions, then `zipWithIndex` (one narrow
    * per-partition-counts job + an offset-add map — the RDD analogue
    * of packChunks' distributed prefix sum). `orderCols` must be a
    * total order (append a unique key as tiebreak); output is then
    * independent of the partition count (tested at 1/3/17). */
  def globalRank(df: DataFrame, orderCols: Seq[Column], outCol: String = "rank",
                 numPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ordNames = orderCols.indices.map(i => s"__ord$i")
    val tagged = orderCols.zip(ordNames).foldLeft(df) {
      case (d, (c, n)) => d.withColumn(n, c)
    }
    val sorted = tagged
      .repartitionByRange(parts, ordNames.map(col): _*)
      .sortWithinPartitions(ordNames.map(col): _*)
    // Same persist rationale as packChunks: zipWithIndex's internal
    // counts job and the caller's action must see the same sorted
    // partitions without paying the range shuffle + sort twice; an
    // RDD-level cache is reclaimed by the ContextCleaner once the
    // returned frame is garbage.
    val sortedRdd = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val ranked = sortedRdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(ranked, schema).drop(ordNames: _*)
  }

  /** Whole-document bin packing — the NO-SPLIT complement of
    * [[packChunks]] (Krell et al. 2021, "Efficient Sequence Packing
    * without Cross-contamination": concat-and-chunk lets attention
    * bleed across unrelated documents; packing whole documents into
    * fixed-capacity bins avoids it at the cost of padding waste, and
    * the packing problem collapses to the LENGTH HISTOGRAM because
    * docs of equal length are interchangeable).
    *
    * Algorithm: best-fit-decreasing on the gap histogram. The solve
    * runs on the driver over aggregate (gap, bin-range) counts — never
    * per bin, never per doc — so driver work/state is bounded by the
    * number of distinct lengths (<= capacity) times the layer count,
    * independent of corpus size. Doc-to-bin assignment is then fully
    * relational: a distributed rank within each length class (via
    * [[globalRank]] on (length, id) minus the broadcast histogram
    * prefix — no per-length window, no hot-length task), range-joined
    * against the broadcast solve log ("spans": rank interval -> bin
    * base), bin id = base + rank offset. Deterministic end to end: a
    * pure function of the (length, id) multiset, partition-invariant
    * (TrainPrepSpec).
    *
    * Documents longer than `capacity` cannot be packed whole; they
    * come back with `bin_id` NULL and `oversize` true (the caller
    * chooses truncate/split/drop — this operator refuses to pick
    * silently). Empty documents clamp to length 1 (they occupy a slot,
    * [[packChunks]]' convention).
    *
    * @return (idCol, n_tokens, bin_id, oversize) — every input row,
    *         exactly once; per-bin token sums <= capacity by
    *         construction. */
  def packBins(df: DataFrame, idCol: String, tokenCol: String,
               capacity: Long): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    // Driver-state guard: the histogram is <= capacity rows and the
    // solve log is histogram-size x layers, so a pathological capacity
    // (adversarial distinct lengths) would silently grow driver memory.
    // 2^24 covers any real context length with ~100x headroom; raise
    // deliberately, not by accident.
    require(capacity <= (1L << 24),
      s"capacity $capacity exceeds 2^24 — the driver solve is bounded by " +
        "the distinct-length histogram (<= capacity rows); a larger " +
        "capacity needs an explicit design review, not a silent solve")
    val spark = df.sparkSession
    val base = df.select(col(idCol).cast("long").as("id"),
      greatest(col(tokenCol).cast("long"), lit(1L)).as("n_tokens"))
    val packable = base.filter(col("n_tokens") <= capacity)
    // The length histogram: <= capacity rows to the driver.
    val hist = packable.groupBy(col("n_tokens").as("len"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    // Rank base of each length class in (len asc, id asc) rank order.
    val cumStart = {
      var acc = 0L
      hist.map { case (len, c) => val s = acc; acc += c; (len, s) }.toMap
    }
    // ---- Driver solve: best-fit-decreasing over gap classes. ----
    // State: gap -> FIFO of contiguous bin-id ranges (start, count).
    // Each placement step consumes whole ranges or splits one — counts
    // move in aggregate, never bin-by-bin.
    val byGap = scala.collection.mutable.TreeMap
      .empty[Long, scala.collection.mutable.ArrayDeque[(Long, Long)]]
    def push(gap: Long, start: Long, n: Long, front: Boolean): Unit =
      if (gap > 0 && n > 0) {
        val q = byGap.getOrElseUpdate(gap,
          scala.collection.mutable.ArrayDeque.empty)
        if (front) q.prepend((start, n)) else q.append((start, n))
      }
    var nextBin = 0L
    // Solve log: (len, span_start_rank, span_len, bin_base) — doc with
    // within-length rank r in [start, start+len) lands in bin
    // base + (r - start), one doc per bin per span.
    val spans = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    for ((len, total) <- hist.sortBy(-_._1)) {
      var need = total
      var cum = 0L
      while (need > 0) {
        // Best fit: smallest gap that admits this length.
        byGap.minAfter(len) match {
          case Some((gap, q)) =>
            val (start, r) = q.removeHead()
            if (q.isEmpty) byGap.remove(gap)
            val m = math.min(need, r)
            // Untouched remainder keeps its position at the front so
            // the next placement continues deterministically.
            if (m < r) push(gap, start + m, r - m, front = true)
            spans += ((len, cum, m, start))
            push(gap - len, start, m, front = false)
            cum += m; need -= m
          case None =>
            // No open bin admits `len`: open fresh bins, packed in
            // same-length layers (floor(capacity/len) docs per bin) —
            // aggregate arithmetic, not a per-bin loop.
            val per = capacity / len
            val full = need / per
            if (full > 0) {
              var j = 0L
              while (j < per) { spans += ((len, cum + j * full, full, nextBin)); j += 1 }
              push(capacity - per * len, nextBin, full, front = false)
              nextBin += full; cum += per * full; need -= per * full
            }
            if (need > 0 && full == 0) {
              // Fewer than one full layer remains: one last bin takes
              // them all (need < per docs of this length).
              var j = 0L
              while (j < need) { spans += ((len, cum + j, 1L, nextBin)); j += 1 }
              push(capacity - need * len, nextBin, 1L, front = false)
              nextBin += 1; cum += need; need = 0
            }
          }
      }
    }
    val nBins = nextBin
    // ---- Relational assignment. ----
    import spark.implicits._
    val spansDf = broadcast(spans.toSeq
      .toDF("len", "span_start", "span_len", "bin_base"))
    val cumDf = broadcast(cumStart.toSeq.toDF("n_tokens", "cum_start"))
    val ranked = globalRank(packable, Seq(col("n_tokens"), col("id")), "grank")
    val assigned = ranked.join(cumDf, "n_tokens")
      .withColumn("lrank", col("grank") - col("cum_start"))
      .join(spansDf,
        col("n_tokens") === col("len") &&
          col("lrank") >= col("span_start") &&
          col("lrank") < col("span_start") + col("span_len"))
      .select(col("id").as(idCol), col("n_tokens"),
        (col("bin_base") + col("lrank") - col("span_start")).as("bin_id"),
        lit(false).as("oversize"))
    val oversize = base.filter(col("n_tokens") > capacity)
      .select(col("id").as(idCol), col("n_tokens"),
        lit(null).cast("long").as("bin_id"), lit(true).as("oversize"))
    assigned.unionByName(oversize)
  }

  /** The consumer-side inverse of [[packBins]] — the per-bin manifest a
    * training loader consumes directly ([[chunkManifest]]'s convention
    * applied to whole-document bins): per bin, the document count, the
    * ORDERED member list, the token fill, and the residual gap. With
    * this artifact the loader never re-derives the assignment — it
    * seeks each bin's documents by id and pads `gap` tokens.
    *
    * `doc_ids` is bounded by construction: every member has >= 1
    * token, so a bin holds <= capacity documents — the collect_list is
    * capacity-bounded per group, never corpus-bounded. Oversize rows
    * (bin_id null) are excluded — they were never packed; the caller's
    * oversize policy owns them.
    *
    * Scale shape: one groupBy on bin_id with partial aggregation;
    * output rows = bins (corpus tokens / capacity at the measured
    * ~99% fill). Conservation (TrainPrepSpec): sum(n_docs) and
    * sum(fill_tokens) equal the packed input's counts, every fill <=
    * capacity, and doc_ids round-trips the assignment exactly.
    *
    * @param assignments [[packBins]] output (idCol, n_tokens, bin_id,
    *                    oversize)
    * @return (bin_id, n_docs, doc_ids ARRAY<BIGINT> id-asc,
    *         fill_tokens, gap) */
  def binManifest(assignments: DataFrame, idCol: String,
                  capacity: Long): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    assignments.filter(!col("oversize"))
      .groupBy("bin_id")
      .agg(count(lit(1)).as("n_docs"),
        sort_array(collect_list(col(idCol))).as("doc_ids"),
        sum(col("n_tokens")).as("fill_tokens"))
      .withColumn("gap", lit(capacity) - col("fill_tokens"))
  }

  /** The consumer-side inverse of [[packChunks]]: per chunk of the
    * concatenated stream, the ordered span of documents it draws from —
    * `(chunk_id, n_docs, first_doc, last_doc, n_tokens)` where
    * `n_tokens` is the chunk's token mass from true (unclamped) counts,
    * so full chunks sum to `budget` and empty documents contribute 0
    * while still being listed in the chunk holding their stream point.
    * Documents are placed in ascending-id order, so `[first_doc,
    * last_doc]` IS the ordered span — a training loader can seek it
    * directly.
    *
    * Scale shape: each document explodes into `n_chunks` rows
    * (bounded by `n_tokens/budget + 1` — total output rows are
    * O(total_tokens/budget + n_docs), linear), then one groupBy keyed
    * on chunk id with map-side partial aggregation. No windows, no
    * driver materialization. */
  def chunkManifest(placements: DataFrame, idCol: String,
                    budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val cid = col("chunk_id")
    placements
      .select(col(idCol).as("doc_id"), col("n_tokens"), col("start_off"),
        explode(sequence(col("chunk_first"), col("chunk_last"))).as("chunk_id"))
      .withColumn("tok_in_chunk",
        greatest(lit(0L),
          least(col("start_off") + col("n_tokens"), (cid + 1) * budget) -
            greatest(col("start_off"), cid * budget)))
      .groupBy("chunk_id")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"),
        sum("tok_in_chunk").as("n_tokens"))
  }
}
