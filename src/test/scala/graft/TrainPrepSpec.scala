package graft

import org.apache.spark.sql.functions._
import graft.ops.{Decontaminate, Packing}

/** Training-data assembly operators: benchmark decontamination and
  * sequence packing. */
class TrainPrepSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")

  // --- Decontaminate ---

  test("overlapCounts matches hand-computed trigram overlap") {
    val corpus = Seq(
      (1L, "a b c d e"), // trigrams: "a b c","b c d","c d e"
      (2L, "x y z w"), //            "x y z","y z w"
      (3L, "a b c x y z q") // shares "a b c" and "x y z"
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d"), (101L, "p q r x y z"))
      .toDF("doc_id", "text") // bench grams: "a b c","b c d","p q r","q r x","r x y","x y z"
    val got = Decontaminate.overlapCounts(corpus, bench, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_grams", "n_contaminated")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 2L), (2L, 2L, 1L), (3L, 5L, 2L)))
  }

  test("a benchmark document planted in the corpus is fully contaminated") {
    val bench = docs.filter($"doc_id" % 20 === 0)
    val planted = bench.limit(3)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
    val res = Decontaminate.overlapCounts(planted, bench, "doc_id", "text")
    val fracs = res.select("contaminated_frac").as[Double].collect()
    assert(fracs.length == 3 && fracs.forall(_ == 1.0))
  }

  test("Bloom-carrier path equals the exact broadcast path on the fixture") {
    val corpus = docs.filter($"doc_id" % 20 =!= 0)
    val bench = docs.filter($"doc_id" % 20 === 0)
    val exact = Decontaminate.overlapCounts(corpus, bench, "doc_id", "text")
    val bloom = Decontaminate.overlapCountsBloom(corpus, bench, "doc_id", "text")
    assert(exact.count() == corpus.count())
    assert(exact.exceptAll(bloom).isEmpty && bloom.exceptAll(exact).isEmpty)
  }

  // --- BPE-ish tokenizer ---

  test("bpeTokenStats splits letter/digit/punct runs (cases the word-soup fixture lacks)") {
    import graft.ops.TextAnalysis
    val df = Seq((1L, "abc123!? x9--y"), (2L, "hello world")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTokenStats(df)
      .select("doc_id", "n_bpe", "n_bpe_distinct", "bpe_chars")
      .as[(Long, Int, Int, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1: abc | 123 | !? | x | 9 | -- | y
    assert(got(1L) == ((7, 7, 13L)))
    assert(got(2L) == ((2, 2, 10L)))
  }

  // --- HeavyHitters ---

  test("frequentTerms equals the exact groupBy-count computation") {
    import graft.ops.HeavyHitters
    val toks = docs.select(explode(split($"text", " ")).as("term"))
    val total = toks.count()
    for ((num, den) <- Seq((1L, 100L), (1L, 20L))) {
      val exact = toks.groupBy("term").agg(count(lit(1)).as("n"))
        .filter($"n" * den >= total * num)
      val got = HeavyHitters.frequentTerms(docs, split($"text", " "), num, den)
      assert(got.exceptAll(exact).isEmpty && exact.exceptAll(got).isEmpty,
        s"mismatch at $num/$den")
    }
  }

  test("frequentTerms is invariant to partitioning (sketch candidates may differ; output may not)") {
    import graft.ops.HeavyHitters
    val a = HeavyHitters.frequentTerms(docs.repartition(1), split($"text", " "), 1L, 100L)
    val b = HeavyHitters.frequentTerms(docs.repartition(13), split($"text", " "), 1L, 100L)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("frequentTerms survives a tight capacity on a skew-heavy stream") {
    import graft.ops.HeavyHitters
    // 3 heavy terms (200 of 1200 each, threshold 1/8 = 150) drowned in
    // 600 singletons: capacity 12 (just above den/num = 8, far below
    // the 603 distinct terms) must still find exactly the heavy ones.
    val rows = (1 to 600).map(i => s"rare$i") ++
      Seq.fill(200)("hot1") ++ Seq.fill(200)("hot2") ++ Seq.fill(200)("hot3")
    val df = rows.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val got = HeavyHitters.frequentTerms(df.repartition(7), split($"text", " "), 1L, 8L, capacity = 12)
      .select("term").as[String].collect().toSet
    assert(got == Set("hot1", "hot2", "hot3"))
  }

  test("on a hot-vocabulary stream, the MG sketch beats naive groupBy-count on shuffle bytes") {
    import graft.ops.HeavyHitters
    // One term owns 50% of the token stream; the other half is 10,000
    // singletons. The naive plan shuffles one row per DISTINCT term
    // (the whole vocabulary); frequentTerms shuffles ≤ capacity
    // counters per partition plus ≤ capacity recount keys — the
    // vocabulary never crosses the wire. Same exhibit pattern as the
    // d02 hot-shingle test; the bench twin is t12_skewed_hot.
    val docs = (0L until 500L).map { i =>
      val uniq = (0 until 20).map(j => s"u${i}_$j").mkString(" ")
      (i, (Seq.fill(20)("hot") :+ uniq).mkString(" "))
    }.toDF("doc_id", "text").repartition(8).cache()
    docs.count()

    try {
      val toks = docs.select(explode(split($"text", " ")).as("term"))
      val total = toks.count()
      val (naive, naiveBytes) = shuffleMeasured {
        toks.groupBy("term").agg(count(lit(1)).as("n"))
          .filter($"n" * 100L >= total * 1L)
          .select("term").as[String].collect().toSet
      }
      val (got, mgBytes) = shuffleMeasured {
        HeavyHitters.frequentTerms(docs, split($"text", " "), 1L, 100L)
          .select("term").as[String].collect().toSet
      }
      assert(naive == Set("hot"))
      assert(got == naive, s"sketch path diverged: $got")
      info(s"shuffle bytes — naive groupBy: $naiveBytes, Misra-Gries: $mgBytes")
      assert(mgBytes < naiveBytes / 2,
        s"MG sketch did not beat the vocabulary-wide shuffle: $mgBytes vs $naiveBytes")
    } finally docs.unpersist()
  }

  test("bm25TopK's query-term cut shuffles a fraction of the full tf aggregation") {
    import graft.ops.TextAnalysis
    // Each doc carries 1 query-term token in 21: the tf aggregation
    // behind bm25TopK must shuffle ≈ matching postings only (the isin
    // cut runs scan-side, before any exchange), while an unfiltered
    // per-(doc, term) tf aggregation shuffles the whole token stream.
    // Same exhibit pattern as the MG-sketch test above.
    val docs = (0L until 500L).map { i =>
      val noise = (0 until 20).map(j => s"u${i}_$j").mkString(" ")
      (i, s"needle $noise")
    }.toDF("doc_id", "text").repartition(8).cache()
    docs.count()
    try {
      val (fullRows, fullBytes) = shuffleMeasured {
        docs.select($"doc_id", explode(split($"text", " ")).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")).count()
      }
      val (hits, bmBytes) = shuffleMeasured {
        TextAnalysis.bm25TopK(docs, Seq("needle"), k = 500).count()
      }
      assert(fullRows == 500L * 21 && hits == 500L)
      info(s"shuffle bytes — full tf agg: $fullBytes, bm25TopK: $bmBytes")
      assert(bmBytes < fullBytes / 2,
        s"query-term cut did not bound the tf shuffle: $bmBytes vs $fullBytes")
    } finally docs.unpersist()
  }

  test("mixturePlan budgets and epochs match a local recompute; unplanned strata excluded") {
    import graft.ops.Sampling
    val targets = Seq("en" -> 0.6, "de" -> 0.4) // es/fr/zh deliberately absent
    val plan = Sampling.mixturePlan(
        docs, "lang", size(split($"text", " ")), targets)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5))).toMap
    assert(plan.keySet == Set("en", "de"), s"unexpected strata: ${plan.keySet}")
    val local = docs.select($"lang", size(split($"text", " ")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(xs => (xs.size.toLong, xs.map(_._2).sum)).toMap
    val total = targets.map(t => local(t._1)._2).sum
    targets.foreach { case (lang, w) =>
      val (nDocs, nToks) = local(lang)
      val (gotDocs, gotToks, gotW, gotBudget, gotEpochs) = plan(lang)
      assert(gotDocs == nDocs && gotToks == nToks && gotW == w)
      assert(gotBudget == math.round(w * total))
      assert(gotEpochs == w * total / nToks)
    }
    // Budgets redistribute the SAME corpus: they sum back to the total.
    assert(plan.values.map(_._4).sum == total,
      "rounding drift: budgets do not sum to the planned total")
  }

  test("executeMixture matches a local recompute and is partition-invariant") {
    import graft.ops.Sampling
    val targets = Seq("en" -> 0.5, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.1, "zh" -> 0.1)
    def run(parts: Int) = Sampling.executeMixture(
        docs.repartition(parts), "lang", "doc_id",
        size(split($"text", " ")), targets)
      .as[(Long, String, Long)].collect().toSet
    val got = run(7)
    assert(run(1) == got, "copy set depends on partitioning")
    // Local recompute of the documented rule.
    val local = docs.select($"doc_id", $"lang", size(split($"text", " ")).cast("long"))
      .as[(Long, String, Long)].collect()
    val byLang = local.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val total = targets.map(t => byLang(t._1)).sum
    val epochs = targets.map { case (l, w) => l -> w * total / byLang(l) }.toMap
    def drawHex(id: Long, rep: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id#$rep".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val want = (for {
      (id, lang, _) <- local
      e = epochs(lang)
      rep <- 0L until math.ceil(e).toLong
      if rep < math.floor(e).toLong ||
        java.lang.Long.parseLong(drawHex(id, rep), 16) <
          math.floor((e - math.floor(e)) * 4294967296.0).toLong
    } yield (id, lang, rep)).toSet
    assert(got == want)
    // The realized doc-copy mass tracks the plan: per stratum, copies
    // land within the floor/ceil envelope of epochs·n_docs.
    val perLang = got.toSeq.groupBy(_._2).view.mapValues(_.size).toMap
    targets.foreach { case (l, _) =>
      val n = local.count(_._2 == l)
      val e = epochs(l)
      assert(perLang(l) >= math.floor(e).toLong * n &&
        perLang(l) <= math.ceil(e).toLong * n,
        s"$l: ${perLang(l)} copies outside [${math.floor(e) * n}, ${math.ceil(e) * n}]")
    }
  }

  // --- Vocabulary estimation ---

  test("HLL vocabulary estimate is partition-invariant and within its rsd of exact") {
    val toks = docs.select(explode(split($"text", " ")).as("term"))
    def est(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(countDistinct($"term").as("e"),
        approx_count_distinct($"term", 0.02).as("a")).head()
      (r.getLong(0), r.getLong(1))
    }
    val (e1, a1) = est(toks.repartition(1))
    val (e7, a7) = est(toks.repartition(7))
    assert(e1 == e7 && a1 == a7, "estimate changed with partitioning")
    assert(math.abs(a1 - e1).toDouble / e1 < 0.05, s"estimate $a1 vs exact $e1")
  }

  // --- Packing ---

  /** In-test oracle: exclusive prefix sum via a local scan of the
    * collected (id, n) pairs. */
  private def localPack(rows: Seq[(Long, Long)], budget: Long): Seq[(Long, Long, Long, Long, Long)] = {
    var acc = 0L
    rows.sortBy(_._1).map { case (id, n) =>
      val start = acc; acc += n
      val span = math.max(n, 1L)
      (id, n, start, start / budget, (start + span - 1) / budget)
    }
  }

  test("packChunks equals the local prefix-sum oracle") {
    val withTokens = docs
      .withColumn("n_tokens", size(split($"text", " ")).cast("long"))
    val expected = localPack(
      withTokens.select("doc_id", "n_tokens").as[(Long, Long)].collect().toSeq, 256L)
    val got = Packing.packChunks(withTokens, "doc_id", "n_tokens", 256)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "start_off", "chunk_first", "chunk_last")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("packChunks output is invariant to the partition count") {
    val withTokens = docs
      .withColumn("n_tokens", size(split($"text", " ")).cast("long"))
    val p1 = Packing.packChunks(withTokens, "doc_id", "n_tokens", 256, numPartitions = 1)
    val p3 = Packing.packChunks(withTokens, "doc_id", "n_tokens", 256, numPartitions = 3)
    val p17 = Packing.packChunks(withTokens, "doc_id", "n_tokens", 256, numPartitions = 17)
    assert(p1.exceptAll(p3).isEmpty && p3.exceptAll(p1).isEmpty)
    assert(p1.exceptAll(p17).isEmpty && p17.exceptAll(p1).isEmpty)
  }

  test("chunkManifest inverts packChunks: contiguous chunks, conserved token mass, ordered spans") {
    import graft.ops.Packing
    val placed = Packing.packChunks(
      docs.withColumn("n_tokens", size(split($"text", " "))),
      "doc_id", "n_tokens", 256)
    val m = Packing.chunkManifest(placed, "doc_id", 256)
      .orderBy("chunk_id").collect()
    // Every token belongs to a doc and the stream is contiguous, so
    // chunk ids are exactly 0..N-1.
    assert(m.map(_.getLong(0)).toSeq == (0L until m.length).toSeq)
    // Token-mass conservation: full chunks carry exactly the budget,
    // the final chunk the remainder, and the total equals the corpus.
    val total = placed.agg(sum("n_tokens")).head().getLong(0)
    assert(m.map(_.getLong(4)).sum == total)
    m.dropRight(1).foreach(r =>
      assert(r.getLong(4) == 256L, s"mid-stream chunk not full: $r"))
    // Ordered spans: the next chunk starts at the boundary doc (a
    // straddle) or the one after it (a clean cut) — never elsewhere.
    m.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(2) == a.getLong(3) || b.getLong(2) == a.getLong(3) + 1,
          s"span discontinuity between chunks ${a.getLong(0)} and ${b.getLong(0)}")
      case _ =>
    }
  }

  test("chunkManifest lists empty documents at their stream point with zero token mass") {
    import graft.ops.Packing
    val df = Seq((0L, 300L), (1L, 0L), (2L, 100L)).toDF("doc_id", "n_tokens")
    val placed = Packing.packChunks(df, "doc_id", "n_tokens", 256)
    val m = Packing.chunkManifest(placed, "doc_id", 256)
      .orderBy("chunk_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // Chunk 0 is all doc 0; chunk 1 holds doc 0's tail (44), the empty
    // doc 1 (point at offset 300, mass 0), and doc 2 (100).
    assert(m == Seq((0L, 1L, 0L, 0L, 256L), (1L, 3L, 0L, 2L, 144L)))
  }

  test("globalRank equals a local sort's row numbers and is partition-invariant") {
    import graft.ops.Packing
    val draw = md5(concat($"doc_id".cast("string"), lit("|t16")))
    def rank(parts: Int) = Packing.globalRank(
      docs.select("doc_id").repartition(parts), Seq(draw, $"doc_id"), "rank")
    val got = rank(7).as[(Long, Long)].collect().sortBy(_._2)
    // Local oracle: sort ids by the same md5 draw.
    def localDraw(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id|t16".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val want = docs.select("doc_id").as[Long].collect()
      .sortBy(id => (localDraw(id), id))
    assert(got.map(_._1).toSeq == want.toSeq)
    assert(got.map(_._2).toSeq == got.indices.map(_.toLong))
    // Partition invariance: the rank column is a pure function of data.
    val other = rank(1).as[(Long, Long)].collect().sortBy(_._2)
    assert(other.toSeq == got.toSeq)
  }

  test("packChunks stream is gapless and chunk spans are consistent") {
    val withTokens = docs
      .withColumn("n_tokens", size(split($"text", " ")).cast("long"))
    val rows = Packing.packChunks(withTokens, "doc_id", "n_tokens", 256)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "start_off", "chunk_first", "chunk_last", "n_chunks")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // Consecutive docs tile the stream exactly: start[i+1] = start[i] + n[i].
    rows.sliding(2).foreach {
      case Array((_, n, s, _, _, _), (_, _, s2, _, _, _)) => assert(s2 == s + n)
      case _ =>
    }
    rows.foreach { case (_, n, s, cf, cl, nc) =>
      assert(cf == s / 256 && cl == (s + math.max(n, 1) - 1) / 256)
      assert(nc == cl - cf + 1 && nc >= 1)
      // A doc spans at most ceil(n/budget)+1 chunks.
      assert(nc <= n / 256 + 2)
    }
  }

  // Independent per-bin replica of packBins' policy (histogram
  // best-fit-decreasing with FIFO bin ranges and layered opening),
  // written at single-bin granularity — no spans, no ranks, no
  // histogram aggregation — so the distributed plumbing (globalRank,
  // prefix offsets, span range-join) is validated end to end against
  // straight-line local code.
  private def referencePack(ds: Seq[(Long, Long)], cap: Long): Map[Long, Long] = {
    val assign = scala.collection.mutable.Map.empty[Long, Long]
    // gap -> FIFO of contiguous bin-id ranges
    val classes = scala.collection.mutable.TreeMap
      .empty[Long, scala.collection.mutable.ArrayDeque[(Long, Long)]]
    def push(gap: Long, start: Long, n: Long, front: Boolean): Unit =
      if (gap > 0 && n > 0) {
        val q = classes.getOrElseUpdate(gap,
          scala.collection.mutable.ArrayDeque.empty)
        if (front) q.prepend((start, n)) else q.append((start, n))
      }
    var nextBin = 0L
    val byLen = ds.filter(_._2 <= cap).groupBy(_._2)
    for (len <- byLen.keys.toSeq.sorted.reverse) {
      val ids = byLen(len).map(_._1).sorted
      var i = 0
      while (i < ids.length) {
        classes.minAfter(len) match {
          case Some((gap, q)) =>
            val (start, r) = q.removeHead()
            if (q.isEmpty) classes.remove(gap)
            val m = math.min(ids.length - i, r).toInt
            if (m < r) push(gap, start + m, r - m, front = true)
            var j = 0
            while (j < m) { assign(ids(i + j)) = start + j; j += 1 }
            push(gap - len, start, m, front = false)
            i += m
          case None =>
            val per = cap / len
            val full = (ids.length - i) / per
            if (full > 0) {
              var j = 0
              while (j < per * full) {
                assign(ids(i + j)) = nextBin + j % full; j += 1
              }
              push(cap - per * len, nextBin, full, front = false)
              nextBin += full; i += (per * full).toInt
            } else {
              val rem = ids.length - i
              var j = 0
              while (j < rem) { assign(ids(i + j)) = nextBin; j += 1 }
              push(cap - rem * len, nextBin, 1L, front = false)
              nextBin += 1; i += rem
            }
        }
      }
    }
    assign.toMap
  }

  test("packBins equals the independent per-bin replica; capacity and conservation hold") {
    val withTokens = docs
      .withColumn("n_tokens", size(split($"text", " ")).cast("long"))
      .select("doc_id", "n_tokens")
    val cap = 128L
    val got = Packing.packBins(withTokens, "doc_id", "n_tokens", cap)
      .select("doc_id", "n_tokens", "bin_id", "oversize")
      .as[(Long, Long, Option[Long], Boolean)].collect()
    val local = withTokens.as[(Long, Long)].collect().toSeq
      .map { case (id, n) => (id, math.max(n, 1L)) }
    val expected = referencePack(local, cap)
    // Every input doc exactly once.
    assert(got.map(_._1).sorted.toSeq == local.map(_._1).sorted)
    // Exact assignment equality with the local replica.
    val gotAssign = got.collect { case (id, _, Some(b), false) => id -> b }.toMap
    assert(got.count(_._4) == local.count(_._2 > cap))
    assert(gotAssign == expected, {
      val diff = (gotAssign.keySet ++ expected.keySet)
        .filter(k => gotAssign.get(k) != expected.get(k)).take(5)
      s"assignment diverged at ${diff.map(k => (k, gotAssign.get(k), expected.get(k)))}"
    })
    // Per-bin capacity, and the FFD lower bound is nearly met.
    val binSums = got.collect { case (_, n, Some(b), _) => (b, n) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
    assert(binSums.values.forall(_ <= cap), "a bin exceeded capacity")
    val nBins = binSums.size
    val lower = math.ceil(binSums.values.sum.toDouble / cap).toLong
    assert(nBins >= lower && nBins <= math.ceil(lower * 1.2).toLong,
      s"bin count $nBins far from the $lower lower bound")
  }

  test("packBins: hand-computed toy — exact fit, layered same-length opening, gap cascade, oversize") {
    // capacity 10; lengths desc: 12 oversize; 10 exact-fits bin0;
    // three 4s: one full layer (2 per bin) -> docs 1,2 in bin1, doc 3
    // opens bin2 (gap 6); two 3s cascade into bin2 (gap 6 -> 3 -> 0).
    val d = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 12L), (5L, 3L),
      (6L, 3L), (7L, 10L)).toDF("doc_id", "n_tokens")
    val got = Packing.packBins(d, "doc_id", "n_tokens", 10L)
      .select("doc_id", "bin_id", "oversize")
      .as[(Long, Option[Long], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(4L) == ((None, true)), s"oversize doc mishandled: ${got(4L)}")
    assert(got(7L) == ((Some(0L), false)))
    assert(got(1L) == ((Some(1L), false)) && got(2L) == ((Some(1L), false)))
    assert(got(3L) == ((Some(2L), false)))
    assert(got(5L) == ((Some(2L), false)) && got(6L) == ((Some(2L), false)))
  }

  test("binManifest round-trips the assignment: membership, conservation, capacity") {
    // The t41 loader contract: the manifest's ordered member lists must
    // BE the assignment (grouped), fills must conserve the packed token
    // mass and respect capacity, gap must be the exact residual, and
    // oversize rows must not appear anywhere in it.
    val cap = 128L
    val withTokens = docs
      .withColumn("n_tokens", size(split($"text", " ")).cast("long"))
      .select("doc_id", "n_tokens")
      // One planted oversize row: the manifest must exclude it.
      .unionByName(Seq((999999L, cap + 7L)).toDF("doc_id", "n_tokens"))
    val assigned = Packing.packBins(withTokens, "doc_id", "n_tokens", cap)
      .localCheckpoint()
    val m = Packing.binManifest(assigned, "doc_id", cap)
      .as[(Long, Long, Seq[Long], Long, Long)].collect()
    val packed = assigned.filter(!$"oversize")
      .select("doc_id", "n_tokens", "bin_id")
      .as[(Long, Long, Long)].collect()
    val byBin = packed.groupBy(_._3)
    assert(m.map(_._1).sorted.toSeq == byBin.keys.toSeq.sorted,
      "manifest bins != assignment bins")
    m.foreach { case (bin, nDocs, ids, fill, gap) =>
      val members = byBin(bin)
      assert(nDocs == members.length && ids == members.map(_._1).sorted.toSeq,
        s"bin $bin member list diverged")
      assert(fill == members.map(_._2).sum && fill <= cap && gap == cap - fill,
        s"bin $bin fill/gap wrong: fill=$fill gap=$gap")
    }
    assert(!m.exists(_._3.contains(999999L)), "oversize row leaked into the manifest")
    // Whole-corpus conservation (the t40/t41 pin cross-check).
    assert(m.map(_._2).sum == packed.length.toLong)
    assert(m.map(_._4).sum == packed.map(_._2).sum)
  }

  test("packBins rejects a driver-state-hazard capacity") {
    intercept[IllegalArgumentException] {
      Packing.packBins(Seq((1L, 5L)).toDF("doc_id", "n_tokens"), "doc_id",
        "n_tokens", (1L << 24) + 1L)
    }
  }

  test("packBins is invariant to input partitioning") {
    val withTokens = docs
      .withColumn("n_tokens", size(split($"text", " ")).cast("long"))
      .select("doc_id", "n_tokens")
    def run(parts: Int) =
      Packing.packBins(withTokens.repartition(parts), "doc_id", "n_tokens", 128L)
        .select("doc_id", "bin_id").as[(Long, Option[Long])].collect().toMap
    val a = run(1)
    assert(run(3) == a && run(17) == a,
      "bin assignment moved under a repartition")
  }

  test("selectByBudget: greedy prefix cut line, hand-computed") {
    import spark.implicits._
    val d = Seq(
      (1L, 0.9, 10L), (2L, 0.8, 15L), (3L, 0.7, 10L)
    ).toDF("doc_id", "quality", "n_tokens")
    val out = graft.ops.Sampling
      .selectByBudget(d, "doc_id", "quality", "n_tokens", 20L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // Quality order 1,2,3; prefix sums 0/10/25. Doc 2 straddles the
    // budget line and doc 3 sits past it — the cut is a PREFIX, not a
    // knapsack backfill (documented semantics: the line is auditable).
    assert(out(1L) == ((10L, 0L, 1L)))
    assert(out(2L) == ((15L, 10L, 0L)))
    assert(out(3L) == ((10L, 25L, 0L)))
  }

  test("selectByBudget is invariant to input partitioning") {
    import spark.implicits._
    val d = (1 to 200)
      .map(i => (i.toLong, (i % 7).toDouble, (i % 13 + 1).toLong))
      .toDF("doc_id", "quality", "n_tokens")
    def run(parts: Int) = graft.ops.Sampling
      .selectByBudget(d.repartition(parts), "doc_id", "quality", "n_tokens", 300L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(run(1) == run(13))
    val kept = run(13).filter(_._4 == 1L)
    assert(kept.nonEmpty && kept.map(_._2).sum <= 300L,
      "kept token mass exceeds the budget")
  }

  // --- BPE merge training ---

  /** Independent in-memory reference trainer: same contract as
    * `TextAnalysis.bpeMerges` (weighted pair counts over the word
    * table, argmax by count desc then lexicographic pair, greedy
    * left-to-right merge application), implemented with plain Scala
    * collections so a Spark-side mistake cannot hide in both. */
  private def refBpe(freqs: Map[String, Long], m: Int): Seq[(Int, String, String, Long)] = {
    var words = freqs.toSeq.map { case (w, f) =>
      (w.split("").filter(_.nonEmpty).toVector, f)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (rank <- 1 to m) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _            =>
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((rank, a, b, cnt))
        words = words.map { case (syms, f) =>
          val merged = syms.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == a && x == b)
              acc.init :+ (a + b)
            else acc :+ x
          }
          (merged, f)
        }
      }
    }
    out.toSeq
  }

  test("bpeMerges learns the hand-computable rules on a classic toy corpus") {
    // 'aaab' x3 + 'ab' x1: pairs round 1: (a,a)=6, (a,b)=4 -> merge (a,a).
    // Round 2 over ['aa','a','b'] x3 + ['a','b']: (aa,a)=3, (a,b)=4 -> (a,b).
    // Round 3 over ['aa','ab'] x3 + ['ab']: (aa,ab)=3 -> merge.
    val d = Seq((1L, "aaab aaab aaab ab")).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.bpeMerges(d, "text", 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)
    assert(got == Seq((1, "a", "a", 6L), (2, "a", "b", 4L), (3, "aa", "ab", 3L)))
  }

  test("bpeMerges equals the independent in-memory trainer on the fixture corpus") {
    val freqs = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = refBpe(freqs, 20)
    val got = graft.ops.TextAnalysis.bpeMerges(docs, "text", 20)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)
    assert(got == want, s"first divergence: ${got.zip(want).find(p => p._1 != p._2)}")
    assert(got.size == 20)
  }

  test("bpeMerges shuffle is vocabulary-sized: invariant to 10x token-mass inflation") {
    // Two corpora with the IDENTICAL 300-word vocabulary, one carrying
    // every document 50 times and one 500 times (10x the token mass,
    // same word set; both replicated enough that every partition sees
    // ~the whole vocabulary, so the map-side combine's per-partition
    // output is saturated and equal on both sides). The trainer's only
    // corpus-wide pass partial-aggregates to the word-frequency table,
    // and every merge round shuffles the pair table of that
    // vocabulary-sized word list — so total shuffle must track the
    // VOCABULARY, not the token mass. The bench twin is t26_skewed_bpe
    // (hot-phrase corpus).
    val vocab = (0 until 300).map(i => s"w${i}tok")
    val lightRows = vocab.grouped(10).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
    def replicated(copies: Int) = (0 until copies).flatMap(r =>
      lightRows.map { case (i, t) => (r * 1000L + i, t) })
      .toDF("doc_id", "text").repartition(8).cache()
    val light = replicated(50)
    val heavy = replicated(500)
    light.count(); heavy.count()

    try {
      val (lightRules, lightBytes) = shuffleMeasured {
        graft.ops.TextAnalysis.bpeMerges(light, "text", 5)
          .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
      }
      val (heavyRules, heavyBytes) = shuffleMeasured {
        graft.ops.TextAnalysis.bpeMerges(heavy, "text", 5)
          .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
      }
      // Same vocabulary -> same relative pair frequencies -> identical
      // rule list (counts differ by exactly 10x, dropped above).
      assert(heavyRules == lightRules,
        s"rule lists diverged: $heavyRules vs $lightRules")
      info(s"shuffle bytes — 50x mass: $lightBytes, 500x mass: $heavyBytes")
      assert(heavyBytes < (lightBytes * 1.3).toLong,
        s"trainer shuffle scaled with token mass: $heavyBytes vs $lightBytes")
    } finally {
      light.unpersist(); heavy.unpersist()
    }
  }

  test("multiclass trainer shuffle is feature-bounded: invariant to 10x document-mass tiling") {
    // Two trivially-separable two-class corpora over one fixed token
    // set, one with 30 docs per class replicated 10 times and one 100
    // times (10x the document mass, same feature geometry; both
    // replicated enough that every partition's map-side combine is
    // saturated). The trainer's shuffles are all feature-keyed —
    // curvature dim²-keyed (one scan), gradient (dim+1)-keyed with
    // |classes| sum columns per iteration — so total shuffle must
    // track the FEATURE WIDTH, not the corpus. The bench twin is
    // t32_skewed_langid (hot-phrase corpus).
    val classTok = Map(0 -> "alpha beta gamma delta", 1 -> "omega sigma theta kappa")
    def corpus(copies: Int) = (0 until copies).flatMap(r =>
      (0 until 60).map { i =>
        val c = i % 2
        (r * 1000L + i, s"${classTok(c)} filler${i % 5}", if (c == 0) "a" else "b")
      }).toDF("doc_id", "text", "cls").repartition(8).cache()
    val light = corpus(10)
    val heavy = corpus(100)
    light.count(); heavy.count()

    def trainAcc(df: org.apache.spark.sql.DataFrame): Double = {
      val m = graft.ops.Classifier.trainMulticlass(
        df, col("cls"), Seq("a", "b"), dim = 64, iters = 6)
      val scored = graft.ops.Classifier.scoreMulticlass(df, m, col("cls"))
      val n = scored.count()
      scored.filter(col("pred") === col("lab")).count().toDouble / n
    }
    try {
      val (lightAcc, lightBytes) = shuffleMeasured(trainAcc(light))
      val (heavyAcc, heavyBytes) = shuffleMeasured(trainAcc(heavy))
      assert(lightAcc >= 0.99 && heavyAcc >= 0.99,
        s"trainer failed the separable corpus: $lightAcc / $heavyAcc")
      info(s"shuffle bytes — 10x mass: $lightBytes, 100x mass: $heavyBytes")
      assert(heavyBytes < (lightBytes * 1.3).toLong,
        s"trainer shuffle scaled with document mass: $heavyBytes vs $lightBytes")
    } finally {
      light.unpersist(); heavy.unpersist()
    }
  }

  /** Reference greedy encoder matching [[refBpe]]'s merge fold. */
  private def refEncode(word: String, rules: Seq[(String, String)]): Vector[String] =
    rules.foldLeft(word.split("").filter(_.nonEmpty).toVector) { case (syms, (a, b)) =>
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
        else acc :+ x
      }
    }

  test("bpeEncode equals the independent in-memory encoder and reassembles the input") {
    val rules = graft.ops.TextAnalysis.bpeMerges(docs, "text", 20)
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    val got = graft.ops.TextAnalysis.bpeEncode(docs, rules)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getSeq[String](3)))).toMap
    val want = docs.select("doc_id", "text").collect().map { r =>
      val toks = r.getString(1).split(" ", -1)
      val pieces = toks.flatMap(t => refEncode(t, rules)).toSeq
      r.getLong(0) -> ((toks.length, pieces.length, pieces))
    }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, g) =>
      assert(g == want(id), s"doc $id diverged: $g vs ${want(id)}")
    }
    // Lossless: pieces concatenate back to the token's characters.
    val sample = got.head._2._3.mkString
    assert(sample.nonEmpty)
  }

  test("bpeEncode with zero rules is character splitting; merges strictly compress") {
    val d = Seq((1L, "aaab ab")).toDF("doc_id", "text")
    val none = graft.ops.TextAnalysis.bpeEncode(d, Seq.empty).collect()(0)
    assert(none.getInt(2) == 6, "zero rules must yield one piece per character")
    val merged = graft.ops.TextAnalysis
      .bpeEncode(d, Seq(("a", "a"), ("a", "b"))).collect()(0)
    // aaab -> [aa, ab]; ab -> [ab]: 3 pieces.
    assert(merged.getInt(2) == 3)
    assert(merged.getSeq[String](3) == Seq("aa", "ab", "ab"))
  }

  test("bpeMerges is partition-invariant and exhausts gracefully") {
    val d = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    def run(parts: Int) = graft.ops.TextAnalysis
      .bpeMerges(d.repartition(parts), "text", 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    // Only 2 mergeable pairs exist ((a,b) then (c,d)); asking for 10
    // stops after 2 instead of looping or crashing.
    assert(run(1) == run(7))
    assert(run(1).size == 2)
    assert(graft.ops.TextAnalysis.bpeMerges(d, "text", 0).count() == 0)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.ops.TextAnalysis.bpeMerges(empty, "text", 3).count() == 0)
  }

  test("backoffTrigramLogProb shuffle tracks the n-gram vocabulary, not token mass") {
    // Same 300-word vocabulary and SAME document count, with each
    // document's text tiled 5x vs 50x (10x token mass; the tiling
    // seams add a handful of trigram types, not a multiplier). The
    // model aggregations partial-agg to n-gram-vocabulary-sized
    // tables, the score table is model-sized, the small model
    // auto-broadcasts into the scoring join, and the per-document
    // sums combine map-side to one row per (doc, partition) — so
    // total shuffle must stay in the light corpus's league, never
    // scale with the token mass. Bench twin: t34_skewed_trigram.
    val vocab = (0 until 300).map(i => s"w${i}tok")
    val baseRows = vocab.grouped(10).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
    def tiled(copies: Int) = baseRows
      .map { case (i, t) => (i, Seq.fill(copies)(t).mkString(" ")) }
      .toDF("doc_id", "text").repartition(8).cache()
    val light = tiled(5)
    val heavy = tiled(50)
    light.count(); heavy.count()

    try {
      val (lightN, lightBytes) = shuffleMeasured {
        graft.ops.TextAnalysis.backoffTrigramLogProb(light).count()
      }
      val (heavyN, heavyBytes) = shuffleMeasured {
        graft.ops.TextAnalysis.backoffTrigramLogProb(heavy).count()
      }
      assert(lightN == baseRows.size && heavyN == baseRows.size)
      info(s"shuffle bytes — 5x tiling: $lightBytes, 50x tiling: $heavyBytes")
      assert(heavyBytes < (lightBytes * 2.0).toLong,
        s"LM scoring shuffle scaled with token mass: $heavyBytes vs $lightBytes")
    } finally {
      light.unpersist(); heavy.unpersist()
    }
  }

  // --- Unigram-LM tokenizer ---

  /** Independent in-memory Viterbi with the same tie-break contract
    * (max exact score, then fewer pieces, then longest final piece). */
  private def refViterbi(w: String, lp: Map[String, Long],
      maxLen: Int): Vector[String] = {
    val n = w.length
    val INF = Long.MinValue / 4
    val best = Array.fill(n + 1)(INF)
    val np = Array.fill(n + 1)(Int.MaxValue)
    val back = new Array[Int](n + 1)
    best(0) = 0L; np(0) = 0
    for (i <- 1 to n; j <- math.max(0, i - maxLen) until i if best(j) != INF) {
      val s = lp.getOrElse(w.substring(j, i),
        if (i - j == 1) graft.ops.UnigramTokenizer.UnkFp else INF)
      if (s != INF) {
        val cand = best(j) + s; val cn = np(j) + 1
        if (cand > best(i) || (cand == best(i) && cn < np(i))) {
          best(i) = cand; np(i) = cn; back(i) = j
        }
      }
    }
    var p = n; var out = List.empty[String]
    while (p > 0) { out = w.substring(back(p), p) :: out; p = back(p) }
    out.toVector
  }

  /** Independent in-memory reference trainer: same contract as
    * `UnigramTokenizer.train` (seed substring mass, Laplace 2^-20
    * fixed-point log probs, hard-EM Viterbi usage rounds, vocabSize
    * prune by count desc / piece asc), plain Scala collections so a
    * Spark-side mistake cannot hide in both. */
  private def refUnigram(freqs: Map[String, Long], vocabSize: Int,
      seedSize: Int, maxLen: Int, iters: Int): Seq[(String, Long, Long)] = {
    def laplace(cs: Seq[(String, Long)]): Seq[(String, Long, Long)] = {
      val t = cs.map(_._2).sum; val v = cs.size
      cs.map { case (p, c) =>
        (p, c, math.round(math.log((c + 1).toDouble / (t + v).toDouble) * 1048576))
      }
    }
    val sub = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, f) <- freqs; len <- 1 to math.min(maxLen, w.length);
         st <- 0 to w.length - len) {
      val s = w.substring(st, st + len)
      sub(s) = sub.getOrElse(s, 0L) + f
    }
    val singles = sub.filter(_._1.length == 1).toSeq.sortBy(_._1)
    val multis = sub.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedSize)
    def usage(ps: Seq[(String, Long, Long)]): Map[String, Long] = {
      val lp = ps.map { case (p, _, l) => p -> l }.toMap
      val u = scala.collection.mutable.HashMap.empty[String, Long]
      for ((w, f) <- freqs; piece <- refViterbi(w, lp, maxLen))
        u(piece) = u.getOrElse(piece, 0L) + f
      u.toMap
    }
    var pieces = laplace((singles ++ multis).sortBy(_._1))
    for (_ <- 1 to iters) {
      val u = usage(pieces)
      val kept = pieces.collect {
        case (p, _, _) if p.length == 1 => (p, u.getOrElse(p, 0L))
        case (p, _, _) if u.contains(p) => (p, u(p))
      }
      pieces = laplace(kept.sortBy(_._1))
    }
    val sing = pieces.filter(_._1.length == 1)
    val mult = pieces.filter(_._1.length > 1)
      .sortBy { case (p, c, _) => (-c, p) }
      .take(math.max(0, vocabSize - sing.size))
    val fin = usage(sing ++ mult)
    laplace((sing ++ mult).map { case (p, _, _) =>
      (p, fin.getOrElse(p, 0L))
    }.sortBy(_._1))
  }

  test("unigram train learns the hand-computable toy vocabulary") {
    // words ab:2, b:1. Seed: a:2, b:3, ab:2 -> lp over T=7,V=3.
    // EM: 'ab' segments as [ab] (one piece beats a+b), usage ab:2,b:1;
    // a survives as a single at 0. Fixed point from round 1 on.
    // Final: T=3, V=3 -> lp(a)=ln(1/6), lp(ab)=ln(3/6), lp(b)=ln(2/6).
    val d = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val k = 1048576.0
    val got = graft.ops.UnigramTokenizer
      .train(d, vocabSize = 3, seedSize = 8, maxPieceLen = 4, iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    assert(got == Seq(
      ("a", 0L, math.round(math.log(1.0 / 6.0) * k)),
      ("ab", 2L, math.round(math.log(3.0 / 6.0) * k)),
      ("b", 1L, math.round(math.log(2.0 / 6.0) * k))), s"got $got")
  }

  test("unigram train equals the independent in-memory trainer on the fixture") {
    val freqs = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = refUnigram(freqs, vocabSize = 48, seedSize = 256,
      maxLen = 4, iters = 3)
    val got = graft.ops.UnigramTokenizer.train(docs, "text",
      vocabSize = 48, seedSize = 256, maxPieceLen = 4, iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    assert(got == want.sortBy(_._1),
      s"first divergence: ${got.zip(want.sortBy(_._1)).find(p => p._1 != p._2)}")
    assert(got.size == 48)
  }

  test("unigram train is partition-invariant") {
    def run(parts: Int) = graft.ops.UnigramTokenizer
      .train(docs.repartition(parts), "text",
        vocabSize = 32, seedSize = 64, maxPieceLen = 3, iters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(1) == run(7), "trained vocab must not depend on partitioning")
  }

  test("unigram Viterbi tie-breaks: fewer pieces win an exact score tie") {
    val lp = new java.util.HashMap[String, java.lang.Long]()
    lp.put("a", java.lang.Long.valueOf(-1048576L))
    lp.put("aa", java.lang.Long.valueOf(-2097152L)) // = 2*lp(a): exact tie
    val got = graft.ops.UnigramTokenizer.viterbi("aa", lp, 4).toSeq
    assert(got == Seq("aa"), s"tie must prefer the single piece: $got")
  }

  test("unigram encode equals the in-memory Viterbi and reassembles the text") {
    val vocab = graft.ops.UnigramTokenizer.train(docs, "text",
      vocabSize = 48, seedSize = 256, maxPieceLen = 4, iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    val lpMap = vocab.toMap
    val enc = graft.ops.UnigramTokenizer.encode(docs.limit(50),
      vocab, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getSeq[String](3)))).toMap
    val raw = docs.limit(50).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(enc.keySet == raw.keySet)
    raw.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val want = toks.toSeq.flatMap(w => refViterbi(w, lpMap, 4))
      val (nTok, nPieces, pieces) = enc(id)
      assert(nTok == toks.length && nPieces == want.length)
      assert(pieces == want, s"doc $id pieces diverge")
      assert(pieces.mkString("") == toks.mkString(""),
        s"doc $id does not reassemble")
    }
  }

  test("unigram encode derives its Viterbi window from the vocabulary — " +
      "pieces longer than the old default are reachable") {
    // A trained vocab can legally contain pieces longer than encode's
    // former independent maxPieceLen default (4); the window is now
    // derived from the vocabulary, so such pieces must actually win.
    val vocab = Seq(("abcdef", -1048576L))
    val enc = graft.ops.UnigramTokenizer
      .encode(Seq((1L, "abcdef")).toDF("doc_id", "text"), vocab)
      .collect()(0)
    assert(enc.getSeq[String](3) == Seq("abcdef"),
      s"6-char vocab piece unreachable: ${enc.getSeq[String](3)}")
  }

  test("compressionStats: bit-equal to a local Deflater reference; " +
      "planted repetition crosses the 0.25 tail; partition-invariant") {
    import graft.ops.TextAnalysis
    def refDeflate(s: String): (Long, Long) = {
      val raw = s.getBytes("UTF-8")
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](8192)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      d.end()
      (raw.length.toLong, n)
    }
    val repetitive = "spark shuffle " * 400 // within-doc repetition
    val diverse = (0 until 400)
      .map(i => java.lang.Long.toHexString(i * 2654435761L)).mkString(" ")
    val docs = Seq(
      (1L, repetitive), (2L, diverse),
      (3L, ""),            // empty: n_raw 0, ratio over max(n_raw,1)
      (4L, "héllo wörld"), // multibyte: n_raw counts UTF-8 BYTES
      (5L, "x"))
    val df = docs.toDF("doc_id", "text")
    val got = TextAnalysis.compressionStats(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    docs.foreach { case (id, text) =>
      val (nRaw, nComp) = refDeflate(text)
      val ratio = (nComp * 1048576L + math.max(nRaw, 1L) / 2) / math.max(nRaw, 1L)
      assert(got(id) == ((nRaw, nComp, ratio)),
        s"doc $id: ${got(id)} != ${(nRaw, nComp, ratio)}")
    }
    assert(got(4L)._1 == "héllo wörld".getBytes("UTF-8").length.toLong)
    // The planted repetitive doc lands deep in the repetitive tail;
    // the hex-salad doc does not.
    assert(got(1L)._3 < 262144L,
      s"repetitive doc should deflate below 0.25: ${got(1L)._3}")
    assert(got(2L)._3 > 262144L,
      s"diverse doc should not: ${got(2L)._3}")
    // Partitioning cannot change a byte (fresh dictionary per doc).
    val re = TextAnalysis.compressionStats(df.repartition(4)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(re == got, "compressionStats must be partition-invariant")
  }

  /** Independent in-memory DoReMi reweighter: same published recipe
    * (Laplace unigram/bigram scoring, multiplicative weights with
    * uniform smoothing, 2^-20 fixed point), written directly over
    * Scala collections with immutable maps — no shared code with
    * `Sampling.doremiReweight`'s DataFrame scoring or array loop. */
  private def refDoremi(rows: Seq[(String, String)], iters: Int,
      etaFp: Long, smoothFp: Long): Map[String, (Long, Long)] = {
    val S = 1048576L
    val toks = rows.map { case (dom, t) => (dom, t.split(" ", -1).toSeq) }
    val allToks = toks.flatMap(_._2)
    val cnt = allToks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val denom = (allToks.size.toLong + cnt.size).toDouble
    val lp = cnt.map { case (t, c) => t -> math.round(math.log((c + 1.0) / denom) * S) }
    val bgs = toks.map { case (dom, ts) => (dom, ts.zip(ts.drop(1))) }
    val bcnt = bgs.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ctx = bcnt.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val vocab = cnt.size.toLong
    val blp = bcnt.map { case (bg, c) =>
      bg -> math.round(math.log((c + 1.0) / (ctx(bg._1) + vocab).toDouble) * S) }
    val domains = toks.map(_._1).distinct.sorted
    val uniSum = toks.groupBy(_._1).map { case (d, ds) =>
      val ts = ds.flatMap(_._2); d -> ((ts.size.toLong, ts.map(lp).sum)) }
    val biSum = bgs.groupBy(_._1).map { case (d, ds) =>
      val bs = ds.flatMap(_._2); d -> ((bs.size.toLong, bs.map(blp).sum)) }
    val excess = domains.map { d =>
      val (nt, ul) = uniSum(d)
      val (nb, bl) = biSum(d)
      val nllU = Math.floorDiv(-ul, nt)
      val nllB = if (nb == 0) nllU else Math.floorDiv(-bl, nb)
      d -> math.max(nllU - nllB, 0L)
    }.toMap
    def norm(v: Map[String, BigInt]): Map[String, Long] = {
      val s = v.values.sum
      val q =
        if (s <= 0) domains.map(_ -> S / domains.size).toMap
        else v.map { case (d, x) => d -> (x * S / s).toLong }
      val deficit = (S - q.values.sum).toInt
      val boosted = q.toSeq.sortBy { case (d, wv) => (-wv, d) }
        .take(deficit).map(_._1).toSet
      q.map { case (d, wv) => d -> (if (boosted(d)) wv + 1L else wv) }
    }
    var w = norm(domains.map(_ -> BigInt(1)).toMap)
    (1 to iters).foreach { _ =>
      val up = w.map { case (d, wi) =>
        val arg = math.min(etaFp.toDouble / S * excess(d).toDouble / S, 10.0)
        d -> BigInt(wi) * math.round(StrictMath.exp(arg) * S) / S
      }
      val n = norm(up)
      w = norm(n.map { case (d, wi) =>
        d -> (BigInt(S - smoothFp) * wi / S + smoothFp / domains.size) })
    }
    domains.map(d => d -> ((excess(d), w(d)))).toMap
  }

  test("doremiReweight equals the independent reweighter and holds the DoReMi invariants") {
    val S = 1048576L
    val d = docs.select("doc_id", "text", "source")
    val got = graft.ops.Sampling.doremiReweight(d, "source").collect()
      .map(r => r.getString(0) -> r).toMap
    val ref = refDoremi(
      d.select("source", "text").as[(String, String)].collect().toSeq,
      iters = 10, etaFp = 1048576L, smoothFp = 131072L)
    assert(got.keySet == ref.keySet)
    ref.foreach { case (dom, (ex, wfp)) =>
      val r = got(dom)
      assert(r.getLong(3) == ex, s"$dom excess_fp: ${r.getLong(3)} != $ex")
      assert(r.getLong(4) == wfp, s"$dom weight_fp: ${r.getLong(4)} != $wfp")
    }
    // Exact weight-mass invariant and real movement.
    assert(got.values.map(_.getLong(4)).sum == S)
    assert(got.values.map(_.getLong(4)).max >
      got.values.map(_.getLong(4)).min, "the loop must move mass")
    // Weak monotonicity: more excess never gets less weight.
    val byEx = got.values.toSeq.sortBy(r => (-r.getLong(3), r.getString(0)))
    byEx.sliding(2).collect { case Seq(a, b) => (a, b) }.foreach {
      case (a, b) =>
        if (a.getLong(3) > b.getLong(3))
          assert(a.getLong(4) >= b.getLong(4),
            s"${a.getString(0)} excess>${b.getString(0)} but weight<")
    }
    // The t17 plan-frame contract columns derive from weight_fp.
    val total = got.values.map(_.getLong(2)).sum
    got.values.foreach { r =>
      val tw = r.getLong(4).toDouble / S
      assert(r.getDouble(5) == tw)
      assert(r.getLong(6) == math.round(tw * total))
      assert(r.getDouble(7) == tw * total / r.getLong(2))
    }
    // iters = 0: no movement — the (deficit-corrected) uniform plan.
    val flat = graft.ops.Sampling.doremiReweight(d, "source", iters = 0)
      .select("weight_fp").as[Long].collect()
    assert(flat.sum == S && (flat.max - flat.min) <= 1L)
  }

  test("doremiReweight: a domain with no bigram evidence gets zero excess and stays in the plan") {
    val d = Seq(
      (1L, "x", "tiny"), (2L, "y", "tiny"), // single-token docs: no bigrams
      (3L, "a b a b a", "big"), (4L, "b a b a b", "big"))
      .toDF("doc_id", "text", "source")
    val got = graft.ops.Sampling.doremiReweight(d, "source").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("big", "tiny"))
    assert(got("tiny").getLong(3) == 0L,
      s"no bigram evidence must mean zero excess: ${got("tiny")}")
    assert(got.values.map(_.getLong(4)).sum == 1048576L)
    assert(got("big").getLong(4) >= got("tiny").getLong(4),
      "the domain with measurable excess must not lose mass to the one without")
  }

  test("executePlan over a prebuilt plan equals executeMixture; a learned plan executes in-band") {
    val targets = Seq("en" -> 0.5, "de" -> 0.15, "es" -> 0.15,
      "fr" -> 0.1, "zh" -> 0.1)
    val toks = size(split(col("text"), " "))
    val direct = graft.ops.Sampling
      .executeMixture(docs, "lang", "doc_id", toks, targets)
    val viaPlan = graft.ops.Sampling.executePlan(docs, "lang", "doc_id",
      graft.ops.Sampling.mixturePlan(docs, "lang", toks, targets))
    assert(direct.exceptAll(viaPlan).isEmpty &&
      viaPlan.exceptAll(direct).isEmpty,
      "executePlan must reproduce executeMixture exactly")
    // Learned plan: every materialized doc's copy count sits inside
    // its domain's [floor(epochs), ceil(epochs)] band.
    val plan = graft.ops.Sampling.doremiReweight(docs, "source")
    val eps = plan.select("stratum", "epochs").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val copies = graft.ops.Sampling.executePlan(docs, "source", "doc_id", plan)
      .groupBy("doc_id", "source").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(copies.nonEmpty)
    copies.foreach { case (src, c) =>
      val e = eps(src)
      assert(c >= math.floor(e).toLong && c <= math.ceil(e).toLong,
        s"$src: $c copies outside [floor, ceil] of epochs $e")
    }
  }

  test("executePlan drops zero- and negative-epoch plan rows instead of descending") {
    // A zero-weight stratum must contribute ZERO copies — before the
    // enforcement, sequence(0, ceil(0)-1) DESCENDED to [0, -1] and the
    // bogus rep = -1 passed the `rep < floor(epochs)` filter, emitting
    // one phantom copy per doc. Reachable via doremiReweight with a
    // smoothing floor below 1/nDomains.
    import spark.implicits._
    val plan = Seq(("en", 2.0), ("de", 0.0), ("es", -1.0))
      .toDF("stratum", "epochs")
    val out = graft.ops.Sampling
      .executePlan(docs, "lang", "doc_id", plan)
      .groupBy("lang").agg(count(lit(1)).as("c"), min(col("rep")).as("min_rep"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(!out.contains("de") && !out.contains("es"),
      s"zero/negative-epoch strata must yield zero copies, got $out")
    assert(out("en")._1 > 0 && out("en")._2 == 0L,
      s"positive stratum unaffected and reps non-negative: $out")
  }

  test("tokenizerFertility: hand-computed ratios, UTF-8 bytes, zero-token NULLs") {
    import graft.ops.TextAnalysis
    val d = Seq(
      ("aa", "ab cd!"), // tokens [ab, cd, !]: 3 tok / 5 tok-chars / 6 bytes / 2 words
      ("bb", "é"), // é: 1 token, 1 char, 2 UTF-8 bytes, 1 word
      ("cc", "")        // no tokens: ratio denominators go NULL, fertility 0/1
    ).toDF("lang", "text")
    val out = TextAnalysis.tokenizerFertility(d).collect()
      .map(r => r.getString(0) -> r).toMap
    val aa = out("aa")
    assert((aa.getLong(2), aa.getLong(3), aa.getLong(4), aa.getLong(5)) ==
      ((3L, 5L, 6L, 2L)), "aa sums")
    assert(aa.getLong(6) == 1572864L, // (3*2^20) div 2
      s"fertility: ${aa.getLong(6)}")
    assert(aa.getLong(7) == 1747626L, // (5*2^20) div 3
      s"chars/token: ${aa.getLong(7)}")
    assert(aa.getLong(8) == 2097152L, "bytes/token: exactly 2.0")
    val bb = out("bb")
    assert((bb.getLong(3), bb.getLong(4)) == ((1L, 2L)),
      "multibyte char: 1 char but 2 UTF-8 octets")
    assert(bb.getLong(7) == 1048576L && bb.getLong(8) == 2097152L,
      "bb ratios diverge exactly 2x between chars and bytes")
    val cc = out("cc")
    assert(cc.getLong(6) == 0L, "0 tokens / 1 word: fertility exactly 0")
    assert(cc.isNullAt(7) && cc.isNullAt(8),
      "zero token mass must read NULL ratios, not a division error")
  }

  test("tokenizerFertility: split division equals the BigInt reference on the corpus") {
    import graft.ops.TextAnalysis
    val rows = TextAnalysis.tokenizerFertility(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, ch, by, wo) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      def ref(num: Long, den: Long): Option[Long] =
        if (den == 0) None
        else Some(((BigInt(num) * 1048576) / den).toLong)
      assert(Option(r.get(6)).map(_.asInstanceOf[Long]) == ref(tok, wo),
        s"${r.getString(0)}: fertility split-div != BigInt reference")
      assert(Option(r.get(7)).map(_.asInstanceOf[Long]) == ref(ch, tok),
        s"${r.getString(0)}: chars/token split-div != BigInt reference")
      assert(Option(r.get(8)).map(_.asInstanceOf[Long]) == ref(by, tok),
        s"${r.getString(0)}: bytes/token split-div != BigInt reference")
    }
  }
}


