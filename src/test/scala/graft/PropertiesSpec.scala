package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the Column-expression primitives that were
  * rewritten for the interpreted-HOF performance fix (zip_with shingle
  * chains) and for the order-statistic quantile cut: each is checked
  * against a naive Scala reference on randomized inputs, all cases
  * evaluated through ONE DataFrame so Spark evaluation cost is paid
  * once per property, not per case. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val Cases = 300

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 12)
    toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "ab", "ba", "x", "aa"))
  } yield toks.mkString(" ")

  private def refShingles(text: String, n: Int): Seq[String] = {
    val words = text.split(" ", -1)
    if (words.length >= n) words.sliding(n).map(_.mkString(" ")).toSeq
    else Seq(text)
  }

  test("shingles(n=2,3,4) equal the naive sliding-window reference on random texts") {
    // NB: empty-string text splits to [""] (length 1), exercising the
    // whole-text fallback; token duplicates exercise merge ties.
    val texts = sample(textGen, Cases)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(2, 3, 4)) {
      val got = df.select(col("id"), graft.ops.Dedup.shingles(col("text"), n).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) == refShingles(t, n),
          s"n=$n text='$t': ${got(i.toLong)} != ${refShingles(t, n)}")
      }
    }
  }

  test("quantileFilter matches a naive sorted-scan reference across a percent-grid of q") {
    // Values from a tiny grid force duplicates AT the threshold; group
    // sizes hit the q·n-integral hazard combos (e.g. q=0.07, n=100).
    val rowGen = for {
      g <- Gen.oneOf("g1", "g2", "g3")
      v <- Gen.choose(0, 9)
    } yield (g, v.toDouble)
    val rows = sample(rowGen, 150).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }
    val df = rows.toDF("doc_id", "source", "quality")
    for (q <- Seq(0.07, 0.14, 0.25, 0.5, 0.9, 1.0)) {
      val got = graft.ops.Sampling
        .quantileFilter(df, "doc_id", "source", "quality", q)
        .select("doc_id", "thr", "keep")
        .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
      rows.groupBy(_._2).foreach { case (_, members) =>
        val sorted = members.sortBy(m => (m._3, m._1))
        val k = math.max(math.ceil(q * sorted.size - 1e-9).toLong, 1L).toInt
        val thr = sorted(k - 1)._3
        members.foreach { case (id, _, v) =>
          assert(got(id) == ((thr, v >= thr)),
            s"q=$q id=$id v=$v: ${got(id)} != ($thr, ${v >= thr})")
        }
      }
    }
  }

  test("backoffTrigramLogProb equals a naive in-memory reference on random corpora") {
    // Same branch expressions, same double associativity, same 2^-20
    // rounding per DISTINCT trigram — any divergence in floors,
    // context totals, or the backoff chain shows up as a fixed-point
    // mismatch. Small vocab forces floor hits AND misses per corpus.
    def refBackoff(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
      def toks(t: String) = t.split(" ", -1).toSeq
      val tris = docs.flatMap { case (id, t) =>
        toks(t).sliding(3).filter(_.size == 3)
          .map(w => (id, (w(0), w(1), w(2)))) }
      val c3 = tris.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
      val c2 = docs.flatMap { case (_, t) =>
        toks(t).sliding(2).filter(_.size == 2).map(w => (w(0), w(1))) }
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val unis = docs.flatMap { case (_, t) => toks(t) }
      val c1 = unis.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val n = unis.size.toLong
      val lp = c3.map { case (k @ (w1, w2, w3), c) =>
        val s =
          if (c >= 2L) c.toDouble / c2((w1, w2)).toDouble
          else if (c2((w2, w3)) >= 2L)
            0.4 * (c2((w2, w3)).toDouble / c1(w2).toDouble)
          else 0.4 * (0.4 * (c1(w3).toDouble / n.toDouble))
        k -> math.round(math.log(s) * 1048576.0)
      }
      tris.groupBy(_._1).map { case (id, ts) =>
        id -> ((ts.size.toLong, ts.map(t => lp(t._2)).sum))
      }
    }
    val docGen = for {
      n <- Gen.choose(3, 9)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
    } yield toks.mkString(" ")
    for (corpus <- 0 until 10) {
      val docs = sample(docGen, 8).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val want = refBackoff(docs)
      val got = graft.ops.TextAnalysis
        .backoffTrigramLogProb(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == want,
        s"corpus $corpus diverged: ${got.toSeq.sorted} vs ${want.toSeq.sorted}" +
          s" on ${docs.mkString("; ")}")
    }
  }

  test("dupSpanRemove equals a naive in-memory span-scrub on random corpora") {
    // Tiny alphabet so cross-document span collisions are common; the
    // whole corpus is one randomized fixture, evaluated once.
    val texts = sample(textGen, 120)
    val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val n = 3
    // Independent reference: spans with positions (whole text when
    // short), df over distinct (doc, span), covered = union of df>=2
    // span ranges, clean = uncovered tokens rejoined.
    val spansOf: ((Long, String)) => Seq[(Int, Int, String)] = { case (_, t) =>
      val w = t.split(" ", -1)
      if (w.length >= n) (0 to w.length - n).map(i => (i, n, w.slice(i, i + n).mkString(" ")))
      else Seq((0, w.length, t))
    }
    val df2 = corpus.flatMap { d => spansOf(d).map(_._3).distinct.map(_ -> d._1) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val expected = corpus.map { case (id, t) =>
      val w = t.split(" ", -1)
      val covered = spansOf((id, t)).filter(s => df2(s._3) >= 2)
        .flatMap(s => s._1 until (s._1 + s._2)).toSet
      val kept = w.zipWithIndex.collect { case (tok, i) if !covered(i) => tok }
      id -> ((w.length.toLong, covered.size.toLong, kept.mkString(" ")))
    }.toMap
    val got = graft.ops.Dedup
      .dupSpanRemove(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id '${texts(id.toInt)}': ${got(id)} != $e")
    }

    // keep-first: same reference with ownership — a span is scrubbed
    // only outside the minimum-id document containing it.
    val owner = corpus.flatMap { d => spansOf(d).map(_._3).distinct.map(_ -> d._1) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expectedKf = corpus.map { case (id, t) =>
      val w = t.split(" ", -1)
      val covered = spansOf((id, t))
        .filter(s => df2(s._3) >= 2 && owner(s._3) != id)
        .flatMap(s => s._1 until (s._1 + s._2)).toSet
      val kept = w.zipWithIndex.collect { case (tok, i) if !covered(i) => tok }
      id -> ((w.length.toLong, covered.size.toLong, kept.mkString(" ")))
    }.toMap
    val gotKf = graft.ops.Dedup
      .dupSpanRemove(corpus.toDF("doc_id", "text"), "doc_id", "text",
        keepFirst = true)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    expectedKf.foreach { case (id, e) =>
      assert(gotKf(id) == e,
        s"keepFirst doc $id '${texts(id.toInt)}': ${gotKf(id)} != $e")
    }
  }

  test("exactSubstrRemove equals a naive in-memory window-scrub on random corpora") {
    // Variable-length semantics via the window reduction: a token is
    // removed iff one of its W-token windows occurs >= 2 times in the
    // corpus by TOTAL count. Tiny alphabet + docs up to 14 tokens at
    // W = 4 makes cross-document window collisions, overlapping-window
    // span merging, and boundary anchors all common. Two planted docs
    // pin the semantics d13 cannot express: a passage repeated WITHIN
    // one document is a duplicate (total-occurrence counting), and a
    // doc of exactly W unique tokens survives verbatim (absolute
    // threshold, no short-doc fallback).
    val W = 4
    val docGen = for {
      n <- Gen.choose(0, 14)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    } yield toks.mkString(" ")
    val texts = sample(docGen, 120) ++ Seq(
      "q r s t q r s t u", // "q r s t" twice in ONE doc -> duplicated
      "j k l m")           // exactly W unique tokens, single occurrence
    val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val winCount = corpus.flatMap { case (_, t) =>
      val w = t.split(" ", -1)
      if (w.length >= W) (0 to w.length - W).map(i => w.slice(i, i + W).mkString(" "))
      else Seq.empty
    }.groupBy(identity).view.mapValues(_.size).toMap
    val expected = corpus.map { case (id, t) =>
      val w = t.split(" ", -1)
      val covered = (if (w.length >= W) 0 to w.length - W else Range(0, 0))
        .filter(i => winCount(w.slice(i, i + W).mkString(" ")) >= 2)
        .flatMap(i => i until i + W).toSet
      val kept = w.zipWithIndex.collect { case (tok, i) if !covered(i) => tok }
      id -> ((w.length.toLong, covered.size.toLong, kept.mkString(" ")))
    }.toMap
    val got = graft.ops.Dedup
      .exactSubstrRemove(corpus.toDF("doc_id", "text"), "doc_id", "text",
        minLen = W)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id '${texts(id.toInt)}': ${got(id)} != $e")
    }
    // The planted within-document duplicate really was scrubbed, and
    // the single-occurrence W-token doc really survived.
    assert(got(120L)._2 == 8L, s"within-doc dup not scrubbed: ${got(120L)}")
    assert(got(121L) == ((4L, 0L, "j k l m")), s"short doc mangled: ${got(121L)}")
  }

  test("substrDecontaminate equals a naive in-memory cross-set window-scrub") {
    // The d19 semantics: a corpus token is removed iff one of its
    // W-token windows appears verbatim anywhere in the BENCHMARK set
    // (cross-set containment, not within-corpus duplication — a
    // corpus-internal duplicate with no benchmark twin must survive).
    val W = 4
    val docGen = for {
      n <- Gen.choose(0, 14)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    } yield toks.mkString(" ")
    val corpusTexts = sample(docGen, 100) ++ Seq(
      "q r s t u v",      // planted: shares "q r s t" with the bench
      "q r s t u v")      // corpus-internal duplicate, bench-free tail
    val benchTexts = sample(docGen, 30) :+ "x q r s t y"
    val corpus = corpusTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val benchWins = benchTexts.flatMap { t =>
      val w = t.split(" ", -1)
      if (w.length >= W) (0 to w.length - W).map(i => w.slice(i, i + W).mkString(" "))
      else Seq.empty
    }.toSet
    val expected = corpus.map { case (id, t) =>
      val w = t.split(" ", -1)
      val covered = (if (w.length >= W) 0 to w.length - W else Range(0, 0))
        .filter(i => benchWins(w.slice(i, i + W).mkString(" ")))
        .flatMap(i => i until i + W).toSet
      val kept = w.zipWithIndex.collect { case (tok, i) if !covered(i) => tok }
      id -> ((w.length.toLong, covered.size.toLong, kept.mkString(" ")))
    }.toMap
    val got = graft.ops.Dedup.substrDecontaminate(
        corpus.toDF("doc_id", "text"),
        benchTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"),
        "doc_id", "text", minLen = W)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id '${corpusTexts(id.toInt)}': ${got(id)} != $e")
    }
    // The planted leak is scrubbed (both copies — "u v" survives each)
    // even though the pair is ALSO a corpus-internal duplicate, and
    // the scrub came from benchmark containment, not self-duplication:
    // positions 0-3 go, the bench-free "u v" tail stays.
    assert(got(100L) == ((6L, 4L, "u v")), s"planted leak: ${got(100L)}")
    assert(got(101L) == ((6L, 4L, "u v")), s"planted leak: ${got(101L)}")
    // Empty benchmark: nothing is removed, corpus round-trips.
    val none = graft.ops.Dedup.substrDecontaminate(
        corpus.toDF("doc_id", "text"),
        Seq.empty[(Long, String)].toDF("doc_id", "text"),
        "doc_id", "text", minLen = W)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(none.values.forall(_ == 0L), "empty benchmark must scrub nothing")
  }

  test("SubstrWindows roll bit-equals the direct per-anchor fold; 64-apart alias gone") {
    import graft.ops.Dedup.SubstrWindows
    // The O(n) rolling update (subtract the leaving token's Mult^(W-1)
    // term, multiply, add the entering token) must produce exactly the
    // keys a direct O(W) fold per anchor does — wrapping Long
    // arithmetic included. Random widths straddle 64 on purpose.
    val rnd = new scala.util.Random(7)
    def directKeys(toks: Array[String], w: Int): Seq[Long] =
      (0 to toks.length - w).map { p =>
        var acc = 0L
        var i = 0
        while (i < w) {
          acc = acc * SubstrWindows.Mult + SubstrWindows.hashToken(toks(p + i))
          i += 1
        }
        acc
      }
    for (_ <- 0 until 60) {
      val w = 2 + rnd.nextInt(70)
      val n = w + rnd.nextInt(150)
      val toks = Array.fill(n)(rnd.nextInt(6).toString)
      val got = SubstrWindows.rollKeys(toks, w)
      assert(got.toSeq == directKeys(toks, w), s"roll != fold at n=$n w=$w")
    }
    // The retired rotate-left-1 combine wrapped at 64 positions: in a
    // 65-token window, tokens 0 and 64 both entered at rotation 0, so
    // swapping them could not change the key (candidate-sliver
    // inflation for minLen >= 64 — VERDICT r9). Demonstrate the old
    // alias, then assert the polynomial key separates the pair.
    val a = Array.tabulate(65)(i => s"t$i")
    val b = a.clone(); val tmp = b(0); b(0) = b(64); b(64) = tmp
    def rotKey(t: Array[String]): Long =
      t.foldLeft(0L)((acc, x) =>
        ((acc << 1) | (acc >>> 63)) ^ SubstrWindows.hashToken(x))
    assert(rotKey(a) == rotKey(b), "sanity: the retired rotate combine aliased here")
    assert(SubstrWindows.rollKeys(a, 65)(0) != SubstrWindows.rollKeys(b, 65)(0),
      "polynomial key must separate a 64-apart token swap")
  }

  test("t46 pipeline inverts the HTML-ification up to the line gate (random corpora)") {
    // Generative end-to-end oracle: for ANY alnum token list, the t46
    // pipeline (HTML-ify between the fixed boilerplate, extract) must
    // return exactly the independent in-memory model — the fixed
    // boilerplate lines always resolve the same way (title/nav/footer
    // dropped, the entity-decoded summary kept with its inline link
    // surviving the density rule) and each 10-token reflow chunk is
    // kept iff it holds >= 5 tokens (alnum tokens make the alpha rule
    // vacuous). Covers n = 0 (the [""]-token split convention), exact
    // multiples of 10, and 1-4/5-9-token tails.
    val tokGen: Gen[Seq[String]] = for {
      n <- Gen.choose(0, 27)
      toks <- Gen.listOfN(n,
        Gen.oneOf("alpha", "b2", "gamma7", "dd", "e", "fox", "g8g", "hij"))
    } yield toks
    val cases = sample(tokGen, 200)
    val df = cases.zipWithIndex
      .map { case (t, i) => (i.toLong, t.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = graft.Queries.htmlExtractFrame(df).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val summary = "summary: tokens & hashes <fast> dedup at scale " +
      "via the spark guide reference"
    cases.zipWithIndex.foreach { case (toks, i) =>
      val w = if (toks.isEmpty) Seq("") else toks // split("", " ") = [""]
      val chunks = w.grouped(10).map(_.mkString(" ")).toSeq
      val keptChunks = chunks.filter(_.split(" ").count(_.nonEmpty) >= 5)
      // title, nav, summary, P paragraphs, footer, trailing "".
      val expLines = (chunks.size + 5).toLong
      val expKept = (1 + keptChunks.size).toLong
      val expText = (summary +: keptChunks).mkString("\n")
      assert(got(i.toLong) == ((expLines, expKept, expText)),
        s"toks=$toks: ${got(i.toLong)}")
    }
  }

  test("mmrDiversify equals a naive in-memory greedy on random pools and lambdas") {
    // The reference mirrors the operator's exact fixed-point contract:
    // rel_fp via HALF_UP decimal rounding (Spark's round), pairwise
    // cosines via rint after a left-to-right double accumulation, Long
    // lambda-algebra, id-asc ties, (rel desc, id asc) pool order. All
    // query groups for one lambda evaluate through ONE DataFrame.
    def relFp(c: Double): Long =
      java.math.BigDecimal.valueOf(c * 1048576.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    def cosFp(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      val c = if (na == 0.0 || nb == 0.0) 0.0
              else dot / (math.sqrt(na) * math.sqrt(nb))
      math.rint(c * 1048576.0).toLong
    }
    def refMmr(pool: Seq[(Long, Double, Array[Float])], k: Int,
        lambdaFp: Long): Seq[(Int, Long)] = {
      val cands = pool.map { case (id, c, v) => (id, relFp(c), v) }
        .sortBy(t => (-t._2, t._1)).toArray
      val lam = lambdaFp; val olam = 1048576L - lambdaFp
      val maxDiv = Array.fill(cands.length)(Long.MinValue)
      val taken = Array.fill(cands.length)(false)
      var lastIdx = -1
      (1 to math.min(k, cands.length)).map { r =>
        val pick =
          if (r == 1) 0
          else {
            cands.indices.filterNot(taken).foreach { i =>
              val d = cosFp(cands(i)._3, cands(lastIdx)._3)
              if (d > maxDiv(i)) maxDiv(i) = d
            }
            cands.indices.filterNot(taken)
              .minBy(i => (-(lam * cands(i)._2 - olam * maxDiv(i)), cands(i)._1))
          }
        taken(pick) = true; lastIdx = pick
        (r, cands(pick)._1)
      }
    }
    val vecGen = Gen.listOfN(3, Gen.choose(-2.0f, 2.0f)).map(_.toArray)
    val poolGen = for {
      n <- Gen.choose(1, 8)
      vs <- Gen.listOfN(n, vecGen)
      cs <- Gen.listOfN(n, Gen.choose(-1.0, 1.0))
    } yield vs.zip(cs).zipWithIndex.map { case ((v, c), i) =>
      (i.toLong + 1L, c, v) }
    for (lambdaFp <- Seq(0L, 314573L, 734003L, 1048576L)) {
      val pools = sample(poolGen, 60)
      val cand = pools.zipWithIndex.flatMap { case (p, qi) =>
        p.map { case (id, c, _) => (qi.toLong, id, c) } }
        .toDF("query_id", "nbr_id", "cosine")
      val corpus = pools.zipWithIndex.flatMap { case (p, qi) =>
        // Per-query id namespace: offset ids so one corpus table serves
        // every pool without collisions.
        p.map { case (id, _, v) => (qi * 100L + id, v) } }
        .toDF("id", "features")
      val candNs = cand.select(col("query_id"),
        (col("query_id") * 100L + col("nbr_id")).as("nbr_id"), col("cosine"))
      val got = graft.ops.Retrieval
        .mmrDiversify(candNs, corpus, k = 4, m = 8, lambdaFp = lambdaFp)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      pools.zipWithIndex.foreach { case (p, qi) =>
        val want = refMmr(p, k = 4, lambdaFp)
          .map { case (_, id) => qi * 100L + id }
        assert(got(qi.toLong) == want,
          s"lambda=$lambdaFp pool $qi diverged: ${got(qi.toLong)} != $want")
      }
    }
  }

  // --- URL normalization (t48) ---

  /** Component-wise URL generator: builds a messy surface form AND its
    * known canonical form from the same components, so the expected
    * value is constructive — no reference re-implementation of the
    * regex chain to drift against. */
  private val urlCaseGen: Gen[(String, String, String)] = for {
    https <- Gen.oneOf(true, false)
    schemeCase <- Gen.oneOf(identity[String] _, (x: String) => x.toUpperCase)
    www <- Gen.oneOf(true, false)
    hostCase <- Gen.oneOf(identity[String] _, (x: String) => x.toUpperCase)
    host <- Gen.oneOf("a.example.com", "b-site.example.org", "example.net")
    defPort <- Gen.oneOf(true, false)
    oddPort <- Gen.oneOf(None, Some(8080), Some(3000))
    segs <- Gen.choose(0, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("Articles", "p", "x7", "Very-Long")))
    trailSlash <- Gen.oneOf(true, false)
    keep <- Gen.choose(0, 2).flatMap(n => Gen.listOfN(n,
      Gen.oneOf("id=9", "q=Spark", "page=2")))
    strip <- Gen.choose(0, 2).flatMap(n => Gen.listOfN(n,
      Gen.oneOf("utm_source=feed", "utm_medium=rss", "fbclid=xYz", "gclid=1",
        "UTM_SOURCE=Feed", "UTM_Campaign=x", "FBCLID=aB")))
    shuffleFirstStrip <- Gen.oneOf(true, false)
    frag <- Gen.oneOf(None, Some("sec-2"))
  } yield {
    val scheme = if (https) "https" else "http"
    // Odd port wins over the default-port flag (a URL has one port).
    val port = oddPort.map(":" + _)
      .getOrElse(if (defPort) { if (https) ":443" else ":80" } else "")
    val path = segs.map("/" + _).mkString + (if (trailSlash) "/" else "")
    // Interleave: optionally lead with a stripped param, then keepers,
    // then the remaining stripped ones — exercises lead/mid/tail strip.
    val params =
      if (shuffleFirstStrip && strip.nonEmpty) strip.take(1) ++ keep ++ strip.drop(1)
      else keep ++ strip
    val query = if (params.isEmpty) "" else "?" + params.mkString("&")
    val messy = schemeCase(scheme) + "://" + hostCase(if (www) "www." else "") +
      hostCase(host) + port + path + query + frag.map("#" + _).getOrElse("")
    val canonPort = oddPort.map(":" + _).getOrElse("")
    val canonPath = segs.map("/" + _).mkString // trailing slashes always drop
    val canonQuery = if (keep.isEmpty) "" else "?" + keep.mkString("&")
    (messy, scheme + "://" + host + canonPort + canonPath + canonQuery, host)
  }

  test("normalizeUrls recovers the constructive canonical form on randomized URLs") {
    val cases = sample(urlCaseGen, Cases)
    val df = cases.zipWithIndex
      .map { case ((messy, _, _), i) => (i.toLong, messy) }.toDF("doc_id", "url")
    val got = graft.ops.Web.normalizeUrls(df)
      .select("doc_id", "norm_url", "domain").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    cases.zipWithIndex.foreach { case ((messy, canon, host), i) =>
      assert(got(i.toLong) == ((canon, host)),
        s"url='$messy': ${got(i.toLong)} != ${(canon, host)}")
    }
  }

  test("line family: random line-alphabet corpora match the seen-set references") {
    // CONSTRUCTIVE: documents are assembled from a small line alphabet
    // (duplicates guaranteed, empty lines included), so the references
    // are plain-Scala seen-set scrubbers over the same construction —
    // no Spark re-implementation to drift against.
    val alphabet = Vector("alpha beta", "gamma", "delta epsilon zeta",
      "", "eta", "theta iota")
    val docGen: Gen[Seq[Int]] = for {
      n <- Gen.choose(1, 7)
      ls <- Gen.listOfN(n, Gen.choose(0, alphabet.size - 1))
    } yield ls
    val corpus = sample(docGen, 60).zipWithIndex
      .map { case (ls, i) => (i.toLong, ls.map(alphabet).mkString("\n")) }
    val df = corpus.toDF("doc_id", "text")
    type Out = (Long, Long, String)
    def collectOut(d: org.apache.spark.sql.DataFrame): Map[Long, Out] =
      d.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def refScrub(preSeen: Set[String]): Map[Long, Out] = {
      val seen = scala.collection.mutable.HashSet[String](preSeen.toSeq: _*)
      corpus.sortBy(_._1).map { case (id, text) =>
        val ls = text.split("\n", -1)
        val kept = ls.filter(l => l.isEmpty || seen.add(l))
        id -> ((ls.length.toLong, (ls.length - kept.length).toLong,
          kept.mkString("\n")))
      }.toMap
    }
    // d24: global first-occurrence dedup.
    val d24 = collectOut(graft.ops.Dedup.lineDedup(df, "doc_id", "text"))
    val ref24 = refScrub(Set.empty)
    assert(d24 == ref24, s"d24 diverged on ${
      d24.keySet.filter(k => d24(k) != ref24(k)).take(3)}")
    // d25: cross-set scrub against a fixed benchmark line set; a
    // corpus-internal duplicate NOT in the bench must survive in every
    // copy, so the reference pre-seeds ONLY the bench lines and never
    // adds corpus lines.
    val benchLines = Set("gamma", "eta")
    val bench = benchLines.toSeq.zipWithIndex
      .map { case (l, i) => (1000L + i, l) }.toDF("doc_id", "text")
    val d25 = collectOut(
      graft.ops.Dedup.lineDecontaminate(df, bench, "doc_id", "text"))
    val ref25 = corpus.map { case (id, text) =>
      val ls = text.split("\n", -1)
      val kept = ls.filter(l => l.isEmpty || !benchLines(l))
      id -> ((ls.length.toLong, (ls.length - kept.length).toLong,
        kept.mkString("\n")))
    }.toMap
    assert(d25 == ref25, s"d25 diverged on ${
      d25.keySet.filter(k => d25(k) != ref25(k)).take(3)}")
    // d26: old-wins against a resident index = first-occurrence dedup
    // with the resident lines pre-seeded.
    val dir = java.nio.file.Files.createTempDirectory("graft_prop_lidx")
    try {
      val resident = Seq((0L, "gamma\ntheta iota")).toDF("doc_id", "text")
      graft.ops.Dedup.saveLineIndex(resident, dir.toString,
        "doc_id", "text")
      val d26 = collectOut(graft.ops.Dedup.lineDedupFromIndex(
        spark, dir.toString, df, "doc_id", "text"))
      val ref26 = refScrub(Set("gamma", "theta iota"))
      assert(d26 == ref26, s"d26 diverged on ${
        d26.keySet.filter(k => d26(k) != ref26(k)).take(3)}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir.toFile)
    }
  }
}

