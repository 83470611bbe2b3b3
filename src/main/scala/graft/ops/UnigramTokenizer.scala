package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (Kudo 2018, "Subword Regularization"; the
  * SentencePiece unigram model) — the probabilistic complement to the
  * BPE trainer/encoder pair ([[TextAnalysis.bpeMerges]] /
  * [[TextAnalysis.bpeEncode]]): instead of greedy merge rules it keeps
  * a piece VOCABULARY with log probabilities and segments by Viterbi.
  * This implementation is the deterministic hard-EM (Viterbi-EM)
  * variant: every quantity is an exact integer count or a 2⁻²⁰
  * fixed-point log probability, every tie-break is total, so the
  * trained vocabulary is a pure function of the corpus — pinnable per
  * scale factor and exactly reproducible by an independent in-memory
  * trainer (TrainPrepSpec).
  *
  * Training (`train`):
  *  1. Word table: one corpus scan → (word, freq), the only time the
  *     corpus is touched (the t26 trainer's shape).
  *  2. Seed: every substring of length 1..`maxPieceLen` of every
  *     distinct word, counted by occurrence mass (freq-weighted, every
  *     position); single characters are ALWAYS kept (coverage
  *     guarantee); multi-char candidates keep the top `seedSize` by
  *     (mass desc, piece asc).
  *  3. `iters` hard-EM rounds: Laplace-smoothed fixed-point log probs
  *     lp(p) = round(ln((c(p)+1)/(T+V))·2²⁰) over the CURRENT piece
  *     set; each distinct word Viterbi-segments under lp and piece
  *     usage re-counts (freq-weighted). Multi-char pieces that go
  *     unused are dropped (natural pruning); singles survive at 0.
  *  4. Prune to `vocabSize`: all singles + the top multis by
  *     (count desc, piece asc); final lp from the pruned counts.
  *
  * Viterbi tie-breaks (the determinism contract, replicated by the
  * spec's independent trainer): maximize the exact Long score sum;
  * on equal score prefer FEWER pieces; on equal count prefer the
  * segmentation whose final piece is LONGEST (smallest split point),
  * applied recursively through the DP.
  *
  * Scale shape (the t26 argument, verbatim): the corpus is touched
  * exactly once (the word-count scan — partial-agg, ~vocabulary-sized
  * output); seeding and every EM round run on the DISTINCT-WORD table
  * (Zipf: orders of magnitude smaller than the corpus), shuffling
  * candidate-vocabulary-sized (piece, count) tables with map-side
  * combine; the piece table broadcast each round is bounded by
  * `seedSize`. Nothing in training is proportional to corpus tokens
  * except the one initial scan. Encoding (`encode`) is the
  * [[TextAnalysis.bpeEncode]] kernel shape: shuffle-free
  * mapPartitions, broadcast piece table, per-partition word → pieces
  * memo, cost = scan bandwidth + distinct-word mass.
  */
object UnigramTokenizer {

  /** Fixed-point scale for log probabilities (2²⁰, the repo-wide
    * convention — see [[TextAnalysis.unigramLogProb]]). */
  val LpScale = 1048576.0

  /** Score for a single character absent from the vocabulary at
    * ENCODE time (training seeds every seen char, so this is only
    * reachable on unseen data): ln-prob −64, far below any trained
    * piece, keeping segmentation total without ever being preferred. */
  val UnkFp: Long = -64L * 1048576L

  private val INF = Long.MinValue / 4

  /** Deterministic Viterbi segmentation of `word` under fixed-point
    * piece scores (see object doc for the tie-break contract). Pure
    * integer DP, O(|word|·maxLen) lookups. */
  private[graft] def viterbi(word: String,
      lp: java.util.HashMap[String, java.lang.Long],
      maxLen: Int): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val best = Array.fill(n + 1)(INF)
    val nPieces = Array.fill(n + 1)(Int.MaxValue)
    val back = new Array[Int](n + 1)
    best(0) = 0L; nPieces(0) = 0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (best(j) != INF) {
          val sub = word.substring(j, i)
          val got = lp.get(sub)
          val s: Long =
            if (got != null) got.longValue()
            else if (i - j == 1) UnkFp
            else INF
          if (s != INF) {
            val cand = best(j) + s
            val candN = nPieces(j) + 1
            // Strict improvements only: iterating j ascending means the
            // smallest split point (longest final piece) wins full ties.
            if (cand > best(i) || (cand == best(i) && candN < nPieces(i))) {
              best(i) = cand; nPieces(i) = candN; back(i) = j
            }
          }
        }
        j += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) { out += word.substring(back(p), p); p = back(p) }
    out.reverseIterator.toArray
  }

  /** Laplace-smoothed fixed-point log probs over a piece-count table:
    * lp(p) = round(ln((c+1)/(T+V))·2²⁰), T = Σc, V = |pieces|. All
    * float work is one ln+round per DISTINCT piece (t19 pattern). */
  private def laplaceFp(counts: Seq[(String, Long)]): Seq[(String, Long, Long)] = {
    val t = counts.iterator.map(_._2).sum
    val v = counts.size.toLong
    counts.map { case (p, c) =>
      (p, c, math.round(math.log((c + 1).toDouble / (t + v).toDouble) * LpScale))
    }
  }

  /** One freq-weighted Viterbi usage-count pass of the word table
    * under the given piece scores. Returns only pieces actually used. */
  private def countUsage(words: DataFrame, pieces: Seq[(String, Long, Long)],
      maxPieceLen: Int): Seq[(String, Long)] = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      pieces.map { case (p, _, l) => (p, l) }.toArray)
    val used = words.as[(String, Long)].mapPartitions { it =>
      val lp = new java.util.HashMap[String, java.lang.Long]()
      bc.value.foreach { case (p, l) => lp.put(p, l) }
      val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
      it.flatMap { case (w, f) =>
        memo.getOrElseUpdate(w, viterbi(w, lp, maxPieceLen))
          .iterator.map(p => (p, f))
      }
    }.toDF("piece", "f")
      .groupBy("piece").agg(sum(col("f")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    used.sortBy(_._1)
  }

  /** Train the unigram vocabulary; returns (piece, count, lp_fp) —
    * `count` the final freq-weighted Viterbi usage, `lp_fp` the final
    * Laplace fixed-point log prob. See object doc for the algorithm
    * and determinism contract. */
  def train(df: DataFrame, textCol: String = "text", vocabSize: Int = 64,
      seedSize: Int = 512, maxPieceLen: Int = 4, iters: Int = 3): DataFrame = {
    require(vocabSize >= 1 && seedSize >= 1 && maxPieceLen >= 1 && iters >= 1,
      s"bad params: vocabSize=$vocabSize seedSize=$seedSize " +
        s"maxPieceLen=$maxPieceLen iters=$iters")
    val spark = df.sparkSession
    import spark.implicits._
    // 1. The single corpus scan.
    val words = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .localCheckpoint(true)
    // 2. Seed substring mass (word-table-sized work). Only BOUNDED
    // results reach the driver: the alphabet (singles) and the
    // top-`seedSize` multi-char candidates via TakeOrdered — the full
    // substring-count table never collects.
    val subCounts = words.as[(String, Long)].flatMap { case (w, f) =>
      for {
        len <- 1 to math.min(maxPieceLen, w.length)
        st <- 0 to w.length - len
      } yield (w.substring(st, st + len), f)
    }.toDF("piece", "f")
      .groupBy("piece").agg(sum(col("f")).as("c"))
      .localCheckpoint(true)
    val singles = subCounts.filter(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    val multis = subCounts.filter(length(col("piece")) > 1)
      .orderBy(col("c").desc, col("piece").asc).limit(seedSize)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    if (singles.isEmpty)
      return Seq.empty[(String, Long, Long)].toDF("piece", "count", "lp_fp")
    var pieces = laplaceFp((singles ++ multis).sortBy(_._1))
    // 3. Hard-EM rounds on the word table.
    for (_ <- 1 to iters) {
      val usage = countUsage(words, pieces, maxPieceLen).toMap
      val kept = pieces.collect {
        case (p, _, _) if p.length == 1 => (p, usage.getOrElse(p, 0L))
        case (p, _, _) if usage.contains(p) => (p, usage(p))
      }
      pieces = laplaceFp(kept.sortBy(_._1))
    }
    // 4. Prune to vocabSize and finalize.
    val sing = pieces.filter(_._1.length == 1)
    val mult = pieces.filter(_._1.length > 1)
      .sortBy { case (p, c, _) => (-c, p) }
      .take(math.max(0, vocabSize - sing.size))
    val finalUsage = countUsage(words, sing ++ mult, maxPieceLen).toMap
    val finalCounts = (sing ++ mult).map { case (p, _, _) =>
      (p, finalUsage.getOrElse(p, 0L))
    }
    laplaceFp(finalCounts.sortBy(_._1))
      .toDF("piece", "count", "lp_fp")
  }

  /** Viterbi-encode `df` under a trained vocabulary — the
    * [[TextAnalysis.bpeEncode]] kernel shape (shuffle-free
    * mapPartitions, broadcast pieces, per-partition word memo).
    * Emits (id, n_tokens, n_pieces, pieces). */
  def encode(df: DataFrame, vocab: Seq[(String, Long)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // The Viterbi window is a property OF THE VOCABULARY, not a free
    // parameter: deriving it as the longest trained piece makes every
    // piece reachable by construction (a second independent knob could
    // silently under-shoot the trainer's maxPieceLen, leaving longer
    // vocabulary pieces dead and every affected word segmenting
    // suboptimally with no error).
    val maxPieceLen = if (vocab.isEmpty) 1 else vocab.map(_._1.length).max
    val bc = spark.sparkContext.broadcast(vocab.toArray)
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val lp = new java.util.HashMap[String, java.lang.Long]()
        bc.value.foreach { case (p, l) => lp.put(p, l) }
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        it.map { case (id, text) =>
          val toks = text.split(" ", -1)
          val pieces = toks.flatMap(w =>
            memo.getOrElseUpdate(w, viterbi(w, lp, maxPieceLen)))
          (id, toks.length, pieces.length, pieces.toSeq)
        }
      }
      .toDF(idCol, "n_tokens", "n_pieces", "pieces")
  }
}
