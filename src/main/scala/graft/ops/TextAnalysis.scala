package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale document pipelines: token
  * statistics, quality scoring, language identification, and document
  * fingerprinting. All are pure `functions._` compositions (whole-stage
  * codegen, no UDFs) and have exact DuckDB-SQL twins, so every operator is
  * oracle-checkable. Designed shuffle-free: each is a per-row projection;
  * only explicit aggregations (term frequencies) shuffle.
  */
object TextAnalysis {

  /** Whitespace tokenizer (documents fixture is space-separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Adjacent-element pairs of `arr`, each joined by `sep` — the shared
    * bigram constructor (word bigrams with a space, LM-model keys with
    * U+0001). Built as zip_with over aligned slices so the source
    * array is evaluated once per row as HOF ARGUMENTS; an in-lambda
    * reference would re-evaluate it per element, interpreted — see
    * [[graft.ops.Dedup.shingles]] for the full rationale. Safe on
    * empty/singleton arrays (zero pairs). */
  private[ops] def adjacentPairs(arr: Column, sep: String): Column = {
    val cnt = greatest(size(arr) - 1, lit(0))
    zip_with(slice(arr, lit(1), cnt), slice(arr, lit(2), cnt),
      (a, b) => concat(a, lit(sep), b))
  }

  /** Per-language marker-word profiles for the n-gram/stopword language-ID
    * heuristic. Fixed lists so the scorer is deterministic and
    * SQL-expressible. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "order", "table", "key"),
    "de" -> Seq("customer", "hash", "join", "group", "row"),
    "es" -> Seq("slow", "agg", "data", "scan", "part"),
    "fr" -> Seq("scan", "batch", "data", "merge", "filter"),
    "zh" -> Seq("join", "small", "row", "stream", "window"))

  /** Ratio of tokens found in `words` (overlap score, one IEEE division —
    * bit-stable across engines). */
  def overlapRatio(toks: Column, words: Seq[String]): Column = {
    val inList = (x: Column) => words.map(x === lit(_)).reduce(_ || _)
    size(filter(toks, x => inList(x))).cast("double") / size(toks)
  }

  /** Token statistics: total, distinct, type-token ratio, mean token
    * length. */
  def tokenStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val tk = tokens(col(textCol))
    df.withColumn("n_tokens", size(tk))
      .withColumn("n_distinct", size(array_distinct(tk)))
      .withColumn("ttr", col("n_distinct").cast("double") / col("n_tokens"))
      .withColumn("mean_token_len",
        aggregate(tk, lit(0L), (acc, x) => acc + length(x)).cast("double") / col("n_tokens"))
  }

  /** BPE-ish pre-tokenizer pattern: letter runs, digit runs, and
    * punctuation runs (the GPT-2 pre-tokenizer's shape, minus the
    * lookahead/contraction cases, so the pattern parses identically
    * under Java regex and RE2 — both engines' oracles agree). */
  val bpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"

  /** Token statistics under the BPE-ish regex pre-tokenizer — the
    * "how many tokens will the trainer see" estimate (whitespace
    * counting under-counts punctuation-heavy/code text). Pure
    * projection, zero shuffle. */
  def bpeTokenStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val tk = regexp_extract_all(col(textCol), lit(bpePattern), lit(0))
    df.withColumn("n_bpe", size(tk))
      .withColumn("n_bpe_distinct", size(array_distinct(tk)))
      .withColumn("bpe_chars",
        aggregate(tk, lit(0L), (acc, x) => acc + length(x)))
  }

  /** Heuristic quality score in [0,1]: mixes length band, lexical
    * diversity and stopword presence (the classic C4/Gopher-style filter
    * shape, re-expressed as deterministic arithmetic). */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val tk = tokens(col(textCol))
    val stop = overlapRatio(tk, Seq("the", "a", "of", "and", "in"))
    val ttr = size(array_distinct(tk)).cast("double") / size(tk)
    val lenOk = when(size(tk).between(20, 90), lit(1.0)).otherwise(lit(0.5))
    df.withColumn("stopword_ratio", stop)
      .withColumn("quality",
        lenOk * lit(0.4) + ttr * lit(0.3) + least(stop * lit(10.0), lit(1.0)) * lit(0.3))
  }

  /** Language ID: argmax of per-language marker overlap, fixed tie order
    * (profile order). */
  def languageId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val tk = tokens(col(textCol))
    // ONE evaluation of the five overlap HOFs per row, for ALL six
    // output columns. Round 17 bound the score array as a transform()
    // lambda variable so `pred_lang`'s CASE references became O(1)
    // lookups — but the score_$lang OUTPUT columns still re-ran their
    // own overlapRatio each, so every languageId consumer paid the
    // heavy filter()-over-tokens HOFs twice per row (once for the
    // score columns, once inside pred's bound array; higher-order
    // functions are interpreted AND excluded from subexpression
    // elimination, SPARK-35410). Round 18: the bound lambda now builds
    // a STRUCT of all six outputs (element_at lookups for the scores,
    // the identical CASE for pred) and an `inline` generator emits its
    // fields as columns — Generate evaluates the struct exactly once
    // per row and downstream references are plain attribute reads, so
    // CollapseProject cannot inline the HOFs anywhere. Still a pure
    // narrow projection: no exchange, 1 element -> exactly 1 row.
    // Values, column names/order, and null behavior are identical.
    val scoresArr = array(langProfiles.map { case (_, words) =>
      overlapRatio(tk, words) }: _*)
    val predOf = (s: Column) => {
      val sc = langProfiles.indices.map(i => element_at(s, i + 1))
      val best = greatest(sc: _*)
      // foldRight gives profile-order priority on ties (first match
      // wins). The zero-evidence guard comes FIRST: with every score
      // 0.0 the first profile's score trivially equals `best`, so
      // without the guard a document matching NO marker word would
      // silently label as the first profile and 'und' would be
      // unreachable (the oracle applies the identical leading CASE
      // arm).
      when(best === 0.0, lit("und"))
        .otherwise(langProfiles.indices.foldRight(lit("und"): Column) {
          case (i, acc) =>
            when(sc(i) === best, lit(langProfiles(i)._1)).otherwise(acc)
        })
    }
    val packed = transform(array(scoresArr), s =>
      struct((langProfiles.zipWithIndex.map { case ((lang, _), i) =>
        element_at(s, i + 1).as(s"score_$lang")
      } :+ predOf(s).as("pred_lang")): _*))
    df.select(col("*"), inline(packed))
  }

  /** Bag-of-words fingerprint: md5 of the sorted distinct token set.
    * Identical fingerprints = identical vocabularies (near-dup clusters for
    * shuffled word-soup documents). */
  def fingerprint(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("fingerprint",
      md5(array_join(array_sort(array_distinct(tokens(col(textCol)))), " ")))

  /** Corpus-level term document-frequency (one shuffle: explode + count
    * distinct docs per term; partial aggregation applies). */
  def termDocFreq(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.select(col(idCol), explode(array_distinct(tokens(col(textCol)))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("doc_freq"))

  /** Rolling polynomial (Rabin-Karp-style) content fingerprint over the
    * raw characters: h = (h*31 + code) mod 1e9+7, folded left-to-right —
    * exact integer arithmetic, portable across engines. Order-sensitive
    * (unlike the bag-of-words md5), so it distinguishes permuted
    * near-duplicates. */
  def rollingFingerprint(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("rolling_fp",
      aggregate(
        transform(filter(split(col(textCol), ""), c => c =!= ""),
          c => ascii(c).cast("long")),
        lit(0L),
        (h, c) => (h * 31L + c) % 1000000007L))

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    * 2003 — the MOSS local fingerprinting algorithm): hash every token
    * k-gram, slide a window of `w` consecutive gram hashes, and select
    * the RIGHTMOST MINIMUM of each window. The winnowing guarantee:
    * any shared substring of at least w + k − 1 tokens contributes at
    * least one IDENTICAL selected (position-independent) fingerprint
    * to both documents, while only ~2/(w+1) of all grams are kept —
    * the robust, density-bounded near-dup signature t07's whole-text
    * rolling hash (order-sensitive, all-or-nothing) cannot give.
    *
    * Arithmetic is the repo's portable polynomial convention (t07):
    * token hash = fold (h·31 + code) mod 1e9+7 over characters; gram
    * hash = fold (g·1000003 + tokenHash) mod 1e9+7 over the k tokens —
    * every intermediate < 1e15, exact in BIGINT on both engines, so
    * the DuckDB twin is bit-exact. Documents with fewer than k tokens
    * have no grams (zero row values); with fewer than w grams, one
    * window spans all of them (at least one fingerprint per non-empty
    * gram stream — the standard boundary treatment).
    *
    * Scale shape: winnowing is a WITHIN-document property — one
    * codegen'd HOF projection (transform/aggregate over the bound
    * token array), zero exchanges, zero joins, O(n·w + Σ|token|) per
    * document. The per-doc summary (gram count, distinct selected
    * count, exact fingerprint mass) keeps the declared query
    * scan-bandwidth-bounded; the selected sets themselves would feed
    * a d03-style bucket join for cross-document matching. */
  def winnowFingerprints(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"bad winnowing params: k=$k w=$w")
    winnowed(df, idCol, textCol, k, w)
      .select(col(idCol),
        size(col("g")).cast("long").as("n_grams"),
        size(col("fps")).cast("long").as("n_fps"),
        coalesce(aggregate(col("fps"), lit(0L),
          (s, p) => s + element_at(col("g"), (p + 1).cast("int")) + p),
          lit(0L)).as("fp_mass"))
  }

  /** Cross-document winnowing match (the SECOND half of Schleimer-
    * Wilkerson-Aiken 2003 — MOSS's actual use: documents sharing
    * selected fingerprints share content): each document's DISTINCT
    * selected gram hashes bucket-join against every other document's,
    * and a pair's `n_shared` counts the intersection. By the winnowing
    * guarantee, any pair sharing a run of >= w + k − 1 tokens surfaces
    * with n_shared >= 1; raising `minShared` trades recall for
    * precision exactly as MOSS's match threshold does.
    *
    * Scale shape: the d03 bucket-join pattern on a stream winnowing
    * has ALREADY thinned to ~2/(w+1) of the gram mass — the join's
    * input is a priced fraction of corpus tokens, never all of them.
    * `maxDf` (the d02 df-cap precedent) drops fingerprints present in
    * more than that many documents before the self-join — boilerplate
    * grams (license headers, navigation chrome) are exactly the hot
    * keys whose buckets would otherwise explode quadratically at
    * 100 TB; capped fingerprints are dropped from COUNTING, not from
    * the documents, so the op degrades conservatively (fewer shared
    * counts, never false pairs).
    *
    * @return `(doc_a, doc_b, n_shared)`, doc_a < doc_b, n_shared >=
    *         `minShared`. */
  def winnowPairs(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 3, w: Int = 4,
      minShared: Int = 1, maxDf: Option[Int] = None): DataFrame =
    winnowPairsFromSets(winnowSets(df, idCol, textCol, k, w),
      minShared, maxDf)

  /** The fingerprint-index half of [[winnowPairs]]: each document's
    * DISTINCT selected gram hashes as a `(id, fp)` stream — MOSS's
    * fingerprint index, built once and matchable under any number of
    * thresholds/caps (t45_capped materializes it once and runs its
    * capped and uncapped censuses from the same pass, mirroring its
    * SQL twin's shared `sets` CTE). */
  def winnowSets(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 3, w: Int = 4): DataFrame =
    winnowed(df, idCol, textCol, k, w)
      .select(col(idCol).as("id"),
        explode(array_distinct(transform(col("fps"),
          p => element_at(col("g"), (p + 1).cast("int"))))).as("fp"))

  /** The match half of [[winnowPairs]], over a prebuilt
    * [[winnowSets]] `(id, fp)` stream. */
  def winnowPairsFromSets(sets: DataFrame, minShared: Int = 1,
      maxDf: Option[Int] = None): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    maxDf.foreach(d => require(d >= 2, s"maxDf must be >= 2, got $d"))
    val kept = maxDf match {
      case None => sets
      case Some(d) =>
        // One narrow partial-agg'd census, then a broadcast-free
        // semi-join shape: fingerprints over the cap never reach the
        // self-join.
        sets.join(
          sets.groupBy("fp").agg(count(lit(1)).as("df"))
            .filter(col("df") <= d).select("fp"),
          Seq("fp"), "left_semi")
    }
    kept.as("a").join(kept.as("b"), col("a.fp") === col("b.fp"))
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Shared winnowing internals: per document the gram-hash array `g`
    * and the selected positions `fps` (rightmost window minima with
    * the paper's `<=` last-wins tie rule, deduplicated in
    * first-occurrence order) — the SWA03 kernel both the per-doc
    * summary (t44) and the cross-doc match (t45) project from.
    *
    * Implemented as a typed `mapPartitions` pass (one tight per-row
    * loop, still a shuffle-free projection): the original nested-HOF
    * form (`transform`/`aggregate` folds over per-character splits)
    * ran every lambda INTERPRETED per array element — the documented
    * SCALE.md anti-shape — and priced the t44/t45/t45_capped family
    * at ~8.8 s of local wall for a within-row O(n·w) computation.
    * The arithmetic is bit-identical (same per-code-point 31-fold mod
    * 1e9+7, same 1000003 gram fold, same window rule), so the DuckDB
    * twins and OpsSpec's independent reference pin the rewrite. */
  private def winnowed(df: DataFrame, idCol: String,
      textCol: String, k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, s"bad winnowing params: k=$k w=$w")
    val M = 1000000007L
    val A = 1000003L
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          // NULL text = no grams (the HOF form's when-guard semantics).
          if (text == null) (id, Array.empty[Long], Array.empty[Long])
          else {
            // split(" ", -1): Spark's split keeps trailing empty
            // tokens (hash 0), unlike Java's default limit.
            val toks = text.split(" ", -1)
            val th = new Array[Long](toks.length)
            var i = 0
            while (i < toks.length) {
              var h = 0L
              // Code-point fold == the HOF form's per-char ascii():
              // both see one value per code point, not per UTF-16 unit.
              val cps = toks(i).codePoints().iterator()
              while (cps.hasNext) h = (h * 31L + cps.nextInt()) % M
              th(i) = h
              i += 1
            }
            if (th.length < k) (id, Array.empty[Long], Array.empty[Long])
            else {
              val m = th.length - k + 1
              val g = new Array[Long](m)
              var p = 0
              while (p < m) {
                var gh = 0L
                var j = 0
                while (j < k) { gh = (gh * A + th(p + j)) % M; j += 1 }
                g(p) = gh
                p += 1
              }
              // Rightmost minimum of window q over grams [q, min(q+w, m)).
              val qEnd = math.max(m - w, 0)
              val seen = new java.util.LinkedHashSet[java.lang.Long]()
              var q = 0
              while (q <= qEnd) {
                val e = math.min(q + w, m)
                var best = -1L
                var bh = Long.MaxValue
                var x = q
                while (x < e) {
                  if (g(x) <= bh) { bh = g(x); best = x.toLong }
                  x += 1
                }
                seen.add(best)
                q += 1
              }
              val fps = new Array[Long](seen.size)
              val itSel = seen.iterator()
              var f = 0
              while (itSel.hasNext) { fps(f) = itSel.next(); f += 1 }
              (id, g, fps)
            }
          }
        }
      }
      .toDF(idCol, "g", "fps")
  }

  /** Canonical text normalization: lowercase, strip everything outside
    * [a-z0-9 ], collapse whitespace runs, trim. The standard pre-pass
    * before tokenizing/shingling scraped text; pure per-row projection
    * (shuffle-free, codegen'd regex). */
  def normalize(df: DataFrame, textCol: String = "text",
      outCol: String = "norm_text"): DataFrame =
    df.withColumn(outCol,
      trim(regexp_replace(
        regexp_replace(lower(col(textCol)), "[^a-z0-9 ]+", " "),
        " +", " ")))

  /** HTML/boilerplate main-content extraction (t46) — the stage every
    * web-scale pretraining pipeline STARTS with (C4, CCNet, RefinedWeb,
    * Dolma all begin at crawled markup, not clean text): deterministic
    * tag stripping plus jusText/trafilatura-shape line-quality scoring,
    * turning a crawled HTML blob into the `text` column every other
    * operator in this engine consumes. (The reference has no text
    * surface at all — `/root/reference/src/main/scala/com/github/
    * fvictorio/nnd/NND.scala` is vectors-only; this is north-star
    * pipeline surface.)
    *
    * Pipeline (each step a codegen'd regex/string projection — zero
    * exchanges, zero UDFs; PlanSpec pins the no-Exchange plan):
    *  1. `<script>`/`<style>` blocks removed WITH their content
    *     (executable/presentational payloads are never text);
    *  2. closing block-level tags (`</p> </h1-6> </li> </tr> </div>
    *     </title> </nav> </header> </footer>`) and `<br>`/`<br/>`
    *     become line breaks — block structure survives tag removal;
    *  3. every remaining tag is stripped;
    *  4. the five core entities + `&nbsp;` decode, `&amp;` LAST so
    *     double-encoded text cannot double-decode;
    *  5. lines split on the breaks, whitespace-collapsed and trimmed,
    *     and KEPT only if they look like prose: >= `minTokens` tokens
    *     (navigation chrome, titles, footers are short) AND
    *     alphanumeric chars >= `minAlphaPct`% of non-space chars
    *     (script residue and symbol junk are not) AND anchor-text
    *     chars <= `maxLinkPct`% of non-space chars — jusText's core
    *     LINK-DENSITY signal: `<a>` runs are marked with \u0001/\u0002
    *     sentinels before tag stripping, so a long navigation bar of
    *     many short links (which the token rule alone passes) still
    *     drops, while prose with an inline link survives. Integer
    *     arithmetic only, so the whole extraction is a bit-exact
    *     DuckDB twin (patterns in the Java-regex/RE2 common subset,
    *     the [[scrubPii]] convention).
    *
    * Anchor accounting contract: an unterminated `<a>` (anchor spans a
    * block break) counts its whole remaining line as link text — the
    * conservative reading, identical in both engines.
    *
    * @return `(idCol, n_lines BIGINT, n_kept BIGINT, extracted
    *         STRING)` — kept lines joined by newline, the clean-text
    *         column downstream ops consume (t46 feeds it to the t01
    *         token stats as the end-to-end witness). */
  def extractMainContent(df: DataFrame, idCol: String = "doc_id",
      htmlCol: String = "html", minTokens: Int = 5,
      minAlphaPct: Int = 50, maxLinkPct: Int = 33): DataFrame = {
    require(minTokens >= 1, s"minTokens must be >= 1, got $minTokens")
    require(minAlphaPct >= 0 && minAlphaPct <= 100,
      s"minAlphaPct must be a percentage, got $minAlphaPct")
    require(maxLinkPct >= 0 && maxLinkPct <= 100,
      s"maxLinkPct must be a percentage, got $maxLinkPct")
    // All tag patterns case-INSENSITIVE ((?i) inline, so the DuckDB
    // twin carries the identical pattern string): crawled markup mixes
    // <SCRIPT>/<Script> freely, and a case-sensitive match would leak
    // script payloads into the text and let uppercase anchors evade
    // the link-density rule (round-12 review finding). Entities stay
    // case-sensitive -- HTML5 named references are.
    // Script/style BEFORE comments: a '<!--' inside a script payload
    // (the legacy `<script><!--` hiding idiom, document.write("<!--"))
    // would otherwise open a bogus comment that swallows real content
    // up to the next '-->'. With the block removed first, comment
    // stripping then sees only genuine comments — whose payload is
    // inert markup (`<!-- <p>x -->`) the generic tag strip would
    // otherwise leak (it eats only to the first '>').
    // NULL markup = the empty document (one empty line, nothing kept,
    // extracted "") — a crawl corpus carries null payloads, and
    // letting the NULL propagate would poison every downstream
    // column (token stats over a null text) instead of the empty-doc
    // semantics every other text op gives.
    // Strip any pre-existing U+0001/U+0002 from the INPUT before the
    // chain runs: those code points are reused below as anchor
    // sentinels, and real crawled markup can carry stray control
    // bytes — left in place they would be miscounted as anchor text
    // and corrupt the link-density rule for the whole line.
    val sanitized = translate(coalesce(col(htmlCol), lit("")),
      "\u0001\u0002", "")
    val noScript = regexp_replace(sanitized,
      "(?is)<script[^>]*>.*?</script>", "")
    val noStyle0 = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", "")
    val noStyle = regexp_replace(noStyle0, "(?s)<!--.*?-->", "")
    // Anchor sentinels BEFORE the generic tag strip (the only tag whose
    // extent must survive stripping); \s-gated so <abbr>/<address>
    // never match.
    val marked = regexp_replace(
      regexp_replace(noStyle, "(?i)<a(\\s[^>]*)?>", "\u0001"),
      "(?i)</a>", "\u0002")
    val withBreaks = regexp_replace(marked,
      "(?i)</p>|</h[1-6]>|</li>|</tr>|</div>|</title>|</nav>|" +
        "</header>|</footer>|<br>|<br/>", "\n")
    val noTags = regexp_replace(withBreaks, "<[^>]*>", "")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    // Non-space anchor-char mass of a raw line: every \u0001-split
    // segment after the first starts with anchor text running to its
    // \u0002 (or to line end if unterminated — split yields the whole
    // segment as element 1 either way).
    def linkMass(l: Column): Column = {
      val segs = split(l, "\u0001")
      coalesce(aggregate(
        slice(segs, lit(2), greatest(size(segs) - 1, lit(0))),
        lit(0L),
        (acc, s) => acc +
          length(replace(element_at(split(s, "\u0002"), 1),
            lit(" "), lit("")))), lit(0L))
    }
    def visible(l: Column): Column =
      trim(regexp_replace(
        replace(replace(l, lit("\u0001"), lit("")),
          lit("\u0002"), lit("")), " +", " "))
    def prose(v: Column, lm: Column): Column = {
      val nonspace = length(replace(v, lit(" "), lit("")))
      size(filter(split(v, " "), t => t =!= "")) >= minTokens &&
        length(regexp_replace(v, "[^a-zA-Z0-9]", "")) * 100 >=
          lit(minAlphaPct) * nonspace &&
        lm * 100 <= lit(maxLinkPct) * nonspace
    }
    df.select(col(idCol), decoded.as("t"))
      .withColumn("lines",
        transform(split(col("t"), "\n"),
          l => struct(visible(l).as("v"), linkMass(l).as("lm"))))
      .withColumn("kept",
        filter(col("lines"), e => prose(e.getField("v"), e.getField("lm"))))
      .select(col(idCol),
        size(col("lines")).cast("long").as("n_lines"),
        size(col("kept")).cast("long").as("n_kept"),
        array_join(transform(col("kept"), e => e.getField("v")), "\n")
          .as("extracted"))
  }

  /** PII scrubbing: emails, IPv4 addresses, and phone-like digit runs
    * replaced with typed placeholders — the redaction pre-pass a
    * training corpus gets before anything else sees it. A pure
    * `regexp_replace` chain (per-row projection, shuffle-free,
    * codegen'd; no UDF). Patterns are written to the common subset of
    * Java regex and RE2, so the DuckDB oracle applies the identical
    * transformation. Order matters: emails first (their local parts
    * contain digit runs), then IPs (dotted digits would else match the
    * phone pattern), then phones. */
  def scrubPii(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", outCol: String = "scrubbed"): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val phone = "\\+?\\d[\\d()\\s.-]{7,}\\d"
    df.select(col(idCol),
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), email, "<EMAIL>"),
          ipv4, "<IP>"),
        phone, "<PHONE>").as(outCol))
  }

  /** Word-bigram repetition statistics — the Gopher/C4-style repetition
    * quality signals (duplicated n-gram mass flags boilerplate and
    * degenerate generations): per document, the bigram count, distinct
    * bigram count, the most-frequent-bigram count and its fraction of all
    * bigrams, and the duplicate-bigram fraction. Two aggregations (per
    * (doc, bigram), then per doc), both partial-agg friendly; fractions
    * are single IEEE divisions of exact integers, so bit-stable across
    * engines. Documents with fewer than two tokens have no bigrams and
    * are dropped. */
  def repetitionStats(df: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = tokens(col(textCol))
    val bigrams = adjacentPairs(w, " ")
    val perBigram = df.filter(size(w) >= 2)
      .select(col(idCol), explode(bigrams).as("b"))
      .groupBy(col(idCol), col("b"))
      .agg(count(lit(1)).as("c"))
    perBigram.groupBy(col(idCol))
      .agg(sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"),
        max(col("c")).as("top_bigram_n"))
      .withColumn("top_bigram_frac",
        col("top_bigram_n").cast("double") / col("n_bigrams"))
      .withColumn("dup_bigram_frac",
        (col("n_bigrams") - col("n_distinct_bigrams")).cast("double") / col("n_bigrams"))
  }

  /** Unigram-LM document scoring — the CCNet/Wenzek-et-al-style
    * perplexity quality filter (arXiv:1911.00359) with the LM reduced
    * to a corpus-fit unigram model: p(t) = (c_t + 1) / (N + V)
    * (Laplace), and each document scored by its total and per-token
    * log-probability. Low mean log-prob = rare-token-heavy/garbled
    * text; suspiciously high = degenerate repetition of frequent
    * tokens — both tails get filtered in a real pipeline.
    *
    * Determinism across engines: each term's ln(p) is rounded to
    * 2⁻²⁰ fixed point ONCE, per distinct term, BEFORE any summation —
    * so the per-document totals are exact BIGINT arithmetic and the
    * only float artifacts are |V| independent `round(ln(p)·2²⁰)`
    * calls, bit-stable unless a term's scaled log-prob sits within
    * ~1e-9 of a rounding midpoint (the same argument as t06's
    * pre-rank rounding, but strengthened: here rounding happens
    * before aggregation, so error cannot accumulate).
    *
    * Scale shape: the frequency table is vocabulary-sized — a
    * dimension table against a corpus-sized token stream — so it
    * BROADCASTS and the token stream is never shuffled by content;
    * the per-document sum partial-aggs to ~1 row per document per
    * partition (a document's tokens are co-located). The N/V scalars
    * are a 2-value bounded collect. */
  def unigramLogProb(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    scoreAgainstUnigramLm(df, unigramLm(df, textCol), idCol, textCol)

  /** The corpus-fit add-one unigram LM as a standalone (term, lp_fp)
    * artifact — [[unigramLogProb]]'s model half, exposed so serving
    * paths can freeze it as a release artifact (st31: LMs change by
    * RELEASE, not by micro-batch) and score later corpora against it
    * ([[scoreAgainstUnigramLm]]). Vocabulary-sized. */
  def unigramLm(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = df.select(explode(tokens(col(textCol))).as("term"))
    // Vocabulary-sized; checkpointed because BOTH the totals action and
    // the model projection read it — without this the corpus-wide
    // explode+groupBy (the only data-sized stage here) executes twice
    // (the bigramLogProb pattern).
    val counts = toks.groupBy("term").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val totals = counts.agg(sum(col("c")), count(lit(1))).head()
    // Empty corpus: sum aggregates to null; any denominator works
    // because the scoring join is empty (output schema is preserved).
    val denom =
      if (totals.isNullAt(0)) 1.0
      else (totals.getLong(0) + totals.getLong(1)).toDouble
    counts.select(col("term"),
      round(log((col("c") + 1).cast("double") / lit(denom)) * lit(1048576.0))
        .cast("long").as("lp_fp"))
  }

  /** Score documents against a STATIC unigram LM ((term, lp_fp) rows,
    * e.g. [[unigramLm]]'s output): per document, the token count and
    * exact fixed-point log-prob sum over the LM's terms. Stateless and
    * per-document independent — a document's row depends only on its
    * own text and the frozen LM, which is what makes the streaming
    * card's drained scoring equal the batch scoring under any batch
    * slicing. Terms absent from the LM are out-of-vocabulary and drop
    * from both sums (for a corpus-fit LM over the same corpus there
    * are none, so this equals [[unigramLogProb]] bit-for-bit). */
  def scoreAgainstUnigramLm(df: DataFrame, lm: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .join(broadcast(lm), Seq("term"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lp_fp")).as("logprob_fp"))
      .select(col("id").as(idCol), col("n_tokens"), col("logprob_fp"),
        (col("logprob_fp").cast("double") / col("n_tokens")).as("mean_lp_fp"))

  /** Bigram-LM document scoring — [[unigramLogProb]]'s order-sensitive
    * refinement: each document scored by Σ ln p(w_i | w_{i-1}) under a
    * corpus-fit add-one bigram model,
    * p(w2 | w1) = (c(w1,w2) + 1) / (c(w1,·) + V), with V the unigram
    * vocabulary size. A unigram filter cannot see scrambled or
    * template-stitched text (same token multiset, broken transitions);
    * the bigram score drops on exactly those documents. Documents with
    * fewer than two tokens have no bigrams and are absent from the
    * output (the oracle's inner join agrees).
    *
    * Determinism across engines: identical to t19's argument — each
    * distinct bigram's ln(p) rounds to 2⁻²⁰ fixed point ONCE before
    * any summation, so per-document totals are exact BIGINT sums and
    * the only float ops are |bigram vocab| independent rounds.
    *
    * Scale shape: the bigram-keyed model holds only bigrams with
    * c ≥ `minCount` — the standard frequency floor, and at web scale
    * the difference between a broadcastable Zipf head and a table that
    * OOMs the driver. Floored-out bigrams (0 < c < minCount) score as
    * unseen-in-context, ln(1/(c(w1,·)+V)) — context totals stay
    * UN-floored, so kept bigrams' probabilities are unchanged by the
    * floor choice — via a unigram-vocabulary-sized w1-keyed fallback
    * table that always broadcasts. The broadcast of the main model is
    * size-GATED on `broadcastMaxRows`: the floored table is counted
    * (one cheap job over its localCheckpoint, which also keeps the
    * corpus to a single model-building scan) and broadcast only when
    * under the gate. Old scale note, still the over-gate plan: the
    * standard frequency floor a real pipeline applies it broadcasts
    * like t19's vocabulary; un-floored web-scale bigram tables exceed
    * broadcast limits, and then the scoring join keys both sides on
    * the bigram and SHUFFLE-joins — same plan minus the broadcast
    * hint, still one pass over the token stream. The per-document sum
    * partial-aggs map-side (a document's bigrams are co-located); the
    * context totals c(w1,·) are a second aggregation OF THE MODEL
    * TABLE (bigram-vocabulary-sized), never of the corpus.
    *
    * `minCount = 1` (the default, and what the t25 oracle pins) keeps
    * every corpus bigram: the fallback path is then unreachable and
    * the output matches the un-floored model bit-for-bit. */
  def bigramLogProb(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minCount: Long = 1L,
      broadcastMaxRows: Long = 10_000_000L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    // (w1, w2) encoded as one U+0001-joined key so the model join has
    // a single equi-key; fixture tokens never contain U+0001.
    val sep = "\u0001"
    val bg = df.select(col(idCol).as("id"), tokens(col(textCol)).as("tk"))
      .select(col("id"), explode(adjacentPairs(col("tk"), sep)).as("bigram"))
    val vocabRow = df.select(explode(tokens(col(textCol))).as("term"))
      .agg(count_distinct(col("term"))).head()
    val vocab = vocabRow.getLong(0)
    // Materialized once (model-sized): reused by the context totals,
    // the floored model, and the broadcast-gate count without
    // re-scanning the corpus.
    val counts = bg.groupBy("bigram").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val ctx = counts
      .groupBy(substring_index(col("bigram"), sep, 1).as("w1"))
      .agg(sum(col("c")).as("cw"))
    val kept =
      if (minCount > 1L) counts.filter(col("c") >= minCount) else counts
    val lp = kept
      .withColumn("w1", substring_index(col("bigram"), sep, 1))
      .join(ctx, Seq("w1"))
      .select(col("bigram"),
        round(log((col("c") + 1).cast("double") /
          (col("cw") + lit(vocab)).cast("double")) * lit(1048576.0))
          .cast("long").as("lp_fp"))
    val model = if (kept.count() <= broadcastMaxRows) broadcast(lp) else lp
    val scored =
      if (minCount <= 1L) bg.join(model, Seq("bigram"))
      else {
        // Unseen-in-context fallback for floored-out bigrams; ctx is
        // unigram-vocabulary-sized, always broadcastable.
        val fb = ctx.select(col("w1"),
          round(log(lit(1.0) / (col("cw") + lit(vocab)).cast("double")) *
            lit(1048576.0)).cast("long").as("fb_fp"))
        bg.withColumn("w1", substring_index(col("bigram"), sep, 1))
          .join(model, Seq("bigram"), "left_outer")
          .join(broadcast(fb), Seq("w1"))
          .withColumn("lp_fp", coalesce(col("lp_fp"), col("fb_fp")))
      }
    scored
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_fp")).as("logprob_fp"))
      .select(col("id").as(idCol), col("n_bigrams"), col("logprob_fp"),
        (col("logprob_fp").cast("double") / col("n_bigrams")).as("mean_lp_fp"))
  }

  /** CCNet-style perplexity-bucket corpus card (Wenzek et al. 2020
    * §4.3, arXiv:1911.00359): per language, documents rank by their
    * [[unigramLogProb]] mean log-probability and split into `buckets`
    * equal tranches — head (bucket 1, most-fluent / lowest
    * perplexity), middle, tail — and the card reports per
    * (lang, bucket) the doc count, token sum, and exact fixed-point
    * log-prob sum. This is THE standard pretraining quality gate:
    * CCNet trains on head+middle and drops tail; the card is what a
    * data curator reads before choosing the cut.
    *
    * Determinism across engines: the rank key is
    * (mean log-prob desc, id asc) — mean = exact BIGINT `logprob_fp`
    * IEEE-divided by `n_tokens` (correctly-rounded division, bit-equal
    * in any engine) and the id tiebreak makes the order total, so the
    * standard ntile assignment is identical everywhere; the card's
    * aggregates are exact BIGINT sums. Full DuckDB twin (t56).
    *
    * Scale shape: this exact form pays one lang-keyed shuffle and a
    * per-language SORT — the verifier shape, fine to terabytes but
    * the sort is the 100 TB bottleneck. The production form is
    * [[ccnetBucketsSampled]]: tranche BOUNDARIES from a one-pass
    * mergeable quantile sketch, then a stateless comparison — no
    * sort anywhere, which is also exactly how CCNet itself does it
    * (quantiles fitted on a sample of the reference corpus). */
  def ccnetBuckets(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", langCol: String = "lang",
      buckets: Int = 3): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    val scored = unigramLogProb(df, idCol, textCol)
    ccnetCardExact(scored.join(df.select(col(idCol), col(langCol)), idCol),
      idCol, langCol, buckets)
  }

  /** The exact (lang, bucket) card over an already-SCORED frame
    * ((id, n_tokens, logprob_fp, mean_lp_fp, lang) rows —
    * [[unigramLogProb]]/[[scoreAgainstUnigramLm]] output joined with
    * the language column): the per-language ntile tranche assignment
    * on the total (mean desc, id asc) order plus the exact BIGINT
    * aggregates. Factored out of [[ccnetBuckets]] so the streaming
    * serve (st31) can apply the identical card once over its drained
    * scored frame — tranches are corpus-relative, so the card can only
    * run over the COMPLETE scored population, never per batch. */
  def ccnetCardExact(scoredWithLang: DataFrame, idCol: String = "doc_id",
      langCol: String = "lang", buckets: Int = 3): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(langCol).orderBy(desc("mean_lp_fp"), asc(idCol))
    scoredWithLang.withColumn("bucket", ntile(buckets).over(w))
      .groupBy(col(langCol), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        sum(col("logprob_fp")).as("sum_logprob_fp"))
  }

  /** [[ccnetBuckets]]' sort-free production form: per-language tranche
    * boundaries from `approx_percentile` over the mean log-prob (a
    * one-pass MERGEABLE sketch — vocabulary-free, partial-aggregated,
    * |langs|·(buckets−1) doubles on the driver), then each document
    * buckets by comparing its mean against its language's boundaries —
    * a broadcast join plus a codegen'd comparison, NO per-language
    * sort. At 100 TB this is the only viable shape; the trade is that
    * tranche sizes are approximate (sketch accuracy, ties at the
    * boundary all land one side) — OpsSpec measures the skew vs the
    * exact [[ccnetBuckets]] tranches on the fixture. Returns one row
    * per document: (id, lang, n_tokens, logprob_fp, bucket). */
  def ccnetBucketsSampled(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", langCol: String = "lang",
      buckets: Int = 3, accuracy: Int = 10000): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    val scored = unigramLogProb(df, idCol, textCol)
    val withLang = scored.join(df.select(col(idCol), col(langCol)), idCol)
    // Boundaries at the (1/b .. (b-1)/b) quantiles of mean_lp_fp,
    // DESCENDING fluency order to match ccnetBuckets' bucket ids
    // (bucket 1 = most fluent): a doc whose mean sits above the
    // q-th-from-top boundary joins tranche q.
    val qs = (1 until buckets).map(i => 1.0 - i.toDouble / buckets)
    val bounds = withLang.groupBy(langCol)
      .agg(percentile_approx(col("mean_lp_fp"),
        array(qs.map(lit): _*), lit(accuracy)).as("bnd"))
    withLang.join(broadcast(bounds), Seq(langCol))
      .withColumn("bucket",
        (lit(buckets) - aggregate(col("bnd"), lit(0),
          (acc, b) => acc + when(col("mean_lp_fp") >= b, 1).otherwise(0)))
          .cast("int"))
      .select(col(idCol), col(langCol), col("n_tokens"),
        col("logprob_fp"), col("bucket"))
  }

  /** Retrieval/RAG chunking: each document flat-mapped to overlapping
    * token windows of `size` tokens advancing by `stride` — the
    * chunk-for-embedding pre-pass of every retrieval pipeline (and the
    * windowed variant of [[graft.ops.Packing]]'s concat-and-chunk).
    * Window count is `1 + ceil(max(len − size, 0) / stride)`, so every
    * token lands in at least one window and the final window may be
    * short — the standard overlapping-chunker contract.
    *
    * A pure projection (`sequence` + `explode` + `slice`): shuffle-free,
    * linear in emitted tokens (`≈ len·size/stride` per document),
    * whole-stage codegen'd, and embarrassingly partition-parallel — the
    * 100 TB cost is exactly the output volume, nothing else. */
  def chunkWindows(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", size: Int = 64,
      stride: Int = 32): DataFrame = {
    require(size >= 1 && stride >= 1, s"bad window: size=$size stride=$stride")
    // stride > size would break the documented every-token-covered
    // contract (tokens between windows never land in any chunk, and
    // the tail window count formula emits empty chunks) — fail fast
    // rather than silently dropping corpus from the embedding path.
    require(stride <= size,
      s"stride=$stride > size=$size leaves inter-window tokens uncovered")
    // Token array materialized as an attribute BEFORE the window
    // lambda: an in-lambda `slice(split(text), ...)` would re-split the
    // text once per window (interpreted HOF body — see Dedup.shingles);
    // slicing a bound array attribute is O(window) instead. The double
    // reference (count + lambda) also keeps CollapseProject from
    // re-inlining the split.
    val w = col("__tk")
    val nWindows =
      lit(1) + ceil(greatest(size_(w) - size, lit(0)).cast("double") / stride).cast("int")
    df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__tk"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nWindows - 1),
          i => slice(w, i * stride + 1, lit(size)))).as(Seq("chunk_idx", "ck")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        (col("chunk_idx") * stride + 1).cast("long").as("start_tok"),
        size_(col("ck")).cast("long").as("n_tok"),
        concat_ws(" ", col("ck")).as("chunk_text"))
  }

  // `size` the column function, shadowed by method params named `size`.
  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)

  /** Top-`n` TF-IDF terms per document. tf = in-doc term count,
    * idf = ln(N/df). `ln` differs by 1 ulp between the JVM and other
    * libm implementations, so for cross-engine verification the score is
    * rounded to `roundDigits` BEFORE ranking (rounding after would let a
    * 1-ulp difference flip ranks); ties break on the term. */
  def tfidfTopTerms(df: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text",
      roundDigits: Int = 6): DataFrame = {
    val nDocs = df.count()
    val tf = df.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = termDocFreq(df, idCol, textCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(desc("score"), asc("term"))
    tf.join(dfreq, "term")
      .withColumn("score",
        round(col("tf") * log(lit(nDocs.toDouble) / col("doc_freq")), roundDigits))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= n)
      .select("doc_id", "rk", "term", "score")
  }

  /** BM25 top-`k` retrieval (Robertson–Spärck Jones weighting, the
    * always-positive `ln(1 + (N−df+0.5)/(df+0.5))` idf variant): scores
    * every document against a literal bag-of-terms query and returns the
    * `k` best — the sparse-retrieval complement to the dense ANN serving
    * family (reference similarity surface: `/root/reference/src/main/
    * scala/com/github/fvictorio/nnd/NND.scala:57-64`; BM25 itself has no
    * reference counterpart).
    *
    * 100 TB shape: the token stream is cut to the query's terms BEFORE
    * any shuffle (an `isin` over ≤|query| literals, pushed into the
    * scan-side projection), so the per-(doc, term) tf aggregation only
    * ever shuffles matching postings; document lengths partial-agg to
    * one row per doc per partition; the corpus scalars (N, avgdl) are a
    * one-row bounded collect; the df table is ≤|query| rows and
    * broadcast. The final top-k is `orderBy + limit` =
    * TakeOrderedAndProject — a map-side bounded heap per partition plus
    * a driver merge of k·partitions rows, never a global sort
    * (PlanSpec-pinned). Per-term scores are fixed-pointed
    * (`round(score·2^20)` as BIGINT, the t19 pattern) before the Long
    * sum, so ranking — and the DuckDB oracle — is bit-stable across
    * engines: every float op below is mirrored op-for-op in the oracle
    * SQL, and the one libm call (`ln`) is washed by the fixed-point
    * rounding.
    */
  def bm25TopK(df: DataFrame, queryTerms: Seq[String],
      idCol: String = "doc_id", textCol: String = "text",
      k1: Double = 1.2, b: Double = 0.75, k: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    require(k >= 1, s"bad k=$k")
    bm25ScoreRows(df, idCol, textCol, k1, b, Some(queryTerms))
      .groupBy("id")
      .agg(sum(col("s_fp")).as("score_fp"), count(lit(1)).as("n_terms"))
      .orderBy(col("score_fp").desc, col("id").asc)
      .limit(k)
      .select(col("id").as(idCol), col("score_fp"), col("n_terms"))
  }

  /** The ONE BM25 scoring pipeline — per-(term, doc) fixed-point
    * scores, shared verbatim by [[bm25TopK]] (tf/df restricted to the
    * query's terms — identical values for any term, since df is a
    * per-term corpus property) and [[bm25Impacts]] (every posting).
    * Sharing the expression tree is what makes the batch/serving
    * parity contract (AnnServeSpec row-equality, the st13 oracle)
    * un-driftable: there is no second copy of the formula to edit. */
  private def bm25ScoreRows(df: DataFrame, idCol: String, textCol: String,
      k1: Double, b: Double, terms: Option[Seq[String]]): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("term"))
    // Doc-count-sized; checkpointed because the scalars action AND the
    // final scoring join both read it — without this the corpus token
    // aggregation executes twice (the bigramLogProb pattern).
    val dls = toks.groupBy("id").agg(count(lit(1)).as("dl"))
      .localCheckpoint()
    // Corpus scalars: one-row bounded collect (count=0 ⇒ empty output,
    // any avgdl works because every downstream join is empty).
    val scalars = dls.agg(count(lit(1)), sum(col("dl"))).head()
    val n = scalars.getLong(0)
    val avgdl = if (n == 0L) 1.0 else scalars.getLong(1).toDouble / n
    val scoped = terms.fold(toks)(ts => toks.filter(col("term").isin(ts: _*)))
    val tf = scoped.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val denom = col("tf") +
      lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))
    tf.join(broadcast(dfs), Seq("term"))
      .join(dls, Seq("id"))
      .select(col("term"), col("id"),
        round(idf * (col("tf") * lit(k1 + 1)) / denom * lit(1048576.0))
          .cast("long").as("s_fp"))
  }

  /** The static half of BM25 SERVING: per-(term, doc) fixed-point
    * impact scores — [[bm25TopK]]'s per-term formula precomputed for
    * EVERY posting, because tf, df, dl and the corpus scalars are all
    * properties of the corpus, not the query. A query's score for a doc
    * is then just the Long sum of the matched rows, which is what lets
    * [[graft.streaming.Bm25Serve]] serve a query stream with one
    * stream-static join and one bounded aggregation (the
    * impact-ordered-index organization of Anh & Moffat, "Pruned query
    * evaluation using pre-computed impacts", SIGIR 2006).
    *
    * `maxPostings` caps each term's posting list to its top-`m` rows by
    * (impact desc, id) — the static-side truncation that bounds
    * per-query serving state for stop-word-grade terms at web scale
    * (a rank cut on an already-built index; exact for every term with
    * df ≤ m). `Int.MaxValue` (the default) skips the ranking window
    * entirely, keeping the build shuffle-only.
    */
  def bm25Impacts(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k1: Double = 1.2, b: Double = 0.75,
      maxPostings: Int = Int.MaxValue): DataFrame = {
    require(maxPostings >= 1, s"bad maxPostings=$maxPostings")
    val impacts = bm25ScoreRows(df, idCol, textCol, k1, b, None)
    if (maxPostings == Int.MaxValue) impacts
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("term").orderBy(col("s_fp").desc, col("id").asc)
      impacts.withColumn("imp_rank", row_number().over(w))
        .filter(col("imp_rank") <= maxPostings)
        .drop("imp_rank")
    }
  }

  /** Distributed BPE merge training (Sennrich et al., arXiv:1508.07909):
    * learns the top-`numMerges` byte-pair-encoding merge rules from the
    * corpus and returns them as `(rank, left, right, pair_count)` rows
    * in merge order — the tokenizer-training step of an LLM data
    * pipeline (t13 counts under a FIXED pre-tokenizer; this LEARNS the
    * vocabulary).
    *
    * Exactly the classic trainer, distributed the way real BPE
    * trainers are feasible at corpus scale: the corpus is touched ONCE
    * (token frequency aggregation); every Lloyd-style merge round then
    * runs on the WORD-FREQUENCY table — vocabulary-sized, corpus-size-
    * independent — as (1) a weighted adjacent-pair count (explode +
    * partial-agg'd sum) and (2) a one-row argmax collect (count desc,
    * then lexicographic pair — fully deterministic), after which the
    * winning pair is folded into every word's symbol sequence by a
    * left-to-right greedy `aggregate` lambda (codegen'd; "aaa" under
    * merge (a,a) → ["aa","a"], the standard non-overlap rule). The
    * symbol table is `localCheckpoint`ed per round (the NND C2
    * pattern) so the plan stays flat across rounds.
    *
    * Determinism: integer frequencies, total argmax order, and ordered
    * greedy application make the rule list a pure function of the
    * corpus at ANY partitioning — pinnable and reproducible. 100 TB
    * shape: one corpus-wide shuffle up front; per round, shuffle is
    * the pair table (≤ vocabulary · mean word length), with the argmax
    * the only driver materialization (1 row). */
  def bpeMerges(df: DataFrame, textCol: String = "text",
      numMerges: Int = 20): DataFrame = {
    require(numMerges >= 0, s"bad numMerges=$numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    val chars = (s: Column) => filter(split(s, ""), c => c =!= "")
    var words = df.select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(chars(col("word")).as("syms"), col("freq"))
      .localCheckpoint(true)
    val rules = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    for (rank <- 1 to numMerges if !exhausted) {
      val pairIdx = expr("sequence(1, size(syms) - 1)")
      val best = words
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(pairIdx).as("i"), col("syms"))
        .select(col("freq"),
          element_at(col("syms"), col("i")).as("a"),
          element_at(col("syms"), col("i") + 1).as("b"))
        .groupBy("a", "b").agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        rules += ((rank, a, b, cnt))
        val merged = aggregate(
          col("syms"),
          array().cast("array<string>"),
          (acc, x) => when(
            size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
            .otherwise(concat(acc, array(x))))
        // Reassignment drops the previous round's checkpoint reference;
        // the context cleaner reclaims its blocks (the table is
        // vocabulary-sized, so at most one extra round lingers).
        words = words.select(merged.as("syms"), col("freq")).localCheckpoint(true)
      }
    }
    rules.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** Corpus drift between two document sets: the symmetrized KL
    * (Jeffreys) divergence of their add-one-smoothed unigram
    * distributions, Σ_t (p_t − q_t)·ln(p_t/q_t) over the union
    * vocabulary — the ingest-monitoring statistic that flags a bad
    * crawl batch or a topic shift between yesterday's corpus and
    * today's (0 = identical distributions, grows with separation).
    *
    * Determinism: each term's contribution is a fixed IEEE expression
    * over exact integer counts, rounded to 2⁻²⁰ fixed point ONCE
    * before the exact BIGINT sum (the t19 pattern), so the result is
    * engine-bit-stable and order-independent. One aggregation per
    * side over the token streams (partial-agg), one vocabulary-sized
    * full-outer join — nothing corpus-sized shuffles twice. */
  def corpusDrift(a: DataFrame, b: DataFrame,
      textCol: String = "text"): DataFrame = {
    def counts(df: DataFrame) = df
      .select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    corpusDriftFromCounts(counts(a), counts(b))
  }

  /** [[corpusDrift]] over pre-aggregated `(term, c)` frequency tables —
    * the entry point for sides that already exist as count artifacts
    * (e.g. the streaming twin's drained complete-mode aggregation). */
  def corpusDriftFromCounts(ca: DataFrame, cb: DataFrame): DataFrame = {
    val a = ca
    val joined = ca.withColumnRenamed("c", "ca")
      .join(cb.withColumnRenamed("c", "cb"), Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .localCheckpoint(true)
    val totals = joined.agg(
      sum(col("ca")), sum(col("cb")), count(lit(1))).head()
    if (totals.isNullAt(0) || totals.isNullAt(1)) {
      val spark = a.sparkSession
      import spark.implicits._
      return Seq((0L, 0L)).toDF("n_terms", "jdiv_fp").limit(0)
    }
    val (na, nb, v) = (totals.getLong(0), totals.getLong(1), totals.getLong(2))
    val pA = (col("ca") + 1).cast("double") / lit((na + v).toDouble)
    val pB = (col("cb") + 1).cast("double") / lit((nb + v).toDouble)
    // The result is one row; materialize it eagerly so the checkpointed
    // join frame's reference drops with this call (context-cleaner
    // reclaim) instead of riding the returned plan.
    val res = joined
      .select(round((pA - pB) * log(pA / pB) * lit(1048576.0))
        .cast("long").as("contrib_fp"))
      .agg(count(lit(1)).as("n_terms"), sum(col("contrib_fp")).as("jdiv_fp"))
      .head()
    val spark = a.sparkSession
    import spark.implicits._
    Seq((res.getLong(0), res.getLong(1))).toDF("n_terms", "jdiv_fp")
  }

  /** BPE encoding — applies a trained merge-rule list ([[bpeMerges]]
    * output order) to every token of the corpus and returns
    * `(id, n_tokens, n_pieces, pieces)` per document: the
    * tokenizer-APPLY half of the lifecycle (train once on yesterday's
    * corpus, encode today's at ingest).
    *
    * Classic greedy application: each token starts as its character
    * sequence; each rule, in rank order, folds left-to-right through
    * the sequence (the exact recurrence the trainer used, so
    * encode(train corpus) reproduces the trainer's final symbol
    * table).
    *
    * Implemented as a typed `mapPartitions` kernel — one of the few
    * deliberate escapes from `functions._` in this codebase, and a
    * measured one: expressing the M-rule fold as nested higher-order
    * lambdas evaluates INTERPRETED with O(len²) array copies per token
    * per rule (37.5s at sf0.1 vs ~2s for this kernel on the same
    * fixture). The imperative loop is how every real tokenizer service
    * runs: the broadcast rule table applies in a tight loop, and a
    * per-partition word → pieces memo collapses the Zipf-distributed
    * token stream to one encode per DISTINCT word per partition. Still
    * shuffle-free and embarrassingly parallel — cost scales with scan
    * bandwidth and distinct-word mass, not token mass. */
  /** Per-document compression ratio — the cheap Kolmogorov-complexity
    * proxy production pipelines run alongside the rule-based gates
    * ([[gopherRules]]) and model scores ([[unigramLogProb]]): highly
    * repetitive/templated text (boilerplate, keyword stuffing, table
    * dumps) deflates far below natural prose, and near-incompressible
    * text is usually binary junk or ciphertext — BOTH tails are filter
    * targets. Emits per doc the exact byte counts (`n_raw` UTF-8
    * bytes, `n_comp` DEFLATE bytes) plus the 2^-20 fixed-point ratio
    * (`ratio_fp = round(n_comp·2^20 / max(n_raw,1))`, integer-exact),
    * leaving thresholds to the caller.
    *
    * Determinism: DEFLATE at a fixed level with a fresh dictionary is
    * a pure function of the bytes for a given zlib build; the JDK
    * bundles its own zlib, so outputs are stable per JDK (the pinned
    * t39 summary is the change detector if the runtime's zlib ever
    * changes). Level 6 — the zlib default — is the standard
    * speed/ratio operating point.
    *
    * Scale shape: a typed `mapPartitions` projection (the [[bpeEncode]]
    * escape-hatch pattern) — one reused `Deflater` per partition
    * (reset per doc; allocating one per row multiplies the native
    * init cost), zero shuffles, zero state, cost linear in scan
    * bytes. At 100 TB this is exactly as parallel as the scan. */
  def compressionStats(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", level: Int = 6): DataFrame = {
    require(level >= 1 && level <= 9, s"bad deflate level: $level")
    val spark = df.sparkSession
    import spark.implicits._
    val lvl = level
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(lvl, true)
        val buf = new Array[Byte](8192)
        val mapped = it.map { case (id, text) =>
          val raw = text.getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var comp = 0L
          while (!deflater.finished()) comp += deflater.deflate(buf)
          val ratioFp = (comp * 1048576L + math.max(raw.length, 1) / 2) /
            math.max(raw.length, 1) // round-half-up integer division
          (id, raw.length.toLong, comp, ratioFp)
        }
        // Release the native zlib stream when the partition drains —
        // relying on finalization leaks native memory under long tasks.
        new Iterator[(Long, Long, Long, Long)] {
          def hasNext: Boolean = {
            val h = mapped.hasNext
            if (!h) deflater.end()
            h
          }
          def next(): (Long, Long, Long, Long) = mapped.next()
        }
      }
      .toDF(idCol, "n_raw", "n_comp", "ratio_fp")
  }

  def bpeEncode(df: DataFrame, rules: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(rules.toArray)
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rs = bc.value
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        def enc(w: String): Array[String] = memo.getOrElseUpdate(w, {
          var syms = w.split("").filter(_.nonEmpty)
          rs.foreach { case (a, b) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            syms.foreach { x =>
              if (out.nonEmpty && out.last == a && x == b)
                out(out.length - 1) = a + b
              else out += x
            }
            syms = out.toArray
          }
          syms
        })
        it.map { case (id, text) =>
          // split(" ", -1) keeps trailing empties — the exact semantics
          // of Spark's split(text, " ") the rest of the pipeline uses.
          val toks = text.split(" ", -1)
          val pieces = toks.flatMap(enc)
          (id, toks.length, pieces.length, pieces.toSeq)
        }
      }
      .toDF(idCol, "n_tokens", "n_pieces", "pieces")
  }

  /** Adjacent-element triples of `arr` joined by `sep` — the trigram
    * constructor ([[adjacentPairs]] lifted one order). Two nested
    * zip_with passes over aligned slices; the array is evaluated only
    * as HOF arguments (never inside a lambda body), per the
    * [[graft.ops.Dedup.shingles]] rationale. Empty for len < 3. */
  private[ops] def adjacentTriples(arr: Column, sep: String): Column = {
    val cnt = greatest(size(arr) - 2, lit(0))
    zip_with(
      zip_with(slice(arr, lit(1), cnt), slice(arr, lit(2), cnt),
        (a, b) => concat(a, lit(sep), b)),
      slice(arr, lit(3), cnt),
      (ab, c) => concat(ab, lit(sep), c))
  }

  /** Blocklist document filter — the C4 "bad words" gate (Raffel et
    * al. 2020, §2.2 of the C4 cleaning rules: drop any page containing
    * a term from a fixed list) generalized to emit the evidence a
    * Dolma-style flag-don't-drop pipeline keeps: per document the
    * total and distinct blocklisted-token counts plus the C4 keep
    * decision (`kept = 1` iff zero hits).
    *
    * Scale shape: a blocklist is a bounded curated dictionary
    * (hundreds of terms), so the probe is a LITERAL array folded into
    * the projection — one `filter` HOF over the bound token-array
    * attribute, zero exchanges, zero joins, embarrassingly
    * partition-parallel (PlanSpec pins the exchange-free plan). A
    * dictionary too large to inline would instead broadcast-semi-join
    * the exploded token stream — never a shuffle of the corpus. */
  def blocklistFlags(df: DataFrame, blocklist: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(blocklist.nonEmpty, "empty blocklist")
    val bl = array(blocklist.distinct.sorted.map(lit): _*)
    df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__tk"))
      .select(col("doc_id"),
        size_(col("__tk")).cast("long").as("n_tokens"),
        filter(col("__tk"), t => array_contains(bl, t)).as("__hits"))
      .select(col("doc_id"), col("n_tokens"),
        size_(col("__hits")).cast("long").as("n_hits"),
        size_(array_distinct(col("__hits"))).cast("long")
          .as("n_distinct_hits"),
        when(size_(col("__hits")) === 0, lit(1L)).otherwise(lit(0L))
          .as("kept"))
  }

  /** Gopher stop-word list (Rae et al. 2021, A1.1: a document must
    * contain at least two of these). */
  val gopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality-rule document filter (Rae et al. 2021, MassiveText
    * curation, Appendix A1.1) — the faithful NAMED rule set, as
    * opposed to [[qualityScore]]'s blended heuristic score: per
    * document the measured evidence for each rule plus the conjunctive
    * keep decision,
    * {{{
    *   50 <= word count <= 100,000
    *   3 <= mean word length <= 10
    *   symbol-to-word ratio ('#' or '...') <= 0.1
    *   >= 80% of words contain an alphabetic character
    *   >= 2 distinct stop-list words present
    * }}}
    * `stopWords` defaults to Gopher's own English list; the rule is
    * membership-count against a curated register list, so corpora in
    * another register (or language) pass their own (the declared t37
    * uses the fixture-register list — Gopher's English list shares
    * only 'the' with the fixture's 31-word vocabulary, which would
    * make the gate constant-false, a measurement of the list, not
    * the corpus).
    * (The line-shape rules — bullet starts, ellipsis ends — need line
    * structure the single-line fixture lacks and are omitted; they are
    * the same projection shape over `split(text, '\n')`.)
    *
    * Determinism: every ratio is one IEEE division of exact integer
    * counts, identical in the DuckDB twin; thresholds compare those
    * identical doubles. Pure projection over the bound token-array
    * attribute — zero exchanges, zero joins, scan-bandwidth cost (the
    * t33 shape; PlanSpec pins it). */
  def gopherRules(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      stopWords: Seq[String] = gopherStopWords): DataFrame = {
    require(stopWords.nonEmpty, "empty stop-word list")
    val stopHits = stopWords.map(s =>
      when(array_contains(col("__tk"), s), 1L).otherwise(0L))
      .reduce(_ + _)
    df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__tk"))
      .select(col("doc_id"),
        size_(col("__tk")).cast("long").as("n_words"),
        (aggregate(col("__tk"), lit(0L), (acc, w) => acc + length(w))
          .cast("double") / size_(col("__tk"))).as("mean_word_len"),
        (size_(filter(col("__tk"),
            w => w.contains("#") || w.contains("..."))).cast("double") /
          size_(col("__tk"))).as("symbol_ratio"),
        // [A-Za-z]: the Gopher rule is "word contains an ALPHABETIC
        // character" — lowercase-only would veto all-caps prose on any
        // corpus not pre-normalized (this op never lowercases).
        (size_(filter(col("__tk"), w => w.rlike("[A-Za-z]"))).cast("double") /
          size_(col("__tk"))).as("alpha_frac"),
        stopHits.as("n_stop"))
      .withColumn("kept",
        when(col("n_words").between(50L, 100000L) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("symbol_ratio") <= 0.1 &&
          col("alpha_frac") >= 0.8 &&
          col("n_stop") >= 2L, lit(1L)).otherwise(lit(0L)))
  }

  /** Gopher repetition-removal rules (Rae et al. 2021, MassiveText
    * curation, Appendix A1.2) — the WITHIN-document repetition half the
    * [[gopherRules]] quality gate omits: a page is removed when too much
    * of its character mass sits inside repeated n-grams,
    * {{{
    *   chars in the most frequent 2-gram  > 0.20 · total   → drop
    *   chars in the most frequent 3-gram  > 0.18 · total   → drop
    *   chars in the most frequent 4-gram  > 0.16 · total   → drop
    *   chars covered by duplicated 5-grams  > 0.15 · total → drop
    *   …   6-grams > 0.14,  7 > 0.13,  8 > 0.12,  9 > 0.11,
    *       10-grams > 0.10 · total                          → drop
    * }}}
    * Two distinct semantics, both the paper's: the 2–4-gram rules count
    * OCCURRENCE mass (count × the gram's character length — repeats of
    * the single most frequent gram), while the 5–10-gram rules count
    * COVERAGE (characters lying inside any ≥2× n-gram, overlapping
    * occurrences counted once). "Characters" here are token characters
    * under the corpus's whitespace tokenization (separators carry no
    * mass), so every metric is an exact BIGINT and the keep decision is
    * pure integer arithmetic (mass·100 ≤ threshold·total) — bit-identical
    * in the DuckDB twin, which recomputes both semantics relationally
    * (per-doc n-gram counts, top-1 by (count desc, gram asc), and a
    * distinct-position coverage join). The duplicate-line/-paragraph
    * rules need line structure the single-line fixture lacks and are
    * omitted (same shape over `split(text, '\n')` — the t37 precedent).
    *
    * Scale shape: repetition is a WITHIN-document property, so the
    * whole rule set needs no cross-document state at all — one
    * mapPartitions projection, zero exchanges, zero joins; the kernel
    * is O(Σₙ L) time and O(L) space per document (hash counts per n,
    * then a coverage mark pass). The relational alternative (nine
    * per-n explode → groupBy(doc, gram) rounds) would shuffle ~9× the
    * token stream to compute a per-row answer — the measured-escape-
    * hatch precedent (BPE encode, Viterbi, DEFLATE) applies. */
  def repetitionRules(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = text.split(" ")
          val lens = toks.map(_.length)
          var total = 0L
          lens.foreach(total += _)
          val sep = '\u0001'
          // gram key for positions [start, start+n): tokens joined by
          // U+0001 (absent from any token; the LM-key convention).
          def key(start: Int, n: Int): String = {
            val sb = new java.lang.StringBuilder()
            var i = 0
            while (i < n) {
              if (i > 0) sb.append(sep)
              sb.append(toks(start + i))
              i += 1
            }
            sb.toString
          }
          // Occurrence mass of the most frequent n-gram; ties broken
          // (count desc, gram asc) — the repo's deterministic order.
          def topMass(n: Int): Long = {
            val m = scala.collection.mutable.HashMap.empty[String, Long]
            var s = 0
            while (s + n <= toks.length) {
              val k = key(s, n); m.update(k, m.getOrElse(k, 0L) + 1L); s += 1
            }
            if (m.isEmpty) 0L
            else {
              var bestK: String = null; var bestC = 0L
              m.foreach { case (k, c) =>
                if (c > bestC || (c == bestC && (bestK == null || k < bestK))) {
                  bestK = k; bestC = c
                }
              }
              // chars of one occurrence = joined length minus separators
              bestC * (bestK.length - (n - 1)).toLong
            }
          }
          // Character coverage of all duplicated n-grams: mark token
          // positions lying in any gram with count >= 2, count once.
          def dupMass(n: Int, covered: Array[Boolean]): Long = {
            java.util.Arrays.fill(covered, false)
            val m = scala.collection.mutable.HashMap.empty[String, Long]
            var s = 0
            while (s + n <= toks.length) {
              val k = key(s, n); m.update(k, m.getOrElse(k, 0L) + 1L); s += 1
            }
            s = 0
            while (s + n <= toks.length) {
              if (m(key(s, n)) >= 2L) {
                var i = s; val e = s + n
                while (i < e) { covered(i) = true; i += 1 }
              }
              s += 1
            }
            var mass = 0L
            var i = 0
            while (i < toks.length) {
              if (covered(i)) mass += lens(i); i += 1
            }
            mass
          }
          val covered = new Array[Boolean](toks.length)
          val top2 = topMass(2); val top3 = topMass(3); val top4 = topMass(4)
          val d = (5 to 10).map(n => dupMass(n, covered)).toArray
          val kept =
            if (top2 * 100L <= 20L * total && top3 * 100L <= 18L * total &&
              top4 * 100L <= 16L * total &&
              d(0) * 100L <= 15L * total && d(1) * 100L <= 14L * total &&
              d(2) * 100L <= 13L * total && d(3) * 100L <= 12L * total &&
              d(4) * 100L <= 11L * total && d(5) * 100L <= 10L * total) 1L
            else 0L
          (id, total, top2, top3, top4, d(0), d(1), d(2), d(3), d(4), d(5),
            kept)
        }
      }
      .toDF(idCol, "total_chars", "top2_chars", "top3_chars", "top4_chars",
        "dup5_chars", "dup6_chars", "dup7_chars", "dup8_chars", "dup9_chars",
        "dup10_chars", "kept")
  }

  /** Gopher repetition-removal rules, the LINE/PARAGRAPH half (Rae et
    * al. 2021, MassiveText curation, Appendix A1.2 — the structural
    * complement of [[repetitionRules]]' n-gram half): a page is removed
    * when too much of it is literally repeated lines or paragraphs,
    * {{{
    *   duplicate lines      > 0.30 · n_lines       → drop
    *   duplicate paragraphs > 0.30 · n_paragraphs  → drop
    *   duplicate line chars      > 0.20 · total    → drop
    *   duplicate paragraph chars > 0.20 · total    → drop
    * }}}
    * Structure and counting follow the paper's published reading (and
    * the de-facto reference implementations): paragraphs split on
    * `"\n\n"`, lines on `"\n"`, and an element is a DUPLICATE when an
    * identical element already occurred earlier in the document — each
    * occurrence after the first counts once, and contributes its own
    * character length to the duplicate char mass (so k copies of a
    * line count k−1 elements and (k−1)·len chars). Characters are
    * non-separator characters (`total_chars` = text length minus every
    * line/paragraph separator), all metrics exact BIGINTs, and the
    * keep decision pure integer arithmetic (count·100 ≤ thr·denom) —
    * bit-identical in the DuckDB twin, which recomputes the same
    * splits and occurrence-after-first counts relationally. Empty
    * elements (consecutive separators) participate in dup counting
    * with zero char mass — the reference-implementation convention.
    * A document with no separators is one paragraph of one line:
    * nothing can duplicate, so it always keeps (the single-line
    * fixture motivates the declared query's deterministic reflow).
    *
    * Scale shape: like [[repetitionRules]], repetition-by-structure is
    * a WITHIN-document property — one mapPartitions projection, zero
    * exchanges, zero joins; the kernel is one hash-set pass per
    * granularity, O(L) time and space per document. The relational
    * alternative (explode lines → groupBy(doc, line) → re-aggregate)
    * would shuffle the whole line stream to compute a per-row answer —
    * the measured-escape-hatch precedent applies. */
  def lineDupRules(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          // Duplicate-after-first census of one granularity's elements:
          // (n_elements, dup_count, dup_chars, char_mass).
          def census(elems: Array[String]): (Long, Long, Long, Long) = {
            val seen = new java.util.HashSet[String]()
            var dupN = 0L; var dupC = 0L; var mass = 0L
            var i = 0
            while (i < elems.length) {
              val e = elems(i)
              mass += e.length
              if (!seen.add(e)) { dupN += 1L; dupC += e.length }
              i += 1
            }
            (elems.length.toLong, dupN, dupC, mass)
          }
          // split(sep, -1) keeps trailing empties — every separator
          // delimits, so char mass is exactly text minus separators.
          val paras = text.split("\n\n", -1)
          val lines = text.split("\n", -1)
          val (nP, dupP, dupPc, _) = census(paras)
          val (nL, dupL, dupLc, mass) = census(lines)
          // Paragraph census re-counts the "\n\n" split's members; the
          // line census's mass is the canonical total (paragraph
          // members still contain single newlines, line members none).
          val kept =
            if (dupL * 100L <= 30L * nL && dupP * 100L <= 30L * nP &&
              dupLc * 100L <= 20L * mass && dupPc * 100L <= 20L * mass) 1L
            else 0L
          (id, nL, nP, dupL, dupP, dupLc, dupPc, mass, kept)
        }
      }
      .toDF(idCol, "n_lines", "n_paras", "dup_lines", "dup_paras",
        "dup_line_chars", "dup_para_chars", "total_chars", "kept")
  }

  /** Stupid-backoff trigram LM document scoring (Brants et al. 2007,
    * "Large Language Models in Machine Translation" — the inexpensive
    * smoothing that made distributed web-scale n-gram LMs practical).
    * Per position i ≥ 3 the score is
    * {{{
    *   S(w3|w1w2) = c(w1w2w3)/c(w1w2)            if c(w1w2w3) ≥ minCount
    *              = α · c(w2w3)/c(w2)            else if c(w2w3) ≥ minCount
    *              = α · α · c(w3)/N              otherwise
    * }}}
    * with α = 0.4 (the paper's constant) and a storage floor
    * `minCount` on the trigram and bigram tables — scoring a corpus
    * with its own un-floored model never backs off, so the floor is
    * what makes the backoff chain real (and is what every production
    * n-gram table applies anyway). Context counts c(w1w2), c(w2) stay
    * un-floored (the t25 convention: kept n-grams' scores are
    * unchanged by the floor choice). Documents with fewer than three
    * tokens have no trigrams and are absent.
    *
    * Determinism across engines: the t19 argument — each DISTINCT
    * trigram's ln(S) rounds to 2⁻²⁰ fixed point once, in the
    * model-sized score table; per-document totals are exact BIGINT
    * sums over the trigram stream.
    *
    * Scale shape — this is the deliberately NON-broadcast complement
    * to [[bigramLogProb]]: a web-scale trigram table (billions of
    * rows even floored; Brants et al. report 300 B n-grams) can never
    * broadcast, so the score table carries NO broadcast hint — the
    * scoring join keys the trigram stream against the model on the
    * trigram and lets Catalyst pick: auto-broadcast under the
    * threshold at small scale, shuffle hash/sort-merge join above it,
    * either way one pass over the token stream with map-side partial
    * aggregation of the per-document sums. Model construction is
    * three corpus-scan aggregations (tri/bi/unigram counts — each
    * combines map-side to model-sized tables) and the score-table
    * joins are model-table-sized, never corpus-sized. */
  def backoffTrigramLogProb(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minCount: Long = 2L,
      alpha: Double = 0.4): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    val sep = "\u0001"
    val tris = df.select(col(idCol).as("id"),
      explode(adjacentTriples(tokens(col(textCol)), sep)).as("tri"))
    // Model tables: materialized once (each is n-gram-vocabulary-sized)
    // because each is reused by two score-table joins below.
    val triC = tris.groupBy("tri").agg(count(lit(1)).as("c3"))
      .localCheckpoint()
    val biC = df.select(explode(adjacentPairs(tokens(col(textCol)), sep))
        .as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c2")).localCheckpoint()
    val uniC = df.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1")).localCheckpoint()
    val nRow = uniC.agg(sum(col("c1"))).head()
    // Empty corpus: any N works — the scoring join below is empty.
    val n = if (nRow.isNullAt(0)) 1L else nRow.getLong(0)
    // Per-DISTINCT-trigram score table: the prefix bigram w1w2, suffix
    // bigram w2w3, and unigrams w2/w3 of an observed trigram are
    // always observed, so the lookups are inner joins.
    val keys = triC.select(col("tri"), col("c3"),
      substring_index(col("tri"), sep, 2).as("w12"),
      substring_index(col("tri"), sep, -2).as("w23"),
      substring_index(substring_index(col("tri"), sep, 2), sep, -1)
        .as("w2"),
      substring_index(col("tri"), sep, -1).as("w3"))
    val s =
      when(col("c3") >= minCount,
        col("c3").cast("double") / col("ctx12").cast("double"))
      .when(col("c23") >= minCount,
        lit(alpha) * (col("c23").cast("double") / col("cw2").cast("double")))
      .otherwise(
        lit(alpha) * (lit(alpha) *
          (col("cw3").cast("double") / lit(n.toDouble))))
    val lp = keys
      .join(biC.select(col("bg").as("w12"), col("c2").as("ctx12")),
        Seq("w12"))
      .join(biC.select(col("bg").as("w23"), col("c2").as("c23")),
        Seq("w23"))
      .join(uniC.select(col("w").as("w2"), col("c1").as("cw2")), Seq("w2"))
      .join(uniC.select(col("w").as("w3"), col("c1").as("cw3")), Seq("w3"))
      .select(col("tri"),
        round(log(s) * lit(1048576.0)).cast("long").as("lp_fp"))
    tris.join(lp, Seq("tri"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_trigrams"), sum(col("lp_fp")).as("logprob_fp"))
      .select(col("id").as(idCol), col("n_trigrams"), col("logprob_fp"),
        (col("logprob_fp").cast("double") / col("n_trigrams"))
          .as("mean_lp_fp"))
  }

  /** Tokenizer fertility census — the per-language tokenizer-eval
    * artifact every multilingual release ships (fertility = subword
    * tokens per word, Ács/mBERT convention; plus the compression
    * ratios chars/token and bytes/token that price a tokenizer's
    * context-window efficiency per language). Tokens are the [[bpePattern]]
    * pre-tokenizer runs (t13's "what the trainer sees" estimate), words
    * are whitespace splits, bytes are UTF-8 octets. All three ratios
    * are EXACT 2⁻²⁰ fixed point with no float anywhere: the scaled
    * division `(2²⁰·num) div den` is computed by the split identity
    * `(num div den)·2²⁰ + ((num mod den)·2²⁰) div den`, exact for any
    * group with num mod den < 2⁴³ (per-LANGUAGE remainders stay inside
    * int64 up to ~35 TB of single-language text; a larger monolith
    * needs one more split level, documented in SCALE.md). Groups whose
    * denominator is zero (a language of empty documents) read NULL
    * ratios, never a division error.
    *
    * Scale shape: one corpus scan computing four per-doc integers
    * inside the projection (regex runs, token char mass, octet length,
    * word count — all codegen'd), then ONE partial-agg'd groupBy on
    * the language key (bounded cardinality: languages, not documents).
    * Nothing else moves; the ratio arithmetic runs on the
    * languages-sized aggregate frame. No reference analog
    * (vectors-only, `NND.scala:62-66`); extends the §2.9 text-analysis
    * family. */
  def tokenizerFertility(df: DataFrame, langCol: String = "lang",
      textCol: String = "text"): DataFrame =
    fertilityRatios(fertilitySums(df, langCol, textCol))

  /** [[tokenizerFertility]]'s aggregation half: the per-language
    * partial sums (n_docs, n_tokens, n_chars, n_bytes, n_words). Pure
    * integer sums — associative and order-independent, so per-batch
    * partials re-aggregate to the batch answer exactly; the streaming
    * serve (st27) rides this property. */
  def fertilitySums(df: DataFrame, langCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    val tk = regexp_extract_all(col(textCol), lit(bpePattern), lit(0))
    df.select(col(langCol).as("lang"),
        size(tk).cast("long").as("d_tokens"),
        aggregate(tk, lit(0L), (acc, x) => acc + length(x)).as("d_chars"),
        octet_length(col(textCol)).cast("long").as("d_bytes"),
        size(split(col(textCol), " ")).cast("long").as("d_words"))
      .groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum("d_tokens").as("n_tokens"),
        sum("d_chars").as("n_chars"),
        sum("d_bytes").as("n_bytes"),
        sum("d_words").as("n_words"))
  }

  /** [[tokenizerFertility]]'s ratio half over an already-summed (or
    * re-merged) per-language frame — one definition of the fixed-point
    * arithmetic for the batch census and the streaming serve. */
  def fertilityRatios(agg: DataFrame): DataFrame = {
    // (2^20 * num) div den without the 2^20-inflated product ever
    // materializing: exact for num, den >= 0 by the Euclidean split.
    def fpDiv(num: String, den: String) = expr(
      s"($num div nullif($den, 0)) * 1048576 + " +
        s"(($num % nullif($den, 0)) * 1048576) div nullif($den, 0)")
    agg.select(col("lang"), col("n_docs"), col("n_tokens"), col("n_chars"),
      col("n_bytes"), col("n_words"),
      fpDiv("n_tokens", "n_words").as("fertility_fp"),
      fpDiv("n_chars", "n_tokens").as("chars_per_token_fp"),
      fpDiv("n_bytes", "n_tokens").as("bytes_per_token_fp"))
  }
}
