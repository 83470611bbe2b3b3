package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import java.util.concurrent.atomic.AtomicInteger

/** Per-user sessionization state carried across micro-batches. */
final case class SessState(lastTsUs: Long, sessions: Long, events: Long)

/** One stateful-sessionization output row. */
final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

/** Watermark-buffered sessionization state: `folded` holds counters over
  * events already finalized (event-time strictly below the watermark, so
  * no earlier event can still arrive); `buf` holds the not-yet-final
  * tail, bounded by the watermark delay. */
final case class SessBufState(
    lastTsUs: Long, sessions: Long, events: Long, buf: Seq[(Long, Long)], seq: Long)

/** Stateful-sessionization output row tagged with a per-user emission
  * sequence number so "latest emission wins" survives any sink that
  * appends one row per micro-batch. */
final case class UserSessionsSeq(user_id: Long, n_sessions: Long, n_events: Long, seq: Long)

/** Per-shard Misra-Gries sketch state carried across micro-batches:
  * the bounded counter map plus the shard's exact stream length. */
final case class MgShard(counts: Map[String, Long], n: Long, seq: Long)

/** One per-shard candidate emission (latest `seq` per shard wins);
  * carries the shard's exact stream length so the drained total needs
  * no extra corpus pass. */
final case class MgShardSummary(shard: Int, terms: Seq[String], n: Long, seq: Long)

/** Per-shard fixed-point PCA moment sketch carried across
  * micro-batches ([[graft.ops.Pca]] layout: count | component sums |
  * upper-tri Gram sums, exact Longs). */
final case class PcaShard(acc: Seq[Long], seq: Long)

/** One per-shard sketch emission (latest `seq` per shard wins). */
final case class PcaShardSummary(shard: Int, acc: Seq[Long], seq: Long)

/** Structured Streaming ingest of the events table.
  *
  * The reference is batch-only (SURVEY.md §2.8); this provides the
  * streaming surface a production pipeline needs: file-source streaming
  * read → event-time watermark → tumbling-window aggregation. For
  * verification the stream is driven synchronously to completion against
  * the static fixture via a memory sink, so the result is a normal batch
  * DataFrame whose content must equal the equivalent batch SQL — i.e. the
  * streaming path itself is oracle-checked.
  */
object EventsStream {

  private val runId = new AtomicInteger(0)

  /** Streaming-read schema: `ts` is always read as the raw int64,
    * which works for both physical encodings the fixture generator has
    * produced (TIMESTAMP(NANOS) and TIMESTAMP(MICROS) are both a plain
    * int64 on disk); [[tsDivisor]] picks the factor that recovers
    * microseconds. */
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Raw-int64 → microseconds divisor for the events fixture at `dir`,
    * probed from the batch read's resolved type (one footer read,
    * memoized): TIMESTAMP(NANOS) resolves to LONG under `nanosAsLong`
    * → divide by 1000; TIMESTAMP(MICROS) resolves to TimestampType →
    * the raw int64 already IS microseconds. Mirrors the defensive
    * normalization in [[graft.Queries.events]] so the streaming and
    * batch paths agree whichever encoding the generator used. */
  // Memoized per directory, invalidated on mtime change: regenerating
  // a fixture in-place with the other timestamp encoding bumps the
  // path's mtime and the stale entry is REPLACED (one footer re-probe)
  // instead of read through 1000x off — and the cache holds exactly
  // one entry per directory however often fixtures regenerate. The
  // stat strips a `file:` scheme prefix first; on a path the local
  // filesystem genuinely can't stat (a DFS URI) the mtime probe
  // degrades to 0 — plain per-directory session memoization.
  private val tsDivisorCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
  private def tsDivisor(spark: SparkSession, dir: String): Long = {
    val mtime =
      try java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(
        s"${dir.stripPrefix("file://").stripPrefix("file:")}/events.parquet"))
        .toMillis
      catch { case _: Exception => 0L }
    tsDivisorCache.compute(dir, (_, prev) =>
      if (prev != null && prev._1 == mtime) prev
      else {
        val t = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
        (mtime, if (t == LongType) 1000L else 1L)
      })._2
  }

  /** The raw streamed `ts` column as a proper microsecond TIMESTAMP. */
  private def tsCol(spark: SparkSession, dir: String): org.apache.spark.sql.Column =
    timestamp_micros(expr(s"ts div ${tsDivisor(spark, dir)}"))

  /** Documents schema for streaming reads of the corpus fixture. */
  private[streaming] val documentsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Runs one synchronous streaming pass: exposes the single-file fixture
    * through a temp directory of symlinks (the file source needs a
    * directory), drains the query into a memory sink, then MATERIALIZES
    * the sink table and tears everything down — temp dir, symlink, and
    * the session-registered memory table — so repeated invocations in a
    * long-lived session leak nothing. */
  /** Polls a drained query until the engine's no-data commit batch has
    * run with an event-time watermark at or past `untilWatermarkUs` —
    * `processAllAvailable` only guarantees DATA batches, but append-mode
    * emission happens in the watermark-advancing no-data batch that can
    * trail it. Returns normally on timeout too: the caller's oracle
    * comparison is the loud failure if settling was genuinely needed. */
  private def awaitWatermark(
      q: org.apache.spark.sql.streaming.StreamingQuery,
      untilWatermarkUs: Long, timeoutMs: Long = 30000L): Unit = {
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    def reached: Boolean = Option(q.lastProgress)
      .flatMap(p => Option(p.eventTime.get("watermark")))
      .map(s => fmt.parse(s).getTime * 1000L)
      .exists(_ >= untilWatermarkUs)
    while (System.nanoTime() < deadline && !reached) Thread.sleep(25)
    if (!reached)
      System.err.println(
        s"[graft] awaitWatermark: timed out after ${timeoutMs}ms waiting for " +
          s"watermark >= ${untilWatermarkUs}us — draining anyway (check the " +
          "target accounts for the declared watermark delays)")
    q.processAllAvailable()
  }

  /** Shared drain-harness lifecycle: creates the temp stream directory
    * with the fixture symlinked in (the file source needs a DIRECTORY),
    * runs `prepare` (heartbeat files etc.), hands the directory to
    * `run`, and tears everything down on every path — children first
    * (prepare may have added files), with the directory stream CLOSED
    * (an unclosed Files.list leaks one fd per drained query, and a
    * long-lived Bench/Verify session drains dozens). One definition so
    * the two drain harnesses cannot diverge on lifecycle fixes. */
  private def withStreamDir[A](dir: String, table: String, name: String,
      prepare: java.nio.file.Path => Unit = _ => ())(
      run: java.nio.file.Path => A): A = {
    val streamDir = java.nio.file.Files.createTempDirectory(s"graft_$name")
    try {
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve(s"$table.parquet"),
        java.nio.file.Paths.get(s"$dir/$table.parquet"))
      prepare(streamDir)
      run(streamDir)
    } finally {
      val children = java.nio.file.Files.list(streamDir)
      try children.forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally children.close()
      java.nio.file.Files.deleteIfExists(streamDir)
    }
  }

  private[streaming] def runDrainedOn(      spark: SparkSession, dir: String, table: String, schema: StructType,
      tag: String,
      prepare: java.nio.file.Path => Unit = _ => (),
      settle: org.apache.spark.sql.streaming.StreamingQuery => Unit = _ => ())(
      build: DataFrame => DataFrame): DataFrame = {
    val name = s"${table}_stream_${tag}_${runId.incrementAndGet()}"
    withStreamDir(dir, table, name, prepare) { streamDir =>
      try {
        val src = spark.readStream.schema(schema).parquet(streamDir.toString)
        val out = build(src)
        val q = out.writeStream
          .outputMode(outputModeFor(tag))
          .format("memory")
          .queryName(name)
          .start()
        try { q.processAllAvailable(); settle(q) }
        finally q.stop()
        val sink = spark.table(name)
        val rows = sink.collect()
        val sinkSchema = sink.schema
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), sinkSchema)
      } finally {
        // Failure path too — a mid-drain error must not leave the
        // memory table registered.
        try spark.catalog.dropTempView(name) catch { case _: Exception => }
      }
    }
  }

  private def runDrained(
      spark: SparkSession, dir: String, tag: String)(
      build: DataFrame => DataFrame): DataFrame =
    runDrainedOn(spark, dir, "events", eventsSchema, tag)(build)

  /** [[runDrainedOn]]'s `foreachBatch` sibling: each micro-batch is
    * handed to `transform` as a plain BATCH DataFrame — the production
    * pattern for per-batch logic the incremental planner cannot run
    * (multi-join pipelines, localCheckpoint, arbitrary actions). The
    * per-batch results are unioned into the returned frame. In this
    * drained-fixture harness the union is a driver buffer; a production
    * deployment writes each batch's result to an append sink (parquet/
    * table) inside the same callback — exactly-once via the batchId —
    * and nothing else changes. */
  private[streaming] def runDrainedForeachBatch(
      spark: SparkSession, dir: String, table: String, schema: StructType,
      tag: String)(transform: DataFrame => DataFrame): DataFrame = {
    val name = s"${table}_stream_${tag}_${runId.incrementAndGet()}"
    withStreamDir(dir, table, name) { streamDir =>
      val buf = java.util.Collections.synchronizedList(
        new java.util.ArrayList[org.apache.spark.sql.Row]())
      @volatile var outSchema: Option[StructType] = None
      val src = spark.readStream.schema(schema).parquet(streamDir.toString)
      val fn: (DataFrame, Long) => Unit = (batch, _) => {
        val out = transform(batch)
        outSchema = Some(out.schema)
        buf.addAll(java.util.Arrays.asList(out.collect(): _*))
      }
      val q = src.writeStream.foreachBatch(fn).start()
      try q.processAllAvailable() finally q.stop()
      // A zero-batch drain (empty fixture) still needs the result
      // schema: derive it from the transform of an empty batch.
      val sch = outSchema.getOrElse(transform(
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          schema)).schema)
      spark.createDataFrame(buf, sch)
    }
  }

  /** Sink output mode per surface: joins and arbitrary-state emit
    * incrementally (append/update); windowed and global aggregations
    * re-emit the full result (complete). */
  private def outputModeFor(tag: String): String = tag match {
    case "join" | "decon" | "chunks" | "sesswin" | "ingestdedup"
       | "htmlx" | "urlgate" => "append"
    case "sessions" | "heavy" | "pca"                            => "update"
    case _                                                       => "complete" // incl. "annserve"
  }

  /** Daily tumbling-window counts/sums per event type, computed through a
    * streaming query with a 1-day watermark and drained to completion. */
  def dailyAggregates(spark: SparkSession, dir: String): DataFrame =
    runDrained(spark, dir, "daily") { src =>
      src.withColumn("ts", tsCol(spark, dir))
        .withWatermark("ts", "1 day")
        .groupBy(window(col("ts"), "1 day").as("win"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .select(to_date(col("win.start")).as("day"), col("event_type"), col("n"), col("total_value"))
    }

  /** Per-session rows through Spark's NATIVE `session_window` operator —
    * the declarative complement to [[sessionCountsStateful]]'s custom
    * `flatMapGroupsWithState` sessionizer. Each event opens a
    * `[ts, ts + gap]` window; touching-or-overlapping windows per user
    * merge, so a session is a maximal event chain with successive gaps
    * of AT MOST `gap` (an event exactly `gap` after its predecessor
    * EXTENDS the session — inclusive merge, pinned by the OpsSpec
    * boundary fixture — so the oracle's island condition is
    * `diff > gap`). Output is one row per (user, session): the session
    * start as exact unix microseconds plus the event count.
    *
    * State/scale shape: Catalyst plans this as the dedicated
    * session-window aggregation — state per OPEN session only, evicted
    * once the watermark passes the session end; map-side partial merge
    * of intra-batch sessions before the user_id shuffle. That is
    * strictly better than the custom sessionizer's per-user-forever
    * state and is why the native form is preferred when per-session
    * rows (not evolving per-user rollups) are the product.
    *
    * Emission: session windows only support APPEND output, which emits
    * a session once the watermark proves no event can extend it — so a
    * drained finite fixture would hold back every session still open
    * at end-of-stream (the last session of EVERY user). The harness
    * therefore drops a far-future HEARTBEAT row (sentinel user −1)
    * into the stream directory — the standard punctuation pattern; a
    * production ingest gets the same effect from the source's
    * ever-advancing event time. The heartbeat pushes the watermark
    * past every real session's end, append mode flushes them all in
    * the no-data commit batch, and the sentinel's own (never-closed)
    * session stays in state, which `stop()` discards; it is filtered
    * regardless. */
  /** Unix-micros instant of 2100-01-01 — the far-future heartbeat
    * event time (fits a Long even scaled to nanos). */
  private val heartbeatUs = 4102444800000000L

  /** Drops a one-row far-future heartbeat file into the drain
    * directory (the punctuation pattern: advance event time past every
    * real row so watermark-gated emission flushes; a production ingest
    * gets the same effect from the source's ever-advancing clock).
    * `eventType` matters when the query filters by type BEFORE its
    * watermark node — the sentinel must survive into every watermark
    * input or that side's clock never advances. */
  private def heartbeatPrepare(spark: SparkSession, rawTs: Long,
      eventType: String)(streamDir: java.nio.file.Path): Unit = {
    import spark.implicits._
    val scratch = java.nio.file.Files.createTempDirectory("graft_heartbeat")
    try {
      val out = scratch.resolve("hb").toString
      Seq((-1L, rawTs, -1L, eventType, 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(out)
      val listing = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      val part =
        try listing.filter(p => p.toString.endsWith(".parquet"))
          .findFirst().get()
        finally listing.close()
      java.nio.file.Files.copy(part, streamDir.resolve("heartbeat.parquet"))
    } finally {
      val walk = java.nio.file.Files.walk(scratch)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  def sessionWindows(spark: SparkSession, dir: String,
      gap: String = "30 minutes"): DataFrame = {
    val div = tsDivisor(spark, dir)
    val heartbeatRaw = heartbeatUs * div
    runDrainedOn(spark, dir, "events", eventsSchema, "sesswin",
      prepare = heartbeatPrepare(spark, heartbeatRaw, "heartbeat"),
      settle = awaitWatermark(_, heartbeatUs)) { src =>
      // NB: the sentinel must NOT be filtered inside the streaming
      // query — a filter on the grouping key pushes down through the
      // aggregation AND the watermark node into the scan, silently
      // deleting the heartbeat before it can advance event time. It is
      // dropped from the drained batch result below instead (belt and
      // braces: its never-closed session cannot emit anyway).
      src.withColumn("ts", tsCol(spark, dir))
        .withWatermark("ts", "0 seconds")
        .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), unix_micros(col("w.start")).as("sess_start"),
          col("n_events"))
    }.filter(col("user_id") =!= -1L)
  }

  /** Streaming ingest-time exact dedup: each streamed document (odd
    * ids play the incoming batch) checked against the STATIC existing
    * corpus (even ids) by exact text match — the stateless
    * stream-static join every ingest pipeline puts in front of
    * near-dup machinery (d07 is the batch near-dup twin; this is the
    * cheap exact gate before it). The static side is a distinct set of
    * xxhash64(text) keys — the resident index holds 8 bytes per
    * existing document instead of the body, so at corpus scale it
    * broadcasts (or bucket-joins) where a text-keyed index could not;
    * same result up to 64-bit collisions (P ≈ n²/2⁶⁵, the
    * [[graft.ops.Dedup.exactByHash]] trade). The stream side carries
    * NO state — the join re-evaluates per micro-batch against the
    * resident artifact, so a forever-running ingest holds only the
    * static index. Drained flags must equal the batch IN-subquery
    * bit-for-bit. */
  def ingestDedupFlags(spark: SparkSession, dir: String): DataFrame =
    runDrainedOn(spark, dir, "documents", documentsSchema, "ingestdedup") { src =>
      val existing = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 2 === 0)
        .select(xxhash64(col("text")).as("e_hash")).distinct()
      src.filter(col("doc_id") % 2 =!= 0)
        .join(existing, xxhash64(col("text")) === col("e_hash"), "left_outer")
        .select(col("doc_id"), col("e_hash").isNotNull.cast("long").as("is_dup"))
    }

  /** Streaming ingest-time NEAR-dup gate — the MinHash-LSH companion
    * to [[ingestDedupFlags]]'s exact gate, and the streaming twin of
    * batch d07: each micro-batch of incoming documents (odd ids) runs
    * the full candidate-generation + exact-Jaccard-verify pipeline of
    * [[graft.ops.Dedup.minhashLshPairsAcross]] against the STATIC
    * existing corpus (even ids). That pipeline is multi-join,
    * aggregation-heavy, and localCheckpoints — shapes the incremental
    * streaming planner cannot execute — so it runs through
    * `foreachBatch`, the production idiom for exactly this: the batch
    * engine plans each micro-batch, the stream carries no state, and a
    * forever-running ingest holds only the static corpus artifacts.
    * Because each incoming document is compared only against the
    * static side (never intra-stream), the per-batch results union to
    * the batch answer REGARDLESS of how the source splits micro-batches
    * — drained output equals d07 bit-for-bit and shares its oracle. */
  def ingestNearDupPairs(spark: SparkSession, dir: String): DataFrame =
    runDrainedForeachBatch(
      spark, dir, "documents", documentsSchema, "neardup") { batch =>
      val existing = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 2 === 0)
      graft.ops.Dedup.minhashLshPairsAcross(
        existing, batch.filter(col("doc_id") % 2 =!= 0),
        "doc_id", "text", 0.7)
    }

  /** Streaming corpus-drift monitor: the odd-id document stream's term
    * counts accumulate in a complete-mode aggregation (state bounded
    * by the VOCABULARY, not the stream length — the t14/st07 sketch is
    * the fallback when even that is too large) and the drained table
    * feeds the same fixed-point Jeffreys-divergence combine as batch
    * t30 against the static even-id reference distribution — so the
    * result equals batch t30 bit-for-bit and shares its oracle. The
    * production loop reads the current divergence per micro-batch to
    * alarm on a drifting crawl WHILE it ingests. */
  def corpusDriftStreaming(spark: SparkSession, dir: String): DataFrame = {
    val streamed = runDrainedOn(
      spark, dir, "documents", documentsSchema, "drift") { src =>
      src.filter(col("doc_id") % 2 =!= 0)
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("c"))
    }
    val staticCounts = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 2 === 0)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    graft.ops.TextAnalysis.corpusDriftFromCounts(staticCounts, streamed)
  }

  /** Streaming HTML main-content extraction (st23): the t46 extraction
    * pipeline applied AT INGEST — crawled markup arrives as a stream
    * and the clean-text column is produced before anything lands. The
    * whole extraction is a stateless per-row projection (six codegen'd
    * regex/string steps, no aggregation, no join), so it streams in
    * APPEND mode with ZERO state: per-row independence makes the
    * drained output equal the batch t46 result under ANY micro-batch
    * slicing — the strongest oracle class the streaming family has.
    * `build` is the batch pipeline itself (the t46 query body), passed
    * in so the two surfaces cannot drift. */
  def htmlExtractServe(spark: SparkSession, dir: String,
      build: DataFrame => DataFrame): DataFrame =
    runDrainedOn(spark, dir, "documents", documentsSchema, "htmlx")(build)

  /** Streaming URL curation at ingest (st24 — the t48/t49 chain over
    * a streaming documents read in APPEND mode with ZERO state: URL
    * canonicalization and the domain gate are stateless per-row
    * projections, so per-row independence makes the drained stream
    * equal the batch result under any micro-batch slicing — the st23
    * argument verbatim). The caller passes the batch pipeline
    * function, so the two surfaces share one definition and one
    * bit-exact twin. */
  def urlGateServe(spark: SparkSession, dir: String,
      build: DataFrame => DataFrame): DataFrame =
    runDrainedOn(spark, dir, "documents", documentsSchema, "urlgate")(build)

  /** Streaming quality-score histogram over the document stream: the
    * live data-quality monitoring surface of an ingest pipeline (drift
    * in the bucket profile flags a bad crawl batch before it lands).
    * The per-document quality score is a stateless projection
    * ([[graft.ops.TextAnalysis.qualityScore]], the batch t02
    * expression verbatim); the histogram is a complete-mode global
    * aggregation over `floor(quality·20)` buckets — state is one
    * count per OCCUPIED bucket (≤ 21 rows) forever, scale-free in
    * stream length. Bucketing happens on bit-identical doubles, so the
    * drained histogram equals the batch SQL bit-for-bit. */
  def qualityHistogram(spark: SparkSession, dir: String): DataFrame =
    runDrainedOn(spark, dir, "documents", documentsSchema, "qhist") { src =>
      graft.ops.TextAnalysis.qualityScore(src)
        .groupBy(floor(col("quality") * 20).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
    }

  /** Streaming deduplication: `dropDuplicates` on (user_id, event_type)
    * over the streaming read, then per-type counts — the exactly-once
    * dedup stage an event-ingest pipeline puts in front of downstream
    * aggregation. State here is one row per distinct key FOREVER — exact,
    * but unbounded; [[dedupCountsWithinWatermark]] is the state-bounded
    * production form. Drained to completion, must equal batch
    * `SELECT DISTINCT`+count. */
  def dedupCounts(spark: SparkSession, dir: String): DataFrame =
    runDrained(spark, dir, "dedup") { src =>
      src.select(col("user_id"), col("event_type"))
        .dropDuplicates("user_id", "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_distinct_users"))
    }

  /** State-BOUNDED streaming deduplication: `dropDuplicatesWithinWatermark`
    * evicts a key's dedup state once the watermark passes its event time
    * plus the delay, so state is O(keys per watermark horizon), not
    * O(all keys ever) — the form a forever-running ingest pipeline must
    * use. Within one horizon the output equals exact dedup; `delay` must
    * cover the duplicate-arrival window (here the whole fixture span, so
    * the oracle is the exact batch DISTINCT). State eviction itself is
    * asserted in OpsSpec with a short horizon across micro-batches. */
  def dedupCountsWithinWatermark(
      spark: SparkSession, dir: String, delay: String = "365 days"): DataFrame =
    runDrained(spark, dir, "dedupwm") { src =>
      src.withColumn("ts", tsCol(spark, dir))
        .withWatermark("ts", delay)
        .select(col("user_id"), col("event_type"), col("ts"))
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_distinct_users"))
    }

  /** Stream-stream interval join: each purchase joined to the same
    * user's events in the preceding hour — two streaming reads of the
    * event log, both watermarked, joined on key + event-time range (the
    * state-bounded join Structured Streaming plans with watermark-based
    * state eviction; at scale both sides shuffle once on user_id and
    * expired state drops out per micro-batch). The joined pairs drain to
    * a memory sink (append mode); per-purchase counts are then a batch
    * aggregation over the sink, and the whole path must equal the batch
    * range join `q27_range_join`. */
  def purchaseAttribution(spark: SparkSession, dir: String): DataFrame = {
    val pairs = runDrained(spark, dir, "join") { src0 =>
      def src = src0.withColumn("ts", tsCol(spark, dir))
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
        .withWatermark("p_ts", "1 day")
      val ev = src
        .select(col("user_id").as("e_user_id"), col("event_id"), col("ts").as("e_ts"))
        .withWatermark("e_ts", "1 day")
      purchases.join(ev,
        col("user_id") === col("e_user_id") &&
          col("e_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("e_ts") < col("p_ts"))
        .select(col("user_id"), col("purchase_id"), col("event_id"))
    }
    pairs
      .groupBy("user_id", "purchase_id")
      .agg(count(lit(1)).as("n_prior_events"))
  }

  /** LEFT OUTER stream-stream interval join — [[purchaseAttribution]]
    * including the purchases with NO prior event (n_prior_events = 0),
    * the rows an inner join silently drops and exactly the ones a
    * funnel analysis wants. The hard semantic is the null-extended
    * emission: Structured Streaming can only emit an unmatched left
    * row once the watermark proves no match can still arrive, so a
    * drained finite fixture would hold back every tail purchase — the
    * heartbeat punctuation flushes them. The sentinel is typed
    * "purchase" so it survives the purchase-side FILTER into that
    * side's watermark node (a "heartbeat"-typed row would advance only
    * the event side, and the join evicts on the MINIMUM watermark);
    * its own unmatched output row (user −1) is dropped post-drain —
    * post-drain because an in-query filter on user_id would push down
    * into the scan and delete the heartbeat at the source. */
  def purchaseAttributionOuter(spark: SparkSession, dir: String): DataFrame = {
    val div = tsDivisor(spark, dir)
    val pairs = runDrainedOn(spark, dir, "events", eventsSchema, "join",
      prepare = heartbeatPrepare(spark, heartbeatUs * div, "purchase"),
      // Both join sides declare a 1-day watermark delay, so the engine
      // watermark can reach at most heartbeatUs − 1 day — awaiting the
      // raw heartbeatUs would be unsatisfiable and every run would burn
      // the full settle timeout before the rescue drain.
      settle = awaitWatermark(_, heartbeatUs - 86_400_000_000L)) { src0 =>
      def src = src0.withColumn("ts", tsCol(spark, dir))
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
        .withWatermark("p_ts", "1 day")
      val ev = src
        .select(col("user_id").as("e_user_id"), col("event_id"), col("ts").as("e_ts"))
        .withWatermark("e_ts", "1 day")
      purchases.join(ev,
        col("user_id") === col("e_user_id") &&
          col("e_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("e_ts") < col("p_ts"),
        "left_outer")
        .select(col("user_id"), col("purchase_id"), col("event_id"))
    }
    pairs
      .filter(col("user_id") =!= -1L)
      .groupBy("user_id", "purchase_id")
      .agg(sum(when(col("event_id").isNotNull, 1L).otherwise(0L))
        .as("n_prior_events"))
  }

  /** Streaming heavy hitters over the documents token stream: terms at
    * ≥ `num/den` of the corpus, computed as a continuously-maintained
    * sharded Misra-Gries sketch plus an exact candidate recount — the
    * streaming twin of [[graft.ops.HeavyHitters.frequentTerms]] (t12),
    * equal to it bit-for-bit on a drained stream.
    *
    * Construction: tokens shard by `hash(term) % shards` (a term lives
    * in exactly ONE shard, so shard candidate sets union losslessly);
    * each shard folds its token stream into bounded Misra-Gries state
    * via `mapGroupsWithState` — `capacity` counters per shard FOREVER,
    * regardless of vocabulary size or stream length, the state bound a
    * forever-running ingest pipeline needs (contrast `dedupCounts`'s
    * documented O(distinct keys) state). The MG no-false-negative
    * guarantee is processing-order-independent, so it survives
    * arbitrary micro-batch arrival order: any term with global count
    * ≥ `N·num/den ≥ N_shard·num/den > N_shard/capacity` is still
    * tracked when the stream drains. The drained candidate union
    * (≤ shards·capacity terms, broadcast) is then exactly recounted in
    * one batch pass, so the output is exact and deterministic even
    * though per-shard candidate sets are not. `shards` sets the
    * stateful parallelism — raise it with the cluster, the state bound
    * scales as shards·capacity. */
  def heavyTerms(spark: SparkSession, dir: String, num: Long, den: Long,
                 capacity: Int = 0, shards: Int = 8): DataFrame = {
    import spark.implicits._
    require(num >= 1 && den >= num, s"need 0 < num/den <= 1, got $num/$den")
    val cap = if (capacity > 0) capacity else (2L * den / num).toInt max 16
    require(cap > den / num,
      s"capacity $cap voids the Misra-Gries guarantee for $num/$den")
    val updates = runDrainedOn(
      spark, dir, "documents", documentsSchema, "heavy") { src =>
      src.select(explode(split(col("text"), " ")).as("term"))
        .as[String]
        .groupByKey(t => math.floorMod(t.hashCode, shards))
        .mapGroupsWithState[MgShard, MgShardSummary](
          GroupStateTimeout.NoTimeout()) { (shard, it, state) =>
          val prior = state.getOption.getOrElse(MgShard(Map.empty, 0L, 0L))
          val b = scala.collection.mutable.HashMap.from(prior.counts)
          var n = prior.n
          it.foreach { t => n += 1; graft.ops.HeavyHitters.mgUpdate(b, t, cap) }
          val next = MgShard(b.toMap, n, prior.seq + 1)
          state.update(next)
          MgShardSummary(shard, b.keys.toSeq.sorted, n, next.seq)
        }
        .toDF()
    }
    // Latest emission per shard; the union over shards is the global
    // candidate superset, and the per-shard exact lengths sum to the
    // stream total — the sketch already counted every token, so no
    // separate corpus count() pass. Recount the candidates exactly in
    // one batch pass (the same broadcast-candidates shape as the batch
    // frequentTerms).
    val latest = updates
      .groupBy("shard")
      .agg(max_by(col("terms"), col("seq")).as("terms"),
        max_by(col("n"), col("seq")).as("n"))
    val cands = latest.select(explode(col("terms")).as("term"))
    val totRow = latest.agg(sum(col("n"))).head()
    val total = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("term"))
    toks.join(broadcast(cands), "term")
      .groupBy("term").agg(count(lit(1)).as("n"))
      .filter(col("n") * lit(den) >= lit(total) * lit(num))
  }

  /** Streaming vocabulary-size estimate: `approx_count_distinct`
    * (HLL++) over the streaming token stream in complete mode — the
    * batch t14 witness pair minus the exact half, because EXACT
    * distinct aggregation is structurally unstreamable (state one row
    * per distinct key forever; Structured Streaming rejects it
    * outright) while the sketch is O(1) registers per partition
    * forever. The register max-merge is associative/commutative/
    * idempotent, so the drained estimate equals the batch estimate on
    * the same rows regardless of micro-batch slicing — pinned against
    * the same per-SF values as t14's `n_approx`. */
  def vocabEstimate(spark: SparkSession, dir: String, rsd: Double = 0.02): DataFrame =
    runDrainedOn(spark, dir, "documents", documentsSchema, "vocab") { src =>
      src.select(explode(split(col("text"), " ")).as("term"))
        .agg(approx_count_distinct(col("term"), rsd).as("n_approx"))
    }

  /** Embeddings schema for streaming reads of the vector fixture. */
  private[streaming] val embeddingsSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Streaming accumulation of [[graft.ops.Pca]]'s moment sketch:
    * sharded `mapGroupsWithState` where each shard's state IS the
    * fixed-point Long sketch of the vectors it has seen — O(d²) Longs
    * per shard FOREVER, scale-free in stream length, the same sharded
    * shape as [[heavyTerms]]. Because the sketch is exactly mergeable
    * (integer sums), the drained per-shard states merge to a sketch
    * BIT-IDENTICAL to the batch [[graft.ops.Pca.momentSketch]] over
    * the same rows, regardless of micro-batch slicing or shard count
    * (asserted in PcaSpec) — i.e. the streaming ingest path trains the
    * SAME basis the batch path would, with zero approximation. */
  def pcaMomentSketch(spark: SparkSession, dir: String,
                      shards: Int = 8): Array[Long] = {
    import spark.implicits._
    val updates = runDrainedOn(
      spark, dir, "embeddings", embeddingsSchema, "pca") { src =>
      src.select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])]
        .groupByKey(r => math.floorMod(r._1, shards.toLong).toInt)
        .mapGroupsWithState[PcaShard, PcaShardSummary](
          GroupStateTimeout.NoTimeout()) { (shard, it, state) =>
          val prior = state.getOption
          var acc: Array[Long] = prior.map(_.acc.toArray).orNull
          it.foreach { case (_, v) =>
            val dim = v.length
            if (acc == null) acc = new Array[Long](1 + dim + dim * (dim + 1) / 2)
            acc(0) += 1
            var i = 0
            var t = 1 + dim
            while (i < dim) {
              val xi = v(i).toDouble
              acc(1 + i) += math.rint(xi * (1L << 20)).toLong
              var j = i
              while (j < dim) {
                acc(t) += math.rint(xi * v(j).toDouble * (1L << 20)).toLong
                t += 1
                j += 1
              }
              i += 1
            }
          }
          val next = PcaShard(acc.toSeq, prior.map(_.seq).getOrElse(0L) + 1)
          state.update(next)
          PcaShardSummary(shard, next.acc, next.seq)
        }
        .toDF()
    }
    // Latest emission per shard; exact merge across shards.
    val perShard = updates
      .groupBy("shard")
      .agg(max_by(col("acc"), col("seq")).as("acc"))
      .select("acc").collect()
      .map(_.getSeq[Long](0).toArray)
    require(perShard.nonEmpty, "empty stream")
    perShard.reduce(graft.ops.Pca.mergeMoments)
  }

  /** Streaming PCA: the top-`topK` eigenvalue spectrum solved from the
    * streamed moment sketch, emitted as fixed-point BIGINTs
    * (`round(λ·2²⁰)`) next to the exact row count — a pure function of
    * the fixture (pinnable) because sketch accumulation is exact
    * integer arithmetic and the Jacobi solve is deterministic. */
  def pcaSpectrum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val acc = pcaMomentSketch(spark, dir)
    val spectrum = graft.ops.Pca.fitSpectrumFromMoments(acc, 4)._2
    val fp = spectrum.take(4).map(ev => math.rint(ev * (1L << 20)).toLong)
    Seq((acc(0), fp(0), fp(1), fp(2), fp(3)))
      .toDF("n_rows", "ev1_fp", "ev2_fp", "ev3_fp", "ev4_fp")
  }

  /** Streaming RAG chunking — batch t20's overlapping stride chunker
    * applied at INGEST time: a stateless per-row flat-map (the window
    * explode is a pure projection, so it is legal on a stream
    * unchanged and carries ZERO streaming state), append mode. The
    * drained rows must equal the batch
    * [[graft.ops.TextAnalysis.chunkWindows]] output exactly — st11
    * shares t20's bit-exact SQL oracle verbatim. */
  def chunkCounts(spark: SparkSession, dir: String): DataFrame =
    runDrainedOn(spark, dir, "documents", documentsSchema, "chunks") { src =>
      graft.ops.TextAnalysis.chunkWindows(src)
    }

  /** Streaming semantic outlier pruning — batch s15's model-apply
    * shape at ingest time: the centroid matrix is a STATIC artifact
    * (fit offline by the deterministic batch k-means — models change
    * by release, not by micro-batch, the d09/st08 argument), so the
    * filter is a stateless codegen'd projection over each micro-batch
    * and the drained census equals batch s15's exactly — st12 shares
    * s15's pins. */
  def outlierPruneCounts(spark: SparkSession, dir: String,
                         k: Int = 8, maxDistFp: Long = 4050L): DataFrame = {
    import org.apache.spark.sql.functions.{count => cnt}
    val batch = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("features"))
    val centroids = graft.ops.Clustering.kmeansCentroids(
      batch, "id", "features", k)
    val all = batch.count()
    val kept = runDrainedOn(
      spark, dir, "embeddings", embeddingsSchema, "prune") { src =>
      // The shared model-apply projection — bit-identical dist_fp to
      // the batch path, stateless on the stream.
      graft.ops.Clustering.assignDistance(src, "embedding", centroids)
        .filter(col("dist_fp") <= maxDistFp)
        .groupBy()
        .agg(cnt(lit(1)).as("n_kept"))
    }
    kept.select(col("n_kept"), (lit(all) - col("n_kept")).as("n_pruned"),
      lit(all).as("n_points"))
  }

  /** Streaming semantic benchmark decontamination (st25) — the d23
    * blocked scrub applied AT INGEST: the benchmark is a static
    * release artifact, embedding micro-batches stream against it, and
    * each batch runs [[graft.ops.Decontaminate.semanticOverlap]]
    * through `foreachBatch` (the st19 idiom — the kernel's
    * driver-local centroid fit is a batch-side collect the
    * incremental planner cannot run; it re-fits per micro-batch from
    * the STATIC bench, so every batch sees bit-identical cells — a
    * production deployment hoists the fit once, same numbers). A
    * document's candidates are generated from its own row against the
    * broadcast probes, so per-batch outputs union to the batch result
    * under any slicing: the drained frame equals batch d23's
    * row-for-row (OpsSpec asserts) and the declared summary shares
    * d23's pinned oracle verbatim. Stream state: ZERO. */
  def semanticDeconServe(spark: SparkSession, dir: String,
      bench: DataFrame, toCorpus: DataFrame => DataFrame,
      tau: Double, nCells: Int = 8, nProbe: Int = 2): DataFrame =
    runDrainedForeachBatch(spark, dir, "embeddings",
        embeddingsSchema, "semdecon") { batch =>
      graft.ops.Decontaminate.semanticOverlap(
        toCorpus(batch.select(col("vec_id").as("id"),
          col("embedding").as("features"))),
        bench, "id", "features", tau, nCells, nProbe)
    }

  /** Streaming line-level decontamination at ingest — d25's cross-set
    * line scrub applied to the document STREAM (the st08/st25 idiom
    * one granularity up): the benchmark's line set is a static
    * broadcast artifact (eval suites change by release, not by
    * micro-batch), and each micro-batch runs the batch
    * [[graft.ops.Dedup.lineDecontaminate]] kernel through
    * `foreachBatch`; the stream holds ZERO state. A document's scrub
    * depends only on its own lines and the static benchmark —
    * per-document independence — so the drained frame equals batch
    * d25 row-for-row under ANY batch slicing and shares its bit-exact
    * DuckDB twin verbatim ([[graft.Queries.LineDeconOracle]]). */
  def lineDeconServe(spark: SparkSession, dir: String,
      bench: DataFrame, toCorpus: DataFrame => DataFrame): DataFrame =
    runDrainedForeachBatch(spark, dir, "documents",
        documentsSchema, "linedecon") { batch =>
      graft.ops.Dedup.lineDecontaminate(toCorpus(batch), bench,
        "doc_id", "text")
    }

  /** Streaming WARC ingest — the m08 byte-cursor parser applied to a
    * LIVE crawl output directory through Spark's `binaryFile` FILE
    * source (the production shape: the fetcher appends ~1 GB segment
    * files to a directory, the engine tails it in bounded micro-batches
    * via `maxFilesPerTrigger`): each batch's (path, content) rows run
    * the stateless `Warc.parseRecords` kernel in `foreachBatch`, the
    * stream holds ZERO state, and per-FILE independence (a WARC file
    * parses alone, by construction) makes the drained record set equal
    * the batch parse under any file-to-batch assignment — st28 shares
    * m08's bit-exact census twin verbatim. The harness materializes
    * `files` (a [[graft.ops.Warc.buildFiles]] frame) into real files
    * driver-side, standing in for the fetcher; in production the
    * directory already exists and this helper is just
    * readStream-binaryFile → foreachBatch(parseRecords).
    *
    * `filesPerTrigger` is the micro-batch sizing knob (guide §2.2:
    * fewer, larger batches — per-trigger scheduler overhead is fixed,
    * so 3 files/trigger made the sf0.1 exhibit pay ~34 engine
    * round-trips for 100 tiny segments, ~70% of its wall). Per-FILE
    * independence makes the drained set equal the batch parse under
    * ANY slicing (OpsSpec pins a 2-files-per-trigger witness next to
    * the default), so the default is sized for ingest throughput: 25
    * keeps the sf0.1 drain a genuine multi-trigger stream at ~4
    * round-trips. */
  def warcIngestServe(spark: SparkSession, files: DataFrame,
      filesPerTrigger: Int = 25): DataFrame = {
    // The fixture materialization below is a DRIVER-side collect (it
    // stands in for the fetcher writing the directory); hard-bound it
    // so nobody points the exhibit harness at a real corpus frame.
    // Bound = 256 segments (the sf0.1 exhibit legitimately carries 100
    // — the first cut at 64 silently broke the sf0.1 phase, caught by
    // the round-15 per-SF verify sweep). ONE job: limit(bound+1) stops
    // the scan right past the bound, and the collected rows are reused
    // for the writes (a separate count() would execute the whole
    // file-assembly pipeline twice).
    val rows = files.select(col("path"), col("content").cast("binary"))
      .limit(257).collect()
    require(rows.length <= 256,
      s"warcIngestServe materializes its fixture on the driver and is " +
        s"bounded to <= 256 segment files (got > 256); in production " +
        s"the crawl directory already exists — readStream the real path")
    val tmp = java.nio.file.Files.createTempDirectory("graft_warc_stream")
    // Temp fixture deleted as soon as the harness exits on ANY path —
    // including a failure before the stream even starts (a write
    // throwing, readStream throwing). Not a JVM shutdown hook:
    // repeated invocations in tests/Bench would accumulate hooks and
    // undeleted-until-exit directories.
    try {
      rows.foreach { r =>
        java.nio.file.Files.write(tmp.resolve(r.getString(0) + ".warc"),
          r.getAs[Array[Byte]](1)): Unit
      }
      // The binaryFile source's fixed schema, stated explicitly — a
      // streaming file source never infers (the m09 argument, enforced
      // by the API here).
      val binarySchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType)))
      val src = spark.readStream.format("binaryFile")
        .schema(binarySchema)
        .option("maxFilesPerTrigger", filesPerTrigger)
        .load(tmp.toString)
      val buf = java.util.Collections.synchronizedList(
        new java.util.ArrayList[org.apache.spark.sql.Row]())
      @volatile var outSchema: Option[org.apache.spark.sql.types.StructType] =
        None
      val fn: (DataFrame, Long) => Unit = (batch, _) => {
        val out = graft.ops.Warc
          .parseRecords(batch.select(col("path"), col("content"))).toDF()
        outSchema = Some(out.schema)
        buf.addAll(java.util.Arrays.asList(out.collect(): _*)): Unit
      }
      val q = src.writeStream.foreachBatch(fn).start()
      try q.processAllAvailable() finally q.stop()
      val sch = outSchema.getOrElse(
        org.apache.spark.sql.catalyst.ScalaReflection
          .schemaFor[graft.ops.WarcRecord].dataType
          .asInstanceOf[org.apache.spark.sql.types.StructType])
      spark.createDataFrame(buf, sch)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(tmp.toFile)
    }
  }

  /** Streaming tokenizer-fertility monitor — the t53 census kept live
    * at ingest (the per-language mix/fertility dashboard a crawl
    * operator watches): each micro-batch contributes its per-language
    * PARTIAL sums (`TextAnalysis.fertilitySums` — pure integer sums,
    * associative and order-independent), the drained partials re-merge
    * with one languages-sized aggregation, and the fixed-point ratios
    * (`fertilityRatios`, the single shared definition) apply ONCE to
    * the merged totals — never per batch, which would average ratios
    * instead of summing masses. Zero stream state; the drained frame
    * equals batch t53 bit-for-bit under any batch slicing and shares
    * its DuckDB twin verbatim. */
  def fertilityServe(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.sum
    val partials = runDrainedForeachBatch(spark, dir, "documents",
        documentsSchema, "fertility") { batch =>
      graft.ops.TextAnalysis.fertilitySums(batch)
    }
    graft.ops.TextAnalysis.fertilityRatios(
      partials.groupBy("lang").agg(
        sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"),
        sum("n_chars").as("n_chars"), sum("n_bytes").as("n_bytes"),
        sum("n_words").as("n_words")))
  }

  /** Streaming CCNet perplexity-bucket corpus card (st31) — t56 kept
    * live at ingest, the quality-gate dashboard a crawl operator
    * watches fill: the unigram LM is a STATIC broadcast artifact
    * (CCNet's own architecture — the reference LM is trained once on
    * a reference corpus and shipped; models change by RELEASE, not by
    * micro-batch — the t36/t31 artifact-serving idiom), and each
    * document micro-batch scores statelessly against it
    * (`TextAnalysis.scoreAgainstUnigramLm`: a document's
    * (n_tokens, logprob_fp) row depends only on its own text and the
    * frozen LM), so the drained scored frame equals the batch scoring
    * under any batch slicing. The CARD — per-language ntile tranches
    * + exact BIGINT aggregates — applies ONCE over the drained frame:
    * tranche boundaries are corpus-relative, so running them per
    * batch would rank each batch against itself (the same
    * masses-not-ratios rule as st27). Zero stream state; with the LM
    * fit on the same corpus there is no OOV and the result equals
    * batch t56 bit-for-bit — it shares t56's DuckDB twin verbatim.
    * At 100 TB the post-drain card swaps to the sort-free
    * `ccnetBucketsSampled` boundary form, whose quantile sketch is
    * MERGEABLE across the drained per-batch partials — same
    * scored-row schema, no per-language sort anywhere. */
  def ccnetServe(spark: SparkSession, dir: String, lm: DataFrame,
      buckets: Int = 3): DataFrame = {
    val scored = runDrainedForeachBatch(spark, dir, "documents",
        documentsSchema, "ccnet") { batch =>
      graft.ops.TextAnalysis.scoreAgainstUnigramLm(batch, lm)
        .join(batch.select(col("doc_id"), col("lang")), "doc_id")
    }
    graft.ops.TextAnalysis.ccnetCardExact(scored, buckets = buckets)
  }

  /** Streaming tokenizer serving — the t36 Viterbi encode applied at
    * ingest time (tokenizer-as-a-service, the artifact-serving half of
    * the t35 lifecycle): the trained vocabulary is a static broadcast
    * artifact (tokenizers change by RELEASE, not by micro-batch), and
    * each document micro-batch runs the stateless mapPartitions
    * Viterbi kernel through `foreachBatch` — batch-engine logic the
    * incremental planner cannot run, the st19 idiom; the stream holds
    * ZERO state. Encoding is per-document, so per-batch outputs union
    * to the batch encode regardless of how the source splits batches:
    * the drained summary equals t36 bit-for-bit and shares its pinned
    * oracle (OpsSpec asserts the row equality). */
  def tokenizerServeCounts(spark: SparkSession, dir: String,
      vocab: Seq[(String, Long)]): DataFrame = {
    import org.apache.spark.sql.functions.{count => cnt}
    val enc = runDrainedForeachBatch(spark, dir, "documents",
        documentsSchema, "tokserve") { batch =>
      graft.ops.UnigramTokenizer.encode(batch, vocab)
        .select(col("doc_id"),
          col("n_pieces").cast("long").as("n_pieces"), col("pieces"))
    }.localCheckpoint(true)
    val tot = enc
      .agg(cnt(lit(1)).as("n_docs"), sum(col("n_pieces")).as("total_pieces"))
      .head()
    val voc = enc.select(explode(col("pieces")).as("p"))
      .agg(count_distinct(col("p"))).head().getLong(0)
    import spark.implicits._
    if (tot.getLong(0) == 0L)
      Seq((0L, 0L, 0L)).toDF("n_docs", "total_pieces", "n_vocab")
    else Seq((tot.getLong(0), tot.getLong(1), voc))
      .toDF("n_docs", "total_pieces", "n_vocab")
  }

  /** Streaming quality-classifier serving — batch t31's model-apply
    * carried to ingest time (the st12 fitted-model pattern): the
    * ridge-logistic model is TRAINED batch-side over the resident
    * corpus and passed in — in the declared st20 it is the persisted
    * t31 artifact ([[graft.ops.Classifier.loadModel]]; models retrain
    * by release, not by micro-batch) — and its fixed-point weights
    * ship in the task binary; the document stream then runs the PURE STATELESS
    * scoring projection (same hashed featurization, same exact-Long
    * margin, bit-identical score_fp to the batch path) with a bounded
    * complete-mode summary on top. Emits t31's exact five-column
    * summary row — shared pinned oracle; OpsSpec asserts equality
    * against the batch query. */
  def classifierServeCounts(spark: SparkSession, dir: String,
      model: graft.ops.Classifier.LogisticModel): DataFrame = {
    import org.apache.spark.sql.functions.{count => cnt}
    val label = col("pred_lang") === "en"
    val wHash = (model.weightsFp :+ model.biasFp)
      .foldLeft(17L)((h, x) => h * 31L + x)
    runDrainedOn(spark, dir, "documents", documentsSchema, "clsserve") { src =>
      graft.ops.Classifier.scoreQuality(
          graft.ops.TextAnalysis.languageId(src), model, label)
        .groupBy()
        .agg(
          cnt(lit(1)).as("n_docs"),
          sum(when(col("pred"), 1L).otherwise(0L)).as("n_pred_pos"),
          sum(when(col("pred") === (col("y") === 1L), 1L).otherwise(0L))
            .as("n_agree"),
          sum(col("score_fp")).as("score_mass"))
    }.withColumn("w_hash", lit(wHash))
  }

  /** Streaming benchmark decontamination — batch d09's scale shape
    * carried to ingest time: the benchmark n-gram set is a STATIC
    * artifact (eval suites change by release, not by micro-batch), so
    * it is built once batch-side, hashed to 8-byte keys, and broadcast;
    * the document stream then runs a PURE STATELESS projection — grams
    * generated in-row (`array_distinct` before any explode), hashed by
    * the engine (`transform` + `xxhash64`), membership counted against
    * the broadcast set. Zero streaming state, append mode: the one
    * streaming surface here that needs neither watermark nor store,
    * which is exactly why decontamination belongs at ingest. The UDF is
    * the same bounded set-probe class as d09's Bloom carrier (no
    * built-in set-membership expression); swap the exact set for the
    * Bloom + exact-verify pair past ~100s of MB of benchmark grams.
    * Output is bit-equal to batch d09 (asserted in OpsSpec) and shares
    * its DuckDB oracle. */
  def decontaminateCounts(spark: SparkSession, dir: String, n: Int = 3): DataFrame = {
    val bench = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 20 === 0)
      .select(explode(array_distinct(graft.ops.Dedup.shingles(col("text"), n))).as("s"))
      .select(xxhash64(col("s")).as("g")).distinct()
      .collect().map(_.getLong(0)).toSet // bounded: the eval suite is small
    val bc = spark.sparkContext.broadcast(bench)
    val nHits = udf((hs: Seq[Long]) => hs.count(bc.value.contains))
    // runDrainedOn returns a MATERIALIZED local frame, so the broadcast
    // has no live consumers after the drain — destroy it to honor the
    // leak-nothing contract across repeated invocations.
    try runDrainedOn(spark, dir, "documents", documentsSchema, "decon") { src =>
      val grams = array_distinct(graft.ops.Dedup.shingles(col("text"), n))
      src.filter(col("doc_id") % 20 =!= 0)
        .select(col("doc_id"), grams.as("grams"))
        .select(col("doc_id"),
          size(col("grams")).cast("long").as("n_grams"),
          nHits(transform(col("grams"), g => xxhash64(g))).cast("long")
            .as("n_contaminated"))
        .withColumn("contaminated_frac",
          col("n_contaminated").cast("double") / col("n_grams"))
    } finally bc.destroy()
  }

  /** Exact µs of a Timestamp (getTime alone floors to ms). */
  def tsMicros(ts: java.sql.Timestamp): Long =
    ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L

  /** The per-invocation state transition of the watermark-buffered
    * sessionizer (shared with the cross-batch disorder test).
    *
    * Incoming events join the buffered tail; everything with event time
    * STRICTLY below the watermark is finalized in (ts, event_id) order —
    * safe, because the watermark operator guarantees no later-arriving
    * row can carry an earlier event time — and folded into the O(1)
    * running counters. The still-ambiguous tail (bounded by the
    * watermark delay) stays buffered. The emitted row is the optimistic
    * fold of counters plus tail, so the final emission after the source
    * drains covers every event even if no further batch arrives. */
  def sessionStep(
      userId: Long,
      rows: Iterator[(Long, Long)],
      state: GroupState[SessBufState]): Iterator[UserSessionsSeq] = {
    val prior = state.getOption.getOrElse(SessBufState(Long.MinValue, 0L, 0L, Vector.empty, 0L))
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val all = (prior.buf ++ rows).sortBy(identity)
    val (ripe, young) = all.partition(_._1 < wmUs)

    def fold(st: (Long, Long, Long), tsUs: Long): (Long, Long, Long) = {
      val (last, sessions, events) = st
      val fresh = last == Long.MinValue || tsUs - last > 1800000000L
      (tsUs, sessions + (if (fresh) 1 else 0), events + 1)
    }
    val folded = ripe.foldLeft((prior.lastTsUs, prior.sessions, prior.events)) {
      (st, e) => fold(st, e._1)
    }
    val view = young.foldLeft(folded) { (st, e) => fold(st, e._1) }

    val seq = prior.seq + 1
    state.update(SessBufState(folded._1, folded._2, folded._3, young, seq))
    // Re-arm an event-time timeout just past the watermark so groups
    // with a buffered tail but no new data still get invoked to
    // finalize it as the watermark advances.
    if (young.nonEmpty)
      state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1800000L)
    Iterator.single(UserSessionsSeq(userId, view._2, view._3, seq))
  }

  /** Custom stateful streaming: per-user session counting (30-minute gap
    * rule) via `flatMapGroupsWithState` with an event-time timeout and a
    * watermark-bounded sort buffer. Unlike a sort-within-batch
    * implementation, a late event arriving in a LATER micro-batch (but
    * inside the watermark delay) is still sessionized in correct event
    * order, because nothing below the watermark is finalized early —
    * cross-batch disorder is exercised in OpsSpec. Drained to
    * completion, the result must equal the batch sessionization. */
  def sessionCountsStateful(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val updates = runDrained(spark, dir, "sessions") { src =>
      // The watermarked TIMESTAMP column must survive into the typed
      // Dataset (event-time timeout requires the watermark tag on an
      // input column); µs conversion happens inside the lambda.
      src.withColumn("tsm", tsCol(spark, dir))
        .withWatermark("tsm", "1 day")
        .select(col("tsm"), col("event_id"), col("user_id"))
        .as[(java.sql.Timestamp, Long, Long)]
        .groupByKey(_._3)
        .flatMapGroupsWithState[SessBufState, UserSessionsSeq](
          OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
          (uid, it, st) => sessionStep(uid, it.map(r => (tsMicros(r._1), r._2)), st)
        }
        .toDF()
    }
    // Update mode appends one row per user per micro-batch; the tagged
    // sequence number picks the latest emission (session counts are NOT
    // monotone under late arrivals — a late event can merge two
    // provisional sessions — so max(n_sessions) would be wrong).
    updates
      .groupBy("user_id")
      .agg(max_by(struct(col("n_sessions"), col("n_events")), col("seq")).as("fin"))
      .select(col("user_id"), col("fin.n_sessions").as("n_sessions"),
        col("fin.n_events").as("n_events"))
  }
}
