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

  /** Schema as stored (ts is physical TIMESTAMP(NANOS) → LONG under
    * `nanosAsLong`). */
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Daily tumbling-window counts/sums per event type, computed through a
    * streaming query with a 1-day watermark and drained to completion. */
  def dailyAggregates(spark: SparkSession, dir: String): DataFrame = {
    val name = s"events_stream_daily_${runId.incrementAndGet()}"
    // The file stream source requires a directory; the fixture is a single
    // parquet file, so expose it through a temp dir of symlinks.
    val streamDir = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = spark.readStream
      .schema(eventsSchema)
      .parquet(streamDir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(to_date(col("win.start")).as("day"), col("event_type"), col("n"), col("total_value"))

    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // Materialize: the memory table lives in the session; copy out rows so
    // the result survives the query being stopped.
    spark.table(name)
  }

  /** Streaming deduplication: `dropDuplicates` on (user_id, event_type)
    * over the streaming read, then per-type counts — the exactly-once
    * dedup stage an event-ingest pipeline puts in front of downstream
    * aggregation. State here is one row per distinct key; in production
    * the key set is bounded with `dropDuplicatesWithinWatermark` (same
    * plan shape, state evicted past the watermark) — the fixture drains
    * in one batch, so the unbounded form keeps the oracle exact. Drained
    * to completion, must equal batch `SELECT DISTINCT`+count. */
  def dedupCounts(spark: SparkSession, dir: String): DataFrame = {
    val name = s"events_stream_dedup_${runId.incrementAndGet()}"
    val streamDir = java.nio.file.Files.createTempDirectory("graft_events_dedup")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = spark.readStream
      .schema(eventsSchema)
      .parquet(streamDir.toString)
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_distinct_users"))

    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
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
    val name = s"events_stream_join_${runId.incrementAndGet()}"
    val streamDir = java.nio.file.Files.createTempDirectory("graft_events_join")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    def src = spark.readStream
      .schema(eventsSchema)
      .parquet(streamDir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 day")
    val ev = src
      .select(col("user_id").as("e_user_id"), col("event_id"), col("ts").as("e_ts"))
      .withWatermark("e_ts", "1 day")

    val joined = purchases.join(ev,
      col("user_id") === col("e_user_id") &&
        col("e_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("e_ts") < col("p_ts"))
      .select(col("user_id"), col("purchase_id"), col("event_id"))

    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .groupBy("user_id", "purchase_id")
      .agg(count(lit(1)).as("n_prior_events"))
  }

  /** Custom stateful streaming: per-user session counting (30-minute gap
    * rule) via `mapGroupsWithState` — the arbitrary-state surface a
    * production pipeline needs for logic windowed aggregation can't
    * express. State (last event time, session/event counters) persists
    * across micro-batches; events inside a batch are ordered in-group.
    * Drained to completion, the result must equal the batch
    * sessionization (checked in OpsSpec). */
  def sessionCountsStateful(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val name = s"events_stream_sessions_${runId.incrementAndGet()}"
    val streamDir = java.nio.file.Files.createTempDirectory("graft_events_state")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))

    val updateFn = (userId: Long, rows: Iterator[(Long, Long)], state: GroupState[SessState]) => {
      val sorted = rows.toArray.sortBy(identity) // (tsUs, event_id)
      var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
      sorted.foreach { case (tsUs, _) =>
        val newSession = st.lastTsUs == Long.MinValue || tsUs - st.lastTsUs > 1800000000L
        st = SessState(tsUs, st.sessions + (if (newSession) 1 else 0), st.events + 1)
      }
      state.update(st)
      UserSessions(userId, st.sessions, st.events)
    }

    val out = spark.readStream
      .schema(eventsSchema)
      .parquet(streamDir.toString)
      .select(expr("ts div 1000").as("tsUs"), col("event_id"), col("user_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .mapGroupsWithState[SessState, UserSessions](GroupStateTimeout.NoTimeout) {
        (uid, it, st) => updateFn(uid, it.map(r => (r._1, r._2)), st)
      }

    val q = out.writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // The memory sink in Update mode appends one row per user per
    // micro-batch (no upsert); the counters are monotone, so max() per
    // user is the final state regardless of how many batches ran.
    spark.table(name)
      .groupBy("user_id")
      .agg(max(col("n_sessions")).as("n_sessions"), max(col("n_events")).as("n_events"))
  }
}
