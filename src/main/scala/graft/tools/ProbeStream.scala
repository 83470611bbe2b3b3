package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-18 measurement probe for the streaming drain harness's FIXED
  * cost (VERDICT r17 next-round #3): runs a representative drained
  * micro-batch query (the st01 daily-aggregate shape) standalone, with
  * wall timers around each harness phase (temp-dir setup, query start,
  * drain, stop, sink collect) and the engine's own per-batch
  * `durationMs` breakdown (triggerExecution / queryPlanning /
  * walCommit / addBatch / commitOffsets / getBatch / latestOffset)
  * from `recentProgress`. Read-only diagnostics — not on the bench
  * path; exists so the "where does the ~1-2 s per st-query go" answer
  * in OPTIMIZATION_r18.md is measured, not guessed.
  *
  * {{{ sbt "runMain graft.tools.ProbeStream /root/testdata/sf0.1 3" }}}
  */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.Bench.session()
    graft.Bench.warmUp(spark, dir)

    val eventsSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

    // ts scaling copied from the fixture contract (micros vs nanos is
    // irrelevant to the overhead being measured; day-bucketing only).
    def run(rep: Int): Unit = {
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = {
        val t1 = System.nanoTime()
        System.err.println(f"[probe-stream] rep$rep $tag%-14s ${(t1 - t0) / 1e6}%8.1f ms")
        t0 = t1
      }
      val streamDir = java.nio.file.Files.createTempDirectory("graft_probe_stream")
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      lap("setup")
      val src = spark.readStream.schema(eventsSchema).parquet(streamDir.toString)
      val out = src.withColumn("tsx", timestamp_micros(col("ts")))
        .withWatermark("tsx", "1 day")
        .groupBy(window(col("tsx"), "1 day").as("win"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val name = s"probe_stream_$rep"
      val q = out.writeStream.outputMode("complete").format("memory")
        .queryName(name).start()
      lap("start")
      q.processAllAvailable()
      lap("drain")
      val prog = q.recentProgress
      q.stop()
      lap("stop")
      val rows = spark.table(name).collect()
      spark.catalog.dropTempView(name)
      val children = java.nio.file.Files.list(streamDir)
      try children.forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally children.close()
      java.nio.file.Files.deleteIfExists(streamDir)
      lap(s"collect(${rows.length})")
      prog.foreach { p =>
        val d = p.durationMs
        System.err.println(s"[probe-stream] rep$rep batch${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=$d")
      }
    }
    (1 to reps).foreach(run)
    spark.stop()
  }
}
