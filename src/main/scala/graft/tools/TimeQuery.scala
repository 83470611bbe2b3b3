package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query wall-time diagnostic: runs ONE declared query N times under
  * Bench's exact session config and sink (the noop full-materialization
  * writer) and prints every sample plus the median — the tool behind
  * per-round drift diagnosis (round 11: n02_knn_incremental read 9.41 s
  * against round 9's 5.70 s with 93 MB flat shuffle; the single driver
  * sample cannot distinguish a regression from shared-JVM swing, so this
  * prints the distribution).
  *
  * {{{ sbt "runMain graft.tools.TimeQuery n02_knn_incremental /root/testdata/sf0.1 5" }}}
  *
  * Args: query name (required), fixture dir (default sf0.1), sample
  * count (default 5). Build-phase artifacts a query deliberately reads
  * prebuilt (n02's prior, n01's graph) are built ONCE before the first
  * sample — matching Bench, where the *_build phases precede the
  * declared queries — so every sample times the declared operation.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: TimeQuery <queryName> [sfDir] [samples]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val n = args.lift(2).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; declared: " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
    // Bench's warm-up: one relational pass + one tiny NND build so the
    // first sample isn't charged codegen/JIT bring-up.
    try graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => }
    try {
      import org.apache.spark.sql.functions.col
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("features"))
        .limit(256)
      graft.nnd.NND.buildGraph(e, graft.nnd.NND.Params(k = 5, maxIterations = 2)).count()
    } catch { case _: Throwable => }
    val ts = (1 to n).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[timequery] $name sample $i: $t%.2f s")
      t
    }.sorted
    val med =
      if (ts.size % 2 == 1) ts(ts.size / 2)
      else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2.0
    println(f"[timequery] $name samples=" +
      ts.map(t => math.round(t * 100) / 100.0).mkString("[", ",", "]") +
      f" median=$med%.2f")
    spark.stop()
  }
}
