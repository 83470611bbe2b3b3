package graft.tools

/** Per-query wall-time diagnostic: runs ONE declared query N times under
  * Bench's exact session config (shared via [[graft.Bench.session]] —
  * not a copy, so the two surfaces cannot drift) and sink (the noop
  * full-materialization writer) and prints every sample plus the
  * median — the tool behind per-round drift diagnosis (round 11:
  * n02_knn_incremental read 9.41 s against round 9's 5.70 s with 93 MB
  * flat shuffle; the single driver sample cannot distinguish a
  * regression from shared-JVM swing, so this prints the distribution).
  *
  * {{{ sbt "runMain graft.tools.TimeQuery n02_knn_incremental /root/testdata/sf0.1 5" }}}
  *
  * Args: query name (required), fixture dir (default sf0.1), sample
  * count (default 5). After Bench's warm-up, the target query runs
  * ONCE UNTIMED: any session-memoized prebuilt artifact it
  * deliberately reads (n02's prior graph, n01's serving graph — the
  * phases Bench times separately as `*_build`) is built in that pass,
  * so every TIMED sample measures the declared operation only. The
  * untimed pass is printed for transparency, excluded from the
  * median. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: TimeQuery <queryName> [sfDir] [samples]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val n = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = graft.Bench.session()
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; declared: " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
    graft.Bench.warmUp(spark, sfDir)
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val build = once()
    println(f"[timequery] $name artifact-build pass (untimed): $build%.2f s")
    val ts = (1 to n).map { i =>
      val g0 = graft.Bench.gcMillis()
      val t = once()
      // The GC delta attributes a wall outlier: a ~10 s sample with
      // ~10 s of collection time is heap pressure, one with ~0 is
      // scheduler/JIT swing.
      println(f"[timequery] $name sample $i: $t%.2f s" +
        s" gc_ms=${graft.Bench.gcMillis() - g0}")
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
