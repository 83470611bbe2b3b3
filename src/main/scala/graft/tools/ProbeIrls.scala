package graft.tools

import org.apache.spark.sql.functions._

/** Round-18 measurement probe for the t31/t32 gradient-scan floor
  * (VERDICT r17 next-round #4): splits one multiclass gradient
  * iteration's ~170-250 ms collect into its PLANNING share (analysis +
  * optimization + physical planning + codegen, forced via
  * `queryExecution.executedPlan`) and its EXECUTION share (the
  * collect on the already-planned frame), across 12 iterations with
  * per-iteration weight values exactly like training — so the "plan
  * re-analysis per iteration because weights are literals" hypothesis
  * is measured before anything is rewritten. Read-only diagnostics,
  * not on the bench path.
  *
  * {{{ sbt "runMain graft.tools.ProbeIrls /root/testdata/sf0.1" }}}
  */
object ProbeIrls {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Bench.session()
    graft.Bench.warmUp(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val dim = 256
    val classes = graft.ops.TextAnalysis.langProfiles.map(_._1)
    val labeled = graft.ops.TextAnalysis.languageId(docs)
    val feats = graft.ops.Classifier.featurizeLab(
      labeled, col("pred_lang"), classes, "doc_id", "text", dim)
      .filter(col("lab") >= 0)
      .localCheckpoint(true)
    val rnd = new java.util.Random(7)
    (1 to 12).foreach { it =>
      // fresh weight values per iteration, like the real trajectory
      val w = classes.map(_ => Array.fill(dim)(rnd.nextInt(2000000).toLong - 1000000L))
      val b = classes.map(_ => rnd.nextInt(1000).toLong)
      val t0 = System.nanoTime()
      val frame = graft.ops.Classifier.multiGradFrame(feats, classes, w, b, dim)
      val t1 = System.nanoTime()
      frame.queryExecution.executedPlan // force analyze+optimize+plan
      val t2 = System.nanoTime()
      val n = frame.collect().length
      val t3 = System.nanoTime()
      System.err.println(f"[probe-irls] iter$it%2d build ${(t1 - t0) / 1e6}%6.1f ms  " +
        f"plan ${(t2 - t1) / 1e6}%6.1f ms  exec ${(t3 - t2) / 1e6}%6.1f ms  rows=$n")
    }
    spark.stop()
  }
}
