package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc k-core size prober for picking n15's declared k. */
object CoreProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-core-probe").master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args.toSeq) {
      val g = graft.Queries.knnGraph(spark, dir).select("id", "neighbors")
      val n = g.count()
      for (k <- Seq(6)) {
        val core = graft.ops.GraphSearch.kCore(g, k, mutual = true)
        val row = core.agg(sum(col("in_core")), max(col("n_rounds"))).head()
        println(s"[probe] $dir n=$n k=$k in_core=${row.getLong(0)} rounds=${row.getInt(1)}")
      }
    }
    spark.stop()
  }
}
