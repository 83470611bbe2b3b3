package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.SimilaritySearch

/** Local tuning harness (not a test): sweeps ANN parameters against the
  * brute-force ground truth on a fixture dir and prints recall + wall
  * time per combo. Run with
  * `sbt "runMain graft.tools.TuneAnn /root/testdata/sf0.1"`.
  *
  * After picking new defaults, re-measure the pinned oracles with
  * [[PinDump]] in the same commit. */
object TuneAnn {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("features"))
      .cache()
    val q = e.filter(col("id") < 20)
    val truth = SimilaritySearch.bruteForceTopK(e, q, 10)
      .select("query_id", "nbr_id").cache()
    val total = truth.count()

    def recall(approx: DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val hits = truth.join(approx.select("query_id", "nbr_id"),
        Seq("query_id", "nbr_id"), "left_semi").count()
      (hits, (System.nanoTime() - t0) / 1e9)
    }

    println(s"== $dir  corpus=${e.count()}  total_truth=$total ==")

    for {
      planes <- Seq(6, 8, 10)
      tables <- Seq(8, 16, 24)
      radius <- Seq(1, 2)
    } {
      // Probed fraction per table: sum_{m<=radius} C(planes,m) / 2^planes.
      // Across L independent tables the expected DISTINCT-candidate
      // fraction is 1-(1-p)^L (the union-bound L·p exceeds 1 for large
      // combos and overstates work — candidates are deduped map-side).
      val perTable = (0 to radius).map(m =>
        (0 until m).foldLeft(1.0)((a, i) => a * (planes - i) / (i + 1))).sum /
        math.pow(2, planes)
      val probed = 1.0 - math.pow(1.0 - perTable, tables)
      val (hits, secs) = recall(
        SimilaritySearch.lshTopK(e, q, 10, planes, tables, radius))
      println(f"lsh planes=$planes tables=$tables radius=$radius " +
        f"probedFrac=$probed%.3f  recall=${hits.toDouble / total}%.3f ($hits/$total)  ${secs}%.1fs")
    }

    for {
      cells <- Seq(16, 32, 64)
      probe <- Seq(4, 8, 16)
      if probe < cells
    } {
      val (hits, secs) = recall(
        SimilaritySearch.ivfTopK(e, q, 10, cells, probe))
      println(f"ivf cells=$cells probe=$probe scanFrac=${probe.toDouble / cells}%.3f  " +
        f"recall=${hits.toDouble / total}%.3f ($hits/$total)  ${secs}%.1fs")
    }
    spark.stop()
  }
}
