package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke: exercises SparkEntry.entry the way the driver's t1 check
  * does (rows > 0 on sf0.001). Run: `sbt "runMain graft.Smoke"`. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(5, truncate = 60)
    println(s"[smoke] entry rows = ${df.count()}")
    spark.stop()
  }
}
