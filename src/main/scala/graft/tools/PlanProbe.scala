package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc physical-plan printer for PlanSpec development: runs one
  * declared query at sf0.001 and prints its executed plan. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-plan-probe").master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.Queries.all(args(0))(spark,
      if (args.length > 1) args(1) else "/root/testdata/sf0.001")
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
