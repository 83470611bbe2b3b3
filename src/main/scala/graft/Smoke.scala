package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke: exercises SparkEntry.entry the way the driver's t1 check
  * does (rows > 0 on sf0.001). Run: `sbt "runMain graft.Smoke"`. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-smoke")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(5, truncate = 60)
    println(s"[smoke] entry rows = ${df.count()}")
    // the config-registered extension path: native functions reachable
    // from plain SQL in this session
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb")
    val sqlRows = spark.sql(
      """SELECT vec_id, vector_dot(embedding, embedding) AS sq_norm,
        |  quantized_dot(vector_quantize(embedding, CAST(0.6 AS DOUBLE)),
        |                vector_quantize(embedding, CAST(0.6 AS DOUBLE))) AS q_sq,
        |  size(random_project(embedding, 16)) AS rp_dim,
        |  size(lsh_buckets(embedding, 8, 4)) AS n_tables
        |FROM emb LIMIT 3""".stripMargin).count()
    println(s"[smoke] SQL-registered vector functions rows = $sqlRows")
    spark.stop()
  }
}
