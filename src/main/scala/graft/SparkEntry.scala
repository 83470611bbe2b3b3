package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.nnd.NND

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: build the approximate K-NN graph over the embeddings table
    * (reference capability, `/root/reference/src/main/scala/com/github/
    * fvictorio/nnd/NND.scala:66`) and return the neighbor table. */
  def entry(spark: SparkSession): DataFrame = {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("features"),
        col("label").cast("long").as("label"))
    NND.buildGraph(emb, NND.Params(k = 10, maxIterations = 5))
      .filter(col("neighbors").isNotNull)
      .select(col("id").as("vec_id"), col("label"), col("neighbors"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}
