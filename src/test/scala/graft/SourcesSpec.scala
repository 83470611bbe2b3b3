package graft

import org.apache.spark.sql.functions._

/** File-format connectors: the engine round-trips its tables through
  * CSV and JSON sources with schema fidelity (the reference has no file
  * connectors at all — SURVEY.md §2.8). */
class SourcesSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("CSV round-trip preserves rows and schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(docs.schema).csv(dir)
    assert(back.count() == docs.count())
    val a = docs.select("doc_id", "text", "lang").collect().map(_.toSeq).toSet
    val b = back.select("doc_id", "text", "lang").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("JSON round-trip preserves rows and values") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.count() == docs.count())
    val a = docs.agg(sum("n_chars"), count(lit(1))).collect().head.toSeq
    val b = back.agg(sum("n_chars"), count(lit(1))).collect().head.toSeq
    assert(a == b)
  }

  test("queries run identically over a CSV-sourced table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_q").toString
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    li.write.mode("overwrite").option("header", "true").csv(dir)
    val csvLi = spark.read.option("header", "true").schema(li.schema).csv(dir)
    val agg = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("l_returnflag").agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
        .collect().map(_.toSeq).toSet
    assert(agg(li) == agg(csvLi))
  }
}
