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

  test("ORC round-trip preserves rows and values (columnar alternative to parquet)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == docs.schema)
    val a = docs.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("XML round-trip preserves rows and values (Spark 4 native XML source)") {
    // The semi-structured feed format crawl pipelines still meet
    // (sitemaps, RSS, OAI-PMH dumps); Spark 4 ships the XML source
    // natively — no external package.
    val dir = java.nio.file.Files.createTempDirectory("graft_xml").toString
    docs.write.mode("overwrite")
      .option("rootTag", "docs").option("rowTag", "doc")
      .xml(dir)
    val back = spark.read.option("rowTag", "doc").xml(dir)
      .select(docs.columns.map(col): _*)
    val a = docs.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b, s"XML round-trip lost rows: ${a.size} vs ${b.size}")
  }

  test("binaryFile source ingests opaque blobs for the multimodal path") {
    // write a few raw files, read them back as (path, content) rows, and
    // run the multimodal decode over the binary column — the real ingest
    // shape for images/audio (one file = one blob).
    val dir = java.nio.file.Files.createTempDirectory("graft_bin")
    (0 until 5).foreach { i =>
      java.nio.file.Files.write(dir.resolve(f"media_$i%02d.bin"),
        Array.tabulate[Byte](100 + i * 37)(j => ((i * 31 + j) % 251).toByte))
    }
    val media = spark.read.format("binaryFile").load(dir.toString)
      .select(
        regexp_extract(col("path"), "media_(\\d+)\\.bin", 1).cast("long").as("doc_id"),
        col("content").as("media"))
    assert(media.count() == 5)
    val meta = graft.ops.Multimodal.decode(media).collect()
    assert(meta.length == 5)
    assert(meta.forall(m => m.media_size >= 100 && m.width >= 16 && m.feature8.length == 8))
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
