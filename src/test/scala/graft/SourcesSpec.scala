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

  // --- WARC ingest (m08/p10) ---

  private def warcBytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("WARC parser: hand-framed records incl. multibyte payload, CRLF inside payload, " +
      "empty payload — Content-Length framing is byte-exact") {
    // Payload 1 carries a CRLF CRLF INSIDE it (delimiter-split would
    // shear here) plus multibyte UTF-8 (é = 2 bytes: char length 18,
    // byte length 19 — a char-counted parser misframes everything
    // after it). Payload 2 is empty.
    val p1 = "café\r\n\r\nstill body"
    assert(p1.length == 18 && warcBytes(p1).length == 19)
    val file =
      "WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        "WARC-Record-ID: <urn:graft:7>\r\n" +
        "WARC-Target-URI: https://a.example.com/x\r\n" +
        s"Content-Length: ${warcBytes(p1).length}\r\n" +
        "\r\n" + p1 + "\r\n\r\n" +
        "WARC/1.0\r\n" +
        "content-length: 0\r\n" + // header names are case-insensitive
        "WARC-Type: metadata\r\n" +
        "\r\n" + "\r\n\r\n"
    val got = graft.ops.Warc.parseWarcBytes("f", warcBytes(file)).toSeq
    assert(got.size == 2, s"expected 2 records, got ${got.map(_.rec_index)}")
    val r0 = got.head
    assert(r0.warc_type == "response" && r0.record_id == "<urn:graft:7>" &&
      r0.url == "https://a.example.com/x" && r0.content_length == 19L)
    assert(new String(r0.payload, "UTF-8") == p1, "payload must round-trip byte-exactly")
    val r1 = got(1)
    assert(r1.warc_type == "metadata" && r1.url == "" &&
      r1.content_length == 0L && r1.payload.isEmpty)
    assert(r0.rec_offset == 0L && r1.rec_offset > 0L && r1.rec_index == 1)
  }

  test("WARC parser: truncation and garbage end the file at the last good record") {
    val good = "WARC/1.0\r\nContent-Length: 4\r\nWARC-Target-URI: u1\r\n\r\nbody\r\n\r\n"
    // (a) payload truncated mid-declared-length
    val truncated = good + "WARC/1.0\r\nContent-Length: 100\r\n\r\nshort"
    assert(graft.ops.Warc.parseWarcBytes("f", warcBytes(truncated)).map(_.url).toSeq
      == Seq("u1"))
    // (b) missing Content-Length
    val noLen = good + "WARC/1.0\r\nWARC-Target-URI: u2\r\n\r\nbody\r\n\r\n"
    assert(graft.ops.Warc.parseWarcBytes("f", warcBytes(noLen)).map(_.url).toSeq
      == Seq("u1"))
    // (c) non-WARC garbage where a version line should be — no
    // fabricated records from resync-into-noise
    val garbage = good + "HTTP/1.1 200 OK\r\nContent-Length: 4\r\n\r\nbody\r\n\r\n"
    assert(graft.ops.Warc.parseWarcBytes("f", warcBytes(garbage)).map(_.url).toSeq
      == Seq("u1"))
    // (d) empty input
    assert(graft.ops.Warc.parseWarcBytes("f", Array.emptyByteArray).isEmpty)
  }

  test("WARC buildFiles -> parseRecords round-trips every (id, url, payload) row") {
    import spark.implicits._
    val rows = Seq(
      (1L, "https://a.example.com/1", "alpha beta", "s0"),
      (2L, "https://a.example.com/2", "", "s0"), // empty body
      (42L, "https://b.example.com/q?x=1", "gamma é世 delta", "s1"),
      (7L, "https://a.example.com/7", "zeta", "s0"))
      .toDF("doc_id", "url", "html", "seg")
    val files = graft.ops.Warc.buildFiles(rows)
    assert(files.count() == 2)
    assert(files.filter(col("path") === "s0").head().getLong(1) == 3L)
    val got = graft.ops.Warc.parseRecords(files).collect()
      .map(r => (r.record_id, r.url, new String(r.payload, "UTF-8"), r.path))
      .toSet
    val want = rows.collect().map(r =>
      (s"<urn:graft:${r.getLong(0)}>", r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(got == want, s"round-trip diverged: $got vs $want")
    // In-file order is ascending id (deterministic serialization).
    val s0 = graft.ops.Warc.parseRecords(files.filter(col("path") === "s0"))
      .collect().sortBy(_.rec_index).map(_.record_id).toSeq
    assert(s0 == Seq("<urn:graft:1>", "<urn:graft:2>", "<urn:graft:7>"))
  }

  private val jsonlSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text",
      org.apache.spark.sql.types.StringType)))

  test("JSONL buildFiles -> parseLines round-trips values incl. JSON-hostile text") {
    import spark.implicits._
    val d = Seq(
      (0L, "plain text", 0L),
      (1L, "quotes \" and \\ backslash", 0L),
      (2L, "embedded\nnewline and\ttab", 0L), // the framing stressor: a raw
                                              // newline must escape, not split
      (3L, "unicode é中", 1L),
      (4L, "", 1L) // empty string survives as "", not null
    ).toDF("doc_id", "text", "seg")
    val files = graft.ops.Jsonl.buildFiles(d, Seq("doc_id", "text"))
    assert(files.count() == 2, "one file per segment")
    val parsed = graft.ops.Jsonl.parseLines(files, jsonlSchema).collect()
      .map(r => r.getLong(3) -> ((r.getBoolean(2), r.getString(4)))).toMap
    assert(parsed.size == 5 && parsed.values.forall(_._1),
      s"all five lines must parse: $parsed")
    val want = Map(0L -> "plain text", 1L -> "quotes \" and \\ backslash",
      2L -> "embedded\nnewline and\ttab", 3L -> "unicode é中", 4L -> "")
    want.foreach { case (id, txt) =>
      assert(parsed(id)._2 == txt, s"doc $id round-trip moved the text")
    }
    // In-file line order is ascending id (deterministic serialization).
    val seg0 = graft.ops.Jsonl.parseLines(
      files.filter(col("path") === "jsonl-0"), jsonlSchema)
      .orderBy("line_index").collect().map(_.getLong(3)).toSeq
    assert(seg0 == Seq(0L, 1L, 2L), s"seg 0 order: $seg0")
  }

  test("JSONL buildFiles: STRING ids order naturally, never through a lossy cast") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // The round-15 ADVICE fix: the in-file ordering key is the RAW id
    // column. With string ids the documented order is the natural
    // (lexicographic) one — and crucially never a silent NULL sort key
    // from cast("long") scrambling the alignment contract.
    val d = Seq(("doc-b", "2nd", 0L), ("doc-a", "1st", 0L),
      ("doc-c", "3rd", 0L)).toDF("doc_id", "text", "seg")
    val files = graft.ops.Jsonl.buildFiles(d, Seq("doc_id", "text"))
    val sch = StructType(Seq(StructField("doc_id", StringType),
      StructField("text", StringType)))
    val order = graft.ops.Jsonl.parseLines(files, sch)
      .orderBy("line_index").collect().map(_.getString(3)).toSeq
    assert(order == Seq("doc-a", "doc-b", "doc-c"),
      s"string ids must serialize in natural ascending order: $order")
  }

  test("attributes sidecar: the alignment census detects a scrambled sidecar") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // The m10 contract: attribute shards align to text shards by
    // (shard, line_index) BECAUSE buildFiles orders both sides by the
    // same id. This witness breaks that premise deliberately (the
    // attribute side serializes in DESCENDING id order via a negated
    // ordering column) and asserts the census's n_aligned counter
    // actually catches it — without this, n_aligned == n_lines would
    // be unfalsified plumbing.
    val d = Seq((0L, "a", 0L), (1L, "bb", 0L), (2L, "ccc", 0L),
      (10L, "x", 1L), (11L, "yy", 1L), (12L, "zzz", 1L))
      .toDF("doc_id", "text", "seg")
    val textShards = graft.ops.Jsonl.buildFiles(d, Seq("doc_id", "text"))
    val attrFrame = d.select(col("doc_id"), (-col("doc_id")).as("ord"),
      length(col("text")).cast("long").as("n_chars"), col("seg"))
    val tSch = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val aSch = StructType(Seq(StructField("doc_id", LongType),
      StructField("n_chars", LongType)))
    def census(attrShards: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val tp = graft.ops.Jsonl.parseLines(textShards, tSch)
        .select(col("path"), col("line_index"), col("doc_id").as("t_id"))
      val ap = graft.ops.Jsonl.parseLines(attrShards, aSch)
        .select(col("path"), col("line_index"), col("doc_id").as("a_id"))
      val r = tp.join(ap, Seq("path", "line_index"))
        .agg(count(lit(1)), sum(when(col("t_id") === col("a_id"), 1L)
          .otherwise(0L))).collect().head
      (r.getLong(0), r.getLong(1))
    }
    val ok = census(graft.ops.Jsonl.buildFiles(attrFrame,
      Seq("doc_id", "n_chars")))
    assert(ok == ((6L, 6L)), s"aligned sidecar must fully align: $ok")
    val bad = census(graft.ops.Jsonl.buildFiles(attrFrame,
      Seq("doc_id", "n_chars"), idCol = "ord"))
    assert(bad._1 == 6L && bad._2 == 2L,
      s"descending-order sidecar must misalign on all but each " +
        s"3-line shard's middle row: $bad")
  }

  test("JSONL parseLines: a malformed line reads parse_ok = false with nulls, never drops") {
    import spark.implicits._
    val files = Seq(
      ("jsonl-bad", 3L,
        "{\"doc_id\":7,\"text\":\"ok\"}\nnot json at all\n{\"doc_id\":9,\"text\":\"also ok\"}")
    ).toDF("path", "n_lines", "content")
    val rows = graft.ops.Jsonl.parseLines(files, jsonlSchema)
      .orderBy("line_index").collect()
    assert(rows.length == 3, "garbage must not drop rows")
    assert(rows(0).getBoolean(2) && rows(0).getLong(3) == 7L)
    assert(!rows(1).getBoolean(2) && rows(1).isNullAt(3) && rows(1).isNullAt(4),
      "the garbage line reads parse_ok = false with null fields")
    assert(rows(2).getBoolean(2) && rows(2).getLong(3) == 9L)
  }
}
