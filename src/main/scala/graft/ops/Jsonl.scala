package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON object per line) ingest/egress — the other
  * container curated corpora actually ship in (Dolma, OSCAR, FineWeb
  * publish JSONL shards; m08's WARC is what the FETCHER writes, this
  * is what the CURATOR publishes). Closes the loop the same way m08
  * did for raw crawl bytes: serialize deterministically, parse back
  * with the engine's native JSON machinery, prove the round trip
  * bit-lossless by census. (The reference has no ingest surface at
  * all — `/root/reference/src/main/scala/com/github/fvictorio/nnd/
  * NND.scala:66` consumes pre-parsed vectors.)
  *
  * Scale shape: [[buildFiles]] shuffles once on the segment key with
  * per-segment memory bounded by the segment's byte size (the caller
  * picks shard granularity — the same ~1 GB crawl convention as
  * WARC); [[parseLines]] is a pure per-file projection — split on
  * newlines + Spark's native `from_json` per line, no shuffle, no
  * driver state, parallelism = file count. JSON escaping makes the
  * newline framing sound: a JSON string literal can never contain a
  * RAW newline (it is escaped as \n), so line split is exact — the
  * framing argument WARC needs Content-Length for comes free here.
  */
object Jsonl {

  /** Serialize rows into JSONL-shaped files: one output row per
    * `segCol` value — `(path, n_lines, content)` — with one canonical
    * `to_json` object per input row, lines in ascending `idCol` order
    * (deterministic under any partitioning: the per-segment set is
    * sorted before joining). One groupBy on the segment key is the
    * only shuffle. */
  def buildFiles(df: DataFrame, cols: Seq[String], idCol: String = "doc_id",
      segCol: String = "seg"): DataFrame =
    // The ordering key is the RAW id column (struct array_sort handles
    // any orderable type) — a lossy cast("long") would turn a string id
    // into a silent NULL sort key and scramble the documented
    // deterministic ascending-id line order.
    df.select(col(segCol), col(idCol).as("__id"),
        to_json(struct(cols.map(col): _*)).as("__line"))
      .groupBy(col(segCol))
      .agg(count(lit(1)).as("n_lines"),
        array_join(transform(array_sort(collect_list(
          struct(col("__id"), col("__line")))), x => x("__line")), "\n")
          .as("content"))
      .select(concat(lit("jsonl-"), col(segCol)).as("path"),
        col("n_lines"), col("content"))

  /** Parse JSONL files back into typed rows with the engine's native
    * `from_json` against an EXPLICIT schema (never schema inference —
    * a 100 TB ingest cannot afford a sampling pass, and inference
    * drifts with the data). PERMISSIVE shape with the corrupt-record
    * column contract: a malformed line yields `parse_ok = false` with
    * null fields — never a dropped row, never an exception — so the
    * census can price the garbage rate, the property a real dump
    * ingest is graded by. (The corrupt column is the detection
    * mechanism: PERMISSIVE from_json returns an all-null struct for
    * garbage, indistinguishable from a legitimate `{}` line without
    * it.) Emits (path, line_index, parse_ok, schema fields...). Pure
    * per-file projection; zero shuffle. */
  def parseLines(files: DataFrame, schema: StructType,
      pathCol: String = "path", contentCol: String = "content"): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt"),
      "schema must not declare the reserved _corrupt field")
    val sch = schema.add("_corrupt", org.apache.spark.sql.types.StringType)
    files.select(col(pathCol).as("path"),
        posexplode(split(col(contentCol), "\n", -1)))
      .select(col("path"), col("pos").as("line_index"),
        from_json(col("col"), sch, Map(
          "mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt")).as("rec"))
      .withColumn("parse_ok", col("rec._corrupt").isNull)
      .select(col("path") +: col("line_index") +: col("parse_ok") +:
        schema.fieldNames.toSeq.map(f => col(s"rec.$f").as(f)): _*)
  }
}
