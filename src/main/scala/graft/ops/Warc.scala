package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One parsed WARC record. `payload` is the raw Content-Length-framed
  * byte slice (decode/extract downstream); `url` is the
  * WARC-Target-URI header ("" when absent — metadata/info records
  * carry none); `record_id` the WARC-Record-ID ("" when absent).
  * File-level (not nested in the object): Catalyst encoders cannot
  * reach object-nested private classes from generated code. */
final case class WarcRecord(
    path: String,
    rec_index: Int,
    rec_offset: Long,
    warc_type: String,
    record_id: String,
    url: String,
    content_length: Long,
    payload: Array[Byte])

/** WARC-shaped crawl ingest/egress — the container format crawls
  * actually arrive in (one file = a stream of Content-Length-framed
  * records), closing the gap between "a documents table with URLs"
  * and the raw bytes a fetcher writes. (The reference has no ingest
  * surface at all — `/root/reference/src/main/scala/com/github/
  * fvictorio/nnd/NND.scala` consumes pre-parsed vectors; this extends
  * the pipeline family the same way m01–m07 extended it for media
  * blobs.)
  *
  * Scale shape: WARC files are read with Spark's `binaryFile` source
  * (or any (path, content) frame); [[parseRecords]] is ONE linear
  * mapPartitions pass per file — no shuffle, no driver state, records
  * emitted lazily from a byte cursor. Crawl convention caps WARC
  * files at ~1 GB, which is exactly the granularity that makes
  * whole-file rows safe in executor memory; parallelism is the file
  * count (a 100 TB crawl is ~100k files — pure scan-side scale-out).
  * Content-Length framing is the load-bearing part: payloads are
  * arbitrary bytes, so no delimiter split can ever be correct — the
  * parser trusts the declared length and only resynchronizes on the
  * inter-record CRLF CRLF.
  */
object Warc {

  /** Serialize records into WARC-shaped files: one output row per
    * `segCol` value — `(path, n_records, content)` — with records
    * concatenated in ascending `idCol` order (deterministic under any
    * partitioning: the per-segment set is sorted before joining).
    * Each record is the WARC/1.0 response shape: a header block
    * (Type, Record-ID carrying the id, Target-URI, Content-Length in
    * BYTES via octet_length), CRLF CRLF, the payload, CRLF CRLF.
    *
    * The writer takes a STRING payload column (UTF-8 on the wire);
    * [[parseRecords]] is byte-exact regardless. One groupBy on the
    * segment key is the only shuffle; per-segment memory is the
    * segment's byte size — the caller picks crawl-convention segment
    * granularity (~1 GB), the same bound the reader relies on. */
  def buildFiles(records: DataFrame, idCol: String = "doc_id",
      urlCol: String = "url", payloadCol: String = "html",
      segCol: String = "seg"): DataFrame = {
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:graft:"),
      col(idCol).cast("string"),
      lit(">\r\nWARC-Target-URI: "), col(urlCol),
      lit("\r\nContent-Length: "),
      octet_length(col(payloadCol)).cast("string"),
      lit("\r\n\r\n"), col(payloadCol), lit("\r\n\r\n"))
    records
      .select(col(segCol).cast("string").as("path"),
        col(idCol).as("id"), rec.as("rec"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_records"),
        array_join(transform(
          array_sort(collect_list(struct(col("id"), col("rec")))),
          x => x.getField("rec")), "").as("body"))
      .select(col("path"), col("n_records"),
        col("body").cast("binary").as("content"))
  }

  /** Parse `(path, content)` rows into [[WarcRecord]]s — one lazy
    * linear pass per file (see the object scaladoc for the scale
    * contract). Header names are case-insensitive per the WARC spec;
    * a record with no parseable Content-Length, a non-WARC leading
    * line, or a truncated payload ends that FILE's parse at the last
    * good record (crawl files get truncated by dying fetchers; a
    * parser that throws poisons the whole partition, one that
    * resyncs mid-garbage fabricates records). */
  def parseRecords(files: DataFrame, pathCol: String = "path",
      contentCol: String = "content"): Dataset[WarcRecord] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col(pathCol).cast("string"), col(contentCol).cast("binary"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        parseWarcBytes(path, if (bytes == null) Array.emptyByteArray else bytes)
      })
  }

  /** The byte-cursor kernel behind [[parseRecords]] (exposed for the
    * spec's hand-framed fixtures, incl. non-ASCII payloads whose char
    * and byte lengths differ). */
  private[graft] def parseWarcBytes(path: String,
      bytes: Array[Byte]): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var pos = 0
      private var idx = 0
      private var nextRec: WarcRecord = null
      private def lineEnd(from: Int): Int = {
        var i = from
        while (i + 1 < bytes.length &&
          !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
        if (i + 1 < bytes.length) i else -1
      }
      private def advance(): Unit = {
        nextRec = null
        if (pos >= bytes.length) return
        val off = pos.toLong
        // Version line.
        val ve = lineEnd(pos)
        if (ve < 0) return
        val version = new String(bytes, pos, ve - pos, "UTF-8")
        if (!version.startsWith("WARC/")) return
        var p = ve + 2
        // Header lines until the blank one.
        var wType = ""; var recId = ""; var uri = ""; var clen = -1L
        var done = false
        while (!done) {
          val he = lineEnd(p)
          if (he < 0) return
          if (he == p) { done = true; p += 2 } // blank line
          else {
            val line = new String(bytes, p, he - p, "UTF-8")
            val c = line.indexOf(':')
            if (c > 0) {
              val name = line.substring(0, c).trim.toLowerCase
              val value = line.substring(c + 1).trim
              name match {
                case "warc-type" => wType = value
                case "warc-record-id" => recId = value
                case "warc-target-uri" => uri = value
                case "content-length" =>
                  clen = try value.toLong catch { case _: Exception => -1L }
                case _ => ()
              }
            }
            p = he + 2
          }
        }
        if (clen < 0 || p + clen > bytes.length) return // truncated
        val payload = java.util.Arrays.copyOfRange(bytes, p, p + clen.toInt)
        p += clen.toInt
        // Inter-record separator (tolerate EOF right after payload).
        if (p + 4 <= bytes.length && bytes(p) == '\r' && bytes(p + 1) == '\n' &&
          bytes(p + 2) == '\r' && bytes(p + 3) == '\n') p += 4
        else if (p == bytes.length || p + 2 == bytes.length) p = bytes.length
        else return // framing broken — stop at the last good record
        pos = p
        nextRec = WarcRecord(path, idx, off, wType, recId, uri, clen, payload)
        idx += 1
      }
      advance()
      // advance() ran once eagerly; hasNext just reads the lookahead.
      override def hasNext: Boolean = nextRec != null
      override def next(): WarcRecord = {
        val r = nextRec; advance(); r
      }
    }
}
