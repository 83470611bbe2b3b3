package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque BINARY columns with typed
  * metadata, decoded / feature-extracted / frame-sampled via distributed
  * per-partition transforms.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked DETERMINISTIC STUB (derives fake dimensions/features
  * from the raw bytes). Everything around it — the binary schema, the
  * mapPartitions batch shape, partition-preserving execution, frame
  * explode — is real and tested; swapping the stub for a JNI/codec call
  * changes no plumbing.
  */
object Multimodal {

  /** A decoded media row: fake metadata derived deterministically from
    * bytes. */
  final case class MediaMeta(
      doc_id: Long,
      media_size: Long,
      width: Int,
      height: Int,
      channels: Int,
      feature8: Array[Float])

  /** Wrap a text table as opaque media blobs (the fixture has no real
    * binary column; production would read image/audio bytes directly). */
  def asMedia(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.select(col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("media"),
      lit("application/octet-stream").as("media_type"))

  /** STUB decode: in production this calls the codec; here dimensions and
    * an 8-float feature vector are derived from the bytes so the
    * distributed plumbing (schema, batching, partition shape) is
    * exercised end-to-end and remains deterministic. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val w = 16 + (bytes.length % 624)
    val h = 16 + (if (bytes.nonEmpty) bytes(0) & 0xff else 0)
    val feats = Array.tabulate(8)(i =>
      if (bytes.length > i) (bytes(i) & 0xff) / 255.0f else 0.0f)
    (w, h, 3, feats)
  }

  /** Distributed decode: one pass per partition over the binary column
    * (the Scala analog of a batched decode UDF — rows stream through
    * without driver involvement). */
  def decode(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, c, f) = decodeStub(bytes)
          MediaMeta(id, bytes.length.toLong, w, h, c, f)
        }
      }
  }

  /** A media row with its extracted feature vector. */
  final case class MediaFeatures(doc_id: Long, media_size: Long, features: Array[Float])

  /** STUB batch feature kernel — in production this is one model forward
    * pass over the whole batch (the reason batching exists); here each
    * blob maps to its deterministic byte-derived 8-float vector. */
  def featureKernelStub(batch: Array[Array[Byte]]): Array[Array[Float]] =
    batch.map(bytes => Array.tabulate(8)(i =>
      if (bytes.length > i) (bytes(i) & 0xff) / 255.0f else 0.0f))

  /** Batched feature extraction — the Scala analog of a Pandas-UDF
    * `mapInPandas` pipeline: the kernel receives a BATCH of blobs at
    * once (the shape model inference needs to amortize per-call
    * overhead), never one row at a time and never the whole partition.
    * `batchSize` bounds peak task memory at batchSize × blob size
    * regardless of partition size; rows stream through per partition
    * with no driver involvement. The kernel is pluggable so tests can
    * instrument the exact batch shapes delivered. */
  def extractFeatures(
      media: DataFrame,
      batchSize: Int = 64,
      kernel: Array[Array[Byte]] => Array[Array[Float]] = featureKernelStub): Dataset[MediaFeatures] = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val feats = kernel(batch.iterator.map(_._2).toArray)
          require(feats.length == batch.length,
            s"kernel returned ${feats.length} results for a batch of ${batch.length}")
          batch.iterator.zip(feats.iterator).map { case ((id, bytes), f) =>
            MediaFeatures(id, bytes.length.toLong, f)
          }
        }
      }
  }

  /** STUB resize: computes the target dimensions a real resampler would
    * produce (aspect-preserving to `targetW` wide) from the decoded
    * metadata — pure deterministic arithmetic (floor(x+0.5), not
    * banker's rounding, so it is engine-portable). The pixel resample
    * itself is the codec stub's job in production. */
  def resize(meta: DataFrame, targetW: Int = 64): DataFrame =
    meta
      .withColumn("new_w", lit(targetW))
      .withColumn("new_h",
        greatest(lit(1),
          floor(col("height") * lit(targetW.toDouble) / col("width") + lit(0.5)).cast("int")))

  /** Frame sampling: split each blob into fixed-size frames and emit one
    * row per sampled frame (every `stride`-th). Pure Column ops —
    * codegen'd, no UDF. */
  def sampleFrames(media: DataFrame, frameSize: Int = 64, stride: Int = 2): DataFrame = {
    val nFrames = ceil(length(col("media")).cast("double") / frameSize).cast("int")
    media
      .withColumn("n_frames", nFrames)
      // sequence(0, -1) would yield [0, -1] (Spark sequences auto-step
      // backward), so zero-frame media must map to an empty array — the
      // explode then drops the row, matching the oracle semantics.
      .withColumn("frame_id",
        explode(when(col("n_frames") > 0,
          filter(sequence(lit(0), col("n_frames") - 1), i => i % stride === 0))
          .otherwise(array().cast("array<int>"))))
      .withColumn("frame",
        expr(s"substring(media, frame_id * $frameSize + 1, $frameSize)"))
      .select(col("doc_id"), col("n_frames"), col("frame_id"), length(col("frame")).as("frame_len"))
  }
}
