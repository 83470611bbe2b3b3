package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque BINARY columns with typed
  * metadata, decoded / feature-extracted / frame-sampled via distributed
  * per-partition transforms.
  *
  * Image decode is REAL: `javax.imageio.ImageIO` (JVM-bundled; PNG /
  * JPEG / BMP / GIF) produces true dimensions, channel count, and a
  * luminance-strip feature vector. Audio decode is REAL:
  * `javax.sound.sampled` (JVM-bundled; WAV/AIFF PCM) produces sample
  * rate, frame count, channels, and an RMS energy profile. Video
  * CONTAINER metadata is REAL: an MP4 box walk yields track
  * dimensions, duration, and track count. MULTI-FRAME pixel decode is
  * REAL for the one animation container the JVM ships a codec for
  * (animated GIF, [[animationFrames]]) — per-frame dims + luminance;
  * MP4/MKV frame decode stays a stub (no JVM codec). Blobs nothing
  * claims (the
  * text fixture's fake blobs) fall back to a clearly-marked
  * DETERMINISTIC STUB that derives metadata from the raw bytes, so
  * the distributed plumbing — binary schema, mapPartitions batch
  * shape, partition-preserving execution, frame explode — is
  * exercised end-to-end on any input; swapping in further codecs
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
    (w, h, 3, byteFeatures(bytes))
  }

  /** THE byte-derived 8-float fallback feature vector — single
    * definition shared by the stub decode and both feature kernels so
    * the oracle-pinned formula cannot drift between paths. */
  def byteFeatures(bytes: Array[Byte]): Array[Float] =
    Array.tabulate(8)(i =>
      if (bytes.length > i) (bytes(i) & 0xff) / 255.0f else 0.0f)

  /** Cheap magic-byte sniff for the formats the JVM-bundled readers
    * handle (PNG/JPEG/GIF/BMP). Gate BEFORE ImageIO: the reader-registry
    * probe plus ImageIO's default disk-backed input cache cost a temp
    * file per call, which a decode loop over 100 TB of mostly-non-image
    * blobs must never pay for a miss. */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      (b(0) == 'B' && b(1) == 'M'))

  /** REAL image decode via the JVM-bundled `javax.imageio` codecs
    * (PNG/JPEG/BMP/GIF): true width/height, color-model channel
    * count, and an 8-float feature vector of per-horizontal-strip mean
    * luminance (deterministic pixel arithmetic, resolution-dependent
    * but codec-stable). Returns None when the bytes carry no known
    * image magic or no installed reader claims them — the caller falls
    * back to [[decodeStub]]. Memory-backed input (no ImageIO temp-file
    * cache) and the magic gate keep the miss path allocation-only. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Float])] =
    try {
      readImage(bytes).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        val channels = img.getColorModel.getNumComponents
        val strips = 8
        val sums = new Array[Double](strips)
        val counts = new Array[Long](strips)
        var y = 0
        while (y < h) {
          val s = math.min(strips - 1, y * strips / h)
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            sums(s) += lum
            counts(s) += 1
            x += 1
          }
          y += 1
        }
        val feats = Array.tabulate(strips)(i =>
          if (counts(i) > 0) (sums(i) / counts(i) / 255.0).toFloat else 0.0f)
        (w, h, channels, feats)
      }
    } catch { case _: Exception => None }

  /** Shared decode front door for [[decodeImage]] and
    * [[resizeImageKernel]]: magic-byte gate + memory-backed ImageIO
    * read (no temp-file cache), None when no installed reader claims
    * the bytes — so codec-support changes land in exactly one place. */
  private def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (!looksLikeImage(bytes)) return None
    Option(javax.imageio.ImageIO.read(
      new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))))
  }

  /** Magic-byte sniff for the JVM-bundled `javax.sound.sampled` readers
    * (WAV and AIFF/AIFC) — same rationale as [[looksLikeImage]]: the
    * reader-registry probe must never run on a non-audio blob. */
  private def looksLikeAudio(b: Array[Byte]): Boolean =
    b.length >= 12 && (
      (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') ||
      (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
        b(8) == 'A' && b(9) == 'I' && b(10) == 'F'))

  /** REAL audio decode via the JVM-bundled `javax.sound.sampled` codecs
    * (WAV/AIFF PCM, 8- or 16-bit): returns the media tuple in the
    * kernel's (w, h, c, features) shape with the audio-native mapping
    * `w = sample rate (Hz)`, `h = sample frame count`, `c = channels`,
    * and features = per-eighth RMS amplitude (channel-averaged,
    * normalized to [0,1]) — the temporal energy profile that plays the
    * role the luminance strips play for images. Deterministic integer/
    * double arithmetic; None for anything the gate or the codec
    * rejects (caller falls back to [[decodeStub]]). */
  def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Float])] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    if (!looksLikeAudio(bytes)) return None
    try {
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val bits = fmt.getSampleSizeInBits
        val pcm = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
        // getFrameSize/getSampleRate can be AudioSystem.NOT_SPECIFIED
        // (-1) from a third-party SPI: a negative frameBytes would give
        // a negative frame count and silently return zeroed features
        // where the contract is None -> decodeStub.
        if (frames <= 0 || frames > Int.MaxValue || !pcm ||
            (bits != 8 && bits != 16) ||
            fmt.getFrameSize <= 0 || !(fmt.getSampleRate > 0)) None
        else {
          val channels = fmt.getChannels
          val frameBytes = fmt.getFrameSize
          val data = in.readAllBytes()
          val n = math.min(frames.toInt, data.length / frameBytes)
          val segs = 8
          val sums = new Array[Double](segs)
          val counts = new Array[Long](segs)
          val unsigned = fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
          var f = 0
          while (f < n) {
            // long arithmetic: f*segs overflows Int beyond ~268M frames
            val s = math.min(segs - 1, (f.toLong * segs / n).toInt)
            var c = 0
            var acc = 0.0
            while (c < channels) {
              val off = f * frameBytes + c * (bits / 8)
              val v =
                if (bits == 8) {
                  val raw = data(off) & 0xff
                  ((if (unsigned) raw - 128 else data(off).toInt) / 128.0)
                } else {
                  val (lo, hi) = if (fmt.isBigEndian) (off + 1, off) else (off, off + 1)
                  val raw = ((data(hi) << 8) | (data(lo) & 0xff))
                  ((if (unsigned) (raw & 0xffff) - 32768 else raw.toShort.toInt) / 32768.0)
                }
              acc += v * v
              c += 1
            }
            sums(s) += acc / channels
            counts(s) += 1
            f += 1
          }
          val feats = Array.tabulate(segs)(i =>
            if (counts(i) > 0) math.sqrt(sums(i) / counts(i)).toFloat else 0.0f)
          Some((fmt.getSampleRate.toInt, n, channels, feats))
        }
      } finally in.close()
    } catch { case _: Exception => None }
  }

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** REAL video CONTAINER metadata: an MP4/ISO-BMFF box walk (pure
    * deterministic byte arithmetic, no codec library) over
    * `ftyp`→`moov`→{`mvhd`, `trak`/`tkhd`} yielding the presentation
    * dimensions of the first visual track, the track count, and the
    * movie duration. Kernel mapping: `w/h` = track width/height
    * (16.16 fixed point, integer part), `c` = track count, features =
    * [duration s, timescale, track count, 0…]. Frame DECODE stays an
    * honest stub (no video codec ships with the JVM) — but the
    * metadata a pipeline filters/partitions on (resolution, duration)
    * is parsed from the real container bits. None when the bytes are
    * not a plausible MP4 (no `ftyp`, malformed/64-bit boxes) — the
    * caller falls back to [[decodeStub]]. */
  def decodeVideoMeta(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Float])] = {
    if (bytes.length < 16 ||
      !(bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p')) return None
    try {
      // (contentStart, contentEnd) of the first `tpe` box in [start, end).
      def findBox(start: Int, end: Int, tpe: String): Option[(Int, Int)] = {
        var off = start
        while (off + 8 <= end) {
          val sz = be32(bytes, off)
          // sz < 8 covers 64-bit-size (sz == 1) and to-end (sz == 0)
          // boxes — rare in practice, unsupported here by design.
          if (sz < 8 || off + sz > end) return None
          if (bytes(off + 4) == tpe(0) && bytes(off + 5) == tpe(1) &&
            bytes(off + 6) == tpe(2) && bytes(off + 7) == tpe(3))
            return Some((off + 8, off + sz.toInt))
          off += sz.toInt
        }
        None
      }
      findBox(0, bytes.length, "moov").flatMap { case (ms, me) =>
        val durSec = findBox(ms, me, "mvhd").flatMap { case (bs, be) =>
          if (be - bs < 20) None
          else {
            val version = bytes(bs) & 0xff
            if (version == 0) {
              val timescale = be32(bytes, bs + 12)
              val duration = be32(bytes, bs + 16)
              if (timescale > 0) Some((duration.toDouble / timescale, timescale)) else None
            } else None // v1 (64-bit times) not needed for the tested surface
          }
        }
        // Walk every trak; take the first nonzero tkhd dimensions.
        var tracks = 0
        var w = 0
        var h = 0
        var off = ms
        var ok = true
        while (ok && off + 8 <= me) {
          val sz = be32(bytes, off)
          if (sz < 8 || off + sz > me) ok = false
          else {
            if (bytes(off + 4) == 't' && bytes(off + 5) == 'r' &&
              bytes(off + 6) == 'a' && bytes(off + 7) == 'k') {
              tracks += 1
              findBox(off + 8, off + sz.toInt, "tkhd").foreach { case (bs, be) =>
                // v0 tkhd: ver/flags(4) times(8) id(4) rsvd(4) dur(4)
                // rsvd(8) layer(2) alt(2) vol(2) rsvd(2) matrix(36) w(4) h(4)
                if ((bytes(bs) & 0xff) == 0 && be - bs >= 84 && w == 0) {
                  val tw = (be32(bytes, bs + 76) >> 16).toInt
                  val th = (be32(bytes, bs + 80) >> 16).toInt
                  if (tw > 0 && th > 0) { w = tw; h = th }
                }
              }
            }
            off += sz.toInt
          }
        }
        durSec.map { case (d, ts) =>
          (w, h, tracks,
            Array(d.toFloat, ts.toFloat, tracks.toFloat, 0f, 0f, 0f, 0f, 0f))
        }
      }
    } catch { case _: Exception => None }
  }

  /** Production decode kernel: real codecs/parsers first (image, audio,
    * video container), stub for bytes nothing claims. */
  def decodeKernel(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) =
    decodeImage(bytes).orElse(decodeAudio(bytes)).orElse(decodeVideoMeta(bytes))
      .getOrElse(decodeStub(bytes))

  /** Distributed decode: one pass per partition over the binary column
    * (the Scala analog of a batched decode UDF — rows stream through
    * without driver involvement). The kernel is pluggable; the default
    * tries the real image codecs and falls back to the stub. */
  def decode(
      media: DataFrame,
      kernel: Array[Byte] => (Int, Int, Int, Array[Float]) = decodeKernel): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, c, f) = kernel(bytes)
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
    batch.map(byteFeatures)

  /** Batch feature kernel backed by the REAL image decode (per-strip
    * mean luminance via ImageIO); stub byte-features for blobs no codec
    * claims. In production the batch maps to one model forward pass;
    * the decode step here is already real for images. */
  def imageFeatureKernel(batch: Array[Array[Byte]]): Array[Array[Float]] =
    batch.map(b => decodeImage(b).map(_._4).getOrElse(byteFeatures(b)))

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

  /** Metadata-only resize: computes the target dimensions a resampler
    * produces (aspect-preserving to `targetW` wide) from already-decoded
    * metadata — pure deterministic Column arithmetic (floor(x+0.5), not
    * banker's rounding, so it is engine-portable). For the pixel
    * resample over the raw blobs see [[resizeMedia]]. */
  def resize(meta: DataFrame, targetW: Int = 64): DataFrame =
    meta
      .withColumn("new_w", lit(targetW))
      .withColumn("new_h",
        greatest(lit(1),
          floor(col("height") * lit(targetW.toDouble) / col("width") + lit(0.5)).cast("int")))

  /** A resized media row: original dims, target dims, and the re-encoded
    * pixels (null when no image codec claimed the input — the metadata
    * columns still carry the stub dims so downstream schema is stable). */
  final case class ResizedMedia(
      doc_id: Long,
      width: Int,
      height: Int,
      new_w: Int,
      new_h: Int,
      resized: Array[Byte])

  private def targetDims(w: Int, h: Int, targetW: Int): (Int, Int) =
    (targetW, math.max(1, math.floor(h * targetW.toDouble / w + 0.5).toInt))

  /** REAL pixel resize kernel: ImageIO decode (magic-byte-gated, memory-
    * backed input), aspect-preserving Graphics2D bilinear resample to
    * `targetW` wide, PNG re-encode. None when the gate or the codec
    * rejects the bytes — the caller keeps the deterministic stub-dims
    * path, so the operator works on any blob mix. */
  def resizeImageKernel(bytes: Array[Byte], targetW: Int): Option[ResizedKernelOut] =
    try {
      readImage(bytes).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val (nw, nh) = targetDims(w, h, targetW)
        val out = new java.awt.image.BufferedImage(
          nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, nw, nh, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        ResizedKernelOut(w, h, nw, nh, bos.toByteArray)
      }
    } catch { case _: Exception => None }

  final case class ResizedKernelOut(
      width: Int, height: Int, newW: Int, newH: Int, png: Array[Byte])

  /** Distributed pixel resize over the binary media column: real decode +
    * resample + re-encode for image blobs, stub-dims fallback (resized =
    * null) for bytes nothing claims. Same per-partition streaming shape
    * as [[decode]] — no driver involvement, task memory bounded by one
    * blob plus its resampled output. */
  def resizeMedia(media: DataFrame, targetW: Int = 64): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          resizeImageKernel(bytes, targetW) match {
            case Some(r) => ResizedMedia(id, r.width, r.height, r.newW, r.newH, r.png)
            case None =>
              val (w, h, _, _) = decodeStub(bytes)
              val (nw, nh) = targetDims(w, h, targetW)
              ResizedMedia(id, w, h, nw, nh, null)
          }
        }
      }
  }

  /** 64-bit average-hash (aHash) perceptual fingerprint of an image
    * blob: bilinear-downscale to an 8×8 luminance grid, threshold each
    * cell against the grid total (`64·lum_i > Σlum` — integer
    * arithmetic, no fractional mean), pack bits 0..63. Near-identical
    * images (re-encodes, small edits, resizes) land within a few bits;
    * the classic image-dedup primitive. Non-image blobs take the
    * deterministic stub: the first 64 bytes are the "pixels", same
    * thresholding — SQL-expressible, so the declared query is
    * bit-exactly oracle-checked on the text fixture while the REAL
    * image path is pinned by in-test PNG rendering (OpsSpec). */
  def phashKernel(bytes: Array[Byte]): Long = {
    val cells: Array[Int] =
      (try readImage(bytes) catch { case _: Exception => None }) match {
        case Some(img) =>
          val out = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, 8, 8, null)
          } finally g.dispose()
          Array.tabulate(64) { i =>
            val rgb = out.getRGB(i % 8, i / 8)
            val (r, gc, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
            (299 * r + 587 * gc + 114 * b) / 1000
          }
        case None =>
          Array.tabulate(64)(i => if (bytes.length > i) bytes(i) & 0xff else 0)
      }
    val total = cells.map(_.toLong).sum
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (64L * cells(i) > total) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** Per-row perceptual hash: `(doc_id, phash)`. Distributed as the
    * same per-partition batch shape as [[decode]]. */
  def perceptualHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, phashKernel(bytes)) })
      .toDF("doc_id", "phash")
  }

  /** Image near-dup pairs: all `(doc_a, doc_b)` with phash hamming
    * distance ≤ `maxHamming`, EXACTLY, via 16-bit block banding — a
    * pair within hamming ≤ 3 differs in at most 3 of the 4 blocks, so
    * (pigeonhole) at least one block matches and the equi-join on
    * `(block_idx, block_value)` is guaranteed to surface it; the
    * hamming filter then verifies candidates exactly. Candidate
    * fan-out is Σ_b size(b)² over 16-bit-block buckets (the SimHash
    * banding argument) — linear for a fixed near-dup rate, never the
    * N²/2 all-pairs scan. */
  def phashPairs(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      s"4-block banding covers hamming < 4 only, got $maxHamming")
    val h = perceptualHash(media)
    val blocks = h.select(col("doc_id"), col("phash"),
      explode(array((0 until 4).map(i => struct(lit(i).as("blk"),
        shiftrightunsigned(col("phash"), i * 16)
          .bitwiseAND(lit(0xFFFFL)).as("v"))): _*)).as("b"))
      .select(col("doc_id"), col("phash"), col("b.blk").as("blk"), col("b.v").as("v"))
    blocks.as("a").join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Multi-frame PIXEL decode (m07) — the real animation path for the
    * one multi-frame container the JVM ships a codec for (animated
    * GIF, via the bundled `javax.imageio` GIF plugin; single-frame
    * PNG/JPEG/BMP decode as 1-frame animations). Per sampled frame
    * (every `stride`-th of the container's frame count): true
    * width/height and the mean pixel luminance in 2⁻²⁰ fixed point —
    * the per-frame brightness profile a video-quality gate thresholds
    * on. This closes the video-decode stub to the extent a pure-JVM
    * engine honestly can: MULTI-FRAME pixel decoding is real end to
    * end; containers the JVM has no codec for (MP4/MKV) still fall
    * back to the deterministic stub, which chunks the blob into
    * `frameSize`-byte pseudo-frames (the m02 shape) with byte-derived
    * dims (the [[decodeStub]] conventions) and
    * `luma_fp = ⌊Σbytes·2²⁰ / (255·len)⌋` — pure integer arithmetic
    * the DuckDB twin replicates bit-exactly (the m04 hex-substr
    * idiom). Real-path luminance is `rint(mean/255·2²⁰)` on the
    * decoded ARGB rasters — codec-deterministic; OpsSpec pins it with
    * an in-test ImageIO-written 3-frame GIF.
    *
    * Scale shape: one mapPartitions projection + a per-row bounded
    * explode — zero exchanges, zero joins (OpsSpec pins the
    * no-Exchange plan); the magic-byte gate keeps the 100 TB
    * mostly-non-media miss path allocation-only, exactly like
    * [[decodeImage]]. */
  def animationFrames(media: DataFrame, frameSize: Int = 64,
      stride: Int = 2): DataFrame = {
    require(frameSize >= 1 && stride >= 1,
      s"bad sampling: frameSize=$frameSize stride=$stride")
    val spark = media.sparkSession
    import spark.implicits._
    val fs = frameSize
    val st = stride
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val real: Option[Seq[(Long, Int, Int, Int, Int, Long)]] =
            if (!looksLikeImage(bytes)) None
            else {
              var reader: javax.imageio.ImageReader = null
              var iis: javax.imageio.stream.MemoryCacheImageInputStream = null
              try {
                iis = new javax.imageio.stream.MemoryCacheImageInputStream(
                  new java.io.ByteArrayInputStream(bytes))
                val readers = javax.imageio.ImageIO.getImageReaders(iis)
                if (!readers.hasNext) None
                else {
                  reader = readers.next()
                  reader.setInput(iis)
                  val nf = reader.getNumImages(true)
                  if (nf <= 0) None
                  else Some((0 until nf by st).map { f =>
                    val img = reader.read(f)
                    val w = img.getWidth
                    val h = img.getHeight
                    var sum = 0.0
                    var y = 0
                    while (y < h) {
                      var x = 0
                      while (x < w) {
                        val rgb = img.getRGB(x, y)
                        sum += 0.299 * ((rgb >> 16) & 0xff) +
                          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                        x += 1
                      }
                      y += 1
                    }
                    val lum = if (w > 0 && h > 0)
                      math.rint(sum / (w.toLong * h) / 255.0 * 1048576.0).toLong
                    else 0L
                    (id, nf, f, w, h, lum)
                  })
                }
              } catch { case _: Exception => None }
              finally {
                // Each cleanup swallows its own failure: a throwing
                // dispose() must not skip the stream close, and a
                // throwing close() must not escape the per-row
                // None-on-bad-image contract and fail the whole task.
                if (reader != null)
                  try reader.dispose() catch { case _: Exception => }
                // The stream (and its memory cache) must close with the
                // reader — dispose() alone leaves it for GC.
                if (iis != null)
                  try iis.close() catch { case _: Exception => }
              }
            }
          real.getOrElse {
            // Stub: m02's byte chunking with decodeStub's dim
            // conventions and exact-integer luminance — the SQL twin's
            // formula, bit for bit.
            val nf = (bytes.length + fs - 1) / fs
            (0 until nf by st).map { f =>
              val from = f * fs
              val len = math.min(fs, bytes.length - from)
              var s = 0L
              var i = from
              while (i < from + len) { s += (bytes(i) & 0xff); i += 1 }
              ((id, nf, f, 16 + len % 624, 16 + (bytes(from) & 0xff),
                s * 1048576L / (255L * len)))
            }
          }
        }
      }
      .toDF("doc_id", "n_frames", "frame_id", "w", "h", "luma_fp")
  }

  /** Frame sampling: split each blob into fixed-size frames and emit one
    * row per sampled frame (every `stride`-th). Pure Column ops —
    * codegen'd, no UDF. */
  def sampleFrames(media: DataFrame, frameSize: Int = 64, stride: Int = 2): DataFrame = {
    // Fail fast at the call site: stride = 0 would evaluate i % 0 per
    // element mid-job (ANSI divide-by-zero / silent all-dropped under
    // legacy), frameSize = 0 hits ceil(Infinity) — the extractFeatures
    // batchSize convention.
    require(frameSize >= 1 && stride >= 1,
      s"bad sampling: frameSize=$frameSize stride=$stride")
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
