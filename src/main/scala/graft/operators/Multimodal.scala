package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §7.4): media as opaque
  * `binary` columns with typed metadata, plus feature extraction.
  *
  * Image decode/resize are REAL — `javax.imageio` ships in the JDK, so
  * [[decode]]/[[resizeTo]] run actual PNG/BMP/GIF/JPEG codecs inside a
  * `Dataset.mapPartitions` batch (one codec context per partition, the
  * mapInPandas shape). Payloads no reader accepts fall back to the
  * deterministic [[PseudoCodec]], keeping the operators total over
  * mixed corpora. Frame sampling and feature extraction stay
  * expression-only inside codegen.
  */
object Multimodal {

  val frameBytes = 256

  /** Attach a binary media column + metadata struct to a text corpus
    * (the corpus stand-in for image/audio payloads).
    */
  def withMedia(docs: DataFrame): DataFrame =
    docs
      .withColumn("media", encode(col("text"), "UTF-8"))
      .withColumn("media_meta", struct(
        lit("application/octet-stream").as("mime"),
        octet_length(col("media")).as("byte_len"),
        (col("doc_id") % 640 + 1).cast("int").as("width"),
        (col("doc_id") % 480 + 1).cast("int").as("height")))

  /** Expression-only feature extraction — stays in whole-stage codegen:
    * content hash, byte length, frame count (fixed-size chunking).
    */
  def mediaFeatures(withMediaDf: DataFrame): DataFrame =
    withMediaDf.select(
      col("doc_id"),
      col("media_meta.byte_len").as("byte_len"),
      md5(col("media")).as("content_hash"),
      expr(s"(octet_length(media) + ${frameBytes - 1}) div $frameBytes")
        .as("n_frames"))

  /** Frame sampling: split the payload into fixed-size chunks and hash
    * each — the shape of a video frame-sampler (binary in, array of
    * per-frame features out), still pure expressions. An empty payload
    * yields an empty array (guarded: `sequence(0, -1)` would otherwise
    * produce the descending [0, -1] and two phantom frames).
    */
  def frameHashes(withMediaDf: DataFrame): DataFrame =
    withMediaDf.select(
      col("doc_id"),
      when(octet_length(col("media")) > 0,
        transform(
          sequence(lit(0),
            expr(s"(octet_length(media) + ${frameBytes - 1}) div $frameBytes - 1")),
          i => md5(substring(col("media"), (i * frameBytes + 1).cast("int"), lit(frameBytes)))))
        .otherwise(array().cast("array<string>"))
        .as("frame_hashes"))

  /** Frame-overlap near-dup pairs (a < b): docs sharing at least
    * `minShared` DISTINCT frame hashes, via the frame inverted index —
    * the video/image near-dup shape (two encodings of the same asset
    * share sampled-frame fingerprints even when container metadata
    * differs). A frame hash held by more than `maxDocsPerFrame` docs
    * is dropped before pairing: a ubiquitous frame (black frame, logo
    * bumper) would otherwise emit a quadratic pair blowup — the same
    * trade as Dedup.cappedPairs; [[frameHotReport]] is the queryable
    * audit of exactly which frames were dropped and how many pairs
    * each drop skipped. Hashes with a single holder can pair with
    * nothing and are dropped by the same filter, so the join input is
    * the rare-frame minority, not the corpus.
    */
  def frameNearDupPairs(withMediaDf: DataFrame, minShared: Int = 2,
      maxDocsPerFrame: Int = 16): DataFrame = {
    val inst = frameHashes(withMediaDf)
      .select(col("doc_id"), explode(array_distinct(col("frame_hashes"))).as("fh"))
    val pairable = inst.groupBy(col("fh"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2 && col("nd") <= maxDocsPerFrame)
      .select(col("fh"))
    val kept = inst.join(pairable, Seq("fh"), "left_semi")
    kept.select(col("fh"), col("doc_id").as("a"))
      .join(kept.select(col("fh"), col("doc_id").as("b")), Seq("fh"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minShared)
  }

  /** Frames [[frameNearDupPairs]]'s ubiquity cap dropped, with the
    * pair count each drop skipped — the media analog of
    * `Dedup.hotBucketReport`, so the bounded-recall trade is queryable
    * rather than silent. Empty when no frame exceeds the cap.
    */
  def frameHotReport(withMediaDf: DataFrame,
      maxDocsPerFrame: Int = 16): DataFrame =
    frameHashes(withMediaDf)
      .select(col("doc_id"), explode(array_distinct(col("frame_hashes"))).as("fh"))
      .groupBy(col("fh")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxDocsPerFrame)
      .select(col("fh"), col("n_docs"),
        (col("n_docs") * (col("n_docs") - 1) / 2).cast("long").as("skipped_pairs"))

  /** Decoded per-payload features. `width`/`height` are -1 on the
    * pseudo (opaque-payload) path, where the codec can't know them.
    */
  final case class DecodedMedia(doc_id: Long, byte_len: Int, width: Int,
      height: Int, channels: Int, mean_intensity: Double, codec: String)

  final case class MediaMeta(mime: String, byte_len: Int, width: Int, height: Int)
  final case class ResizedMedia(doc_id: Long, media: Array[Byte], media_meta: MediaMeta)

  private val idBytesEnc =
    Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)

  /** Attach a REAL PNG payload per doc: an 8-bit grayscale gradient
    * whose dimensions and pixels are closed-form in doc_id
    * (width = 8 + id%9, height = 8 + id%7, pixel(x,y) =
    * (7x + 13y + id) mod 256), so decode results are oracle-checkable
    * end to end. Generation runs per-partition with one encoder
    * context (ImageIO disk cache off), the same batch shape as
    * [[decode]].
    */
  def withMediaPng(docs: DataFrame): DataFrame =
    docs.select(col("doc_id")).as(Encoders.scalaLong)
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map(id => (id, pngPayload(id)))
      }(idBytesEnc)
      .toDF("doc_id", "media")

  /** The closed-form gradient PNG for [[withMediaPng]] — also the
    * spec's oracle generator. PNG is lossless, so decoded samples
    * equal the formula exactly.
    */
  def pngPayload(id: Long): Array[Byte] = {
    val w = 8 + (id % 9).toInt
    val h = 8 + (id % 7).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((x * 7 + y * 13 + id) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL per-partition batch decode — `Dataset.mapPartitions` with
    * encoders (not `df.rdd`), so the exchange stays in Tungsten rows
    * and the per-partition closure is the only deserialization point.
    * Decodable payloads (PNG/BMP/GIF/JPEG — whatever the JDK's
    * `javax.imageio` readers accept) report true width/height/bands
    * and the exact mean sample intensity; opaque payloads fall back to
    * the deterministic [[PseudoCodec]] so the operator is total over
    * mixed corpora (`codec` says which path fired). One ImageIO
    * context per partition: cache off once, readers reused by the
    * JDK's registry — the mapInPandas batch shape, kept.
    */
  def decode(withMediaDf: DataFrame): Dataset[DecodedMedia] = {
    val enc = Encoders.product[DecodedMedia]
    withMediaDf.select(col("doc_id"), col("media")).as(idBytesEnc)
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val fallback = new PseudoCodec
        rows.map { case (id, bytes) => decodeOne(id, bytes, fallback) }
      }(enc)
  }

  /** Decoded-size ceilings for untrusted payloads: a few-hundred-byte
    * header can DECLARE a raster (or PCM stream) of arbitrary size, so
    * the allocation bound must come from the header fields, checked
    * BEFORE the decoder materializes anything. 64M pixels (a 8k x 8k
    * frame) / 64 MiB of PCM are far above any real corpus payload;
    * anything larger degrades to the pseudo path like every other
    * undecodable payload — the operator stays total and an adversarial
    * input cannot OOM an executor.
    */
  private[graft] val MaxDecodePixels: Long = 64L * 1024 * 1024
  private[graft] val MaxDecodedAudioBytes: Long = 64L * 1024 * 1024

  /** `ImageIO.read` behind a header-first size gate: pick the reader,
    * read width/height from the metadata (no raster allocation), and
    * only then decode. Null for undecodable OR oversized payloads.
    */
  private[graft] def safeImageRead(bytes: Array[Byte]): java.awt.image.BufferedImage =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) null
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            val w = reader.getWidth(0).toLong
            val h = reader.getHeight(0).toLong
            if (w <= 0 || h <= 0 || w * h > MaxDecodePixels) null
            else reader.read(0)
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => null }

  private def decodeOne(id: Long, bytes: Array[Byte],
      fallback: PseudoCodec): DecodedMedia = {
    val img = safeImageRead(bytes)
    if (img == null) {
      val (ch, mean) = fallback.decode(bytes)
      DecodedMedia(id, bytes.length, -1, -1, ch, mean, "pseudo")
    } else {
      val r = img.getRaster
      val w = img.getWidth
      val h = img.getHeight
      val bands = r.getNumBands
      var sum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < bands) { sum += r.getSample(x, y, b); b += 1 }
          x += 1
        }
        y += 1
      }
      DecodedMedia(id, bytes.length, w, h, bands,
        sum / (w.toDouble * h * bands), "imageio")
    }
  }

  /** Decoded audio features; `sample_rate`/`n_frames` are -1 on the
    * pseudo (opaque-payload) path.
    */
  final case class DecodedAudio(doc_id: Long, byte_len: Int, sample_rate: Int,
      n_frames: Long, channels: Int, mean_amplitude: Double, codec: String)

  /** Attach a REAL WAV payload per doc: 8-bit unsigned mono PCM at
    * 8 kHz whose length and samples are closed-form in doc_id
    * (n = 800 + id%100 frames, sample(i) = (7i + id) mod 256) — the
    * audio analog of [[withMediaPng]], decode results oracle-checkable
    * end to end.
    */
  def withMediaWav(docs: DataFrame): DataFrame =
    docs.select(col("doc_id")).as(Encoders.scalaLong)
      .mapPartitions(ids => ids.map(id => (id, wavPayload(id))))(idBytesEnc)
      .toDF("doc_id", "media")

  /** The closed-form PCM WAV for [[withMediaWav]]. WAV PCM is
    * uncompressed, so decoded samples equal the formula exactly.
    */
  def wavPayload(id: Long): Array[Byte] = {
    val n = 800 + (id % 100).toInt
    val samples = new Array[Byte](n)
    var i = 0
    while (i < n) { samples(i) = (((i * 7 + id) % 256) & 0xff).toByte; i += 1 }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode — the same `Dataset.mapPartitions` batch shape
    * as [[decode]], running the JDK's `javax.sound.sampled` parsers
    * (WAV/AIFF/AU): true sample rate, frame count, channel count, and
    * the exact mean sample amplitude (8-bit PCM read unsigned).
    * Payloads no parser accepts fall back to [[PseudoCodec]] features
    * so the operator is total over mixed corpora.
    */
  def decodeAudio(withMediaDf: DataFrame): Dataset[DecodedAudio] = {
    val enc = Encoders.product[DecodedAudio]
    withMediaDf.select(col("doc_id"), col("media")).as(idBytesEnc)
      .mapPartitions { rows =>
        val fallback = new PseudoCodec
        rows.map { case (id, bytes) => decodeAudioOne(id, bytes, fallback) }
      }(enc)
  }

  private def decodeAudioOne(id: Long, bytes: Array[Byte],
      fallback: PseudoCodec): DecodedAudio = {
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    // header-declared stream size gate, mirror of [[safeImageRead]]:
    // frame count x frame size bounds the readAllBytes allocation
    // BEFORE it happens; unknown (-1) frame counts are unboundable and
    // degrade the same way
    def declaredBytes(s: javax.sound.sampled.AudioInputStream): Long = {
      val frames = s.getFrameLength
      if (frames < 0) Long.MaxValue
      else frames * math.max(1, s.getFormat.getFrameSize).toLong
    }
    if (in == null || declaredBytes(in) > MaxDecodedAudioBytes) {
      val (ch, mean) = fallback.decode(bytes)
      DecodedAudio(id, bytes.length, -1, -1L, ch, mean, "pseudo")
    } else {
      val fmt = in.getFormat
      val frames = in.getFrameLength
      val data = in.readAllBytes()
      var sum = 0.0
      var i = 0
      while (i < data.length) { sum += (data(i) & 0xff); i += 1 }
      DecodedAudio(id, bytes.length, fmt.getSampleRate.toInt, frames,
        fmt.getChannels,
        if (data.isEmpty) 0.0 else sum / data.length, "javax.sound")
    }
  }

  /** REAL resize, same per-partition batch shape as [[decode]]:
    * decodable payloads are resampled (area-averaging) to the target
    * dimensions and re-encoded as PNG; opaque payloads take the
    * [[PseudoCodec]] byte-budget path so the output schema is total.
    * The metadata struct is rewritten to match the new payload.
    */
  def resizeTo(withMediaDf: DataFrame, width: Int, height: Int): Dataset[ResizedMedia] = {
    val enc = Encoders.product[ResizedMedia]
    withMediaDf.select(col("doc_id"), col("media")).as(idBytesEnc)
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val fallback = new PseudoCodec
        rows.map { case (id, bytes) =>
          val img = safeImageRead(bytes)
          if (img == null) {
            val out = fallback.resize(bytes, width, height)
            ResizedMedia(id, out,
              MediaMeta("application/octet-stream", out.length, width, height))
          } else {
            val dst = new java.awt.image.BufferedImage(width, height, img.getType match {
              case 0 => java.awt.image.BufferedImage.TYPE_INT_ARGB // TYPE_CUSTOM
              case t => t
            })
            val g = dst.createGraphics()
            g.drawImage(img.getScaledInstance(width, height,
              java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            val out = bos.toByteArray
            ResizedMedia(id, out, MediaMeta("image/png", out.length, width, height))
          }
        }
      }(enc)
  }

  final case class MediaPHash(doc_id: Long, phash_hi: Long,
    phash_lo: Long, codec: String)

  /** Perceptual average-hash (aHash) over REAL decoded rasters: the
    * image is average-pooled onto an 8x8 grid (pixel (x, y) lands in
    * cell (x*8/w, y*8/h) — plain integer floor division), and bit c is
    * set iff cell c's mean sample exceeds the image's global mean.
    * Near-identical images (re-encodes, small edits) collide; that
    * makes the hash the standard content-level media dedup key, one
    * step beyond byte-level dedup (media_dedup) and frame hashing.
    *
    * INTEGER-EXACT by construction: both means are ratios of integer
    * sums, and the comparison is done cross-multiplied
    * (cell_sum * n_pixels > total_sum * cell_n), so there is no float
    * division, no summation-order sensitivity, and a closed-form
    * oracle replays every bit. (Bound: samples are CLAMPED to 8 bits
    * — ImageIO can hand back 16-bit rasters whose raw samples would
    * push cell_sum * n past 2^63 — so cell_sum <= 255 * 64M pixels
    * times n <= 64M stays under 2^63 thanks to [[MaxDecodePixels]].
    * The clamp saturates >8-bit samples at 255; hash bits for such
    * images remain well-defined and deterministic, just coarser.)
    * The 64 bits ship as two non-negative 32-bit halves so neither
    * engine touches the sign bit. Undecodable payloads degrade to
    * (-1, -1, "pseudo") — the operator stays total. Band 0 only
    * (grayscale contract; a luma mix would slot in per sample).
    */
  def perceptualHash(withMediaDf: DataFrame): Dataset[MediaPHash] = {
    val enc = Encoders.product[MediaPHash]
    withMediaDf.select(col("doc_id"), col("media")).as(idBytesEnc)
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          val img = safeImageRead(bytes)
          if (img == null) MediaPHash(id, -1L, -1L, "pseudo")
          else {
            val r = img.getRaster
            val w = img.getWidth
            val h = img.getHeight
            // >8-bit rasters downscale by bit depth (sample >> extra
            // bits) instead of clamping at 255: a clamp saturates
            // typical 16-bit content (most samples >> 255) to a
            // uniform raster, so unrelated bright images would all
            // hash to the same degenerate value and falsely pair in
            // phash near-dup matching; the shift preserves both the
            // 8-bit overflow bound and relative brightness.
            val shift = math.max(0, r.getSampleModel.getSampleSize(0) - 8)
            val cellSum = new Array[Long](64)
            val cellN = new Array[Long](64)
            var total = 0L
            var y = 0
            while (y < h) {
              val cy = y * 8 / h
              var x = 0
              while (x < w) {
                val c = cy * 8 + x * 8 / w
                val v = math.min(r.getSample(x, y, 0) >> shift, 255).toLong
                cellSum(c) += v
                cellN(c) += 1
                total += v
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            var hi = 0L
            var lo = 0L
            var c = 0
            while (c < 64) {
              if (cellSum(c) * n > total * cellN(c)) {
                if (c < 32) lo |= 1L << c else hi |= 1L << (c - 32)
              }
              c += 1
            }
            MediaPHash(id, hi, lo, "imageio")
          }
        }
      }(enc)
  }

  /** Deterministic stand-in for a media codec. */
  final class PseudoCodec {
    def decode(bytes: Array[Byte]): (Int, Double) = {
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
      val channels = 1 + (bytes.length % 3)
      val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
      (channels, mean)
    }

    /** Fake resample: cycle the source bytes into the target byte
      * budget (one byte per target pixel) — deterministic, size-exact.
      */
    def resize(bytes: Array[Byte], width: Int, height: Int): Array[Byte] = {
      val out = new Array[Byte](math.max(0, width * height))
      if (bytes.nonEmpty) {
        var i = 0
        while (i < out.length) { out(i) = bytes(i % bytes.length); i += 1 }
      }
      out
    }
  }
}
