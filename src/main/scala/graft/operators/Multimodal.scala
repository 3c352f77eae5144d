package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §7.4): media as opaque
  * `binary` columns with typed metadata, plus feature extraction.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * deterministic stub (hash-derived pseudo-features) — clearly marked —
  * while the Spark-side plumbing is real: schema, per-partition batch
  * processing (one "codec handle" per partition, the mapPartitions
  * analog of a Pandas-UDF batch), frame sampling via binary slicing,
  * and expression-only fast paths that stay inside codegen.
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
    * trade as Dedup.cappedPairs; count dropped hashes for the audit
    * via the returned pairs' complement or a `hotBucketReport`-style
    * pass. Hashes with a single holder can pair with nothing and are
    * dropped by the same filter, so the join input is the rare-frame
    * minority, not the corpus.
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

  private val decodeSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("byte_len", IntegerType),
    StructField("channels", IntegerType),
    StructField("mean_intensity", DoubleType)))

  /** STUB DECODER — per-partition batch decode, the Scala analog of a
    * Pandas UDF over mapInPandas: one "codec" is initialized per
    * partition and reused across the batch (this is where a real
    * libjpeg/ffmpeg handle would live). The decode itself is a
    * deterministic fake: features derived from the raw bytes.
    */
  def decodeStub(withMediaDf: DataFrame): DataFrame = {
    val spark = withMediaDf.sparkSession
    val input = withMediaDf.select(col("doc_id"), col("media"))
    val rdd = input.rdd.mapPartitions { rows =>
      // per-partition "codec" init (a real decoder handle at scale)
      val codec = new PseudoCodec
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val f = codec.decode(bytes)
        Row(id, bytes.length, f._1, f._2)
      }
    }
    spark.createDataFrame(rdd, decodeSchema)
  }

  private val resizeSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media", BinaryType),
    StructField("media_meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("byte_len", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))))

  /** STUB RESIZE — same per-partition batch shape as [[decodeStub]]:
    * payload transformed to the target dimensions' byte budget, the
    * metadata struct rewritten to match. A real implementation swaps
    * PseudoCodec.resize for the codec call; schema and partitioning
    * stay identical.
    */
  def resizeStub(withMediaDf: DataFrame, width: Int, height: Int): DataFrame = {
    val spark = withMediaDf.sparkSession
    val input = withMediaDf.select(col("doc_id"), col("media"))
    val rdd = input.rdd.mapPartitions { rows =>
      val codec = new PseudoCodec
      rows.map { r =>
        val id = r.getLong(0)
        val resized = codec.resize(r.getAs[Array[Byte]](1), width, height)
        Row(id, resized,
          Row("application/octet-stream", resized.length, width, height))
      }
    }
    spark.createDataFrame(rdd, resizeSchema)
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
