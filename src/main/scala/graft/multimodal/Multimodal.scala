package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `binary` columns plus typed metadata, with decode / feature
  * extraction / resize / frame-sampling as batch `mapPartitions` stages.
  *
  * The actual codec step is a STUB (image/audio libraries are not in
  * this environment): `decodeStub` derives deterministic fake features
  * from the bytes. Everything around it — the schema, the binary column
  * handling, the partition-wise batch shape (decoder state loaded once
  * per partition, exactly like a real libjpeg/ffmpeg handle), the
  * metadata struct — is real and tested, so a real decoder drops in by
  * replacing one function.
  *
  * Scale notes: binaries ride in the row (parquet BYTE_ARRAY) so a 100 TB
  * media table partitions like any other; feature extraction is a narrow
  * map stage; metadata-only queries never touch the blob column thanks to
  * parquet column pruning.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Deterministic media table derived from the documents table: the text
    * bytes stand in for encoded media payloads. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("content"),
      struct(
        (pmod(col("doc_id"), lit(1024)) + 16).cast("int").as("width"),
        (pmod(col("doc_id") * 7, lit(768)) + 16).cast("int").as("height"),
        (pmod(col("doc_id") * 13, lit(60000))).as("duration_ms")).as("meta"))

  /** STUB decode + feature-extract: bytes → fixed-width feature vector.
    * Real implementation would decode pixels/samples here; the fake is a
    * deterministic byte-histogram projection so tests and oracles are
    * stable. Runs partition-wise with one "decoder" per partition. */
  def extractFeatures(df: DataFrame, dim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val contentIdx = df.schema.fieldIndex("content")
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType), nullable = true))
    val rdd = df.rdd.mapPartitions { it =>
      val decoder = new StubDecoder(dim) // per-partition decoder handle
      it.map { row =>
        val bytes = row.get(contentIdx)
        val feats =
          if (bytes == null) null
          else decoder.decodeAndFeaturize(bytes.asInstanceOf[Array[Byte]])
        Row.fromSeq(row.toSeq :+ feats)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Resize: metadata-only transform (a real resize would re-encode the
    * payload; the stub scales the metadata and truncates the payload
    * proportionally, keeping the plumbing honest). */
  def resize(df: DataFrame, maxSide: Int): DataFrame = {
    // Compute the scale from the ORIGINAL meta once, and use it for both
    // the meta rewrite and the payload truncation (recomputing it after
    // the meta swap would always yield ~1.0 and never truncate).
    df.withColumn("_scale", least(lit(1.0),
        lit(maxSide) / greatest(col("meta.width"), col("meta.height")).cast("double")))
      .withColumn("meta", struct(
        floor(col("meta.width") * col("_scale")).cast("int").as("width"),
        floor(col("meta.height") * col("_scale")).cast("int").as("height"),
        col("meta.duration_ms").as("duration_ms")))
      .withColumn("content",
        expr("substring(content, 1, greatest(1, cast(length(content) * _scale as int)))"))
      .drop("_scale")
  }

  /** Frame-sample a "video": emit every `stride`-th byte-window as a
    * frame row (explode). Real impl samples decoded frames; the stride
    * cut keeps the fan-out shape. */
  def sampleFrames(df: DataFrame, stride: Int, frameBytes: Int = 32): DataFrame =
    df.filter(col("media_type") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0),
          greatest(lit(0), floor(length(col("content")) / (stride * frameBytes))
            .cast("int") - 1))))
      .withColumn("frame",
        expr(s"substring(content, frame_idx * $stride * $frameBytes + 1, $frameBytes)"))
      .select(col("doc_id"), col("frame_idx"), col("frame"),
        length(col("frame")).as("frame_len"))

  /** Chunk an "audio" payload into fixed-duration windows: each chunk
    * covers `windowMs` of the clip, with the byte span derived from the
    * metadata duration (bytes-per-ms of THIS clip — variable bitrate
    * across rows, constant within one). The ASR/audio-embedding
    * front-end shape: contiguous windows, last one ragged. */
  def chunkAudio(df: DataFrame, windowMs: Long): DataFrame = {
    val nChunks = greatest(lit(1L),
      ceil(col("meta.duration_ms").cast("double") / windowMs).cast("long"))
    val bytesPerChunk = greatest(lit(1L),
      ceil(length(col("content")).cast("double") / nChunks).cast("long"))
    df.filter(col("media_type") === "audio")
      .withColumn("_n", nChunks)
      .withColumn("_bpc", bytesPerChunk)
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("_n") - 1)))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * windowMs).as("start_ms"),
        least(lit(windowMs), col("meta.duration_ms") - col("chunk_idx") * windowMs)
          .as("chunk_ms"),
        expr("substring(content, cast(chunk_idx * _bpc + 1 as int), cast(_bpc as int))")
          .as("chunk"))
      .withColumn("chunk_len", length(col("chunk")))
  }
}

/** Stand-in for a per-partition codec handle (libjpeg/ffmpeg-like). */
private[multimodal] final class StubDecoder(dim: Int) extends Serializable {
  def decodeAndFeaturize(bytes: Array[Byte]): Array[Float] = {
    val v = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      v(math.floorMod(bytes(i), dim)) += 1.0f
      i += 1
    }
    // L1-normalize the byte histogram
    val s = v.sum
    if (s > 0) { var j = 0; while (j < dim) { v(j) /= s; j += 1 } }
    v
  }
}
