package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** L5 — multimodal columns (SURVEY.md §2.10): image/audio/video payloads
  * as opaque `binary` columns with a typed metadata struct, exactly the
  * schema-on-read pattern of the reference's raw frames (S2,
  * ssidentity.h:36-42).
  *
  * The Spark-side plumbing — schema, per-partition batch iteration,
  * output shape — is real and tested; the codec itself is a STUB (the
  * container ships no image/audio libraries): `FakeDecoder` derives
  * deterministic pseudo-features from the payload bytes. Swapping in a
  * real decoder changes only the body of [[FakeDecoder.decode]].
  *
  * At 100 TB: payloads stay in parquet binary columns (never shuffled —
  * feature extraction is map-only `mapPartitions`), features are slim
  * numeric columns that downstream joins/aggs shuffle instead.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, media_type: String,
      n_bytes: Int, width: Int, height: Int, mean_luma: Double)

  /** STUB decoder — deterministic fake in place of a real codec. */
  object FakeDecoder {
    /** "Decode" a payload: byte-derived pseudo dimensions + mean
      * luminance. Real impl would call an image/audio library here. */
    def decode(doc_id: Long, mediaType: String, payload: Array[Byte]): MediaFeatures = {
      val n = payload.length
      val w = 16 + (math.abs(java.util.Arrays.hashCode(payload)) % 64)
      val h = 16 + (n % 64)
      val luma = if (n == 0) 0.0
        else payload.iterator.map(b => (b & 0xff).toDouble).sum / n
      MediaFeatures(doc_id, mediaType, n, w, h,
        math.round(luma * 10000).toDouble / 10000)
    }
  }

  /** Wrap the documents table as a fake media table: utf-8 text bytes
    * stand in for encoded payloads (binary column + metadata columns). */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Feature extraction: map-only, batched per partition (the plan shape
    * a vectorized/Pandas-style UDF would have — one iterator pass per
    * partition, no shuffle of payload bytes). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .mapPartitions(_.map(r => FakeDecoder.decode(r.doc_id, r.media_type, r.payload)))
  }

  /** End-to-end: documents → media table → features, as a DataFrame for
    * the driver contract (rows-only check; the codec is a stub). */
  def mediaFeatures(spark: SparkSession, docs: DataFrame): DataFrame =
    extractFeatures(spark, asMediaTable(docs)).toDF()
      .orderBy("doc_id")

  final case class ResizedMedia(doc_id: Long, media_type: String,
      width: Int, height: Int, payload: Array[Byte])
  final case class FrameSample(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Resize stub: real impl would decode + scale; the stub downsamples
    * the payload bytes to the target "pixel" budget deterministically.
    * Map-only batched-per-partition, like every codec step — payload
    * bytes never shuffle. */
  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .mapPartitions(_.map { r =>
        val budget = math.max(1, w * h)
        val step = math.max(1, r.payload.length / budget)
        val out = r.payload.indices.by(step).take(budget)
          .map(r.payload).toArray
        ResizedMedia(r.doc_id, r.media_type, w, h, out)
      })
  }

  /** Time-based frame-sampling SCHEDULE — the planning half of video
    * curation, split from the decode: given per-asset duration, emit
    * the (frame_idx, ts_ms) sample points at `strideMs` spacing capped
    * at `maxFrames` per asset (uniform sampling with a budget — the
    * standard video-training recipe). Pure integer column arithmetic
    * (ceil-division via (d + s − 1) DIV s), map-only, codegen'd — so
    * the schedule for 100 TB of video plans at scan speed and only the
    * scheduled frames are ever handed to the (expensive) decoder,
    * which consumes this as its work list. Non-positive durations
    * yield no rows. */
  def frameSchedule(assets: DataFrame, idCol: String, durationMsCol: String,
      strideMs: Long, maxFrames: Int): DataFrame = {
    require(strideMs > 0, s"strideMs must be > 0 (got $strideMs)")
    require(maxFrames > 0, s"maxFrames must be > 0 (got $maxFrames)")
    assets
      .withColumn("n_frames",
        least(expr(s"($durationMsCol + ${strideMs - 1}L) DIV ${strideMs}L"),
          lit(maxFrames.toLong)))
      .filter(col("n_frames") > 0)
      .select(col(idCol), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1L)).as("frame_idx"))
      .withColumn("ts_ms", col("frame_idx") * lit(strideMs))
  }

  /** L5e — media container-header parse, pure binary builtins: the S2
    * fixed-offset pattern (ssidentity.h:36-42) applied to media bytes.
    * Reads a PNG header from a BinaryType `payloadCol`: validates the
    * 8-byte magic, then big-endian u32 width/height and the bit-depth
    * byte from the IHDR chunk at their fixed offsets (PNG spec — IHDR
    * is always first, so offsets 17/21/25 are structural, not a
    * heuristic). Invalid magic → valid=false, null dims — never a
    * thrown row.
    *
    * Everything is `substring`-on-binary + `conv(hex(...))` — codegen'd
    * builtins inside one WholeStageCodegen span, no UDF: header
    * triage of 100 TB of media runs at scan speed and only rows that
    * pass (right codec, sane dims) are handed to the expensive decode
    * stub ([[FakeDecoder]]). Column pruning keeps the payload out of
    * any downstream shuffle: the emitted columns are slim scalars. */
  val PngMagicHex = "89504E470D0A1A0A"
  def parsePngHeader(media: DataFrame, payloadCol: String): DataFrame = {
    val p = col(payloadCol)
    def beU32(off: Int) = // 1-based offset, 4 bytes, big-endian
      conv(hex(substring(p, off, 4)), 16, 10).cast("long")
    val valid = hex(substring(p, 1, 8)) === lit(PngMagicHex) &&
      length(p) >= 26
    media
      .withColumn("png_valid", valid)
      .withColumn("width", when(valid, beU32(17)))
      .withColumn("height", when(valid, beU32(21)))
      .withColumn("bit_depth",
        when(valid, conv(hex(substring(p, 25, 1)), 16, 10).cast("long")))
      .drop(payloadCol)
  }

  /** Frame-sample stub for video payloads: every `stride`-th fixed-size
    * chunk of the payload stands in for a decoded frame. One input row
    * fans out to ≤ maxFrames slim rows — the explode happens AFTER the
    * (stubbed) decode so only sampled frames ever materialize. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameBytes: Int = 64, stride: Int = 4, maxFrames: Int = 8): Dataset[FrameSample] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .filter(_.media_type == "video")
      .mapPartitions(_.flatMap { r =>
        val nChunks = math.max(1, r.payload.length / math.max(1, frameBytes))
        (0 until nChunks by stride).take(maxFrames).iterator.map { i =>
          val from = i * frameBytes
          val until = math.min(from + frameBytes, r.payload.length)
          FrameSample(r.doc_id, i, java.util.Arrays.copyOfRange(r.payload, from, until))
        }
      })
  }
}
