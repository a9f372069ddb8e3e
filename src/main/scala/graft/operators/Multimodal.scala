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
}
