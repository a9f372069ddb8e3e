package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Core row model of the engine — the reference's in-flight record
  * (`struct _req`, ssidentity.h:46-59) and persistent fact table
  * (`obs`, schema:1-9) unified into one typed row.
  *
  * Deviations from the reference, per SURVEY.md §1.2 (all are the
  * reference's own declared TODOs, ssidentity.c:25-26):
  *   - `ts` is a real TimestampType, not a locale-format string; the
  *     display format ("%x - %I:%M%p") is an edge rendering (F6).
  *   - `sensorId` added for the fleet merge (S5, README.md:12-13).
  *   - `valid` carries the "weird STA" sanitize flag (ssidentity.c:193).
  */
final case class Observation(
    ts: Timestamp,
    mac: String,     // 12 uppercase hex chars, no separators (ssidentity.c:181)
    ssid: String,    // printable bytes; non-printables \xNN-escaped (ssidentity.c:158-177)
    rssi: Int,       // raw byte - 255 (ssidentity.c:185)
    freq: Int,       // MHz, big-endian u16 (ssidentity.c:187-188)
    dist: Double,    // FSPL meters, 2dp (ssidentity.c:283-286, :99)
    sensorId: Long,
    valid: Boolean)

object Observation {
  /** Schema for schema-on-read paths (raw frame parsing, streaming). */
  val schema: StructType = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("mac", StringType, nullable = false),
    StructField("ssid", StringType, nullable = false),
    StructField("rssi", IntegerType, nullable = false),
    StructField("freq", IntegerType, nullable = false),
    StructField("dist", DoubleType, nullable = false),
    StructField("sensorId", LongType, nullable = false),
    StructField("valid", BooleanType, nullable = false)))
}

/** A raw captured frame before parsing (S1/S2): opaque bytes plus
  * capture metadata. Mirrors the `recvfrom` buffer (ssidentity.c:83-84),
  * schema imposed at parse time (schema-on-read, ssidentity.h:36-42). */
final case class RawFrame(ts: Timestamp, sensorId: Long, bytes: Array[Byte])

object RawFrame {
  val schema: StructType = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("sensorId", LongType, nullable = false),
    StructField("bytes", BinaryType, nullable = false)))
}
