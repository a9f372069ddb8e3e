package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SignalFunctions._

/** S2 — the reference's ingest hot path (`parseRaw`, ssidentity.c:134-204)
  * as ONE declarative plan over a `bytes: binary` column. The C version is
  * a hand-fused single pass with selectivity-ordered early exits
  * (ssidentity.c:142-146); here the same fusion and predicate ordering
  * come from whole-stage codegen + Catalyst predicate pushdown — nothing
  * is hand-scheduled.
  *
  * Works identically on a batch DataFrame and a Structured Streaming
  * DataFrame (same plan, incrementalized by the engine) — see
  * `graft.streaming.IngestPipeline`.
  *
  * 1-based offsets = reference's 0-based (ssidentity.h:36-42) + 1.
  */
object FrameParser {
  // ssidentity.h:36-42 (+1 for Spark substring)
  val SubtypeOff = 27      // FRAME_TYPE_OFFSET 26
  val ProtoOff = 24        // ip proto peek (ssidentity.c:138-141)
  val FreqOff = 20         // CHANNEL_FREQ_OFFSET 19
  val RssiOff = 23         // RSSI_OFFSET 22
  val DestMacOff = 31      // DEST_ADDR_OFFSET 30
  val SrcMacOff = 37       // SRC_ADDR_OFFSET 36
  val SsidLenOff = 62      // SSID_LEN_OFFSET 61
  val SsidOff = 63         // SSID_OFFSET 62
  val ProbeRequest = 4     // PROBE_REQ subtype (ssidentity.h:23)

  /** Raw frames → parsed observations. Input schema: (ts timestamp,
    * sensorId long, bytes binary). Output: Observation columns.
    *
    * Predicate chain = P2∧P3∧P4∧P5 (ssidentity.c:144-156); rejected rows
    * are dropped (the reference's NULL-return, P7). */
  def parse(frames: DataFrame): DataFrame = {
    val b = col("bytes")
    val ssidLen = u8(b, SsidLenOff)
    frames
      .withColumn("subtype", frameSubtype(b, SubtypeOff))
      .withColumn("proto", u8(b, ProtoOff))
      // P2: probe-req ∧ broadcast dest ∧ not a known IP protocol
      .filter(col("subtype") === ProbeRequest &&
        isBroadcastMac(b, DestMacOff) && !isKnownIpProtocol(col("proto")))
      // P5: 0 < ssid_len <= 32 (ssidentity.c:155-156)
      .withColumn("ssid_len", ssidLen)
      .filter(col("ssid_len") > 0 && col("ssid_len") <= 32)
      .select({
        // ssid byte slice bound once (the P5 filter already guarantees
        // ssid_len <= 32, so no extra 32-byte cap is needed)
        val ssidBytes = substring(b, SsidOff, 32).substr(lit(1), col("ssid_len"))
        Seq(
          col("ts"),
          macHex(b, SrcMacOff).as("mac"),                            // F3+F4
          sanitizeSsidBytes(ssidBytes).as("ssid"),                   // F5
          decodeRssi(u8(b, RssiOff)).as("rssi"),                     // F7
          beU16(b, FreqOff).as("freq"),                              // F2
          col("sensorId"),
          isPrintable(decode(ssidBytes, "ISO-8859-1")).as("valid"))
      }: _*)
      .withColumn("dist", fsplDistance2dp(col("rssi"), col("freq"))) // F8
  }
}
