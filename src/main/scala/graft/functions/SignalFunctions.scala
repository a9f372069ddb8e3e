package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar expression library F1–F10 (SURVEY.md §2.8): the reference's
  * value semantics re-expressed as codegen'd Catalyst expressions
  * (`org.apache.spark.sql.functions._` only — no UDFs in the hot path).
  *
  * All byte offsets below are 1-based (Spark `substring` convention);
  * the reference's 0-based offsets (ssidentity.h:36-42) are +1 here.
  */
object SignalFunctions {

  // ---- binary frame decoding (S2 parser, ssidentity.c:134-204) ----

  /** Unsigned byte read at 1-based offset: 0..255 as int, −1 when the
    * frame is shorter (native expression — the conv(hex(substring))
    * form round-trips every byte through two strings + a radix parse). */
  def u8(bin: Column, off: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.ByteAtExpr(
        org.apache.spark.sql.graft.Bridge.expression(bin), off))

  /** F2 — big-endian u16 at 1-based offset ((b[n]<<8)|b[n+1],
    * ssidentity.c:187-188). */
  def beU16(bin: Column, off: Int): Column =
    shiftleft(u8(bin, off), 8).bitwiseOR(u8(bin, off + 1))

  /** F1 — 802.11 frame subtype: high nibble of the frame-control byte
    * ((b & 0xF0) >> 4, ssidentity.c:136). */
  def frameSubtype(bin: Column, off: Int): Column =
    shiftright(u8(bin, off).bitwiseAND(lit(0xf0)), 4)

  /** F3 — MAC pack: 6 bytes big-endian → u64 (macU8ToU64,
    * ssidentity.c:262-272). 48 bits, fits a signed long. */
  def macPack(bin: Column, off: Int): Column =
    conv(hex(substring(bin, off, 6)), 16, 10).cast("long")

  /** F4 — MAC format: u64 → 12-char zero-padded uppercase hex
    * ("%012lX", ssidentity.c:181). */
  def formatMac(macU64: Column): Column = format_string("%012X", macU64)

  /** MAC string directly from frame bytes (F3+F4 fused — stays in one
    * codegen stage, no intermediate long). */
  def macHex(bin: Column, off: Int): Column =
    upper(hex(substring(bin, off, 6)))

  /** P3 — broadcast-MAC predicate (6 bytes all 0xFF, ssidentity.c:248-256). */
  def isBroadcastMac(bin: Column, off: Int): Column =
    macHex(bin, off) === lit("FFFFFFFFFFFF")

  /** P4 — known-IP-protocol predicate (ICMP/IGMP/TCP/UDP,
    * ssidentity.c:232-239; constants ssidentity.h:18-21). */
  def isKnownIpProtocol(proto: Column): Column = proto.isin(1, 2, 6, 17)

  // ---- value decode / enrich ----

  /** F7 — RSSI decode: raw byte − 255. The reference deliberately does
    * NOT reinterpret as int8 (ssidentity.c:185); reproduce exactly. */
  def decodeRssi(rawByte: Column): Column = rawByte - lit(255)

  /** F8 — inverse free-space-path-loss distance in meters
    * (signalToDistance, ssidentity.c:283-286):
    * 10^((27.55 − 20·log10(freq) + rssi_magnitude)/20); with rssi stored
    * as a negative dBm this is 10^((27.55 − rssi − 20·log10(freq))/20)...
    * matching the C exactly: exp = (27.55 - (20*log10(freq)) + |rssi|)/20.
    * Rounding to 2dp happens at the sink (ssidentity.c:99) — callers that
    * need the stored form use [[fsplDistance2dp]]. */
  def fsplDistance(rssi: Column, freqMhz: Column): Column =
    pow(lit(10.0), (lit(27.55) - lit(20.0) * log10(freqMhz) + abs(rssi)) / lit(20.0))

  /** F8 at sink precision ("%.02f", ssidentity.c:99). */
  def fsplDistance2dp(rssi: Column, freqMhz: Column): Column =
    round(fsplDistance(rssi, freqMhz), 2)

  // ---- rendering (edge only; storage stays typed) ----

  /** F6 — the reference's display timestamp: strftime("%x - %I:%M%p")
    * → "07/21/16 - 11:41AM" (ssidentity.c:210-222). */
  def renderTs(ts: Column): Column = date_format(ts, "MM/dd/yy - hh:mma")

  /** F10 — console row render (printf, ssidentity.c:89-95). */
  def renderRow(ts: Column, mac: Column, ssid: Column, rssi: Column,
      freq: Column, dist: Column): Column =
    format_string("%s  %s  \"%s\"\t%ddBm %dmHz  Dist: %.2fm",
      renderTs(ts), mac, ssid, rssi, freq, dist)

  // ---- SSID sanitize (F5, ssidentity.c:158-177) ----

  private val PrintableRange = "^[\\x20-\\x7E]*$"

  /** Validity flag: true iff every byte is printable ASCII (the row is
    * flagged "weird" otherwise, ssidentity.c:193). */
  def isPrintable(s: Column): Column = s.rlike(PrintableRange)

  /** F5 — SSID sanitize over a string column, pure built-ins: printable
    * chars verbatim, bytes ≤ 0xFF as uppercase \xNN escapes, code
    * points above 0xFF (reachable only via this general string API, not
    * the frame-byte path) as width-4 \uNNNN — NOT truncated to two hex
    * digits, which would collide with unrelated \xNN escapes. Empty
    * input stays empty (split("", "") yields [""], whose ascii() is 0 —
    * unguarded it would fabricate "\x00"). Deviation from the reference
    * (documented, SURVEY.md §7.5): the C version can overrun its
    * 32-byte buffer when escapes expand (ssidentity.c:164-175); we
    * escape without truncation. */
  def sanitizeSsid(s: Column): Column =
    when(length(s) === 0, lit("")).otherwise(array_join(
      transform(split(s, ""), c =>
        when(c.rlike("^[\\x20-\\x7E]$"), c)
          .when(ascii(c) <= 255,
            concat(lit("\\x"), lpad(upper(hex(ascii(c))), 2, "0")))
          .otherwise(concat(lit("\\u"), lpad(upper(hex(ascii(c))), 4, "0")))),
      ""))

  /** F5 over raw bytes (frame parsing path): per-byte escape. Binary has
    * no builtin array view, so route through latin-1 decode which maps
    * bytes 1:1 to U+0000..U+00FF code points. */
  def sanitizeSsidBytes(bin: Column): Column =
    sanitizeSsid(decode(bin, "ISO-8859-1"))
}
