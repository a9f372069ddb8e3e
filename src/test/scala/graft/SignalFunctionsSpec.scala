package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.SignalFunctions._

/** Golden-fixture tests (SURVEY.md §5.2): the 4 real rows of the
  * reference's observations.db re-derived from raw field values, plus
  * property checks of the scalar library F1-F10. */
class SignalFunctionsSpec extends SparkTestBase {
  import org.apache.spark.sql.Row

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).collect()(0).get(0)

  test("F8 golden fixture: observations.db distances reproduce exactly") {
    // (rssi, freq) -> stored DIST (ssidentity.c:283-286, 2dp at :99)
    val rows = Seq((-90, 2464, 306.1), (-88, 2464, 243.14), (-84, 2464, 153.41))
    rows.foreach { case (rssi, freq, want) =>
      assert(one(fsplDistance2dp(lit(rssi), lit(freq))) == want,
        s"rssi=$rssi freq=$freq")
    }
  }

  test("F8 monotonicity: distance decreases with stronger signal, " +
      "increases with frequency") {
    val d = (r: Int, f: Int) =>
      one(fsplDistance(lit(r), lit(f))).asInstanceOf[Double]
    assert(d(-90, 2437) > d(-80, 2437))
    assert(d(-80, 2437) > d(-60, 2437))
    assert(d(-70, 5180) < d(-70, 2412))
  }

  test("F7 RSSI decode: raw byte - 255, NOT int8 reinterpret") {
    assert(one(decodeRssi(lit(165))) == -90)  // 0xA5
    assert(one(decodeRssi(lit(167))) == -88)
    assert(one(decodeRssi(lit(255))) == 0)
  }

  test("F4 MAC format: %012lX zero-padded uppercase") {
    assert(one(formatMac(lit(0x28B2BDD02FC8L))) == "28B2BDD02FC8")
    assert(one(formatMac(lit(0xABCL))) == "000000000ABC")
  }

  test("F6 display timestamp: strftime %x - %I:%M%p shape") {
    val ts = Timestamp.valueOf("2016-07-21 11:41:00")
    assert(one(renderTs(lit(ts))) == "07/21/16 - 11:41AM")
    val pm = Timestamp.valueOf("2016-07-21 23:05:00")
    assert(one(renderTs(lit(pm))) == "07/21/16 - 11:05PM")
  }

  test("F5 sanitize: printable verbatim, non-printable \\xNN-escaped") {
    assert(one(sanitizeSsid(lit("HomeWifi-5G"))) == "HomeWifi-5G")
    assert(one(sanitizeSsid(lit("ab"))) == "a\\x01b")
    assert(one(isPrintable(lit("plain ssid"))) == true)
    assert(one(isPrintable(lit("bad"))) == false)
  }

  test("F2 big-endian u16 and F1 subtype extraction") {
    val bytes = lit(Array[Byte](0x09, 0x41.toByte))
    assert(one(beU16(bytes, 1)) == 0x0941)  // 2369
    // frame-control byte 0x40 -> subtype 4 (probe request)
    assert(one(frameSubtype(lit(Array[Byte](0x40.toByte)), 1)) == 4)
  }

  test("F10 console render matches the reference printf shape") {
    val s = one(renderRow(
      lit(Timestamp.valueOf("2016-07-21 11:41:00")), lit("28B2BDD02FC8"),
      lit("myssid"), lit(-90), lit(2464), lit(306.097)))
    assert(s == "07/21/16 - 11:41AM  28B2BDD02FC8  \"myssid\"\t-90dBm 2464mHz  Dist: 306.10m")
  }
}
