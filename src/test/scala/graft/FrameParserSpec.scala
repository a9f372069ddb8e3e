package graft

import java.sql.Timestamp

import graft.model.RawFrame
import graft.operators.FrameParser

/** S2/P2-P7 — the binary frame parser over synthesized 802.11 probe
  * request frames laid out per ssidentity.h:36-42 (0-based offsets:
  * freq 19, rssi 22, subtype 26, dest 30, src 36, ssid_len 61,
  * ssid 62). */
class FrameParserSpec extends SparkTestBase {

  /** Build a frame with the reference's offsets (0-based). */
  def frame(
      subtype: Int = 4,
      dest: Array[Byte] = Array.fill(6)(0xff.toByte),
      src: Array[Byte] = Array(0x28, 0xb2, 0xbd, 0xd0, 0x2f, 0xc8).map(_.toByte),
      ssid: Array[Byte] = "myssid".getBytes("US-ASCII"),
      ssidLen: Option[Int] = None,
      rssiRaw: Int = 165, // -90 dBm
      freq: Int = 2464,
      proto: Int = 0): Array[Byte] = {
    val b = new Array[Byte](128)
    b(19) = ((freq >> 8) & 0xff).toByte
    b(20) = (freq & 0xff).toByte
    b(22) = rssiRaw.toByte
    b(23) = proto.toByte
    b(26) = ((subtype << 4) & 0xff).toByte
    dest.copyInto(b, 30)
    src.copyInto(b, 36)
    b(61) = ssidLen.getOrElse(ssid.length).toByte
    ssid.copyInto(b, 62)
    b
  }

  implicit class ArrCopy(a: Array[Byte]) {
    def copyInto(dst: Array[Byte], off: Int): Unit =
      System.arraycopy(a, 0, dst, off, a.length)
  }

  def parse(frames: Array[Byte]*): Array[org.apache.spark.sql.Row] = {
    import spark.implicits._
    val df = frames.zipWithIndex
      .map { case (f, i) => RawFrame(new Timestamp(1700000000000L + i), 7L, f) }
      .toDF()
    FrameParser.parse(df).orderBy("ts").collect()
  }

  test("accepts a well-formed probe request and decodes every field") {
    val rows = parse(frame())
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[String]("mac") == "28B2BDD02FC8")
    assert(r.getAs[String]("ssid") == "myssid")
    assert(r.getAs[Int]("rssi") == -90)
    assert(r.getAs[Int]("freq") == 2464)
    assert(r.getAs[Double]("dist") == 306.1)  // golden fixture row 1
    assert(r.getAs[Long]("sensorId") == 7L)
    assert(r.getAs[Boolean]("valid"))
  }

  test("P2 rejects: wrong subtype, unicast dest, known IP protocol") {
    assert(parse(frame(subtype = 8)).isEmpty)                      // beacon
    assert(parse(frame(dest = Array.fill(6)(0x01.toByte))).isEmpty) // not broadcast
    assert(parse(frame(proto = 6)).isEmpty)                        // TCP
    assert(parse(frame(proto = 17)).isEmpty)                       // UDP
  }

  test("P5 rejects out-of-range SSID lengths (0 < len <= 32)") {
    assert(parse(frame(ssidLen = Some(0))).isEmpty)
    assert(parse(frame(ssidLen = Some(33))).isEmpty)
    assert(parse(frame(ssid = Array.fill(32)('a'.toByte))).length == 1)
  }

  test("F5 flags non-printable SSID bytes and escapes them") {
    val weird = Array[Byte]('a'.toByte, 0x01.toByte, 'b'.toByte)
    val rows = parse(frame(ssid = weird))
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("ssid") == "a\\x01b")
    assert(!rows(0).getAs[Boolean]("valid"))
  }

  test("parser is total: arbitrary byte garbage never throws, only drops or flags") {
    // the reference's posture (any protocol may arrive on the raw
    // socket, ssidentity.c:83) — random frames of random lengths,
    // including empty and truncated-below-every-offset, must parse to
    // zero-or-more rows without an exception
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val params = Gen.Parameters.default
    def sample[A](g: Gen[A], s: Long): A =
      Iterator.iterate(Seed(s))(_.next).map(g.apply(params, _))
        .collect { case Some(v) => v }.next()
    val frames = (0 until 200).map { i =>
      val len = sample(Gen.chooseNum(0, 200), 1000L + i)
      Array.tabulate(len)(j => sample(Gen.chooseNum(-128, 127), i * 251L + j).toByte)
    }
    // craft a near-valid frame truncated mid-SSID as an extra edge
    val truncated = frame().take(64)
    val rows = parse(frames :+ truncated: _*)
    rows.foreach { r =>
      assert(r.getAs[String]("mac").length == 12)
      assert(r.getAs[Int]("freq") >= 0)
    }
  }

  test("mixed stream: only valid probe requests survive") {
    val rows = parse(frame(), frame(subtype = 8), frame(proto = 1),
      frame(ssidLen = Some(0)), frame(src = Array.fill(6)(0x11.toByte)))
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("mac")).toSet ==
      Set("28B2BDD02FC8", "111111111111"))
  }
}
