package graft

import graft.operators.Multimodal

/** L5 — multimodal plumbing (schema, batch shape, fan-out) plus the
  * REAL image codec: PNG payloads round-trip through javax.imageio.
  * Audio/video codecs remain documented stubs. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "an image document with some payload text"),
    (1L, "an audio document"),
    (2L, "a video document whose bytes get frame-sampled into chunks " * 4),
    (3L, "another image"),
    (5L, "one more video document with a long enough payload body " * 6))
    .toDF("doc_id", "text")

  test("media table: binary payload + typed metadata, type from id") {
    val m = Multimodal.asMediaTable(docs)
    assert(m.schema("payload").dataType.typeName == "binary")
    val types = m.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("media_type")).toMap
    assert(types(0L) == "image" && types(1L) == "audio" && types(2L) == "video")
  }

  test("feature extraction is deterministic, map-only, full coverage") {
    val f = Multimodal.mediaFeatures(spark, docs).collect()
    assert(f.length == 5)
    val byId = f.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Int]("n_bytes") == "an audio document".length)
    assert(byId.values.forall(r => r.getAs[Double]("mean_luma") > 0))
    // image rows went through the REAL codec: dims are the encoder's
    // (4 + id%13, 4 + len%11), not the pseudo-feature shape
    val text0 = "an image document with some payload text"
    assert(byId(0L).getAs[Int]("width") == 4 &&
      byId(0L).getAs[Int]("height") == 4 + (text0.length % 11))
    // deterministic: same input -> identical features
    val again = Multimodal.mediaFeatures(spark, docs).collect()
    assert(f.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("PNG codec round-trip: gray8 encode → ImageIO decode is exact; corrupt degrades") {
    // 3×2 gray image, known pixels → mean luma is their exact mean
    val pix = Array[Byte](10, 20, 30, 40, 50, 60)
    val png = Multimodal.Decoder.encodePngGray(3, 2, pix)
    val Some((w, h, luma)) = Multimodal.Decoder.decodeImage(png)
    assert((w, h) == ((3, 2)))
    assert(math.abs(luma - 35.0) < 1e-9, s"exact mean of the 6 samples: $luma")
    // decode() routes via magic triage and rounds to 4 dp
    val feats = Multimodal.Decoder.decode(7L, "image", png)
    assert((feats.width, feats.height, feats.mean_luma) == ((3, 2, 35.0)))
    // corrupt body (magic intact): falls back to pseudo-features, no throw
    val corrupt = png.clone()
    corrupt(png.length / 2) = (corrupt(png.length / 2) ^ 0x5a).toByte
    val fb = Multimodal.Decoder.decode(8L, "image", corrupt)
    assert(fb.n_bytes == corrupt.length)
    // non-PNG payload never reaches ImageIO
    val txt = Multimodal.Decoder.decode(9L, "audio", "not a png".getBytes)
    assert(txt.n_bytes == 9)
  }

  test("resize: payload shrunk to the pixel budget, metadata carried") {
    val r = Multimodal.resize(spark, Multimodal.asMediaTable(docs), 4, 4).collect()
    assert(r.length == 5)
    r.foreach { m =>
      assert(m.width == 4 && m.height == 4)
      assert(m.payload.length <= 16)
    }
  }

  test("frame schedule: ceil-division frame counts, cap, stride, empty assets") {
    import spark.implicits._
    val assets = Seq(
      (1L, 4500L),   // ceil(4500/2000) = 3 frames
      (2L, 2000L),   // exactly one stride → 1 frame
      (3L, 50000L),  // ceil = 25 → capped at 4
      (4L, 0L),      // empty asset → no rows
      (5L, -10L))    // negative duration → no rows
      .toDF("asset_id", "duration_ms")
    val got = graft.operators.Multimodal
      .frameSchedule(assets, "asset_id", "duration_ms", strideMs = 2000L, maxFrames = 4)
      .orderBy("asset_id", "frame_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 0L, 0L), (1L, 3L, 1L, 2000L), (1L, 3L, 2L, 4000L),
      (2L, 1L, 0L, 0L),
      (3L, 4L, 0L, 0L), (3L, 4L, 1L, 2000L), (3L, 4L, 2L, 4000L), (3L, 4L, 3L, 6000L)))
    intercept[IllegalArgumentException](graft.operators.Multimodal
      .frameSchedule(assets, "asset_id", "duration_ms", 0L, 4))
  }

  test("L5e header parse: real PNG bytes round-trip; corrupt/short rows degrade to invalid") {
    // a REAL 1×1 PNG header (magic + IHDR len/type + w=1, h=1, depth 8):
    // the parser must agree with the spec, not just with our synthesizer
    val realPng: Array[Byte] = Array(
      0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, // magic
      0x00, 0x00, 0x00, 0x0D, 0x49, 0x48, 0x44, 0x52, // len=13, "IHDR"
      0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x02, 0x80, // w=1, h=640
      0x08, 0x06).map(_.toByte)
    val corrupt = realPng.clone(); corrupt(0) = 0x00
    val short = realPng.take(20)
    val df = Seq((1L, realPng), (2L, corrupt), (3L, short))
      .toDF("doc_id", "payload")
    val got = Multimodal.parsePngHeader(df, "payload")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toMap
    assert(got(1L) == ((true, Some(1L), Some(640L), Some(8L))))
    assert(got(2L) == ((false, None, None, None)))
    assert(got(3L) == ((false, None, None, None)))
    // payload dropped: only slim scalars leave the operator
    assert(!Multimodal.parsePngHeader(df, "payload").columns.contains("payload"))
  }

  test("WAV header parse: hand-built RIFF bytes read back; corrupt/short invalid") {
    import org.apache.spark.sql.functions.col
    // 44-byte PCM WAV header: 2ch, 44100 Hz, 16-bit -> block 4, rate 176400
    def le(v: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(k => ((v >> (8 * k)) & 0xff).toByte)
    val wav = "RIFF".getBytes ++ le(36 + 800, 4) ++ "WAVEfmt ".getBytes ++
      le(16, 4) ++ le(1, 2) ++ le(2, 2) ++ le(44100, 4) ++ le(176400, 4) ++
      le(4, 2) ++ le(16, 2) ++ "data".getBytes ++ le(800, 4)
    val corrupt = wav.clone(); corrupt(0) = 'X'.toByte
    val rows = Seq((1L, wav), (2L, corrupt), (3L, wav.take(20)))
      .toDF("doc_id", "payload")
    val got = Multimodal.parseWavHeader(rows, "payload").orderBy("doc_id").collect()
    val ok = got(0)
    assert(ok.getAs[Boolean]("wav_valid"))
    assert(ok.getAs[Long]("audio_format") == 1L)
    assert(ok.getAs[Long]("channels") == 2L)
    assert(ok.getAs[Long]("sample_rate") == 44100L)
    assert(ok.getAs[Long]("byte_rate") == 176400L)
    assert(ok.getAs[Long]("block_align") == 4L)
    assert(ok.getAs[Long]("bits_per_sample") == 16L)
    assert(ok.getAs[Long]("data_size") == 800L)
    assert(ok.getAs[Boolean]("rate_consistent"))
    got.drop(1).foreach { r =>
      assert(!r.getAs[Boolean]("wav_valid"))
      assert(r.isNullAt(r.fieldIndex("sample_rate")))
    }
    // a well-framed header with a LYING byte_rate parses but fails the
    // consistency cross-check instead of passing silently
    val lying = wav.clone()
    System.arraycopy(le(999999, 4), 0, lying, 28, 4)
    val bad = Multimodal.parseWavHeader(
      Seq((9L, lying)).toDF("doc_id", "payload"), "payload").collect().head
    assert(bad.getAs[Boolean]("wav_valid") && !bad.getAs[Boolean]("rate_consistent"))
  }

  test("WAV PCM decode: exact sample arithmetic, square-wave identity, degrade paths") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.MediaRow
    // square wave: rms == peak == amplitude exactly, sumsq = n*amp^2
    val sq = Multimodal.synthPcmWav(amplitude = 100, nSamples = 4)
    // hand samples [3, -5]: peak 5, sumsq 34, rms floor(sqrt(17)) = 4
    val hand = {
      val b = Multimodal.synthPcmWav(amplitude = 0, nSamples = 2)
      b(44) = 3; b(45) = 0          // 3 LE
      b(46) = (-5 & 0xff).toByte; b(47) = (-1).toByte // -5 LE
      b
    }
    val rows = Seq(
      MediaRow(1L, "audio", sq),
      MediaRow(2L, "audio", hand),
      MediaRow(3L, "audio", Multimodal.synthPcmWav(7, 0)),  // empty data
      MediaRow(4L, "audio", "not a wav at all".getBytes),
      MediaRow(5L, "audio", sq.take(30))                    // truncated
    ).toDF("doc_id", "media_type", "payload")
    val got = Multimodal.wavPcmFeatures(spark, rows)
      .collect().map(f => f.doc_id ->
        ((f.wav_ok, f.n_samples, f.peak_abs, f.sumsq, f.rms))).toMap
    assert(got(1L) == ((true, 4L, 100L, 40000L, 100L)))
    assert(got(2L) == ((true, 2L, 5L, 34L, 4L)))
    assert(got(3L) == ((true, 0L, 0L, 0L, 0L)))
    assert(got(4L) == ((false, 0L, 0L, 0L, 0L)))
    assert(got(5L) == ((false, 0L, 0L, 0L, 0L)))
    intercept[IllegalArgumentException](Multimodal.synthPcmWav(40000, 1))
  }

  test("frame sampling: video-only fan-out, bounded frames, slim rows") {
    val fs = Multimodal.sampleFrames(spark, Multimodal.asMediaTable(docs),
      frameBytes = 16, stride = 2, maxFrames = 4).collect()
    assert(fs.nonEmpty)
    assert(fs.map(_.doc_id).toSet == Set(2L, 5L))
    fs.groupBy(_.doc_id).foreach { case (_, frames) =>
      assert(frames.length <= 4)
      assert(frames.forall(_.payload.length <= 16))
      assert(frames.map(_.frame_idx).distinct.length == frames.length)
    }
  }

  test("L5h dHash: re-encode identical, brightness-invariant, gradient-reversal far") {
    // strictly increasing column gradient: every dHash bit is 0
    def gradient(shift: Int, reversed: Boolean = false): Array[Byte] = {
      val w = 18
      (0 until w).map { x =>
        val v = (if (reversed) (w - 1 - x) else x) * 13 + shift
        v.toByte
      }.toArray // row-major cycled by encodePngGray
    }
    val base = Multimodal.Decoder.encodePngGray(18, 16, gradient(0))
    val again = Multimodal.Decoder.encodePngGray(18, 16, gradient(0))
    val bright = Multimodal.Decoder.encodePngGray(18, 16, gradient(10))
    val rev = Multimodal.Decoder.encodePngGray(18, 16,
      gradient(0, reversed = true))
    val Some(hBase) = Multimodal.dHash64(base)
    assert(Multimodal.dHash64(again).contains(hBase), "re-encode must hash equal")
    assert(Multimodal.dHash64(bright).contains(hBase),
      "uniform brightness shift preserves every gradient comparison")
    val Some(hRev) = Multimodal.dHash64(rev)
    assert(java.lang.Long.bitCount(hBase ^ hRev) > 32,
      "a reversed gradient must be far in hamming space")
    assert(Multimodal.dHash64("not an image".getBytes).isEmpty)
  }

  test("L5h phash pairs: dup images pair at hamming 0; far images never candidate") {
    import spark.implicits._
    def png(rev: Boolean) = Multimodal.Decoder.encodePngGray(18, 16,
      (0 until 18).map(x => ((if (rev) 17 - x else x) * 13).toByte).toArray)
    val media = Seq(
      (1L, "image", png(false)), (2L, "image", png(false)), // exact dups
      (3L, "image", png(true)),                              // far
      (4L, "audio", "zz".getBytes)).toDF("doc_id", "media_type", "payload")
    val hashes = Multimodal.perceptualHashes(spark, media).toDF()
    val pairs = Multimodal.phashNearDups(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet == Set((1L, 2L)), s"got $pairs")
    assert(pairs((1L, 2L)) == 0L)
    // audio rows carry NULL hashes and never enter the pair space
    assert(hashes.filter(org.apache.spark.sql.functions.col("media_type") === "audio")
      .filter(org.apache.spark.sql.functions.col("phash").isNotNull).count() == 0L)
  }

  test("L5h re-encode corpus: darker-export twins pair with their source at hamming ≤1") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (30L, "The quick brown fox jumps over the lazy dog again and again"),
      (33L, "short text no twin"),          // image, id % 30 != 0 → no twin
      (31L, "an audio doc")                 // not an image
    ).toDF("doc_id", "text")
    val media = Multimodal.asMediaTableWithReEncodes(docs)
    // twin emitted only for the id%30==0 image doc, offset 2^40
    val twinId = 30L + (1L << 40)
    assert(media.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(30L, 31L, 33L, twinId))
    val pairs = Multimodal.phashNearDups(
        Multimodal.perceptualHashes(spark, media).toDF(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet == Set((30L, twinId)), s"got $pairs")
    assert(pairs((30L, twinId)) <= 1L,
      "halved luma is monotone — nearly every gradient comparison survives")
  }
}
