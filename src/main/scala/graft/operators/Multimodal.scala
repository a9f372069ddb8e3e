package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** L5 — multimodal columns (SURVEY.md §2.10): image/audio/video payloads
  * as opaque `binary` columns with a typed metadata struct, exactly the
  * schema-on-read pattern of the reference's raw frames (S2,
  * ssidentity.h:36-42).
  *
  * The Spark-side plumbing — schema, per-partition batch iteration,
  * output shape — is real and tested. The IMAGE codec is real too:
  * PNG payloads decode through javax.imageio (ships with the JDK —
  * no invented dependency), yielding true dimensions and mean
  * luminance. Audio/video codecs are still deterministic pseudo-
  * feature stubs (the container carries no such libraries); swapping
  * one in changes only [[Decoder.pseudoFeatures]]'s branch.
  *
  * At 100 TB: payloads stay in parquet binary columns (never shuffled —
  * feature extraction is map-only `mapPartitions`), features are slim
  * numeric columns that downstream joins/aggs shuffle instead. The
  * magic-byte triage in [[Decoder.decode]] is the same planning/decode
  * split as [[parsePngHeader]]: only plausibly-decodable payloads reach
  * the codec.
  */
object Multimodal {

  /** javax.imageio defaults to useCache=true: every `ImageIO.read`
    * over a stream spins up a FileCacheImageInputStream — a TEMP FILE
    * created, written and deleted PER DECODE CALL. Under 32 concurrent
    * decode tasks that is disk I/O plus temp-dir contention for
    * payloads that are already in memory (task metrics showed run-time
    * ≫ CPU-time on the decode stages — tasks blocked, not computing).
    * Memory-cached streams decode byte-identically; set once per JVM,
    * referenced from every ImageIO entry point in this object. */
  private[operators] lazy val imageIoMemCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, media_type: String,
      n_bytes: Int, width: Int, height: Int, mean_luma: Double)

  object Decoder {
    private val PngMagic: Array[Byte] =
      Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

    private def hasPngMagic(payload: Array[Byte]): Boolean =
      payload.length >= 8 && java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(payload, 0, 8), PngMagic)

    /** Real image decode (JDK ImageIO): true width/height and mean
      * luminance (band-averaged for multi-band rasters). None when the
      * bytes do not decode — corrupt payloads degrade, never throw. */
    def decodeImage(payload: Array[Byte]): Option[(Int, Int, Double)] = {
      imageIoMemCache
      try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))).map { img =>
        val r = img.getRaster
        val (w, h) = (img.getWidth, img.getHeight)
        val bands = math.min(r.getNumBands, 3)
        var sum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var s = 0; var b = 0
            while (b < bands) { s += r.getSample(x, y, b); b += 1 }
            sum += s.toDouble / bands
            x += 1
          }
          y += 1
        }
        (w, h, sum / (w.toLong * h).toDouble)
      } catch { case _: Throwable => None }
    }

    /** Deterministic pseudo-features for media types whose codec the
      * container does not ship (audio/video): byte-derived dimensions +
      * mean byte value. A real codec swap changes only this branch. */
    def pseudoFeatures(doc_id: Long, mediaType: String,
        payload: Array[Byte]): MediaFeatures = {
      val n = payload.length
      val w = 16 + (math.abs(java.util.Arrays.hashCode(payload)) % 64)
      val h = 16 + (n % 64)
      val luma = if (n == 0) 0.0
        else payload.iterator.map(b => (b & 0xff).toDouble).sum / n
      MediaFeatures(doc_id, mediaType, n, w, h,
        math.round(luma * 10000).toDouble / 10000)
    }

    /** Magic-byte triage, then the real codec; anything else (or a
      * payload that fails to decode) gets pseudo-features. */
    def decode(doc_id: Long, mediaType: String, payload: Array[Byte]): MediaFeatures =
      (if (hasPngMagic(payload)) decodeImage(payload) else None) match {
        case Some((w, h, luma)) =>
          MediaFeatures(doc_id, mediaType, payload.length, w, h,
            math.round(luma * 10000).toDouble / 10000)
        case None => pseudoFeatures(doc_id, mediaType, payload)
      }

    /** Encode a gray8 PNG (JDK ImageIO) — the test-harness side of the
      * codec: `pix` fills the raster row-major, cycled. Gray8 PNG is
      * lossless, so decodeImage returns exactly these samples back. */
    def encodePngGray(w: Int, h: Int, pix: Array[Byte]): Array[Byte] = {
      require(w > 0 && h > 0, s"dims must be positive (got $w x $h)")
      val src = if (pix.isEmpty) Array[Byte](0) else pix
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, src(i % src.length) & 0xff)
          i += 1; x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  final case class PHashRow(doc_id: Long, media_type: String,
      phash: Option[Long])

  /** L5h — dHash perceptual image fingerprint: decode, block-mean
    * downsample to a 9×8 luminance grid (pure INTEGER area sums — no
    * float resize kernel, so the hash is bit-deterministic across
    * runs and platforms), then 64 horizontal gradient comparisons
    * (bit y·8+x set iff cell(x,y) > cell(x+1,y)). Robust to re-encoding
    * and uniform brightness shifts (gradients survive both), which is
    * exactly what byte-level dedup misses for images. None when the
    * payload does not decode. */
  def dHash64(payload: Array[Byte]): Option[Long] = {
    imageIoMemCache
    (try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
     catch { case _: Throwable => None }).map { img =>
      val r = img.getRaster
      val (w, h) = (img.getWidth, img.getHeight)
      val bands = math.min(r.getNumBands, 3)
      // block-mean 9x8 grid in scaled-integer luma (sum*cells kept
      // exact; comparisons are on (sum, count) cross-products)
      val gridSum = Array.ofDim[Long](8, 9)
      val gridCnt = Array.ofDim[Long](8, 9)
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 9) {
          val x0 = math.min(gx * w / 9, w - 1)
          val x1 = math.max(x0 + 1, (gx + 1) * w / 9)
          val y0 = math.min(gy * h / 8, h - 1)
          val y1 = math.max(y0 + 1, (gy + 1) * h / 8)
          var s = 0L; var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              var b = 0; var ps = 0
              while (b < bands) { ps += r.getSample(x, y, b); b += 1 }
              s += ps; x += 1
            }
            y += 1
          }
          gridSum(gy)(gx) = s
          gridCnt(gy)(gx) = (x1 - x0).toLong * (y1 - y0)
          gx += 1
        }
        gy += 1
      }
      var hash = 0L
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          // mean(x) > mean(x+1) ⟺ sum(x)·cnt(x+1) > sum(x+1)·cnt(x)
          if (gridSum(yy)(xx) * gridCnt(yy)(xx + 1) >
              gridSum(yy)(xx + 1) * gridCnt(yy)(xx))
            hash |= 1L << (yy * 8 + xx)
          xx += 1
        }
        yy += 1
      }
      hash
    }
  }

  /** Per-image fingerprints over a media table — map-only batched per
    * partition (the codec boundary shape); non-image / undecodable
    * rows carry a NULL hash. */
  def perceptualHashes(spark: SparkSession, media: DataFrame): Dataset[PHashRow] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .mapPartitions(_.map(r => PHashRow(r.doc_id, r.media_type,
        if (r.media_type == "image") dHash64(r.payload) else None)))
  }

  /** L5h pairs — near-duplicate images via banded pHash buckets: the
    * 64-bit fingerprint splits into 4 sixteen-bit chunks; by
    * pigeonhole any pair at hamming ≤ 3 shares at least one chunk
    * VALUE, so candidate generation is an equi self-join on
    * (chunk_idx, chunk_value) — bucketed, never all-pairs (the
    * simhash banding argument, L2e) — and the exact popcount verify
    * runs on candidates only. Payload bytes never reach this plan:
    * only (doc_id, 8-byte hash) rows shuffle. */
  def phashNearDups(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4 bands prove recall only up to hamming 3 (got $maxHamming)")
    val h = hashes.filter(col("phash").isNotNull)
      .select(col("doc_id"), col("phash"),
        explode(array((0 until 4).map(i =>
          struct(lit(i).as("ci"),
            shiftright(col("phash"), 16 * i).bitwiseAND(lit(0xffffL))
              .as("cv"))): _*)).as("c"))
      .select(col("doc_id"), col("phash"), col("c.ci"), col("c.cv"))
    h.as("a").join(h.as("b"),
        col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).cast("long")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Wrap the documents table as a media table: image rows carry a REAL
    * gray8 PNG (dims and pixels derived from the doc — so the decode
    * path downstream exercises an actual codec); audio/video rows keep
    * utf-8 text bytes as stand-in payloads for their stubbed codecs. */
  def asMediaTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val mediaType = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val payload =
          if (mediaType == "image")
            Decoder.encodePngGray(
              4 + (id % 13).toInt, 4 + (text.length % 11),
              text.getBytes("UTF-8"))
          else text.getBytes("UTF-8")
        MediaRow(id, mediaType, payload)
      }).toDF()
  }

  /** Media table plus deterministic "darker export" re-encodes: every
    * 10th image doc also yields a twin whose pixels are halved
    * (id + 2^40, same dims) — the canonical perceptual-near-dup
    * scenario (same photo, different export settings) that byte-level
    * dedup CANNOT catch but dHash pairs at hamming ≤1 (a monotone
    * luma map preserves almost every gradient comparison). Same single
    * mapPartitions pass as [[asMediaTable]]; the twin offset 2^40 is
    * far above any doc_id at any scale factor. */
  def asMediaTableWithReEncodes(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val mediaType = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val bytes = text.getBytes("UTF-8")
        val (w, h) = (4 + (id % 13).toInt, 4 + (text.length % 11))
        if (mediaType != "image")
          Iterator(MediaRow(id, mediaType, bytes))
        else {
          val base = MediaRow(id, "image", Decoder.encodePngGray(w, h, bytes))
          if (id % 30 == 0)
            Iterator(base, MediaRow(id + (1L << 40), "image",
              Decoder.encodePngGray(w, h,
                bytes.map(b => ((b & 0xff) / 2).toByte))))
          else Iterator(base)
        }
      }).toDF()
  }

  /** Feature extraction: map-only, batched per partition (the plan shape
    * a vectorized/Pandas-style UDF would have — one iterator pass per
    * partition, no shuffle of payload bytes). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .mapPartitions(_.map(r => Decoder.decode(r.doc_id, r.media_type, r.payload)))
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
    * path ([[Decoder]]). Column pruning keeps the payload out of
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

  /** L5e's audio twin — WAV/RIFF header parse over an opaque BINARY
    * column: validate the RIFF/WAVE/fmt/data framing at fixed offsets
    * and read the PCM format fields. RIFF is LITTLE-endian where PNG is
    * big-endian, so the reads compose per-byte `conv(hex(byte))` shifts
    * in ascending significance — the other half of the binary-parsing
    * surface, still pure codegen'd builtins (substring-on-binary + hex
    * + conv + shifts), map-only over the scan like [[parsePngHeader]].
    * Corrupt/short payloads yield wav_valid=false with NULL fields.
    * `rate_consistent` cross-checks the parsed byte_rate/block_align
    * against their PCM definitions (byte_rate = sample_rate·block_align;
    * block_align = channels·bits/8) — a malformed-but-well-framed
    * header surfaces as a consistency failure, not a crash. */
  def parseWavHeader(media: DataFrame, payloadCol: String): DataFrame = {
    val p = col(payloadCol)
    def byteAt(off: Int) = conv(hex(substring(p, off, 1)), 16, 10).cast("long")
    def leU(off: Int, n: Int) = (0 until n)
      .map(k => shiftleft(byteAt(off + k), 8 * k))
      .reduceLeft(_ + _)
    val valid = hex(substring(p, 1, 4)) === lit("52494646") &&      // "RIFF"
      hex(substring(p, 9, 8)) === lit("57415645666D7420") &&        // "WAVEfmt "
      hex(substring(p, 37, 4)) === lit("64617461") &&               // "data"
      length(p) >= 44
    media
      .withColumn("wav_valid", valid)
      .withColumn("audio_format", when(valid, leU(21, 2)))
      .withColumn("channels", when(valid, leU(23, 2)))
      .withColumn("sample_rate", when(valid, leU(25, 4)))
      .withColumn("byte_rate", when(valid, leU(29, 4)))
      .withColumn("block_align", when(valid, leU(33, 2)))
      .withColumn("bits_per_sample", when(valid, leU(35, 2)))
      .withColumn("data_size", when(valid, leU(41, 4)))
      .withColumn("rate_consistent", when(valid,
        col("byte_rate") === col("sample_rate") * col("block_align") &&
          col("block_align") ===
            col("channels") * shiftright(col("bits_per_sample"), 3)))
      .drop(payloadCol)
  }

  case class WavFeatures(doc_id: Long, wav_ok: Boolean, n_samples: Long,
      peak_abs: Long, sumsq: Long, rms: Long)

  /** Canonical 44-byte mono 16-bit PCM WAV around a full-swing square
    * wave (+A, −A alternating): rms == amplitude EXACTLY, so decoded
    * features are arithmetically predictable from (amplitude, n) —
    * the property that lets an oracle check the REAL decoder without
    * replaying it. */
  def synthPcmWav(amplitude: Int, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
    require(amplitude >= 0 && amplitude <= 32767,
      s"amplitude must fit int16 (got $amplitude)")
    require(nSamples >= 0, s"nSamples must be >= 0 (got $nSamples)")
    val dataSize = 2 * nSamples
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nSamples) {
      out.putShort((if (i % 2 == 0) amplitude else -amplitude).toShort)
      i += 1
    }
    out.array()
  }

  /** Audio twin of [[asMediaTable]]'s PNG side: every doc becomes a
    * REAL PCM WAV whose amplitude/sample count derive arithmetically
    * from (doc_id, n_chars) — so the decoded features hash-check
    * against an oracle that never touches the bytes. */
  def asAudioTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nChars) =>
        MediaRow(id, "audio",
          synthPcmWav((500 + id % 7000).toInt, (40 + nChars % 100).toInt))
      }).toDF()
  }

  /** L5e's REAL audio decode — 16-bit PCM samples out of the WAV data
    * chunk (pure JVM byte arithmetic, no codec library): per payload,
    * the interleaved sample count, peak |amplitude|, EXACT integer
    * sum of squares, and rms = ⌊√(sumsq/n)⌋. The same codec-boundary
    * split as the PNG path: [[parseWavHeader]] (relational, oracle-
    * checked) validates framing and schedules; THIS decodes — a
    * `mapPartitions` at the boundary where no Catalyst expression
    * fits, emitting slim integer features, never raw samples.
    * Non-WAV / non-16-bit / truncated payloads yield wav_ok=false
    * zero-rows — degrade, never throw. */
  def wavPcmFeatures(spark: SparkSession, media: DataFrame): Dataset[WavFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .mapPartitions(_.map { r =>
        val p = r.payload
        def leU(off: Int, n: Int): Long = {
          var v = 0L; var k = 0
          while (k < n) { v |= (p(off + k) & 0xffL) << (8 * k); k += 1 }
          v
        }
        val framed = p.length >= 44 &&
          p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
          p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E' &&
          p(36) == 'd' && p(37) == 'a' && p(38) == 't' && p(39) == 'a'
        if (!framed || leU(34, 2) != 16L)
          WavFeatures(r.doc_id, wav_ok = false, 0L, 0L, 0L, 0L)
        else {
          val dataSize = math.min(leU(40, 4), (p.length - 44).toLong)
          val n = dataSize / 2
          var i = 0L
          var peak = 0L
          var sumsq = 0L
          while (i < n) {
            val off = 44 + 2 * i
            val s = ((p(off.toInt) & 0xff) |
              (p(off.toInt + 1).toInt << 8)).toShort.toLong
            val a = math.abs(s)
            if (a > peak) peak = a
            sumsq += s * s
            i += 1
          }
          val rms = if (n == 0) 0L
            else math.floor(math.sqrt(sumsq.toDouble / n)).toLong
          WavFeatures(r.doc_id, wav_ok = true, n, peak, sumsq, rms)
        }
      })
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
