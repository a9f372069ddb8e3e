package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.model.RawFrame
import graft.streaming.{ArrivalAlerts, IngestPipeline, PresenceAnalytics}

/** ST1–ST7 — Structured Streaming semantics under deterministic
  * MemoryStream schedules (SURVEY.md §5.2: no oracle; asserted against
  * hand-computed expected state). */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._
  import ArrivalAlerts.{Alert, Sighting}

  private implicit def sqlCtx = spark.sqlContext
  private implicit val sparkImplicit: org.apache.spark.sql.SparkSession = spark

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Frame builder matching FrameParserSpec's layout. */
  private def probeFrame(srcByte: Byte, rssiRaw: Int = 165): Array[Byte] = {
    val b = new Array[Byte](128)
    b(19) = 0x09; b(20) = 0xa0.toByte          // 2464 MHz
    b(22) = rssiRaw.toByte
    b(26) = 0x40                               // probe request
    (30 until 36).foreach(i => b(i) = 0xff.toByte)
    (36 until 42).foreach(i => b(i) = srcByte)
    b(61) = 4
    "ssid".getBytes("US-ASCII").copyToArray(b, 62)
    b
  }

  test("ST1 ingest: raw frames stream -> parsed observation stream") {
    val in = MemoryStream[(Long, Long, Array[Byte])]
    val frames = in.toDF()
      .selectExpr("timestamp_millis(_1) as ts", "_2 as sensorId", "_3 as bytes")
    val q = IngestPipeline.parse(frames)
      .writeStream.format("memory").queryName("st1_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((1700000000000L, 1L, probeFrame(0x11)),
        (1700000001000L, 1L, new Array[Byte](128)),        // rejected
        (1700000002000L, 2L, probeFrame(0x22, rssiRaw = 167)))
      q.processAllAvailable()
      val rows = spark.table("st1_out").orderBy("ts").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[String]("mac") == "111111111111")
      assert(rows(0).getAs[Double]("dist") == 306.1)
      assert(rows(1).getAs[String]("mac") == "222222222222")
      assert(rows(1).getAs[Int]("rssi") == -88)
    } finally q.stop()
  }

  test("L4/L5 curation transforms run UNCHANGED on a document stream") {
    // the map-only curation stages (PII scrub, token budgets, lang gate)
    // are plain declarative transforms, so the SAME code incrementalizes
    // under Structured Streaming — batch backfill and live curation
    // share one implementation (the engine's core design claim)
    val in = MemoryStream[(Long, String, String)]
    def curate(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TextAnalysis.piiScrub(
          df.filter(org.apache.spark.sql.functions.col("lang") === "en"))
        .withColumn("n_bpe",
          graft.functions.TextFunctions.bpeTokenCount(
            org.apache.spark.sql.functions.col("scrubbed")).cast("long"))
    val docs = in.toDF().selectExpr("_1 as doc_id", "_2 as lang", "_3 as text")
    val q = curate(docs)
      .writeStream.format("memory").queryName("curate_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val data = Seq(
        (1L, "en", "contact me a@b.io thanks"),
        (2L, "fr", "bonjour le monde"),          // gated out
        (3L, "en", "card 1234567890 stolen"))
      in.addData(data: _*)
      q.processAllAvailable()
      val streamed = spark.table("curate_out")
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val batch = curate(data.toDF("doc_id", "lang", "text"))
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(streamed == batch && streamed.length == 2)
      assert(streamed(0).contains("contact me <EMAIL> thanks"))
    } finally q.stop()
  }

  test("normalize + chunking stream unchanged (batch backfill ≡ live curation)") {
    // the round-5 curation stages are map-only too: the identical
    // normalize → chunk plan incrementalizes under Structured Streaming
    val in = MemoryStream[(Long, String)]
    def stage(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Chunking.charChunks(
        df.select(org.apache.spark.sql.functions.col("doc_id"),
          graft.functions.TextFunctions.normalizeText(
            org.apache.spark.sql.functions.col("text")).as("text")),
        "text", size = 10, stride = 7)
    val docs = in.toDF().selectExpr("_1 as doc_id", "_2 as text")
    val q = stage(docs)
      .writeStream.format("memory").queryName("chunk_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val data = Seq(
        (1L, "  Hello   WORLD and   MORE text  "),
        (2L, "Él Ñiño"))
      in.addData(data: _*)
      q.processAllAvailable()
      val streamed = spark.table("chunk_out")
        .orderBy("doc_id", "off").collect().map(_.toSeq).toSeq
      val batch = stage(data.toDF("doc_id", "text"))
        .orderBy("doc_id", "off").collect().map(_.toSeq).toSeq
      assert(streamed == batch && streamed.nonEmpty)
      assert(streamed.last == Seq(2L, 0L, "el nino"))
    } finally q.stop()
  }

  test("streaming exact dedup: first arrival of a fingerprint wins, state bounded by watermark") {
    val in = MemoryStream[(Long, String, Timestamp)]
    val docs = in.toDF().selectExpr("_1 as doc_id", "_2 as text", "_3 as ts")
    val q = graft.operators.Dedup
      .dropExactDuplicatesWithinWatermark(docs, "ts", "10 minutes")
      .writeStream.format("memory").queryName("sdedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (1L, "alpha beta", ts("2024-01-01 10:00:00")),
        (2L, "ALPHA   beta", ts("2024-01-01 10:01:00")),  // same fingerprint (normalized)
        (3L, "gamma", ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      in.addData(
        (4L, "alpha beta", ts("2024-01-01 10:03:00")),    // dup across batches: dropped
        (5L, "delta", ts("2024-01-01 10:04:00")))
      q.processAllAvailable()
      val kept = spark.table("sdedup_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L, 5L), s"got $kept")
    } finally q.stop()
  }

  test("streaming URL dedup: recrawl variants collapse on the canonical key") {
    // the L2k canonical key is a plain map-only column, so ST6's
    // dropDuplicatesWithinWatermark runs on it unchanged — a live
    // crawl frontier dedups ?utm/case/slash recrawls with bounded state
    val in = MemoryStream[(Long, String, Timestamp)]
    val docs = in.toDF().selectExpr("_1 as doc_id", "_2 as url", "_3 as ts")
      .withColumn("curl",
        graft.functions.UrlFunctions.canonicalUrl(
          org.apache.spark.sql.functions.col("url")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("curl")
    val q = docs.writeStream.format("memory").queryName("surl_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (1L, "https://www.site.com/a", ts("2024-01-01 10:00:00")),
        (2L, "https://WWW.Site.COM/a/", ts("2024-01-01 10:01:00")),   // variant: dropped
        (3L, "https://www.site.com/b", ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      in.addData(
        (4L, "http://www.site.com/a?utm_source=x", ts("2024-01-01 10:03:00")), // recrawl: dropped
        (5L, "https://cdn.site.com/a", ts("2024-01-01 10:04:00")))    // new host: kept
      q.processAllAvailable()
      val kept = spark.table("surl_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L, 5L), s"got $kept")
    } finally q.stop()
  }

  test("L2r live: document stream probes the static band index, matches batch") {
    import org.apache.spark.sql.functions.col
    val corpusRows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely different content about jazz musicians and bass lines"))
    val corpus = corpusRows.toDF("doc_id", "text")
    val idx = graft.operators.Dedup.minHashBandIndex(corpus)
    val in = MemoryStream[(Long, String, Timestamp)]
    val docs = in.toDF().selectExpr("_1 as doc_id", "_2 as text", "_3 as ts")
    val out = graft.streaming.NearDupStream.probe(
      docs, "ts", "10 minutes", corpus, Some(idx), threshold = 0.5)
    val q = out.writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val t = Timestamp.valueOf("2024-01-01 10:00:00")
      val batchRows = Seq(
        (100L, "the quick brown fox jumps over the lazy dogs near the river bank", t),
        (101L, "unrelated text about deep sea creatures and their glowing light", t))
      in.addData(batchRows: _*)
      q.processAllAvailable()
      val streamed = spark.table("neardup_out")
        .select("doc_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == Set((100L, 1L)), s"got $streamed")
      // identical verdicts to the batch incremental probe (new x old side)
      val batch = graft.operators.Dedup.incrementalNearDups(
          batchRows.map(r => (r._1, r._2)).toDF("doc_id", "text"), corpus,
          threshold = 0.5)
        .filter(col("pair_kind") === "new_old")
        .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
      assert(batch == streamed, s"stream $streamed vs batch $batch")
    } finally q.stop()
  }

  test("S1 production source: frames over a real TCP socket parse end-to-end") {
    val server = new java.net.ServerSocket(0)
    val payload = java.util.Base64.getEncoder.encodeToString(probeFrame(0x33))
    val writer = new Thread(() => {
      val sock = server.accept()
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      out.println(s"7:1700000000000:$payload")
      out.println("not a frame at all")          // malformed: dropped, not fatal
      out.println(s"oops:9999:$payload")         // non-numeric sensor: dropped
      out.println(s"8:1700000001000:$payload")
      // keep the connection open until the test finishes reading
      Thread.sleep(30000)
      sock.close()
    })
    writer.setDaemon(true)
    writer.start()
    val frames = graft.streaming.IngestPipeline
      .fromSocket(spark, "localhost", server.getLocalPort)
    val q = IngestPipeline.parse(frames)
      .writeStream.format("memory").queryName("s1_socket_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      var rows = Array.empty[org.apache.spark.sql.Row]
      while (rows.length < 2 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        rows = spark.table("s1_socket_out").collect()
        if (rows.length < 2) Thread.sleep(100)
      }
      assert(rows.length == 2)
      assert(rows.map(_.getAs[Long]("sensorId")).sorted.toSeq == Seq(7L, 8L))
      assert(rows.forall(_.getAs[String]("mac") == "333333333333"))
      assert(rows.forall(_.getAs[Double]("dist") == 306.1))
      // sensor-stamped event time survives (not the batch timestamp)
      assert(rows.map(_.getAs[Timestamp]("ts").getTime).sorted.toSeq ==
        Seq(1700000000000L, 1700000001000L))
    } finally { q.stop(); server.close() }
  }

  test("S1 replayable file-log source: offsets commit, restart is exactly-once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_filelog").toString
    val landing = s"$dir/landing"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landing))
    val payload = java.util.Base64.getEncoder.encodeToString(probeFrame(0x33))
    // atomic publish (write + move): the source must never list a
    // half-written upload — the producer-side half of the contract
    def upload(name: String, lines: Seq[String]): Unit = {
      val tmp = java.nio.file.Paths.get(dir, s"$name.tmp")
      java.nio.file.Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(landing, name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    def startQuery() = IngestPipeline.parse(
        graft.streaming.IngestPipeline.fromFileLog(spark, landing, maxFilesPerTrigger = 1))
      .select("ts", "sensorId", "mac")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    upload("u1.txt", Seq(s"7:1700000000000:$payload",
      "not a frame at all", s"8:1700000001000:$payload"))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop() // stop #1: clean shutdown
    assert(spark.read.parquet(out).count() == 2)
    // restart: the committed file must NOT re-emit; a new upload must
    upload("u2.txt", Seq(s"9:1700000002000:$payload"))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out).collect()
    assert(rows.length == 3, "no loss, no duplicates across restart")
    assert(rows.map(_.getAs[Long]("sensorId")).sorted.toSeq == Seq(7L, 8L, 9L))
    // crash BETWEEN sink write and offset commit: drop the newest
    // commit marker — the restart replays that micro-batch and the
    // file sink's transactional log must absorb the duplicate
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit))
    assert(commits.nonEmpty, "checkpoint must carry commit markers")
    assert(new java.io.File(s"$ckpt/sources/0").listFiles().nonEmpty,
      "checkpoint must carry the processed-file offset log")
    val newest = commits.maxBy(_.getName.toLong)
    // a real crash writes NEITHER the marker nor its Hadoop checksum
    // sidecar — remove both, or the local ChecksumFs rejects the
    // replay's rename against the stale .crc
    val crc = new java.io.File(newest.getParentFile, s".${newest.getName}.crc")
    assert(newest.delete(), "commit marker delete must succeed")
    crc.delete()
    val q3 = startQuery()
    try q3.processAllAvailable() finally q3.stop()
    assert(spark.read.parquet(out).count() == 3,
      "a replayed micro-batch must be absorbed exactly-once by the sink")
  }

  test("ST2 tumbling window counts under incremental arrival") {
    val in = MemoryStream[(Timestamp, String)]
    val obs = in.toDF().toDF("ts", "mac")
    val q = PresenceAnalytics.tumblingCounts(
        PresenceAnalytics.watermarked(obs, "10 minutes"), "1 hour")
      .writeStream.format("memory").queryName("st2_out")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData((ts("2026-01-01 10:05:00"), "A"), (ts("2026-01-01 10:55:00"), "A"),
        (ts("2026-01-01 11:05:00"), "A"), (ts("2026-01-01 10:30:00"), "B"))
      q.processAllAvailable()
      in.addData((ts("2026-01-01 11:20:00"), "A"))
      q.processAllAvailable()
      val rows = spark.table("st2_out")
        .groupBy("window_start", "mac")
        .agg(org.apache.spark.sql.functions.max("n").as("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(rows((ts("2026-01-01 10:00:00"), "A")) == 2)
      assert(rows((ts("2026-01-01 10:00:00"), "B")) == 1)
      assert(rows((ts("2026-01-01 11:00:00"), "A")) == 2)
    } finally q.stop()
  }

  test("ST3 sliding windows: each event lands in width/slide windows") {
    val obs = Seq((ts("2026-01-01 10:05:00"), "A", -60),
      (ts("2026-01-01 10:06:00"), "A", -50)).toDF("ts", "mac", "rssi")
    val got = PresenceAnalytics.slidingCounts(obs, "10 minutes", "1 minute")
      .orderBy("window_start").collect()
    // event at 10:05 is in windows starting 09:56..10:05 (10 of them);
    // both events share 09:57..10:05 (9 windows)
    assert(got.length == 11)
    val both = got.filter(_.getAs[Long]("n") == 2)
    assert(both.length == 9)
    assert(both.forall(_.getAs[Int]("peak_rssi") == -50))
  }

  test("ST4 session windows: batch plan == hand-computed dwell sessions") {
    // batch/stream share the plan; assert the batch semantics precisely
    val obs = Seq(
      (ts("2026-01-01 09:00:00"), "A", 10.0),
      (ts("2026-01-01 09:10:00"), "A", 8.0),   // same visit (gap 10m < 15m)
      (ts("2026-01-01 09:40:00"), "A", 12.0),  // new visit (gap 30m)
      (ts("2026-01-01 09:00:00"), "B", 5.0))
      .toDF("ts", "mac", "dist")
    val got = PresenceAnalytics.dwellSessions(obs, "15 minutes")
      .orderBy("mac", "session_start").collect()
    assert(got.length == 3)
    assert(got(0).getAs[Long]("n_obs") == 2)
    assert(got(0).getAs[Double]("nearest_m") == 8.0)
    assert(got(0).getAs[Timestamp]("session_end") == ts("2026-01-01 09:25:00"))
    assert(got(1).getAs[Long]("n_obs") == 1)
  }

  test("ST5 watermark drops late rows in streaming aggregation") {
    val in = MemoryStream[(Timestamp, String)]
    val obs = in.toDF().toDF("ts", "mac")
    val q = PresenceAnalytics.tumblingCounts(
        PresenceAnalytics.watermarked(obs, "5 minutes"), "10 minutes")
      .writeStream.format("memory").queryName("st5_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((ts("2026-01-01 10:00:00"), "A"))
      q.processAllAvailable()
      // advance watermark far past the first window
      in.addData((ts("2026-01-01 12:00:00"), "A"))
      q.processAllAvailable()
      // hours late -> dropped by the watermark
      in.addData((ts("2026-01-01 10:01:00"), "A"))
      q.processAllAvailable()
      in.addData((ts("2026-01-01 13:00:00"), "A"))
      q.processAllAvailable()
      val first = spark.table("st5_out")
        .filter($"window_start" === ts("2026-01-01 10:00:00")).collect()
      assert(first.length == 1 && first(0).getAs[Long]("n") == 1)
    } finally q.stop()
  }

  test("ST6 dedup within watermark: re-heard frames collapse") {
    val in = MemoryStream[(Timestamp, String, Long)]
    val obs = in.toDF().toDF("ts", "mac", "sensorId")
    val q = PresenceAnalytics.dedupWithinWatermark(obs, "10 minutes")
      .writeStream.format("memory").queryName("st6_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        (ts("2026-01-01 10:00:00"), "A", 1L),
        (ts("2026-01-01 10:00:00"), "A", 1L),   // same frame twice (fixture rows 3-4)
        (ts("2026-01-01 10:00:00"), "A", 2L))   // different sensor -> kept
      q.processAllAvailable()
      in.addData((ts("2026-01-01 10:00:30"), "A", 1L),
        (ts("2026-01-01 10:00:00"), "A", 1L))   // replay in later batch
      q.processAllAvailable()
      assert(spark.table("st6_out").count() == 3)
    } finally q.stop()
  }

  test("ST7 arrival alerts: first_seen then reappeared after gap") {
    val in = MemoryStream[Sighting]
    val q = ArrivalAlerts.alerts(in.toDS(), gapSec = 3600L)
      .writeStream.format("memory").queryName("st7_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(Sighting("A", ts("2026-01-01 10:00:00")),
        Sighting("A", ts("2026-01-01 10:10:00")),
        Sighting("B", ts("2026-01-01 10:00:00")))
      q.processAllAvailable()
      in.addData(Sighting("A", ts("2026-01-01 10:30:00")))  // within gap: silent
      q.processAllAvailable()
      in.addData(Sighting("A", ts("2026-01-01 12:00:00")))  // 90 min gap: alert
      q.processAllAvailable()
      val alerts = spark.table("st7_out").as[Alert].collect()
      val aAlerts = alerts.filter(_.mac == "A").sortBy(_.ts.getTime)
      assert(aAlerts.map(_.kind).toSeq == Seq("first_seen", "reappeared"))
      assert(aAlerts(1).gapSec == 5400L)
      assert(alerts.count(_.mac == "B") == 1)
    } finally q.stop()
  }

  test("ST7 on transformWithState (Spark 4 API) matches flatMapGroupsWithState") {
    // transformWithState needs the RocksDB state store; use a dedicated
    // session config scope via a fresh query against the shared context
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Sighting]
      val q = graft.streaming.ArrivalAlertsTws.alerts(in.toDS(), gapSec = 3600L)
        .writeStream.format("memory").queryName("st7b_out")
        .outputMode(OutputMode.Append()).start()
      try {
        in.addData(Sighting("A", ts("2026-01-01 10:00:00")),
          Sighting("B", ts("2026-01-01 10:00:00")))
        q.processAllAvailable()
        in.addData(Sighting("A", ts("2026-01-01 12:00:00")))
        q.processAllAvailable()
        val alerts = spark.table("st7b_out").as[Alert].collect()
        val aAlerts = alerts.filter(_.mac == "A").sortBy(_.ts.getTime)
        assert(aAlerts.map(_.kind).toSeq == Seq("first_seen", "reappeared"))
        assert(aAlerts(1).gapSec == 7200L)
        assert(alerts.count(_.mac == "B") == 1)
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("ST7 transition function is order-insensitive within a batch") {
    val (alerts, state) = ArrivalAlerts.transition("A",
      Iterator(Sighting("A", ts("2026-01-01 12:00:00")),
        Sighting("A", ts("2026-01-01 10:00:00"))),
      None, gapSec = 3600L)
    assert(alerts.map(_.kind) == List("first_seen", "reappeared"))
    assert(state.lastSeen == ts("2026-01-01 12:00:00").getTime)
  }

  test("S6 settings-driven distance filter re-reads per micro-batch") {
    val in = MemoryStream[(Timestamp, Long, Double)]
    val obs = in.toDF().toDF("ts", "sensorId", "dist")
    val settings = Seq((1L, 100.0), (2L, 300.0)).toDF("sensorId", "max_dist_m")
    val q = PresenceAnalytics.distanceFiltered(obs, settings)
      .writeStream.format("memory").queryName("s6_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((ts("2026-01-01 10:00:00"), 1L, 50.0),    // kept (<=100)
        (ts("2026-01-01 10:01:00"), 1L, 150.0),            // dropped
        (ts("2026-01-01 10:02:00"), 2L, 150.0),            // kept (<=300)
        (ts("2026-01-01 10:03:00"), 3L, 1.0))              // no settings row -> dropped
      q.processAllAvailable()
      val rows = spark.table("s6_out").orderBy("ts").collect()
      assert(rows.map(_.getAs[Double]("dist")).toSeq == Seq(50.0, 150.0))
      assert(rows.map(r => r.getAs[Long]("sensorId")).toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("J3 watchlist: stream x broadcast static semi join") {
    val in = MemoryStream[(Timestamp, String)]
    val obs = in.toDF().toDF("ts", "mac")
    val watchlist = Seq("BAD1", "BAD2").toDF("mac")
    val q = PresenceAnalytics.watchlistHits(obs, watchlist)
      .writeStream.format("memory").queryName("j3_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((ts("2026-01-01 10:00:00"), "GOOD"),
        (ts("2026-01-01 10:01:00"), "BAD1"),
        (ts("2026-01-01 10:02:00"), "BAD2"),
        (ts("2026-01-01 10:03:00"), "GOOD2"))
      q.processAllAvailable()
      val rows = spark.table("j3_out").orderBy("ts").collect()
      assert(rows.map(_.getAs[String]("mac")).toSeq == Seq("BAD1", "BAD2"))
    } finally q.stop()
  }

  test("ST9 stream-stream join: co-observations within tolerance, across sensors") {
    val inA = MemoryStream[(Timestamp, String, Long)]
    val inB = MemoryStream[(Timestamp, String, Long)]
    val a = inA.toDF().toDF("ts", "mac", "sensorId")
    val b = inB.toDF().toDF("ts", "mac", "sensorId")
    val q = PresenceAnalytics.coObservations(a, b, toleranceSec = 60)
      .writeStream.format("memory").queryName("st9_out")
      .outputMode(OutputMode.Append()).start()
    try {
      inA.addData(
        (ts("2026-01-01 10:00:00"), "AA", 1L),
        (ts("2026-01-01 10:05:00"), "BB", 1L))
      inB.addData(
        (ts("2026-01-01 10:00:30"), "AA", 2L),   // within 60s → pair
        (ts("2026-01-01 10:02:00"), "AA", 2L),   // 120s off → no pair
        (ts("2026-01-01 10:05:10"), "BB", 1L),   // same sensor → no pair
        (ts("2026-01-01 10:05:20"), "CC", 3L))   // different mac → no pair
      q.processAllAvailable()
      val rows = spark.table("st9_out").collect()
        .map(r => (r.getAs[String]("mac"), r.getAs[Long]("l_sensor"), r.getAs[Long]("r_sensor")))
      assert(rows.toSeq == Seq(("AA", 1L, 2L)))
    } finally q.stop()
  }

  test("ST9 left outer: unmatched rows emit with nulls once the watermark passes") {
    val inA = MemoryStream[(Timestamp, String, Long)]
    val inB = MemoryStream[(Timestamp, String, Long)]
    val a = inA.toDF().toDF("ts", "mac", "sensorId")
    val b = inB.toDF().toDF("ts", "mac", "sensorId")
    val q = PresenceAnalytics.coObservations(a, b,
        toleranceSec = 60, delay = "1 minute", joinType = "left_outer")
      .writeStream.format("memory").queryName("st9o_out")
      .outputMode(OutputMode.Append()).start()
    try {
      inA.addData((ts("2026-01-01 10:00:00"), "AA", 1L))   // will match
      inA.addData((ts("2026-01-01 10:00:05"), "XX", 1L))   // never matches
      inB.addData((ts("2026-01-01 10:00:30"), "AA", 2L))
      q.processAllAvailable()
      // advance both watermarks far past 10:00 + tolerance + delay so
      // the engine can emit the unmatched XX row with null right side
      inA.addData((ts("2026-01-01 12:00:00"), "W1", 9L))
      inB.addData((ts("2026-01-01 12:00:00"), "W2", 9L))
      q.processAllAvailable()
      inA.addData((ts("2026-01-01 13:00:00"), "W3", 9L))
      inB.addData((ts("2026-01-01 13:00:00"), "W4", 9L))
      q.processAllAvailable()
      val rows = spark.table("st9o_out").collect()
        .map(r => (r.getAs[String]("mac"), r.isNullAt(3)))
        .toSet
      assert(rows.contains(("AA", false)), rows.toString)   // matched pair
      assert(rows.contains(("XX", true)), rows.toString)    // null-emitted
    } finally q.stop()
  }

  test("ST9 plan on batch inputs is J2's interval self-join semantics") {
    val a = Seq((ts("2026-01-01 10:00:00"), "AA", 1L)).toDF("ts", "mac", "sensorId")
    val b = Seq((ts("2026-01-01 10:00:30"), "AA", 2L),
      (ts("2026-01-01 10:03:00"), "AA", 2L)).toDF("ts", "mac", "sensorId")
    val got = PresenceAnalytics.coObservations(a, b, toleranceSec = 60).collect()
    assert(got.length == 1 && got(0).getAs[Long]("r_sensor") == 2L)
    // self-join parity: pairDedup emits each unordered pair ONCE
    val obs = Seq((ts("2026-01-01 10:00:00"), "AA", 1L),
      (ts("2026-01-01 10:00:30"), "AA", 2L)).toDF("ts", "mac", "sensorId")
    val both = PresenceAnalytics.coObservations(obs, obs, toleranceSec = 60)
    assert(both.count() == 2)   // (1,2) and (2,1)
    val once = PresenceAnalytics.coObservations(obs, obs, toleranceSec = 60,
      pairDedup = true).collect()
    assert(once.length == 1 &&
      once(0).getAs[Long]("l_sensor") == 1L && once(0).getAs[Long]("r_sensor") == 2L)
  }

  test("ST9 bounded: parity with the plain tolerance join off-flood; a beacon spammer stays bounded") {
    // quiet fixture: the binned+capped form must reproduce the plain
    // tolerance join exactly (adjacent-bin + cap-not-binding argument)
    val quiet = Seq(
      (ts("2026-01-01 10:00:00"), "AA", 1L),
      (ts("2026-01-01 10:00:30"), "AA", 2L),   // within 60s of the above
      (ts("2026-01-01 10:00:59"), "AA", 3L),   // within 60s of both
      (ts("2026-01-01 10:01:20"), "AA", 5L),   // ADJACENT-bin partner of 10:00:59
      (ts("2026-01-01 10:03:00"), "AA", 4L),   // isolated
      (ts("2026-01-01 10:00:10"), "BB", 1L),
      (ts("2026-01-01 10:00:40"), "BB", 1L))   // same sensor → no pair
      .toDF("ts", "mac", "sensorId")
    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getTimestamp(1),
      r.getLong(2), r.getTimestamp(3), r.getLong(4))
    val plain = PresenceAnalytics.coObservations(quiet, quiet,
      toleranceSec = 60, pairDedup = true).collect().map(key).toSet
    val bounded = PresenceAnalytics.boundedCoObservations(quiet, quiet,
      toleranceSec = 60, maxPerBucket = 32, pairDedup = true).collect().map(key).toSet
    assert(plain.nonEmpty && bounded == plain, s"bounded=$bounded plain=$plain")
    // flood fixture: ONE mac beaconing 500 times inside a 50 s window —
    // the plain self-join is ~C(500,2) pairs on a single key; the cap
    // keeps ≤ maxPerBucket rows per (mac, 60 s bin), so with rows in at
    // most 2 bins the output is ≤ C(2·cap, 2) — bounded, not quadratic
    val base = ts("2026-01-01 10:00:00").getTime
    val flood = (0 until 500).map(i =>
        (new Timestamp(base + i * 100L), "EVIL", (i % 5).toLong))
      .toDF("ts", "mac", "sensorId")
    val cap = 8
    val floodOut = PresenceAnalytics.boundedCoObservations(flood, flood,
      toleranceSec = 60, maxPerBucket = cap, pairDedup = true)
    val n = floodOut.count()
    val bound = (2 * cap) * (2 * cap - 1) / 2
    assert(n <= bound, s"flood output $n exceeds the C(2*cap,2)=$bound bound")
    assert(n > 0, "the cap must keep SOME co-observations, not censor the key")
    // the kept rows are the deterministic (ts, sensorId)-first per bin:
    // survivors' l_ts all come from each bin's earliest rows
    val lTs = floodOut.select("l_ts").collect().map(_.getTimestamp(0).getTime).toSet
    val keptPerBin = (0 until 500).map(i => (base + i * 100L))
      .groupBy(t => t / 60000L) // ms → the operator's 60 s bin
    assert(lTs.subsetOf(
      keptPerBin.values.flatMap(_.sorted.take(cap)).toSet),
      "survivors must be each bin's deterministic first rows")
  }

  test("W14 live anomaly flags == batch rollingAnomaly, row for row") {
    import graft.streaming.AnomalyStream
    import graft.streaming.AnomalyStream.{AnomalyFlag, Obs}
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // two keys; s spikes at seq 8; feed split across micro-batches so
      // state persists across batch boundaries (and one batch arrives
      // out of order to exercise the within-batch sort)
      val rows = (1 to 12).map(i =>
          Obs("s", i.toLong, if (i == 8) 500L else 50L + (i % 3))) ++
        (1 to 12).map(i => Obs("c", i.toLong, 50L))
      val in = MemoryStream[Obs]
      val q = AnomalyStream.flags(in.toDS(), n = 8, z = 2, minRows = 4)
        .writeStream.format("memory").queryName("w14_live")
        .outputMode(OutputMode.Append()).start()
      try {
        val (head, tail) = rows.partition(_.seq <= 6)
        in.addData(head: _*)
        q.processAllAvailable()
        in.addData(tail.reverse: _*)   // out of order within the batch
        q.processAllAvailable()
        val live = spark.table("w14_live").as[AnomalyFlag].collect()
          .map(f => (f.key, f.seq) -> ((f.zscore, f.isAnomaly))).toMap
        val batch = graft.operators.Trend.rollingAnomaly(
            rows.toDF("key", "seq", "y"), Seq("key"),
            Seq(org.apache.spark.sql.functions.col("seq")),
            org.apache.spark.sql.functions.col("y"),
            n = 8, z = 2, minRows = 4)
          .collect()
          .map(r => (r.getAs[String]("key"), r.getAs[Long]("seq")) ->
            ((Option(r.getAs[java.lang.Double]("zscore")).map(_.doubleValue()),
              r.getAs[Boolean]("is_anomaly")))).toMap
        assert(live.size == 24 && live == batch)
        assert(live(("s", 8L))._2 && !live(("c", 8L))._2)
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("A8c live running quantile == batch histogram estimate at every prefix") {
    import graft.streaming.HistogramStream
    import graft.streaming.HistogramStream.{Estimate, Obs}
    import org.apache.spark.sql.functions.col
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val (lo, hi, bins) = (0L, 1000L, 10)
      var s = 11L
      def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); s }
      val rows = (1 to 20).map(i => Obs("a", i.toLong, math.floorMod(next(), 1000L))) ++
        (1 to 9).map(i => Obs("b", i.toLong, 100L * i))
      val in = MemoryStream[Obs]
      val q = HistogramStream.quantile(in.toDS(), q = 0.9, lo, hi, bins)
        .writeStream.format("memory").queryName("a8c_live")
        .outputMode(OutputMode.Append()).start()
      try {
        val (head, tail) = rows.partition(_.seq <= 10)
        in.addData(head: _*)
        q.processAllAvailable()
        in.addData(tail.reverse: _*)   // out of order within the batch
        q.processAllAvailable()
        val live = spark.table("a8c_live").as[Estimate].collect()
          .map(e => (e.key, e.seq) -> ((e.nTotal, e.est))).toMap
        assert(live.size == rows.size)
        // every prefix's live estimate equals the batch estimator on
        // exactly that prefix (state crosses the micro-batch boundary)
        for (k <- Seq("a", "b"); upTo <- Seq(3L, 9L, 10L, 14L)
             if live.contains((k, upTo))) {
          val prefix = rows.filter(r => r.key == k && r.seq <= upTo)
          if (prefix.nonEmpty) {
            val st = graft.operators.QuantileHistogram.histogramState(
              prefix.toDF("key", "seq", "v"), Seq("key"), col("v"), lo, hi, bins)
            val batch = graft.operators.QuantileHistogram
              .quantiles(st, Seq("key"), Seq(0.9), lo, hi, bins)
              .collect().head
            assert(live((k, upTo)) == ((batch.getAs[Long]("n_total"),
              batch.getAs[Long]("est"))), s"key=$k upTo=$upTo")
          }
        }
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("W13 live EWMA == batch ewma, row for row") {
    import graft.streaming.AnomalyStream
    import graft.streaming.AnomalyStream.{EwmaOut, Obs}
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rows = (1 to 10).map(i => Obs("k", i.toLong, (i * i * 7 % 23).toLong))
      val in = MemoryStream[Obs]
      val q = AnomalyStream.ewma(in.toDS(), span = 4)
        .writeStream.format("memory").queryName("w13_live")
        .outputMode(OutputMode.Append()).start()
      try {
        in.addData(rows.take(5): _*)
        q.processAllAvailable()
        in.addData(rows.drop(5).reverse: _*)
        q.processAllAvailable()
        val live = spark.table("w13_live").as[EwmaOut].collect()
          .map(e => e.seq -> e.ewma).toMap
        val batch = graft.operators.Trend.ewma(
            rows.toDF("key", "seq", "y"), Seq("key"),
            Seq(org.apache.spark.sql.functions.col("seq")),
            org.apache.spark.sql.functions.col("y"), span = 4)
          .collect().map(r => r.getAs[Long]("seq") -> r.getAs[Double]("ewma"))
          .toMap
        assert(live.size == 10 && live == batch)
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("W15 live Holt == batch holt, row for row") {
    import graft.streaming.AnomalyStream
    import graft.streaming.AnomalyStream.{HoltOut, Obs}
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rows = (1 to 10).map(i => Obs("k", i.toLong, (i * i * 7 % 23).toLong))
      val in = MemoryStream[Obs]
      val q = AnomalyStream.holt(in.toDS())
        .writeStream.format("memory").queryName("w15_live")
        .outputMode(OutputMode.Append()).start()
      try {
        in.addData(rows.take(5): _*)
        q.processAllAvailable()
        in.addData(rows.drop(5).reverse: _*)
        q.processAllAvailable()
        val live = spark.table("w15_live").as[HoltOut].collect()
          .map(e => e.seq -> (e.level, e.trend, e.forecast)).toMap
        val batch = graft.operators.Trend.holt(
            rows.toDF("key", "seq", "y"), Seq("key"), Seq("seq"), "y")
          .collect().map(r => r.getAs[Long]("seq") ->
            (r.getAs[Double]("level"), r.getAs[Double]("trend"),
              r.getAs[Double]("forecast")))
          .toMap
        assert(live.size == 10 && live == batch)
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("W15 live Holt drops cross-batch late rows instead of folding out of order") {
    import graft.streaming.AnomalyStream
    import graft.streaming.AnomalyStream.{HoltOut, Obs}
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // a recursion can only sort WITHIN a micro-batch: seq 2 arriving
      // after seq 3 was already folded must be DROPPED (no output row,
      // state untouched), never folded out of order — folding it would
      // silently diverge level/trend from the batch fold for every
      // subsequent row. The emitted rows must equal the batch fold over
      // the rows that were actually folded (seq 1, 3, 5).
      val in = MemoryStream[Obs]
      val q = AnomalyStream.holt(in.toDS())
        .writeStream.format("memory").queryName("w15_late")
        .outputMode(OutputMode.Append()).start()
      try {
        in.addData(Obs("k", 1L, 10L), Obs("k", 3L, 20L))
        q.processAllAvailable()
        in.addData(Obs("k", 2L, 99L), Obs("k", 5L, 30L)) // seq 2 is LATE
        q.processAllAvailable()
        val live = spark.table("w15_late").as[HoltOut].collect()
          .map(e => e.seq -> (e.level, e.trend, e.forecast)).toMap
        val folded = Seq(("k", 1L, 10L), ("k", 3L, 20L), ("k", 5L, 30L))
        val batch = graft.operators.Trend.holt(
            folded.toDF("key", "seq", "y"), Seq("key"), Seq("seq"), "y")
          .collect().map(r => r.getAs[Long]("seq") ->
            (r.getAs[Double]("level"), r.getAs[Double]("trend"),
              r.getAs[Double]("forecast")))
          .toMap
        assert(!live.contains(2L), "the late row must not emit")
        assert(live == batch, "emitted rows == batch fold over folded rows")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("SAMP live weighted reservoir == batch A-Res sample at every prefix") {
    import graft.streaming.ReservoirStream
    import graft.streaming.ReservoirStream.{Item, Res}
    import org.apache.spark.sql.functions.col
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // varied weights incl. a zero-weight row (no selection mass)
      val rows = (1 to 14).map(i =>
        Item("a", i.toLong, 100L + i, w = (i % 5 + (if (i % 5 == 0) 0 else 0)).toDouble)) ++
        (1 to 6).map(i => Item("b", i.toLong, 200L + i, w = i.toDouble))
      val in = MemoryStream[Item]
      val q = ReservoirStream.sample(in.toDS(), k = 3, salt = "rs")(spark)
        .writeStream.format("memory").queryName("samp_live")
        .outputMode(OutputMode.Append()).start()
      try {
        val (head, tail) = rows.partition(_.seq <= 7)
        in.addData(head: _*)
        q.processAllAvailable()
        in.addData(tail.reverse: _*)    // out of order within the batch
        q.processAllAvailable()
        val live = spark.table("samp_live").as[Res].collect()
          .map(r => (r.group, r.seq) -> r.ids.toSet).toMap
        assert(live.size == rows.size)
        // at each checked prefix (incl. the micro-batch boundary), the
        // live reservoir equals the batch sampler over that prefix
        for (g <- Seq("a", "b"); upTo <- Seq(3L, 7L, 11L, 14L)
             if live.contains((g, upTo))) {
          val prefix = rows.filter(r => r.group == g && r.seq <= upTo)
          val batch = graft.operators.Sampling.weightedSamplePerGroup(
              prefix.toDF("group", "seq", "id", "w"),
              col("group"), col("id"), col("w"), k = 3, salt = "rs")
            .select("id").collect().map(_.getLong(0)).toSet
          assert(live((g, upTo)) == batch, s"group=$g upTo=$upTo")
        }
        // zero-weight rows never enter a reservoir
        val zeroIds = rows.filter(_.w <= 0.0).map(_.id).toSet
        assert(live.values.forall(_.intersect(zeroIds).isEmpty))
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("ST10 feed source: commit-order delivery; DOWNSTREAM watermark owns event-time lateness") {
    // The change feed delivers by COMMIT version (arrival order); rows
    // inside a delivery carry no event-time ordering. The contract
    // (SURVEY §2.9): a downstream event-time aggregation treats the
    // feed like any unordered source — ITS watermark on an event-time
    // column governs lateness. Here: an event-time window count over
    // the feed; a commit carrying an event OLDER than the advanced
    // watermark is dropped by the aggregation (the window already
    // emitted), while in-order commits land — the store never
    // re-orders or re-delivers on the subscriber's behalf.
    import graft.streaming.MergeSink
    import org.apache.spark.sql.functions.{col, window}
    val dir = java.nio.file.Files.createTempDirectory("graft_feed_et").toString
    val store = s"$dir/store"
    def put(k: Long, tsSec: Long, batch: Long): Unit =
      MergeSink.applyBucketedBatch(
        Seq((k, "upsert", k, new Timestamp(tsSec * 1000L)))
          .toDF("k", "op", "ver", "ts"),
        batch, store, "k", "op", "ver", Seq("ts"), nBuckets = 4)
    val t0 = 1700000100L // multiple of 300 — aligned to the window grid
    put(1L, t0 + 10, 0L)  // window [t0, t0+300)
    val q = spark.readStream.format("graft")
      .option("startingVersion", "earliest")
      .option("maxVersionsPerTrigger", "1") // one commit per micro-batch
      .load(store)
      .filter(col("change") =!= "delete")
      .withWatermark("ts_new", "0 seconds")
      .groupBy(window(col("ts_new"), "300 seconds").as("w"))
      .count()
      .selectExpr("CAST(w.start AS LONG) AS ws", "count")
      .writeStream.format("memory").queryName("feed_et")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      q.processAllAvailable()
      // advance event time far past the first window: watermark moves,
      // the [t0, t0+300) window closes and emits count=1
      put(2L, t0 + 900, 1L)
      q.processAllAvailable()
      put(3L, t0 + 1000, 2L) // same late window as key 2, still open
      q.processAllAvailable()
      val afterAdvance = spark.table("feed_et").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(afterAdvance.get(t0) == Some(1L),
        s"first window must close and emit once the watermark passes: $afterAdvance")
      // a LATE commit: event time back inside the already-emitted
      // window. Delivery happens (commit order), but the DOWNSTREAM
      // watermark drops it — the emitted window count never changes.
      put(4L, t0 + 20, 3L)
      // and one in-order event that closes the second window
      put(5L, t0 + 2000, 4L)
      q.processAllAvailable()
      val fin = spark.table("feed_et").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fin.get(t0) == Some(1L),
        s"the late event must NOT reopen or grow the emitted window: $fin")
      assert(fin.get(t0 + 900) == Some(2L),
        s"in-order windows keep emitting: $fin")
    } finally q.stop()
  }
}
