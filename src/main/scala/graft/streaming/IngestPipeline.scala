package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.operators.FrameParser

/** ST1/ST8 — the reference's ingest loop (ssidentity.c:81-114) as a
  * Structured Streaming pipeline: source → parse/filter/enrich → sinks.
  *
  * The C client is a single blocking `while(TRUE){recvfrom; parse;
  * printf; INSERT}` with at-least-once delivery (insert errors swallowed,
  * ssidentity.c:108-111). Here the SAME declarative transform
  * (FrameParser.parse — identical plan batch or streaming) runs
  * micro-batched with checkpointed exactly-once sinks; Catalyst
  * incrementalizes it, nothing is hand-scheduled.
  *
  * At fleet scale (S5, README.md:12-13): one query per sensor region or
  * one source with a `sensorId` column; the parquet sink partitions by
  * (date, sensorId) so downstream per-device analytics prune partitions.
  */
object IngestPipeline {

  /** The transform shared by batch backfills and live streams (P1-P7 +
    * F1-F8 from SURVEY §2). Input: RawFrame schema (ts, sensorId,
    * bytes); output: Observation columns. */
  def parse(frames: DataFrame): DataFrame = FrameParser.parse(frames)

  /** S1 — production TCP source (the reference's raw socket,
    * ssidentity.c:74-84, minus the kernel-capture privilege): sensors
    * write one `sensorId:epochMillis:base64(frame)` line per captured
    * frame. The SENSOR stamps the time at capture — the reference's own
    * semantics (it stamps at parse on the sensor, ssidentity.c:183) and
    * the only way to get per-frame time here: current_timestamp() in a
    * streaming query is the per-MICRO-BATCH constant, which would
    * collapse same-batch frames onto one ts and break dedup/gap
    * analytics. Malformed lines (non-numeric fields, broken base64) are
    * dropped, not poison pills: try_cast instead of ANSI cast, so one
    * stray TCP client cannot kill the query into a checkpoint-replay
    * loop. Tests drive it with a real ServerSocket; production would
    * swap the socket format for Kafka with the SAME downstream plan. */
  def fromSocket(spark: SparkSession, host: String, port: Int): DataFrame =
    parseFrameLines(spark.readStream.format("socket")
      .option("host", host).option("port", port).load())

  /** The `sensorId:epochMillis:base64(frame)` line contract shared by
    * every transport (socket, file log, and a Kafka `value` column
    * would decode identically): malformed lines drop via try_cast, one
    * bad producer never poisons the checkpoint-replay loop. */
  private def parseFrameLines(lines: DataFrame): DataFrame =
    lines.select(
        expr("timestamp_millis(try_cast(split_part(value, ':', 2) AS LONG))").as("ts"),
        expr("try_cast(split_part(value, ':', 1) AS LONG)").as("sensorId"),
        unbase64(substring_index(col("value"), ":", -1)).as("bytes"))
      .filter(col("ts").isNotNull && col("sensorId").isNotNull && col("bytes").isNotNull)

  /** S1 — REPLAYABLE upload channel (the fleet-scale form of
    * `ssidentity.c:30`'s "Add DB upload to server based on settings"):
    * sensors upload frame-line files into a landing directory; the
    * server consumes them through Spark's file-stream source, which is
    * the sandbox's Kafka-class source — per-micro-batch OFFSETS (the
    * processed-file log) commit to the checkpoint, so a crashed or
    * restarted query resumes EXACTLY where it stopped: files already
    * committed never re-emit, files not yet committed replay in full,
    * and with an exactly-once sink the pipeline is end-to-end
    * exactly-once (StreamingSpec proves the restart interleaving).
    * Same line contract and downstream plan as [[fromSocket]] — a real
    * deployment swaps this for `format("kafka")` (partition offsets
    * instead of file names; the connector jar is absent here) and
    * nothing downstream changes.
    *
    * `maxFilesPerTrigger` bounds a micro-batch the way Kafka's
    * `maxOffsetsPerTrigger` does — backlog drains in bounded batches
    * instead of one giant catch-up batch after downtime. */
  def fromFileLog(spark: SparkSession, landingDir: String,
      maxFilesPerTrigger: Int = 100): DataFrame =
    parseFrameLines(spark.readStream.format("text")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(landingDir))

  /** S3 — console sink (the reference's printf, ssidentity.c:89-95). */
  def toConsole(obs: DataFrame): DataStreamWriter[Row] =
    obs.writeStream.format("console").outputMode(OutputMode.Append())

  /** S4 — table append sink, exactly-once via checkpoint (upgrades the
    * reference's swallowed-error at-least-once, ssidentity.c:108-111).
    * Partitioned by observation date so a 100 TB fact table prunes. */
  def toParquet(obs: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    obs.withColumn("obs_date", to_date(col("ts")))
      .writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("obs_date", "sensorId")
      .outputMode(OutputMode.Append())

  /** ST8 — fan-out: one source feeding both console and table sinks via
    * foreachBatch. foreachBatch itself is only at-least-once (a crash
    * between the table write and the checkpoint commit replays the
    * batch), so the table write is made idempotent: each micro-batch
    * fully overwrites its own `_batch_id=<id>` directory. A replay of
    * batch N replaces EVERYTHING its failed attempt wrote — including
    * files under partition values that changed between attempts (e.g.
    * an obs_date shifted by a midnight-straddling wall-clock stamp),
    * which a dynamic partition overwrite keyed on leaf partitions would
    * leave behind. Net effect is exactly-once for the table even when
    * batch content is nondeterministic; readers see `_batch_id` as a
    * discovered partition column. The console echo stays best-effort
    * (it may repeat on replay, like the reference's printf). The batch
    * df is persisted so the two sinks share one computation of the
    * parse pipeline rather than re-reading the source. */
  def fanOut(obs: DataFrame, path: String, checkpoint: String,
      alsoConsole: Boolean = false): DataStreamWriter[Row] = {
    // a FRESH checkpoint restarts batch ids at 0, and batch-0's
    // overwrite would silently destroy a previous run's _batch_id=0
    // data — refuse the foot-gun up front
    val hconf = obs.sparkSession.sparkContext.hadoopConfiguration
    val outPath = new org.apache.hadoop.fs.Path(path)
    val offsetsPath = new org.apache.hadoop.fs.Path(checkpoint, "offsets")
    val fs = outPath.getFileSystem(hconf)
    require(fs.exists(offsetsPath) || !fs.exists(outPath) ||
        fs.listStatus(outPath).isEmpty,
      s"output $path already has data but checkpoint $checkpoint is fresh: " +
        "batch ids would restart at 0 and overwrite prior batches — use the " +
        "original checkpoint or a new output path")
    obs.withColumn("obs_date", to_date(col("ts")))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // persist only when two sinks actually share the computation
        if (alsoConsole) batch.persist()
        try {
          batch.write.mode("overwrite")
            .partitionBy("obs_date", "sensorId")
            .parquet(s"$path/_batch_id=$batchId")
          if (alsoConsole) batch.show(20, false)
        } finally { if (alsoConsole) batch.unpersist(); () }
      }
  }

  /** Start helper with a processing-time trigger (the micro-batch
    * replacement for the reference's busy loop). */
  def start(w: DataStreamWriter[Row], intervalMs: Long = 0L): StreamingQuery =
    (if (intervalMs > 0) w.trigger(Trigger.ProcessingTime(intervalMs)) else w).start()
}
