package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ST2–ST6, J3, A8 — event-time presence analytics over the observation
  * stream (README.md:17-19: "Active hours", "Habitual movements",
  * "Tracking / Arrival alerts").
  *
  * Every builder takes a DataFrame and returns a DataFrame: the SAME
  * plan works on a batch read (backfill / oracle check) and a streaming
  * read (live) — Structured Streaming's core property. Watermarks only
  * restrict state retention; they don't change batch semantics.
  */
object PresenceAnalytics {

  /** ST5 — event-time watermark (sensor uploads arrive late once the
    * fleet merge lands, ssidentity.c:30; clock skew makes lateness real).
    * On batch inputs this is a no-op, so oracle checks still apply. */
  def watermarked(obs: DataFrame, delay: String = "1 hour"): DataFrame =
    obs.withWatermark("ts", delay)

  /** ST2 — tumbling activity histogram per device ("Active hours"). */
  def tumblingCounts(obs: DataFrame, width: String = "1 hour"): DataFrame =
    obs.groupBy(window(col("ts"), width), col("mac"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("mac"), col("n"))

  /** ST3 — sliding presence ("Tracking": is the device around now?). */
  def slidingCounts(obs: DataFrame, width: String = "10 minutes",
      slide: String = "1 minute"): DataFrame =
    obs.groupBy(window(col("ts"), width, slide), col("mac"))
      .agg(count(lit(1)).as("n"), max(col("rssi")).as("peak_rssi"))
      .select(col("window.start").as("window_start"), col("mac"),
        col("n"), col("peak_rssi"))

  /** ST4 — gap-based dwell sessions ("Habitual movements": visits). */
  def dwellSessions(obs: DataFrame, gap: String = "15 minutes"): DataFrame =
    obs.groupBy(session_window(col("ts"), gap), col("mac"))
      .agg(count(lit(1)).as("n_obs"), min(col("dist")).as("nearest_m"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("mac"),
        col("n_obs"), col("nearest_m"))

  /** ST6 — stateful dedup of re-heard frames (fixture rows 3-4 of
    * observations.db are the same frame twice). Streaming: bounded state
    * via watermark; batch: plain dropDuplicates. */
  def dedupWithinWatermark(obs: DataFrame, delay: String = "10 minutes",
      keys: Seq[String] = Seq("mac", "ts", "sensorId")): DataFrame =
    if (obs.isStreaming)
      obs.withWatermark("ts", delay).dropDuplicatesWithinWatermark(keys)
    else obs.dropDuplicates(keys)

  /** J3 — watchlist tracking: stream ⋈ broadcast static watchlist
    * (left_semi keeps only watched devices; the dimension never
    * shuffles). */
  def watchlistHits(obs: DataFrame, watchlist: DataFrame): DataFrame =
    obs.join(broadcast(watchlist), Seq("mac"), "left_semi")

  /** A8 — incremental per-device counters (run under
    * outputMode("update"); same plan aggregates a batch backfill). */
  def liveCounts(obs: DataFrame): DataFrame =
    obs.groupBy(col("mac"))
      .agg(count(lit(1)).as("n_obs"), max(col("ts")).as("last_seen"),
        min(col("dist")).as("nearest_m"))

  /** S6/P6 — settings-driven distance filter ("Add distance filtering
    * based on settings" + remote-admin settings channel,
    * ssidentity.c:29-31): per-sensor max-range settings enter as a
    * broadcast stream-static join; re-reading the settings table per
    * micro-batch picks up remote edits without restarting the query. */
  def distanceFiltered(obs: DataFrame, settings: DataFrame): DataFrame =
    obs.join(broadcast(settings), Seq("sensorId"))
      .filter(col("dist") <= col("max_dist_m"))
      .select(obs.columns.map(col).toSeq: _*)

  /** ST9 — stream-stream co-observation join: the LIVE form of J2's
    * trilateration prerequisite (ssidentity.c:35 needs the same MAC
    * heard by different sensors at ~the same time). Both sides carry
    * event-time watermarks and the join predicate bounds the time
    * skew, so Spark can evict join state older than
    * watermark + tolerance — state stays O(tolerance · rate), not
    * unbounded. Inner join: matches emit as soon as both sides arrive.
    * The same plan is J2 when both inputs are batch reads. */
  /** `pairDedup = true` emits each unordered sensor pair ONCE
    * (l_sensor < r_sensor) — required when both inputs are the SAME
    * feed (J2 parity: the self-join would otherwise emit (s1,s2) and
    * (s2,s1)). Leave false for two heterogeneous streams, where the
    * sensor ids carry side-specific meaning. */
  def coObservations(left: DataFrame, right: DataFrame,
      toleranceSec: Long = 60, delay: String = "2 minutes",
      joinType: String = "inner", pairDedup: Boolean = false): DataFrame = {
    val l = left.withWatermark("ts", delay)
      .select(col("mac"), col("ts").as("l_ts"), col("sensorId").as("l_sensor"))
    val r = right.withWatermark("ts", delay)
      .select(col("mac").as("r_mac"), col("ts").as("r_ts"),
        col("sensorId").as("r_sensor"))
    val sensorCond =
      if (pairDedup) col("l_sensor") < col("r_sensor")
      else col("l_sensor") =!= col("r_sensor")
    // left_outer: unmatched left rows emit (with null right columns)
    // only once the right watermark passes l_ts + tolerance — the
    // engine can then prove no match can still arrive
    l.join(r,
        col("mac") === col("r_mac") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $toleranceSec SECONDS") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $toleranceSec SECONDS") &&
        sensorCond,
        joinType)
      .select(col("mac"), col("l_ts"), col("l_sensor"),
        col("r_ts"), col("r_sensor"))
  }

  /** The BATCH/backfill form of [[coObservations]] with the hot-key
    * flood bounded (VERDICT r8 #3): the streaming form's state is
    * watermark-bounded, but its batch twin equi-joins on `mac` with
    * the tolerance as residual — ONE beacon-spamming device makes that
    * key quadratic at scale. Two structural fixes, both from this
    * codebase's existing idioms:
    *
    *  1. '''Binning''' (the [[graft.operators.RangeJoin]] shape): time
    *     quantizes into tolerance-width bins and the equi key becomes
    *     `(mac, bin)` — a long-lived chatty mac spreads across bins
    *     instead of concentrating on one shuffle key. `|Δts| ≤ tol`
    *     implies the partner's bin is adjacent, so each left row
    *     probes exactly bins `{b−1, b, b+1}` and every matching pair
    *     meets on exactly ONE probe bin (no dedup pass needed).
    *  2. '''Density cap''' (the Dedup `maxBucket` idiom): at most
    *     `maxPerBucket` rows survive per `(mac, bin)`, kept in
    *     deterministic `(ts, sensorId)` order — rows tied on BOTH are
    *     full duplicates of the 3-column input, so the cut is
    *     order-insensitive. Worst-case output per (mac, bin pair) is
    *     `maxPerBucket²`, never O(n²) in one key; the cap must be
    *     mirrored in any oracle replay (the l2 banding precedent).
    *
    * Inner join only (the batch twin's case); inputs carry
    * `(mac, ts, sensorId)` like [[coObservations]]'s. */
  def boundedCoObservations(left: DataFrame, right: DataFrame,
      toleranceSec: Long = 60, maxPerBucket: Int = 32,
      pairDedup: Boolean = false): DataFrame = {
    require(toleranceSec > 0, s"toleranceSec must be positive (got $toleranceSec)")
    require(maxPerBucket >= 1, s"maxPerBucket must be >= 1 (got $maxPerBucket)")
    val w = toleranceSec * 1000000L
    // `div` not `/`: truncating long division keeps boundary rows in
    // the same bin on both engine and oracle (RangeJoin precedent)
    def capped(df: DataFrame, mac: String, ts: String, sen: String) =
      df.select(col("mac").as(mac), col("ts").as(ts), col("sensorId").as(sen))
        .withColumn("_bin", expr(s"unix_micros($ts) div ${w}L"))
        .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col(mac), col("_bin")).orderBy(col(ts), col(sen))))
        .filter(col("_rn") <= maxPerBucket).drop("_rn")
    val l = capped(left, "mac", "l_ts", "l_sensor")
      .withColumn("_pbin", explode(array(col("_bin") - 1, col("_bin"), col("_bin") + 1)))
      .drop("_bin")
    val r = capped(right, "r_mac", "r_ts", "r_sensor")
    val sensorCond =
      if (pairDedup) col("l_sensor") < col("r_sensor")
      else col("l_sensor") =!= col("r_sensor")
    l.join(r,
        col("mac") === col("r_mac") && l("_pbin") === r("_bin") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $toleranceSec SECONDS") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $toleranceSec SECONDS") &&
        sensorCond)
      .select(col("mac"), col("l_ts"), col("l_sensor"),
        col("r_ts"), col("r_sensor"))
  }
}
