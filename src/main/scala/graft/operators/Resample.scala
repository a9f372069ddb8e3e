package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W10 — time-series resampling with forward fill: the dense hourly
  * timeline per key, with missing buckets carried forward from the last
  * observation ("what was the device's presence level at 3am, when it
  * said nothing?"). The standard telemetry densification that turns an
  * irregular event log into a regular series for downstream windows.
  *
  * Shape: per-key bucket counts (map-combined), then ONE key window
  * whose lead() names each observed hour's successor, and a sequence()
  * explode of the half-open gap [hr, next) — the filled value IS the
  * gap opener's count, so the forward fill falls out of the explode
  * itself. Two exchanges total (the bucket agg, the key window); the
  * earlier grid-join formulation built the dense calendar in a
  * separate frame and shuffled it back against the observations (a
  * bounds aggregate + an equi join + a carry window — five exchanges),
  * paying a join whose right side the gap explode reproduces for free.
  * Never a global calendar cross join; a key with a year-long span
  * costs its own rows only. */
object Resample {

  /** Dense per-`keyCol` hourly series over [min observed hour, max
    * observed hour], with `n_obs` (0 where silent) and `n_filled` (last
    * non-null count carried forward — at an observed hour, itself). */
  def hourlyForwardFill(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val hourly = events
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hr"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("hr"))
    hourly
      .withColumn("_next", lead(col("hr"), 1).over(w))
      .select(col(keyCol), col("n"), col("hr").as("_hr"),
        explode(sequence(col("hr"),
          coalesce(col("_next") - expr("interval 1 hour"), col("hr")),
          expr("interval 1 hour"))).as("hr"))
      .select(col(keyCol), col("hr"),
        when(col("hr") === col("_hr"), col("n")).otherwise(lit(0L)).as("n_obs"),
        col("n").as("n_filled"))
  }

  /** W12 — linear interpolation of an irregular series at arbitrary
    * query times ("what was the sensor reading at THIS moment?" — the
    * lerp upgrade of an as-of join, which only holds the last value).
    *
    * Built on the UNION trick, not a join: samples and query points
    * merge into ONE per-key ordered stream, a single window pass
    * carries (last sample before, first sample after) past every query
    * row, and the lerp is arithmetic on the carried columns. An as-of
    * join formulation would need TWO range joins (backward + forward);
    * here both directions fall out of one key-partitioned sort — one
    * exchange, one window exec, state = two carried (ts, y) pairs.
    *
    * Ties: a sample AT the query instant sorts before the query row
    * (is_q breaks the tie), lands on the backward side with t0 = t,
    * and the lerp degenerates to exactly y0. Duplicate sample
    * timestamps are pre-reduced with max() so the carried value is
    * deterministic. Query times outside the observed span hold the
    * nearest endpoint. `y` must be an integer column (callers quantize,
    * e.g. ×100); `yScale` converts the reported value back. */
  def interpolateAt(samples: DataFrame, queries: DataFrame, keyCol: String,
      tsCol: String, y: org.apache.spark.sql.Column,
      yScale: Long = 1L, digits: Int = 4): DataFrame = {
    val s = samples
      .groupBy(col(keyCol), col(tsCol))
      .agg(max(y.cast("long")).as("_y"))
      .select(col(keyCol), col(tsCol), lit(0).as("_is_q"), col("_y"))
    val q = queries
      .select(col(keyCol), col(tsCol)).distinct()
      .select(col(keyCol), col(tsCol), lit(1).as("_is_q"), lit(null).cast("long").as("_y"))
    val ord = Seq(col(tsCol), col("_is_q"))
    val back = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val fwd = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(0, Window.unboundedFollowing)
    val t = unix_micros(col(tsCol))
    val st = when(col("_is_q") === 0, t)
    val merged = s.unionByName(q)
      .withColumn("_y0", last(col("_y"), ignoreNulls = true).over(back))
      .withColumn("_t0", last(st, ignoreNulls = true).over(back))
      .withColumn("_y1", first(col("_y"), ignoreNulls = true).over(fwd))
      .withColumn("_t1", first(st, ignoreNulls = true).over(fwd))
      .filter(col("_is_q") === 1)
    // exact-long inputs → identical doubles in every engine; t1 > t ≥ t0
    // whenever both sides exist, so the divisor is never zero
    val lerp = col("_y0").cast("double") +
      (col("_y1") - col("_y0")).cast("double") * (t - col("_t0")).cast("double") /
        (col("_t1") - col("_t0")).cast("double")
    merged.select(col(keyCol), col(tsCol),
      (round(
        when(col("_y0").isNotNull && col("_y1").isNotNull, lerp)
          .otherwise(coalesce(col("_y0"), col("_y1")).cast("double"))
          / yScale, digits) + 0.0).as("interp"))
  }
}
