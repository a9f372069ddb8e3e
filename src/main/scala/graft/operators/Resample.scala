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
  * Shape: per-key bucket counts (map-combined), per-key [min, max]
  * bounds (same aggregate pass shape), a sequence() explode bounded by
  * each key's own span — never a global calendar cross join — and ONE
  * key-partitioned window whose ignoreNulls last() is the forward
  * fill. State per row is one carried value; a key with a year-long
  * span costs its own rows only. */
object Resample {

  /** Dense per-`keyCol` hourly series over [min observed hour, max
    * observed hour], with `n_obs` (0 where silent) and `n_filled` (last
    * non-null count carried forward — at an observed hour, itself). */
  def hourlyForwardFill(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val hourly = events
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hr"))
      .agg(count(lit(1)).as("n"))
    val bounds = hourly.groupBy(col(keyCol))
      .agg(min(col("hr")).as("_lo"), max(col("hr")).as("_hi"))
    val grid = bounds.select(col(keyCol),
      explode(sequence(col("_lo"), col("_hi"), expr("interval 1 hour"))).as("hr"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(hourly, Seq(keyCol, "hr"), "left_outer")
      .select(col(keyCol), col("hr"),
        coalesce(col("n"), lit(0L)).as("n_obs"),
        last(col("n"), ignoreNulls = true).over(w).as("n_filled"))
  }
}
