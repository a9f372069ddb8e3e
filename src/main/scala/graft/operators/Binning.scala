package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A19 — equal-frequency discretization (quantile binning): assign each
  * row the quantile bucket of its value within its group — the feature
  * bucketing step before histogram features, calibration curves, or
  * stratified mixing.
  *
  * The naive formulation is `ntile(n) OVER (ORDER BY y)` — a
  * PARTITIONLESS window that sorts the entire corpus in one task. This
  * operator is the scale shape instead: per-group bin BOUNDARIES from
  * one exact-percentile aggregate (group-cardinality output), joined
  * back (broadcast — the boundary table is tiny), and a map-side
  * comparison chain assigns bins. Two scans of nothing: one aggregate
  * exchange + one map pass; no global sort anywhere.
  *
  * ntile() semantics differ at ties (it splits equal values across
  * bins by arbitrary row order); boundary-based binning is the
  * DETERMINISTIC variant — equal values always share a bin, so bin
  * populations drift from n/bins exactly where duplicates sit on a
  * boundary. That trade is what makes the result reproducible and
  * engine-replayable. `y` must be integer (callers quantize) so the
  * percentile interpolation is bit-identical across engines. */
object Binning {

  /** Per-group equal-frequency bin assignment: adds `bin` ∈ [1, nBins].
    * Boundary k is the exact k/nBins percentile (linear interpolation);
    * values <= boundary fall in the lower bin. */
  def equalFreqBins(df: DataFrame, group: Seq[String], y: Column,
      nBins: Int = 4): DataFrame = {
    require(nBins >= 2 && nBins <= 64, s"nBins must be in [2, 64] (got $nBins)")
    Seq("_y", "_bounds").foreach(cn =>
      require(!df.columns.contains(cn),
        s"input already has a '$cn' column — it would be overwritten and dropped"))
    val pcts = (1 until nBins).map(k => k.toDouble / nBins)
    val base = df.withColumn("_y", y.cast("long"))
    val bounds = base.groupBy(group.map(col): _*)
      .agg(expr(s"percentile(_y, array(${pcts.mkString(", ")}))").as("_bounds"))
    val bin = (1 until nBins).map(k =>
      when(col("_y") > element_at(col("_bounds"), k), 1).otherwise(0))
      .reduce(_ + _) + 1
    base.join(broadcast(bounds), group)
      .withColumn("bin", bin)
      .drop("_y", "_bounds")
  }

  /** A21 — winsorization: clamp each value into its group's
    * [pLow, pHigh] percentile band — the robust-preprocessing step
    * before moment-based statistics (an OLS fit or z-score over raw
    * heavy-tailed data is one fat-finger reading away from garbage;
    * see [[TextAnalysis.robustOutliers]] for the flag-only variant).
    * Same shape as [[equalFreqBins]]: one exact-percentile aggregate,
    * broadcast joinback, map-side least/greatest — the corpus never
    * shuffles. Adds `y_w` (clamped, interpolated bounds → double). */
  def winsorize(df: DataFrame, group: Seq[String], y: Column,
      pLowPct: Int = 1, pHighPct: Int = 99, digits: Int = 4): DataFrame = {
    require(0 <= pLowPct && pLowPct < pHighPct && pHighPct <= 100,
      s"need 0 <= pLow < pHigh <= 100 (got $pLowPct/$pHighPct)")
    Seq("_y", "_lo", "_hi").foreach(cn =>
      require(!df.columns.contains(cn),
        s"input already has a '$cn' column — it would be overwritten and dropped"))
    val base = df.withColumn("_y", y.cast("long"))
    val bounds = base.groupBy(group.map(col): _*)
      .agg(expr(s"percentile(_y, ${pLowPct / 100.0})").as("_lo"),
        expr(s"percentile(_y, ${pHighPct / 100.0})").as("_hi"))
    base.join(broadcast(bounds), group)
      .withColumn("y_w",
        round(least(greatest(col("_y").cast("double"), col("_lo")), col("_hi")),
          digits) + 0.0)
      .drop("_y", "_lo", "_hi")
  }
}
