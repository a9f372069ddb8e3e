package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A8c — MERGEABLE quantile state: fixed-domain equi-width histograms
  * whose counts sum, plus a deterministic quantile estimator over the
  * merged counts. The quantile member of the incremental-state family
  * ([[BitmapDistinct]] for distincts, [[Snapshot.contentDigests]] for
  * content): per-shard/per-day states persist as (group, bin, n) rows
  * and MERGE by addition — estimating p99 latency over a year of
  * 100 TB shards never revisits a raw row, where exact `percentile()`
  * must re-aggregate everything and `approx_percentile` sketches don't
  * replay across engines.
  *
  * Exactness contract: bin counts are EXACT integers (map-combined
  * groupBy); the estimate interpolates uniformly inside the containing
  * bin, so |est − true quantile| < one bin width ALWAYS (both lie in
  * the same bin — the bound is structural, not probabilistic), and the
  * whole pipeline is integer arithmetic + one ceil(q·N) per query:
  * bit-identical in any engine, hence DuckDB-oracle-checkable, unlike
  * sketch quantiles. Out-of-domain values clamp into the edge bins
  * (they perturb the estimate only at the extremes they sit in).
  *
  * Scale shape: state build is ONE map-combined groupBy (the only pass
  * over data); merge is a union + sum over (group, ≤nBins) rows; the
  * estimator's window runs over ≤nBins rows per group, never data.
  */
object QuantileHistogram {

  private def binExpr(v: Column, lo: Long, binWidth: Long, nBins: Int): Column =
    least(lit(nBins - 1L), greatest(lit(0L),
      floor((v - lit(lo)) / lit(binWidth)).cast("long")))

  /** Build the state: (groupCols..., bin, n) over domain [lo, hi),
    * `nBins` equal-width bins; hi−lo must divide evenly so the bin
    * edges are exact integers in every engine. Only occupied bins
    * appear (the merge and the estimator both tolerate gaps). */
  def histogramState(df: DataFrame, group: Seq[String], v: Column,
      lo: Long, hi: Long, nBins: Int): DataFrame = {
    require(nBins >= 2 && nBins <= 4096, s"nBins must be in [2, 4096] (got $nBins)")
    require(hi > lo, s"domain must be non-empty (got [$lo, $hi))")
    require((hi - lo) % nBins == 0,
      s"hi - lo (${hi - lo}) must be divisible by nBins ($nBins) for exact edges")
    val w = (hi - lo) / nBins
    df.groupBy(group.map(col) :+ binExpr(v.cast("long"), lo, w, nBins).as("bin"): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Merge shard states by addition — associative/commutative, so
    * daily states roll into monthly into yearly without raw data. */
  def mergeStates(states: Seq[DataFrame], group: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeStates needs at least one state")
    states.reduce(_ unionByName _)
      .groupBy((group :+ "bin").map(col): _*)
      .agg(sum("n").as("n"))
  }

  /** Pure single-threaded twins of the bin function and the estimator —
    * the single source of truth the relational forms mirror and the
    * LIVE processor ([[graft.streaming.HistogramStream]]) calls per
    * row, so batch backfill and stream provably agree (cross-checked
    * in StreamingSpec, same discipline as Trend.anomalyDecision). */
  def binOf(v: Long, lo: Long, binWidth: Long, nBins: Int): Int =
    math.min(nBins - 1L,
      math.max(0L, math.floor((v - lo).toDouble / binWidth).toLong)).toInt

  /** Estimate over a dense bin-count vector; None while empty. */
  def estimate(bins: IndexedSeq[Long], q: Double, lo: Long,
      binWidth: Long): Option[Long] = {
    val n = bins.sum
    if (n == 0L) None
    else {
      val r = math.max(1L, math.ceil(q * n).toLong)
      var cum = 0L
      var i = 0
      while (i < bins.length) {
        val c = bins(i)
        if (c > 0 && cum < r && r <= cum + c)
          return Some(lo + i.toLong * binWidth +
            math.floor((r - cum).toDouble * binWidth / c).toLong)
        cum += c
        i += 1
      }
      None
    }
  }

  /** Quantile estimates from a (merged) state: one row per (group, q).
    * Rank r = max(1, ⌈q·N⌉); the estimate places r uniformly inside
    * its containing bin, biased to the lower edge by integer division:
    * est = lo + bin·w + ⌊(r − cum_before)·w / n_bin⌋. */
  def quantiles(state: DataFrame, group: Seq[String], qs: Seq[Double],
      lo: Long, hi: Long, nBins: Int): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1] (got ${qs.mkString(", ")})")
    require((hi - lo) % nBins == 0,
      s"hi - lo (${hi - lo}) must be divisible by nBins ($nBins) for exact edges")
    val w = (hi - lo) / nBins
    val cum = state.withColumn("_cum",
        sum("n").over(Window.partitionBy(group.map(col): _*).orderBy("bin")))
      .withColumn("_before", col("_cum") - col("n"))
    val targets = state.groupBy(group.map(col): _*)
      .agg(sum("n").as("n_total"))
      .select(group.map(col) :+ col("n_total") :+
        explode(array(qs.map(lit): _*)).as("q"): _*)
      .withColumn("_r", greatest(lit(1L),
        ceil(col("q") * col("n_total")).cast("long")))
    targets.join(cum, group)
      .filter(col("_before") < col("_r") && col("_r") <= col("_cum"))
      .select(group.map(col) :+ col("q") :+ col("n_total") :+
        (lit(lo) + col("bin") * lit(w) +
          floor((col("_r") - col("_before")) * lit(w) / col("n")).cast("long"))
          .as("est"): _*)
  }
}
