package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A24 — exact WEIGHTED median per group (the a8 percentile family
  * assumes every row counts once; curation pipelines weight rows — by
  * replication factor, trust score, or sampling inverse — and the
  * median must follow the weights).
  *
  * Definition: the smallest value v whose cumulative weight reaches
  * half the total, 2·cumw(v) ≥ totw — the lower weighted median,
  * deterministic with NO tie-break column: rows sharing a value reach
  * the threshold as a block (the last row of a value-tie always
  * carries the full block's cumulative weight), so the chosen VALUE is
  * order-independent even though intra-tie cumulative sums are not.
  *
  * Shape: one per-group window (hash-partitioned on the group — never
  * partitionless) computing the running and total weight in a single
  * Window exec, then a map-combined min. Integer weights keep the
  * threshold comparison exact (2·cumw and totw are longs). */
object WeightedStats {

  def weightedMedian(df: DataFrame, groupCol: String, value: Column,
      weight: Column): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_v"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.select(col(groupCol), value.as("_v"), weight.cast("long").as("_w"))
      .withColumn("_cumw", sum(col("_w")).over(cum))
      .withColumn("_totw", sum(col("_w")).over(all))
      .filter(col("_cumw") * 2 >= col("_totw"))
      .groupBy(groupCol)
      .agg(min(col("_v")).as("weighted_median"),
        first(col("_totw")).as("total_weight"))
  }

  /** A25 — Benford first-digit audit (Newcomb 1881 / Benford 1938; the
    * classic fabricated-numbers detector): observed first-significant-
    * digit counts of a positive measure vs the Benford expectation
    * n·log10(1 + 1/d), reported in exact integer micro-counts. The
    * digit comes from the value's STRING rendering (first [1-9] char)
    * — no log10/pow on the data path, so the extraction replays
    * bit-identically in any engine. One map-side digit projection, one
    * 9-row aggregate, the 1-row total as a broadcast scalar. */
  def benfordAudit(df: DataFrame, value: Column): DataFrame = {
    val digit = regexp_extract(value.cast("string"), "[1-9]", 0)
    val counts = df.select(digit.as("digit"))
      .filter(col("digit") =!= "")
      .groupBy("digit").agg(count(lit(1)).as("n_observed"))
    val total = counts.agg(sum("n_observed").as("_n"))
    counts.crossJoin(broadcast(total))
      .withColumn("n_expected_micro",
        floor(col("_n").cast("double") *
          (log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0)))
          * lit(1000000.0)).cast("long"))
      .withColumn("deviation_micro",
        col("n_observed") * lit(1000000L) - col("n_expected_micro"))
      .select("digit", "n_observed", "n_expected_micro", "deviation_micro")
  }
}
