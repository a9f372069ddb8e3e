package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** O5 — 2-D Pareto frontier (skyline): the distinct (x, y) points not
  * dominated by any other (q dominates p iff q.x ≤ p.x ∧ q.y ≤ p.y and
  * q ≠ p, both axes minimized) — "cheapest AND nearest" style
  * multi-objective picks over device/corpus candidates.
  *
  * The textbook method sorts globally and keeps a running min — which
  * in Spark is a PARTITIONLESS window: every row through one task, the
  * single-task shape this codebase bans (cf. DenseSequence). Instead
  * the running min splits into two levels:
  *
  *   1. bucket points by ⌊x / W⌋; per-bucket min(y) is a map-combined
  *      aggregate, and the prefix-min over PRIOR buckets is a window
  *      over the |buckets|-sized table (tiny by construction — W sizes
  *      bucket count, not data);
  *   2. within each bucket, a window PARTITIONED BY bucket (parallel)
  *      takes the running min over (x, y)-preceding rows.
  *
  * A point survives iff y < min(prior-bucket min, within-bucket running
  * min) — together those cover exactly the lexicographically-preceding
  * points, the classic frontier criterion on distinct pairs. Points in
  * a prior bucket have strictly smaller x (⌊x'/W⌋ < ⌊x/W⌋ ⇒ x' < x), so
  * the split loses nothing. Both exchanges are on the bucket key; the
  * frontier never globally sorts the data. */
object Skyline {

  def paretoFrontier2D(points: DataFrame, xCol: String, yCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0.0, s"bucketWidth must be positive (got $bucketWidth)")
    val d = points.select(col(xCol).as("x"), col(yCol).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .distinct()
      .withColumn("_b", floor(col("x") / lit(bucketWidth)).cast("long"))
    // level 1: per-bucket min, then prefix-min across buckets — the
    // only unpartitioned window runs over |buckets| rows
    val bmin = d.groupBy("_b").agg(min(col("y")).as("_bymin"))
      .withColumn("_prior",
        min(col("_bymin")).over(Window.orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("_b"), col("_prior"))
    // level 2: within-bucket running min over (x, y)-preceding rows
    val wIn = Window.partitionBy(col("_b")).orderBy(col("x"), col("y"))
      .rowsBetween(Window.unboundedPreceding, -1)
    d.join(broadcast(bmin), "_b")
      .withColumn("_within", min(col("y")).over(wIn))
      // least() skips NULLs, so a missing level drops out of the bound
      .withColumn("_m", least(col("_prior"), col("_within")))
      .filter(col("_m").isNull || col("y") < col("_m"))
      .select(col("x").as(xCol), col("y").as(yCol))
  }
}
