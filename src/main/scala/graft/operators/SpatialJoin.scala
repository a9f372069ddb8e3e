package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J9 — all-pairs radius join (spatial self-join): every pair of
  * points within Euclidean distance `r` — co-located devices, sensor
  * neighborhoods, duplicate site detection (the batch sibling of
  * LivingArea's trilateration: once devices have positions, "who is
  * near whom" is this join).
  *
  * The naive form is a cross join — O(n²) is 10¹⁸ comparisons at
  * 100 TB. Grid bucketing makes it an EQUI join: hash every point to a
  * ⌈r⌉-sized grid cell, explode ONE side to its 3×3 cell neighborhood,
  * and join on the cell key. Losslessness: two points within r differ
  * by < r per axis, so B's cell is always among A's 9 neighbors — the
  * candidate set is a superset, and the exact d² ≤ r² filter finishes
  * the job. Candidate volume is O(n · density), not O(n²).
  *
  * Scale shape: one shuffle on the cell key (both sides co-partition);
  * the 9× explode lands on the build side only. Urban-core cell skew
  * is ordinary join skew — AQE skew-split applies; for extreme
  * hotspots shrink the cell to r/2 (25 neighbor cells, smaller
  * buckets) — the [[ZOrder]] curve keys the same trick at file level.
  * All-integer coordinates keep d² in BIGINT — exact in any engine.
  */
object SpatialJoin {

  /** Unique unordered pairs (id_a < id_b) within `r`, with squared
    * distance. Coordinates must be integral (LongType after cast) —
    * d² stays exact; `r` itself may be fractional. */
  def radiusPairs(points: DataFrame, id: String, x: String, y: String,
      r: Double): DataFrame = {
    require(r > 0.0, s"radius must be positive (got $r)")
    val cell = math.ceil(r).toLong
    val r2 = {
      val rCeil2 = r * r
      require(rCeil2 <= Long.MaxValue.toDouble, "radius out of range")
      math.floor(rCeil2).toLong // integer d² ≤ r² ⇔ d² ≤ floor(r²)
    }
    val p = points.select(col(id).as("pid"),
      col(x).cast("long").as("px"), col(y).cast("long").as("py"))
    def cellOf(c: Column) = floor(c.cast("double") / lit(cell.toDouble)).cast("long")
    val withCell = p.withColumn("cx", cellOf(col("px")))
      .withColumn("cy", cellOf(col("py")))
    // left side fans out to its 3×3 neighborhood; right side stays 1×
    val offsets = array((-1L to 1L).flatMap(dx => (-1L to 1L).map(dy =>
      struct(lit(dx).as("dx"), lit(dy).as("dy")))): _*)
    val a = withCell.select(col("pid").as("id_a"), col("px").as("xa"),
        col("py").as("ya"), explode(offsets).as("o"),
        col("cx"), col("cy"))
      .select(col("id_a"), col("xa"), col("ya"),
        (col("cx") + col("o.dx")).as("jx"), (col("cy") + col("o.dy")).as("jy"))
    val b = withCell.select(col("pid").as("id_b"), col("px").as("xb"),
      col("py").as("yb"), col("cx").as("jx"), col("cy").as("jy"))
    a.join(b, Seq("jx", "jy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("d2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("d2") <= lit(r2))
      .select(col("id_a"), col("id_b"), col("d2"))
  }
}
