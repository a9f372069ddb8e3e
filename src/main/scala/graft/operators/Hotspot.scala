package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GEO — grid hotspot detection (a Getis-Ord-shaped census): per
  * occupied cell, its own count, its 3×3-neighborhood sum, and a hot
  * flag comparing the neighborhood against the global density.
  *
  * The neighborhood sum is NOT a spatial distance join: each cell
  * explodes its count into its 9 neighbor keys map-side (a ×9 row
  * blowup of the CELL table, not the observation table) and ONE
  * equi-groupBy re-aggregates — the same bucketed-equi-join discipline
  * as [[SpatialJoin]], so it scales with occupied cells, never with
  * cell-pair combinations. The hot flag is exact integer arithmetic
  * over OCCUPIED-cell densities — a sparse grid must not dilute its
  * neighborhoods with empty cells, so the comparison is per occupied
  * neighbor:  nbr_sum / nbr_cells ≥ factor · total / n_cells,
  * cross-multiplied to  nbr_sum · n_cells ≥ factor · nbr_cells · total
  * so boundary cells never flip on float rounding. */
object Hotspot {

  /** One row per OCCUPIED cell: (cx, cy, n, nbr_sum, nbr_cells, hot).
    * Cell coords must be integral (callers floor to their grid). */
  def gridHotspots(cells: DataFrame, xCol: String, yCol: String,
      hotFactor: Int = 1): DataFrame = {
    require(hotFactor >= 1, s"hotFactor must be >= 1 (got $hotFactor)")
    val counts = cells
      .groupBy(col(xCol).cast("long").as("cx"), col(yCol).cast("long").as("cy"))
      .agg(count(lit(1)).as("n"))
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)
    val contrib = counts.select(explode(array(offsets.map { case (dx, dy) =>
        struct((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy"),
          col("n").as("n")) }: _*)).as("c"))
      .select("c.*")
    val nbr = contrib.groupBy("cx", "cy")
      .agg(sum("n").as("nbr_sum"), count(lit(1)).as("nbr_cells"))
    val totals = counts.agg(sum("n").as("_total"), count(lit(1)).as("_ncells"))
    counts.join(nbr, Seq("cx", "cy"))
      .crossJoin(broadcast(totals))
      .select(col("cx"), col("cy"), col("n"), col("nbr_sum"), col("nbr_cells"),
        (col("nbr_sum") * col("_ncells") >=
          lit(hotFactor.toLong) * col("nbr_cells") * col("_total")).as("hot"))
  }
}
