package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A7 — trilateration estimation ("Add Triangulation (Trilateration
  * Estimation)", ssidentity.c:35): per key, estimate a 2-D position from
  * ≥3 (sensor_x, sensor_y, distance) observations.
  *
  * Spark-first formulation (SURVEY.md §4.2): linearized least squares
  * kept entirely in built-in `sum` expressions + a final algebraic
  * `select` — a single partial+final HashAggregate, no UDAF, no Catalyst
  * internals, fully codegen'd and SQL-expressible (so the DuckDB oracle
  * can replay it verbatim).
  *
  * Linearization: each range equation (x−xi)² + (y−yi)² = di² expands to
  *   −2·xi·x − 2·yi·y + s = di² − xi² − yi²     with s = x²+y²
  * an overdetermined linear system A·[x y s]ᵀ = b. Normal equations AᵀA
  * and Aᵀb are 3×3 / 3×1 sums of per-row products → solve by Cramer.
  */
object Trilateration {

  /** obs(keyCols..., x, y, d) → (keyCols..., n_sensors, est_x, est_y).
    * Groups with <3 distinct sensor positions or a near-singular system
    * are dropped (no unique solution exists). Rows with a NULL
    * coordinate or distance are excluded up front — SQL sums skip NULL
    * while count(*) does not, so keeping them would build M from more
    * rows than v and silently solve an inconsistent system. */
  def estimate(obs: DataFrame, keyCols: Seq[String],
      x: Column, y: Column, d: Column, roundTo: Int = 3): DataFrame = {
    val a1 = x * -2.0
    val a2 = y * -2.0
    val b = d * d - x * x - y * y

    val clean = obs.filter(x.isNotNull && y.isNotNull && d.isNotNull)
    val agg = clean.groupBy(keyCols.map(col): _*).agg(
      countDistinct(x, y).as("n_sensors"),
      sum(a1 * a1).as("m11"), sum(a1 * a2).as("m12"), sum(a1).as("m13"),
      sum(a2 * a2).as("m22"), sum(a2).as("m23"),
      count(lit(1)).cast("double").as("m33"),
      sum(a1 * b).as("v1"), sum(a2 * b).as("v2"), sum(b).as("v3"))

    // Cramer's rule on the symmetric normal matrix
    val det =
      col("m11") * (col("m22") * col("m33") - col("m23") * col("m23")) -
      col("m12") * (col("m12") * col("m33") - col("m23") * col("m13")) +
      col("m13") * (col("m12") * col("m23") - col("m22") * col("m13"))
    val detX =
      col("v1") * (col("m22") * col("m33") - col("m23") * col("m23")) -
      col("m12") * (col("v2") * col("m33") - col("m23") * col("v3")) +
      col("m13") * (col("v2") * col("m23") - col("m22") * col("v3"))
    val detY =
      col("m11") * (col("v2") * col("m33") - col("m23") * col("v3")) -
      col("v1") * (col("m12") * col("m33") - col("m23") * col("m13")) +
      col("m13") * (col("m12") * col("v3") - col("v2") * col("m13"))

    // scale-invariant singularity test: det scales as entry³, so a
    // fixed cutoff drops well-conditioned small-unit systems and
    // passes garbage large-unit ones — normalize by the max |entry|³
    val mnorm = greatest(abs(col("m11")), abs(col("m12")), abs(col("m13")),
      abs(col("m22")), abs(col("m23")), abs(col("m33")))
    agg
      .filter(col("n_sensors") >= 3 && abs(det) > lit(1e-9) * pow(mnorm, 3))
      .select(keyCols.map(col) ++ Seq(
        col("n_sensors"),
        // + 0.0 normalizes IEEE −0.0 → +0.0 so rounded near-zero
        // estimates hash identically across engines
        (round(detX / det, roundTo) + 0.0).as("est_x"),
        (round(detY / det, roundTo) + 0.0).as("est_y")): _*)
  }
}
