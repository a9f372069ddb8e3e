package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §3.3 — the reference's canonical server-side endpoint ("Triangulation
  * of 'living area' via geolocation of associated SSIDs", README.md:16;
  * ssidentity.c:33-37), composed end to end from §2 operators:
  *
  *   obs → time-bucket → trilaterate per (device, bucket) [A7]
  *       → quantize to cells → modal cell per device [A2/W1 top-1]
  *
  * Plan shape at 100 TB: one partial+final hash aggregate for the
  * normal-equation sums keyed (mac, bucket) — the only wide shuffle —
  * then a per-mac window over the (much smaller) per-bucket estimates.
  * Sensor positions ride IN the obs rows (each sensor knows where it
  * is); a geo dimension would enter as a broadcast join (J1).
  */
object LivingArea {

  /** obs(mac, bucket, x, y, d) → (mac, home_x, home_y, n_buckets):
    * the modal estimated cell per device and how many time buckets
    * support it. Ties break on cell coordinates for determinism. */
  def modalLocation(obs: DataFrame, cell: Double = 1.0): DataFrame = {
    val est = Trilateration.estimate(obs, Seq("mac", "bucket"),
      col("x"), col("y"), col("d"))
    // +0.0 normalizes IEEE −0.0 BEFORE grouping so cell keys agree
    // across engines
    val cells = est.select(col("mac"),
      (round(col("est_x") / cell, 0) * cell + 0.0).as("cx"),
      (round(col("est_y") / cell, 0) * cell + 0.0).as("cy"))
      .groupBy("mac", "cx", "cy").agg(count(lit(1)).as("n_buckets"))
    val w = Window.partitionBy("mac")
      .orderBy(col("n_buckets").desc, col("cx"), col("cy"))
    cells.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("mac"), col("cx").as("home_x"),
        col("cy").as("home_y"), col("n_buckets"))
  }
}
