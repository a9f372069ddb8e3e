package graft

import org.apache.spark.sql.functions._

import graft.operators.Trilateration

/** A7 — trilateration validated on synthetic geometry with known ground
  * truth (SURVEY.md §7.5: "validate vs a synthetic geometry where truth
  * is known"). */
class TrilaterationSpec extends SparkTestBase {
  import spark.implicits._

  private def obsFor(truth: Map[Long, (Double, Double)],
      sensors: Seq[(Double, Double)], noise: Double = 0.0) = {
    val rows = for {
      (mac, (tx, ty)) <- truth.toSeq
      ((sx, sy), i) <- sensors.zipWithIndex
    } yield {
      val d = math.sqrt((sx - tx) * (sx - tx) + (sy - ty) * (sy - ty)) +
        noise * math.sin(mac * 13 + i)
      (mac, sx, sy, d)
    }
    rows.toDF("mac", "x", "y", "d")
  }

  private val sensors = Seq((0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (10.0, 10.0))
  private val truth = Map(1L -> (3.0, 4.0), 2L -> (7.5, 2.5), 3L -> (5.0, 5.0))

  test("exact distances recover exact positions") {
    val est = Trilateration.estimate(obsFor(truth, sensors),
      Seq("mac"), col("x"), col("y"), col("d")).collect()
    assert(est.length == 3)
    est.foreach { r =>
      val (tx, ty) = truth(r.getAs[Long]("mac"))
      assert(math.abs(r.getAs[Double]("est_x") - tx) < 1e-6)
      assert(math.abs(r.getAs[Double]("est_y") - ty) < 1e-6)
    }
  }

  test("noisy distances stay close (least-squares, overdetermined)") {
    val est = Trilateration.estimate(obsFor(truth, sensors, noise = 0.2),
      Seq("mac"), col("x"), col("y"), col("d")).collect()
    est.foreach { r =>
      val (tx, ty) = truth(r.getAs[Long]("mac"))
      assert(math.abs(r.getAs[Double]("est_x") - tx) < 0.5)
      assert(math.abs(r.getAs[Double]("est_y") - ty) < 0.5)
    }
  }

  test("underdetermined groups (<3 sensor positions) are dropped") {
    val est = Trilateration.estimate(
      obsFor(truth, sensors.take(2)), Seq("mac"), col("x"), col("y"), col("d"))
    assert(est.count() == 0)
  }
}
