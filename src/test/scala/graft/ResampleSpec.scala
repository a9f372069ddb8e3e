package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Resample

/** Hourly resample + forward fill: dense grid bounds, gap carry, and
  * per-key isolation. */
class ResampleSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gaps densify to their span and carry the last observed count") {
    val e = Seq(
      (1L, ts("2024-01-01 10:15:00")), (1L, ts("2024-01-01 10:45:00")),
      // hour 11 silent, hour 12 silent
      (1L, ts("2024-01-01 13:05:00")),
      (2L, ts("2024-01-01 22:00:00")))
      .toDF("user_id", "ts")
    val got = Resample.hourlyForwardFill(e, "user_id", "ts")
      .select(col("user_id"), date_format(col("hr"), "HH").as("h"),
        col("n_obs"), col("n_filled"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      (1L, "10", 2L, 2L),
      (1L, "11", 0L, 2L), // silent hour carries the 10:00 count
      (1L, "12", 0L, 2L),
      (1L, "13", 1L, 1L),
      (2L, "22", 1L, 1L))) // user 2's grid is its own single hour
  }

  test("the grid never extends beyond a key's own observed span") {
    val e = Seq((1L, ts("2024-01-01 05:00:00")), (2L, ts("2024-01-02 09:00:00")))
      .toDF("user_id", "ts")
    val got = Resample.hourlyForwardFill(e, "user_id", "ts")
    assert(got.count() == 2L, "one observed hour each → one grid row each")
  }

  test("n_filled equals n_obs at every observed hour") {
    val e = (0L until 200L).map(i =>
      (i % 7, ts(f"2024-01-01 ${(i % 24)}%02d:00:00"))).toDF("user_id", "ts")
    val bad = Resample.hourlyForwardFill(e, "user_id", "ts")
      .filter(col("n_obs") > 0 && col("n_obs") =!= col("n_filled")).count()
    assert(bad == 0L)
  }
}
