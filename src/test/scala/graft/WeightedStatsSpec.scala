package graft

import org.apache.spark.sql.functions._

import graft.operators.WeightedStats

/** A24 weighted median + A25 Benford audit: hand models, tie safety,
  * and the zero/negative-value guard. */
class WeightedStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("A24: weights move the median; definition is the lower weighted median") {
    val df = Seq(
      // group g: a heavy tail row dominates — median jumps to it
      ("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 10.0, 8L),
      // group h: uniform weights, even count → lower median (2 of {1,2,3,4})
      ("h", 1.0, 1L), ("h", 2.0, 1L), ("h", 3.0, 1L), ("h", 4.0, 1L),
      // group i: a heavy LOW value qualifies at exactly half the total
      ("i", 1.0, 2L), ("i", 5.0, 1L), ("i", 5.0, 1L))
      .toDF("grp", "v", "w")
    val got = WeightedStats.weightedMedian(df, "grp", col("v"), col("w"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got("g") == ((10.0, 10L)), got)
    assert(got("h") == ((2.0, 4L)), got)
    assert(got("i") == ((1.0, 4L)), "2·cumw ≥ totw is inclusive at the boundary")
    // duplicate-value ties: the chosen VALUE is order-independent
    val ties = Seq(("t", 5.0, 1L), ("t", 5.0, 1L), ("t", 1.0, 1L)).toDF("grp", "v", "w")
    assert(WeightedStats.weightedMedian(ties, "grp", col("v"), col("w"))
      .collect().head.getDouble(1) == 5.0)
  }

  test("A25: digits from the string rendering; zeros drop; expectation matches the closed form") {
    val df = Seq(1.5, 0.19, 123.0, 2.3, 0.02, 0.0, 9.9).toDF("v")
    val got = WeightedStats.benfordAudit(df, col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // first significant digits: 1, 1, 1, 2, 2, (0.0 dropped), 9
    assert(got.view.mapValues(_._1).toMap == Map("1" -> 3L, "2" -> 2L, "9" -> 1L), got)
    def expected(d: Int): Long =
      math.floor(6.0 * (math.log(1.0 + 1.0 / d) / math.log(10.0)) * 1e6).toLong
    for (d <- Seq(1, 2, 9)) {
      assert(got(d.toString)._2 == expected(d), s"digit $d expectation")
      assert(got(d.toString)._3 == got(d.toString)._1 * 1000000L - expected(d))
    }
  }
}
