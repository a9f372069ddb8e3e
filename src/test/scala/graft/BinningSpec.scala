package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.operators.Binning

/** A19 equal-frequency binning. */
class BinningSpec extends SparkTestBase {
  import spark.implicits._

  test("bins: uniform 1..8 quarters evenly; ties always share a bin") {
    val df = (1L to 8L).map(("g", _)).toDF("g", "y")
    val got = Binning.equalFreqBins(df, Seq("g"), col("y"), nBins = 4)
      .collect().map(r => r.getAs[Long]("y") -> r.getAs[Int]("bin")).toMap
    // boundaries 2.75 / 4.5 / 6.25 -> clean quarters
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2,
      5L -> 3, 6L -> 3, 7L -> 4, 8L -> 4))
    // heavy duplicate ON a boundary: every copy lands in ONE bin
    val dup = (Seq.fill(6)(5L) ++ Seq(1L, 9L)).map(("g", _)).toDF("g", "y")
    val bins = Binning.equalFreqBins(dup, Seq("g"), col("y"), nBins = 4)
      .filter(col("y") === 5L).select("bin").as[Int].collect().toSet
    assert(bins.size == 1)
  }

  test("bins: per-group boundaries are independent; plan has no Window") {
    val df = ((1L to 4L).map(("a", _)) ++ (101L to 104L).map(("b", _)))
      .toDF("g", "y")
    val q = Binning.equalFreqBins(df, Seq("g"), col("y"), nBins = 2)
    val got = q.collect()
      .map(r => (r.getString(0), r.getAs[Long]("y")) -> r.getAs[Int]("bin")).toMap
    assert(got(("a", 2L)) == 1 && got(("a", 3L)) == 2)
    assert(got(("b", 102L)) == 1 && got(("b", 103L)) == 2)
    val p = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Window"), p.take(2000))
  }

  test("winsorize: tails clamp to interpolated bounds, interior passes through") {
    val df = (1L to 100L).map(("g", _)).toDF("g", "y")
    val got = Binning.winsorize(df, Seq("g"), col("y"), pLowPct = 10, pHighPct = 90)
      .collect().map(r => r.getAs[Long]("y") -> r.getAs[Double]("y_w")).toMap
    // p10 of 1..100 interpolates to 1 + 0.1*99 = 10.9; p90 to 90.1
    assert(got(1L) == 10.9 && got(5L) == 10.9)
    assert(got(100L) == 90.1 && got(95L) == 90.1)
    assert(got(50L) == 50.0 && got(11L) == 11.0 && got(90L) == 90.0)
    intercept[IllegalArgumentException](
      Binning.winsorize(df, Seq("g"), col("y"), pLowPct = 50, pHighPct = 50))
  }
}
