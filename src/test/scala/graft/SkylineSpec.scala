package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Skyline

/** 2-D skyline: equality against the quadratic dominance definition,
  * duplicate/tie semantics, and bucket-width invariance. */
class SkylineSpec extends SparkTestBase {
  import spark.implicits._

  /** The O(n²) definition, single-threaded: distinct non-dominated pairs. */
  private def brute(pts: Seq[(Double, Long)]): Set[(Double, Long)] = {
    val d = pts.distinct
    d.filter(p => !d.exists(q =>
      q != p && q._1 <= p._1 && q._2 <= p._2)).toSet
  }

  private def run(df: DataFrame, w: Double): Set[(Double, Long)] =
    Skyline.paretoFrontier2D(df, "x", "y", w)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSet

  test("matches the quadratic definition on seeded random points, any bucket width") {
    var s = 99L
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); s }
    val pts = (0 until 400).map(_ =>
      (math.floorMod(next(), 500L).toDouble, math.floorMod(next(), 500L)))
    val df = pts.toDF("x", "y")
    val want = brute(pts)
    for (w <- Seq(1.0, 37.0, 10000.0)) // many buckets … one bucket
      assert(run(df, w) == want, s"bucketWidth=$w")
  }

  test("ties: equal-x keeps only the lowest y; equal-y keeps only the lowest x") {
    val df = Seq((1.0, 5L), (1.0, 3L), (2.0, 3L), (3.0, 1L))
      .toDF("x", "y")
    // (1,5) loses to (1,3); (2,3) loses to (1,3); (3,1) survives (lower y)
    assert(run(df, 1.0) == Set((1.0, 3L), (3.0, 1L)))
  }

  test("exact duplicates collapse to one frontier point, not zero") {
    val df = Seq((1.0, 1L), (1.0, 1L), (2.0, 0L)).toDF("x", "y")
    assert(run(df, 1.0) == Set((1.0, 1L), (2.0, 0L)))
  }

  test("a single dominating point yields a single-row frontier") {
    val df = Seq((0.0, 0L), (1.0, 1L), (5.0, 9L)).toDF("x", "y")
    assert(run(df, 2.0) == Set((0.0, 0L)))
  }

  test("the only unpartitioned window runs over the bucket table, not the data") {
    val df = (0 until 1000).map(i => (i.toDouble, (i * 37 % 100).toLong)).toDF("x", "y")
    val p = Skyline.paretoFrontier2D(df, "x", "y", 100.0)
      .queryExecution.executedPlan.toString
    // the data-sized window must carry the bucket partition key
    assert(p.contains("partitionBy") || p.contains("_b"), p.take(500))
  }
}
