package graft

import org.apache.spark.sql.functions._

import graft.operators.SpatialJoin

/** Grid-bucketed radius join: exact equivalence to the brute-force
  * cross join it rewrites, across radii and around negative-coordinate
  * cell boundaries (where naive integer division would mis-bucket). */
class SpatialJoinSpec extends SparkTestBase {
  import spark.implicits._

  // seeded LCG scatter, coordinates straddling zero
  private lazy val pts = {
    var s = 12345L
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); s }
    (0L until 300L).map { i =>
      (i, math.floorMod(next(), 80L) - 40L, math.floorMod(next(), 80L) - 40L)
    }.toDF("pid", "x", "y")
  }

  private def brute(r: Double): Set[(Long, Long, Long)] = {
    val r2 = math.floor(r * r).toLong
    val a = pts.as("a"); val b = pts.as("b")
    a.join(b, col("a.pid") < col("b.pid"))
      .select(col("a.pid"), col("b.pid"),
        ((col("a.x") - col("b.x")) * (col("a.x") - col("b.x")) +
         (col("a.y") - col("b.y")) * (col("a.y") - col("b.y"))).as("d2"))
      .filter(col("d2") <= r2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
  }

  private def grid(r: Double): Seq[(Long, Long, Long)] =
    SpatialJoin.radiusPairs(pts, "pid", "x", "y", r)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq

  for (r <- Seq(1.5, 3.0, 7.0)) {
    test(s"grid pruning is lossless and duplicate-free at r=$r") {
      val g = grid(r)
      assert(g.size == g.toSet.size, "a pair must appear exactly once")
      assert(g.toSet == brute(r))
      assert(g.forall { case (a, b, _) => a < b }, "canonical orientation")
    }
  }

  test("co-located points pair at d2=0; points just past r are excluded") {
    val tiny = Seq((1L, 5L, 5L), (2L, 5L, 5L), (3L, 5L, 8L), (4L, 5L, 9L))
      .toDF("pid", "x", "y")
    val got = SpatialJoin.radiusPairs(tiny, "pid", "x", "y", 3.0)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    // (1,2) d2=0; (1,3)/(2,3) d2=9 = r²; (3,4) d2=1; (1,4)/(2,4) d2=16 > 9
    assert(got == Set((1L, 2L, 0L), (1L, 3L, 9L), (2L, 3L, 9L), (3L, 4L, 1L)))
  }
}
