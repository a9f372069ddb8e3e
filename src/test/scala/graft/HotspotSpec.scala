package graft

import org.apache.spark.sql.functions._

import graft.operators.Hotspot

/** GEO grid hotspots. */
class HotspotSpec extends SparkTestBase {
  import spark.implicits._

  test("hotspots: dense core flags, sparse fringe doesn't, neighborhood sums exact") {
    // 3x3 core of 10 points/cell around (0,0); two singleton outliers
    val core = for { dx <- -1 to 1; dy <- -1 to 1; _ <- 1 to 10 }
      yield (dx.toLong, dy.toLong)
    val pts = (core ++ Seq((50L, 50L), (52L, 50L))).toDF("x", "y")
    // global mean = 92/11 ≈ 8.4 per occupied cell; core neighborhoods
    // average exactly 10 -> hot at factor 1, outliers (1) stay cold
    val got = Hotspot.gridHotspots(pts, "x", "y", hotFactor = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got.size == 11)
    // center cell sees the full core: 9 cells x 10 points
    assert(got((0L, 0L)) == ((10L, 90L, 9L, true)))
    // corner cell sees a 2x2 slice of the core
    assert(got((1L, 1L)) == ((10L, 40L, 4L, true)))
    // isolated outliers: neighborhood = themselves -> far below mean
    assert(got((50L, 50L)) == ((1L, 1L, 1L, false)))
    assert(got((52L, 50L)) == ((1L, 1L, 1L, false)))
  }
}
