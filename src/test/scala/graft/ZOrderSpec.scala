package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-order layout: bit-interleave correctness against hand values and a
  * measured file-pruning win over a 1-D sort for 2-D box predicates. */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue: hand-computed interleavings") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1023L, 1023L))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 10))
      .collect().map(_.getLong(0)).toSeq
    // z(3,5): x bits 11 at even positions → 1+4; y bits 101 at odd → 2+32
    assert(got == Seq(0L, 1L, 2L, 39L, (1L << 20) - 1))
  }

  test("zValue locality: same quadrant shares the high bits") {
    // all points in the [0,512) x [0,512) quadrant have z < 2^18 with
    // bits=10 (both high bits 0); any point with x or y >= 512 doesn't
    val inQ = Seq((511L, 511L), (0L, 500L)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 10)).collect().map(_.getLong(0))
    val outQ = Seq((512L, 0L), (0L, 512L)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 10)).collect().map(_.getLong(0))
    assert(inQ.forall(_ < (1L << 18)) && outQ.forall(_ >= (1L << 18)))
  }

  test("z-clustered files prune a 2-D box where a 1-D sort reads everything") {
    val rnd = new scala.util.Random(3)
    val pts = Seq.fill(20000)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    val dir = Files.createTempDirectory("zorder").toFile
    val zPath = s"$dir/z"; val xPath = s"$dir/x"
    ZOrder.clusterByZ(pts, col("x"), col("y"), bits = 10, numFiles = 16)
      .write.parquet(zPath)
    pts.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(xPath)
    // per-FILE bounding boxes, then count files a y-selective box
    // predicate (all x, y < 64) would have to read
    def filesOverlapping(path: String): (Int, Int) = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      val hit = files.count { f =>
        val r = spark.read.parquet(f).agg(min("y"), max("y")).head
        r.getLong(0) < 64 // box y ∈ [0, 64); file overlaps iff its min is inside
      }
      (hit, files.length)
    }
    val (zHit, zTotal) = filesOverlapping(zPath)
    val (xHit, xTotal) = filesOverlapping(xPath)
    // 1-D x-sort: y values uniform within every file → all files overlap.
    // z-cluster: only files whose z-range intersects the y<64 band.
    assert(xHit == xTotal, s"x-sorted layout should overlap all files ($xHit/$xTotal)")
    assert(zHit <= zTotal / 2,
      s"z-clustered layout should prune most files, read $zHit/$zTotal")
  }

  test("hilbert: the bits=1 square and full 4x4 reference walk") {
    val grid = (for (x <- 0 to 3; y <- 0 to 3) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val d2 = grid.withColumn("h", ZOrder.hilbertIndex(col("x"), col("y"), bits = 2))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the canonical order-2 Hilbert walk (Wikipedia's d2xy convention)
    val walk = Seq((0L, 0L), (1L, 0L), (1L, 1L), (0L, 1L),
      (0L, 2L), (0L, 3L), (1L, 3L), (1L, 2L),
      (2L, 2L), (2L, 3L), (3L, 3L), (3L, 2L),
      (3L, 1L), (2L, 1L), (2L, 0L), (3L, 0L))
    walk.zipWithIndex.foreach { case (xy, d) =>
      assert(d2(xy) == d.toLong, s"cell $xy expected d=$d got ${d2(xy)}")
    }
  }

  test("hilbert: consecutive curve positions are ALWAYS adjacent cells (z is not)") {
    val n = 16 // bits = 4
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    def walkOf(c: org.apache.spark.sql.Column) = grid.withColumn("d", c)
      .collect().map(r => r.getLong(2) -> ((r.getLong(0), r.getLong(1))))
      .sortBy(_._1).map(_._2)
    def maxStep(w: Seq[(Long, Long)]): Long = w.sliding(2).map {
      case Seq((x1, y1), (x2, y2)) => math.abs(x2 - x1) + math.abs(y2 - y1)
    }.max
    val hw = walkOf(ZOrder.hilbertIndex(col("x"), col("y"), bits = 4))
    val zw = walkOf(ZOrder.zValue(col("x"), col("y"), bits = 4))
    assert(hw.length == n * n && hw.distinct.length == n * n) // a bijection
    assert(maxStep(hw) == 1L, "hilbert must never jump")
    assert(maxStep(zw) > 1L, "morton's seam jumps are the point of contrast")
  }

  test("O4c zoneMapReport: clustered layout skips, arrival layout reads everything") {
    import spark.implicits._
    val rows = (0L until 100L).map(i => (i, i % 10L)).toDF("id", "u")
    def skips(order: Seq[org.apache.spark.sql.Column]): (Long, Long) = {
      val rep = ZOrder.zoneMapReport(rows, order, col("u"),
        nFiles = 5, lo = 0L, hi = 1L).collect()
      (rep.length.toLong, rep.count(_.getAs[Boolean]("can_skip")).toLong)
    }
    // arrival order: every 20-row file sees u 0..9 — nothing skips
    assert(skips(Seq(col("id"))) == ((5L, 0L)))
    // clustered by u: files are contiguous u-ranges {0,1},{2,3},… —
    // the predicate u ∈ [0,1] reads ONE file, skips four
    assert(skips(Seq(col("u"), col("id"))) == ((5L, 4L)))
    intercept[IllegalArgumentException](
      ZOrder.zoneMapReport(rows, Seq(col("id")), col("u"), 0, 0L, 1L))
  }
}
