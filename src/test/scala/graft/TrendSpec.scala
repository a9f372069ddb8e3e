package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.operators.{Resample, Trend}

/** W12 interpolation, W13 EWMA, W14 rolling anomaly — hand-computed
  * series plus single-window plan proofs. */
class TrendSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("W12 interpolation: lerp, exact-hit, endpoint holds, duplicate-ts determinism") {
    val samples = Seq(
      ("u", ts(0), 100L), ("u", ts(10), 200L),
      ("u", ts(10), 150L),                       // dup ts -> max wins (200)
      ("v", ts(5), 40L)).toDF("k", "t", "y")
    val queries = Seq(
      ("u", ts(5)),    // strictly between  -> 150
      ("u", ts(0)),    // exactly at sample -> 100
      ("u", ts(-5)),   // before the span   -> hold 100
      ("u", ts(15)),   // after the span    -> hold 200
      ("v", ts(99))).toDF("k", "t")
    val got = Resample.interpolateAt(samples, queries, "k", "t", col("y"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000, r.getDouble(2)))
      .toSet
    assert(got == Set(
      ("u", 5L, 150.0), ("u", 0L, 100.0), ("u", -5L, 100.0),
      ("u", 15L, 200.0), ("v", 99L, 40.0)))
  }

  test("W13 EWMA: hand weights over a short head, exact thirds") {
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L), ("g", 4L, 4L))
      .toDF("k", "i", "y")
    val got = Trend.ewma(df, Seq("k"), Seq(col("i")), col("y"), span = 2)
      .orderBy("i").select("ewma").as[Double].collect()
    // weights (2, 1): 2/2, (4+1)/3, (6+2)/3, (8+3)/3
    assert(got.toSeq == Seq(1.0, 1.6667, 2.6667, 3.6667))
  }

  test("W14 anomaly: planted spike flagged, constant series silent, warm-up suppressed") {
    val flat = (1 to 10).map(i => ("c", i.toLong, 50L))
    val spike = (1 to 10).map(i => ("s", i.toLong, if (i == 8) 500L else 50L))
    val df = (flat ++ spike).toDF("k", "i", "y")
    val got = Trend.rollingAnomaly(df, Seq("k"), Seq(col("i")), col("y"),
        n = 8, z = 2, minRows = 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Boolean]("is_anomaly"))
      .toMap
    assert(got.values.count(identity) == 1)
    assert(got(("s", 8L)))
    // constant series: dev = 0, varc = 0 -> strict inequality never fires
    assert(flat.forall { case (k, i, _) => !got((k, i)) })
  }

  test("W13/W14 plan: all trailing aggregates share ONE window exec and exchange") {
    val df = Seq(("g", 1L, 1L)).toDF("k", "i", "y")
    for (q <- Seq(
        Trend.ewma(df, Seq("k"), Seq(col("i")), col("y"), span = 4),
        Trend.rollingAnomaly(df, Seq("k"), Seq(col("i")), col("y")))) {
      val p = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert("Window \\(\\d+\\)".r.findAllIn(p).size == 1, p.take(2000))
      assert("hashpartitioning\\(k".r.findAllIn(p).size == 1, p.take(2000))
    }
  }

  test("W15 Holt: engine fold equals the sequential holtStep reference; init and coupling exact") {
    // interleaved keys prove per-key isolation; the ramp has nonzero
    // trend so the coupled b-state actually matters
    val df = Seq(
      ("g", 1L, 10L), ("h", 1L, 5L), ("g", 2L, 20L), ("h", 2L, 5L),
      ("g", 3L, 30L), ("g", 4L, 40L), ("h", 3L, 50L))
      .toDF("k", "i", "y")
    val got = Trend.holt(df, Seq("k"), Seq("i"), "y")
      .orderBy("k", "i")
      .select("k", "i", "level", "trend", "forecast")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    // sequential reference: the same holtStep arithmetic, per key
    def ref(ys: Seq[Long]): Seq[(Double, Double)] =
      ys.tail.scanLeft((ys.head.toDouble, 0.0)) { case ((l, b), y) =>
        Trend.holtStep(l, b, y.toDouble, 0.5, 0.5)
      }
    val g = ref(Seq(10L, 20L, 30L, 40L))
    val h = ref(Seq(5L, 5L, 50L))
    val want = (g.zipWithIndex.map { case ((l, b), i) => ("g", i + 1L, l, b, l + b) } ++
      h.zipWithIndex.map { case ((l, b), i) => ("h", i + 1L, l, b, l + b) })
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == want, s"got ${got.toSeq}")
    // hand-check the coupling on g's head: l2 = .5*20+.5*10 = 15,
    // b2 = .5*(15-10) = 2.5, forecast2 = 17.5
    assert(got(1) == ("g", 2L, 15.0, 2.5, 17.5))
  }

  test("W15b Holt-Winters: engine fold equals the sequential reference; seasonal ring cycles exactly") {
    // period 2 over a 2-cycle pattern: the seasonal state must pick up
    // the alternation; 6 steps exercise the ring past two full seasons
    val ys = Seq(10L, 20L, 12L, 22L, 14L, 24L)
    val df = ys.zipWithIndex.map { case (y, i) => ("g", i + 1L, y) }
      .toDF("k", "i", "y")
    val got = Trend.holtWinters(df, Seq("k"), Seq("i"), "y", period = 2)
      .orderBy("i").select("level", "trend", "seasonal").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    // sequential reference over the same ring discipline
    val ring = Array(0.0, 0.0)
    var (l, b, s) = (0.0, 0.0, 0.0)
    val want = ys.zipWithIndex.map { case (y, t) =>
      val sOld = ring(t % 2)
      if (t == 0) { l = y.toDouble; b = 0.0 }
      else {
        val (l2, b2, _) = Trend.holtWintersStep(l, b, sOld, y.toDouble, 0.5, 0.5, 0.5)
        l = l2; b = b2
      }
      s = 0.5 * (y.toDouble - l) + 0.5 * sOld
      ring(t % 2) = s
      (l, b, s)
    }
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    // the alternating series leaves a nonzero seasonal split
    assert(math.abs(got.last._3) > 0.5, s"seasonal should be material: ${got.last}")
  }

  test("W15 plan: one shuffle on the key, no window exec (groupBy fold + map-side explode)") {
    val df = Seq(("g", 1L, 1L)).toDF("k", "i", "y")
    val p = Trend.holt(df, Seq("k"), Seq("i"), "y")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert("hashpartitioning\\(k".r.findAllIn(p).size == 1, p.take(2000))
    assert(!p.contains("Window ("), p.take(2000))
    assert(p.contains("graft_holt_states"), p.take(2000))
  }
}
