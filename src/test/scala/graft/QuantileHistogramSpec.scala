package graft

import org.apache.spark.sql.functions._

import graft.operators.QuantileHistogram

/** Mergeable histogram quantiles: the structural one-bin error bound
  * against exact rank statistics, the shard-merge identity, edge-bin
  * clamping, and the argument guards. */
class QuantileHistogramSpec extends SparkTestBase {
  import spark.implicits._

  private val Lo = 0L
  private val Hi = 1000L
  private val Bins = 10 // width 100

  test("every estimate is within one bin width of the exact rank value") {
    var s = 3L
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); s }
    val vals = (0 until 2000).map(i =>
      (if (i % 3 == 0) "a" else "b", math.floorMod(next(), 1000L)))
    val df = vals.toDF("g", "v")
    val qs = Seq(0.1, 0.5, 0.9, 0.99, 1.0)
    val st = QuantileHistogram.histogramState(df, Seq("g"), col("v"), Lo, Hi, Bins)
    val got = QuantileHistogram.quantiles(st, Seq("g"), qs, Lo, Hi, Bins)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(3)).toMap
    val byG = vals.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((g, sorted) <- byG; q <- qs) {
      val r = math.max(1, math.ceil(q * sorted.size).toLong).toInt
      val exact = sorted(r - 1)
      val est = got((g, q))
      assert(math.abs(est - exact) < (Hi - Lo) / Bins,
        s"g=$g q=$q est=$est exact=$exact")
    }
    // n_total carried through
    assert(got.size == byG.size * qs.size)
  }

  test("shard states merged by addition equal the full-corpus state") {
    val df = (0L until 500L).map(i => ("k", i, i % 997)).toDF("g", "id", "v")
    def shard(p: Int) = QuantileHistogram.histogramState(
      df.filter(col("id") % 3 === p), Seq("g"), col("v"), Lo, Hi, Bins)
    val merged = QuantileHistogram
      .mergeStates(Seq(shard(0), shard(1), shard(2)), Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = QuantileHistogram.histogramState(df, Seq("g"), col("v"), Lo, Hi, Bins)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == full)
  }

  test("out-of-domain values clamp into the edge bins") {
    val df = Seq(("k", -50L), ("k", 5000L), ("k", 999L), ("k", 0L))
      .toDF("g", "v")
    val st = QuantileHistogram.histogramState(df, Seq("g"), col("v"), Lo, Hi, Bins)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(st == Map(0L -> 2L, 9L -> 2L), st.toString)
  }

  test("guards: bin count, divisibility, quantile range, empty merge") {
    val df = Seq(("k", 1L)).toDF("g", "v")
    intercept[IllegalArgumentException](
      QuantileHistogram.histogramState(df, Seq("g"), col("v"), 0L, 1000L, 1))
    intercept[IllegalArgumentException](
      QuantileHistogram.histogramState(df, Seq("g"), col("v"), 0L, 1000L, 7))
    intercept[IllegalArgumentException](
      QuantileHistogram.histogramState(df, Seq("g"), col("v"), 10L, 10L, 2))
    val st = QuantileHistogram.histogramState(df, Seq("g"), col("v"), Lo, Hi, Bins)
    intercept[IllegalArgumentException](
      QuantileHistogram.quantiles(st, Seq("g"), Seq(0.0), Lo, Hi, Bins))
    intercept[IllegalArgumentException](
      QuantileHistogram.quantiles(st, Seq("g"), Seq.empty, Lo, Hi, Bins))
    intercept[IllegalArgumentException](
      QuantileHistogram.mergeStates(Seq.empty, Seq("g")))
  }
}
