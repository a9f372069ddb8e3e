package graft

import org.apache.spark.sql.functions._

import graft.operators.{BitmapDistinct, Regression}

/** A17 bitmap exact-distinct and A18 sums-first OLS. */
class RegressionBitmapSpec extends SparkTestBase {
  import spark.implicits._

  test("A17 bitmap distinct == plain distinct, negative keys and word edges included") {
    // keys straddle word boundaries (63|64), zero, negatives, and dups
    val rows = Seq(
      ("a", -129L), ("a", -64L), ("a", -1L), ("a", 0L), ("a", 0L),
      ("a", 63L), ("a", 64L), ("a", 65L), ("a", 65L), ("a", 1000000L),
      ("b", 7L), ("b", 7L), ("b", 7L)).toDF("g", "k")
    val got = BitmapDistinct.distinctCount(rows, Seq("g"), col("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = rows.distinct().groupBy("g").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got == Map("a" -> 8L, "b" -> 1L))
  }

  test("A17 merged bitmaps == distinct of the union, without raw rows") {
    val x = Seq(("a", 1L), ("a", 2L), ("b", 64L)).toDF("g", "k")
    val y = Seq(("a", 2L), ("a", 130L), ("b", 64L), ("b", 65L)).toDF("g", "k")
    val merged = BitmapDistinct.mergeBitmaps(
        BitmapDistinct.bitmaps(x, Seq("g"), col("k")),
        BitmapDistinct.bitmaps(y, Seq("g"), col("k")), Seq("g"))
      .groupBy("g").agg(sum(bit_count(col("bits"))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == Map("a" -> 3L, "b" -> 2L))
  }

  test("A18 OLS recovers an exact line and matches the builtin on noisy data") {
    // exact line y = 2x + 3 -> slope 2, intercept 3, r2 = 1
    val line = Seq.tabulate(10)(i => ("g", i.toLong, 2L * i + 3)).toDF("g", "x", "y")
    val fit = Regression.ols(line, Seq("g"), col("x"), col("y")).collect().head
    assert(fit.getAs[Double]("slope") == 2.0)
    assert(fit.getAs[Double]("intercept") == 3.0)
    assert(fit.getAs[Double]("r2") == 1.0)
    // noisy data: agree with Spark's own regr_* to the rounding digit
    val noisy = Seq.tabulate(50)(i =>
      ("g", i.toLong, (3 * i + 7 + (i * i * 13 % 11) - 5).toLong))
      .toDF("g", "x", "y")
    val ours = Regression.ols(noisy, Seq("g"), col("x"), col("y")).collect().head
    val ref = noisy.agg(
        expr("regr_slope(y, x)").as("s"), expr("regr_intercept(y, x)").as("i"))
      .collect().head
    assert(math.abs(ours.getAs[Double]("slope") - ref.getDouble(0)) < 1e-5)
    assert(math.abs(ours.getAs[Double]("intercept") - ref.getDouble(1)) < 1e-5)
  }

  test("A18 OLS survives 10^9-range y (VERDICT r16 #6: sum(y*y) would overflow a long)") {
    // y ~ 1e9 => y*y ~ 1e18 per row; 40 rows sum to ~4e19 > Long.Max —
    // the r16 sf1 scaler hit exactly this as an ANSI overflow error.
    // DECIMAL(38,0) accumulators keep the moments exact (the DuckDB
    // oracle's BIGINT sums auto-promote to HUGEINT the same way).
    val big = Seq.tabulate(40)(i =>
      ("g", i.toLong, 1000000000L + 2L * i)).toDF("g", "x", "y")
    val fit = Regression.ols(big, Seq("g"), col("x"), col("y")).collect().head
    // exact line y = 2x + 1e9: slope and intercept recovered exactly
    assert(fit.getAs[Double]("slope") == 2.0)
    assert(fit.getAs[Double]("intercept") == 1.0e9)
    assert(fit.getAs[Double]("r2") == 1.0)
    // and the small-magnitude path is bit-identical to the long-era
    // closed form: same exact integers -> same doubles
    val line = Seq.tabulate(10)(i => ("g", i.toLong, 2L * i + 3)).toDF("g", "x", "y")
    val small = Regression.ols(line, Seq("g"), col("x"), col("y")).collect().head
    assert(small.getAs[Double]("slope") == 2.0 &&
      small.getAs[Double]("intercept") == 3.0)
  }

  test("A23 correlation matrix: exact +/-1, builtin agreement, constant-column NULL") {
    val df = Seq.tabulate(40) { i =>
      (i.toLong, 2L * i + 5, 100L - 3 * i, (i * i * 7 % 13).toLong, 9L)
    }.toDF("a", "b", "c", "d", "k")
    val vars = Seq("a" -> col("a"), "b" -> col("b"), "c" -> col("c"),
      "d" -> col("d"), "k" -> col("k"))
    val got = Regression.correlationMatrix(df, vars)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // 5 vars -> 10 pairs, upper triangle in declaration order
    assert(got.size == 10)
    assert(got(("a", "b")).contains(1.0), "perfect linear -> exactly 1")
    assert(got(("a", "c")).contains(-1.0), "perfect inverse -> exactly -1")
    assert(got(("a", "k")).isEmpty && got(("d", "k")).isEmpty,
      "constant column correlates with nothing (NULL, not error)")
    // noisy pair agrees with Spark's builtin corr to the rounding digit
    val ref = df.agg(corr(col("a").cast("double"), col("d").cast("double")))
      .collect().head.getDouble(0)
    assert(math.abs(got(("a", "d")).get - ref) < 1e-5,
      s"ours=${got(("a", "d"))} builtin=$ref")
    intercept[IllegalArgumentException](
      Regression.correlationMatrix(df, Seq("a" -> col("a"))))
    intercept[IllegalArgumentException](
      Regression.correlationMatrix(df, Seq("a" -> col("a"), "a" -> col("b"))))
  }

  test("A18 degenerate groups yield NULL fits, not errors") {
    val flat = Seq(("cx", 5L, 1L), ("cx", 5L, 9L), ("cy", 1L, 4L), ("cy", 2L, 4L))
      .toDF("g", "x", "y")
    val rows = Regression.ols(flat, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("cx").isNullAt(rows("cx").fieldIndex("slope")))   // constant x
    assert(rows("cy").getAs[Double]("slope") == 0.0)              // constant y
    assert(rows("cy").isNullAt(rows("cy").fieldIndex("r2")))      // 0/0
  }
}
