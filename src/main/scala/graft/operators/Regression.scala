package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordinary least squares as a single distributed aggregate
  * (SURVEY.md §2.11) — the same sums-first discipline as
  * [[Trilateration]]: the ONLY thing that crosses the wire per group
  * is the five-moment tuple (n, Σx, Σy, Σxy, Σx², Σy²), folded
  * map-side like any algebraic aggregate; slope/intercept/R² are
  * derived from the closed form on the reduced row. One scan, one
  * exchange of group-cardinality rows, nothing iterative — the shape
  * that survives 100 TB is exactly "fit a trend per key" as a groupBy.
  *
  * Determinism contract (the reason this is not `regr_slope`): x and y
  * enter as INTEGER columns (callers pre-quantize, e.g. ×100 for 2-dp
  * measurements), so every moment is an exact long — float summation
  * order across partitions can never perturb the result, and a DuckDB
  * oracle replaying the same integer sums reproduces it bit-for-bit.
  * The closed forms divide two exactly-agreed longs at the end:
  *   slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
  *   intercept = (Σy·D − N·Σx) / (n·D)      (N, D = slope num/den)
  *   R² = N² / (D · (nΣy² − (Σy)²))          (computed in doubles —
  * both engines convert the SAME longs, so the rounding agrees).
  * Degenerate groups (constant x → D = 0, or constant y) yield NULL
  * via try_divide rather than a division error. */
object Regression {

  /** Per-group OLS fit of integer `y` on integer `x`. `yScale` divides
    * the reported slope/intercept back into caller units (e.g. 100 when
    * y was quantized from a 2-dp double).
    *
    * Accumulator width (r17, VERDICT r16 #6): the moments accumulate as
    * DECIMAL(38,0) — still exact integers (the determinism contract
    * above is unchanged; the same exact values convert to the same
    * doubles), but a 10⁹-range y no longer overflows Σy² the way a
    * 64-bit sum does (y = 10¹¹ after ×100 quantization ⇒ y² ≈ 10²²
    * per ROW). This mirrors the DuckDB oracle, whose BIGINT sums
    * auto-promote to HUGEINT. First-order derived terms (n·Σxy, Σx·Σy)
    * stay within 38 digits for any y ≤ ~10¹⁵ at 10⁹ rows per group;
    * squares of derived terms (R²'s num²) are computed in doubles on
    * both engines, exactly as before. */
  def ols(df: DataFrame, group: Seq[String], x: Column, y: Column,
      yScale: Long = 1L, digits: Int = 6): DataFrame = {
    require(yScale > 0, s"yScale must be positive (got $yScale)")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val m = df
      .select(group.map(col) :+ x.cast("long").cast(dec).as("_x")
        :+ y.cast("long").cast(dec).as("_y"): _*)
      .groupBy(group.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum("_x").as("sx"), sum("_y").as("sy"),
        sum(col("_x") * col("_y")).as("sxy"),
        sum(col("_x") * col("_x")).as("sxx"),
        sum(col("_y") * col("_y")).as("syy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val deny = col("n") * col("syy") - col("sy") * col("sy")
    // + 0.0 normalizes IEEE −0.0 → +0.0 so rounded near-zero slopes
    // hash identically across engines
    m.select(group.map(col) :+ col("n") :+
      (round(try_divide(num.cast("double"),
        (den * yScale).cast("double")), digits) + 0.0).as("slope") :+
      (round(try_divide((col("sy") * den - num * col("sx")).cast("double"),
        (col("n") * den * yScale).cast("double")), digits) + 0.0).as("intercept") :+
      (round(try_divide(num.cast("double") * num.cast("double"),
        den.cast("double") * deny.cast("double")), digits) + 0.0).as("r2"): _*)
  }

  /** A23 — pairwise Pearson correlation matrix over integer columns in
    * ONE aggregate pass: the feature-selection / drift-sanity report
    * ("which metrics move together") at corpus scale. Every moment —
    * per-variable Σx and Σx², per-pair Σxy — folds map-side into a
    * SINGLE reduced row; the |vars|·(|vars|−1)/2 output rows are
    * reshaped from that row driver-free (explode of a literal struct
    * array). The only floats are the final covariance/variance ratio
    * (exact longs → double, one sqrt, one divide — engine-agreed).
    *
    * Same determinism contract as [[ols]]: callers pre-quantize to
    * integers, and keep n·Σxy below 2⁶³ (quantize coarsely for huge
    * tables — correlation is scale-invariant, so dividing a column's
    * unit out first never changes the answer). Constant columns yield
    * NULL correlation via try_divide. */
  def correlationMatrix(df: DataFrame, vars: Seq[(String, Column)],
      digits: Int = 6): DataFrame = {
    require(vars.size >= 2, s"need at least 2 variables (got ${vars.size})")
    require(vars.map(_._1).distinct.size == vars.size,
      "variable names must be unique")
    val names = vars.map(_._1)
    val pairs = for { i <- names.indices; j <- i + 1 until names.size }
      yield (names(i), names(j))
    val base = df.select(vars.map { case (n, c) => c.cast("long").as(n) }: _*)
    val aggs = names.flatMap(n => Seq(sum(col(n)).as(s"_s_$n"),
        sum(col(n) * col(n)).as(s"_q_$n"))) ++
      pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"_p_${a}_$b") } :+
      count(lit(1)).as("_n")
    val row = base.agg(aggs.head, aggs.tail: _*)
    val pairStructs = pairs.map { case (a, b) =>
      val cov = col("_n") * col(s"_p_${a}_$b") - col(s"_s_$a") * col(s"_s_$b")
      val vx = col("_n") * col(s"_q_$a") - col(s"_s_$a") * col(s"_s_$a")
      val vy = col("_n") * col(s"_q_$b") - col(s"_s_$b") * col(s"_s_$b")
      struct(lit(a).as("x_name"), lit(b).as("y_name"), col("_n").as("n"),
        (round(try_divide(cov.cast("double"),
          sqrt(vx.cast("double") * vy.cast("double"))), digits) + 0.0)
          .as("corr"))
    }
    row.select(explode(array(pairStructs: _*)).as("p")).select(col("p.*"))
  }
}
