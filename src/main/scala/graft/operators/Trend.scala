package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W13/W14 — per-key trend smoothing and anomaly flagging over ordered
  * event series, in the same exact-integer discipline as [[Regression]]:
  * inputs are quantized longs, every sum is exact, and flags come from
  * integer inequalities — so the result is independent of partition
  * count and replayable by another engine, while floats appear only in
  * the final reported score.
  *
  * Both operators are ONE key-partitioned window pass (all columns
  * share the same WindowSpec, so Catalyst plans a single sort + single
  * WindowExec): the 100 TB cost is one shuffle on the key — the minimum
  * for any per-key ordered semantics — and O(span) state per row. */
object Trend {

  /** W13 — fixed-span EWMA with α = 1/2: the last `span` observations
    * weighted 2^(span−1) … 1 (newest heaviest), normalized by the
    * weights actually present so series heads are averages of what
    * exists, not biased toward zero. Integer numerator/denominator;
    * one rounded division at the end. */
  def ewma(df: DataFrame, key: Seq[String], order: Seq[Column], y: Column,
      span: Int = 4, yScale: Long = 1L, digits: Int = 4): DataFrame = {
    require(span >= 1 && span <= 62, s"span must be in [1, 62] (got $span)")
    val w = Window.partitionBy(key.map(col): _*).orderBy(order: _*)
    val yl = y.cast("long")
    val terms = (0 until span).map { k =>
      (1L << (span - 1 - k), if (k == 0) yl else lag(yl, k).over(w))
    }
    val num = terms.map { case (wt, c) =>
      when(c.isNotNull, c * wt).otherwise(lit(0L)) }.reduce(_ + _)
    val den = terms.map { case (wt, c) =>
      when(c.isNotNull, lit(wt)).otherwise(lit(0L)) }.reduce(_ + _)
    df.withColumn("ewma",
      round(num.cast("double") / (den * yScale).cast("double"), digits) + 0.0)
  }

  /** The pure per-row value [[ewma]] computes relationally, extracted
    * for the streaming twin: `prior` is the trailing window (oldest
    * first, at most span−1 values), weights are 2^k newest-heaviest,
    * normalized by the weights actually present — identical to the
    * lag-column formulation at series heads. */
  def ewmaValue(prior: Seq[Long], x: Long, span: Int, yScale: Long = 1L,
      digits: Int = 4): Double = {
    val win = (prior :+ x).takeRight(span)
    // newest element has lag 0 → weight 2^(span−1)
    val terms = win.reverse.zipWithIndex
    val num = terms.map { case (v, k) => v * (1L << (span - 1 - k)) }.sum
    val den = terms.map { case (_, k) => 1L << (span - 1 - k) }.sum
    java.math.BigDecimal.valueOf(num.toDouble / (den * yScale).toDouble)
      .setScale(digits, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0
  }

  /** The pure per-row decision [[rollingAnomaly]] computes
    * relationally, extracted so the STREAMING twin
    * ([[graft.streaming.AnomalyStream]]) provably runs the same
    * arithmetic: trailing window = `prior :+ x`, the same integer flag
    * inequality, and the same HALF_UP-rounded score
    * (java BigDecimal.valueOf mirrors Catalyst's Round on doubles). */
  def anomalyDecision(prior: Seq[Long], x: Long, z: Int, minRows: Int,
      digits: Int = 4): (Option[Double], Boolean) = {
    val win = prior :+ x
    val c = win.length.toLong
    val s1 = win.sum
    val s2 = win.iterator.map(v => v * v).sum
    val dev = c * x - s1
    val varc = c * s2 - s1 * s1
    val zscore =
      if (varc == 0L) None
      else Some(java.math.BigDecimal
        .valueOf(dev.toDouble / math.sqrt(varc.toDouble))
        .setScale(digits, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0)
    (zscore, c >= minRows && dev * dev > z.toLong * z * varc)
  }

  /** W15 — Holt DOUBLE-exponential smoothing per key: level + trend,
    * the two coupled recursive states that extrapolate a series where
    * [[ewma]]'s single state only tracks it. The recursion cannot
    * unroll into a bounded lag window (see
    * [[org.apache.spark.sql.graft.HoltStatesExpr]]), so the plan is
    * the irreducible shape of a per-key sequential fold: ONE shuffle
    * on the key (`groupBy` + `sort_array(collect_list)`), the native
    * fold expression over each packed series, and a map-side explode
    * back to rows — O(series) state per key, series length the
    * documented bound (the same bound any stateful per-key recursion
    * carries; keys spread across the cluster). Emits the input's key /
    * order / y columns plus `level`, `trend` and the one-step-ahead
    * `forecast` = ℓ_t + b_t as RAW doubles in the input's units —
    * display rounding is the caller's (the oracle-checked query
    * quantizes to integer units, where the only rounding boundary is
    * an exactly-representable .5 that both engines round identically;
    * a fractional display round like round(x/100, 4) diverges between
    * engines at decimal boundaries unrepresentable in binary).
    *
    * Engine-replay: states fold in IEEE doubles with an operation
    * order the oracle's recursive CTE mirrors exactly — bit-identical
    * doubles, then the caller's exact quantization. */
  def holt(df: DataFrame, key: Seq[String], order: Seq[String], yCol: String,
      alpha: Double = 0.5, beta: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1 && beta > 0 && beta <= 1,
      s"need 0 < alpha, beta <= 1 (got $alpha, $beta)")
    require(order.nonEmpty, "need at least one order column")
    val fields = order :+ yCol
    val packed = df
      .select((key ++ fields).distinct.map(col): _*)
      .groupBy(key.map(col): _*)
      .agg(sort_array(collect_list(struct(fields.map(col): _*))).as("_series"))
    val series = transform(col("_series"), s => s.getField(yCol).cast("long"))
    val states = org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.HoltStatesExpr(
        org.apache.spark.sql.graft.Bridge.expression(series), alpha, beta))
    packed.withColumn("_states", states)
      .select(key.map(col) :+
        explode(arrays_zip(col("_series"), col("_states"))).as("_z"): _*)
      .select(key.map(col) ++
        order.map(o => col(s"_z._series.$o").as(o)) ++ Seq(
        col(s"_z._series.$yCol").as(yCol),
        (col("_z._states.level") + lit(0.0)).as("level"),
        (col("_z._states.trend") + lit(0.0)).as("trend"),
        (col("_z._states.level") + col("_z._states.trend") + lit(0.0))
          .as("forecast")): _*)
  }

  /** The pure per-step transition [[holt]]'s native fold applies,
    * extracted so specs (and a future streaming twin) provably run the
    * same arithmetic. */
  def holtStep(l: Double, b: Double, y: Double, alpha: Double,
      beta: Double): (Double, Double) = {
    val lNew = alpha * y + (1.0 - alpha) * (l + b)
    val bNew = beta * (lNew - l) + (1.0 - beta) * b
    (lNew, bNew)
  }

  /** W15b — Holt-Winters ADDITIVE triple smoothing: [[holt]] plus a
    * `period`-slot seasonal component, completing the smoothing ladder
    * (single w13 → double w15 → triple w15b). Identical plan shape to
    * [[holt]] — one key shuffle, native O(series) fold (the ring adds
    * O(period) state), map-side explode — and the same engine-replay
    * discipline (the oracle's recursive CTE carries the seasonal ring
    * as a LIST column, op order mirrored exactly). Emits raw-double
    * `level`, `trend`, `seasonal`; display rounding is the caller's. */
  def holtWinters(df: DataFrame, key: Seq[String], order: Seq[String],
      yCol: String, period: Int, alpha: Double = 0.5, beta: Double = 0.5,
      gamma: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1 && beta > 0 && beta <= 1 &&
      gamma > 0 && gamma <= 1,
      s"need 0 < alpha, beta, gamma <= 1 (got $alpha, $beta, $gamma)")
    require(period >= 1, s"period must be >= 1 (got $period)")
    require(order.nonEmpty, "need at least one order column")
    val fields = order :+ yCol
    val packed = df
      .select((key ++ fields).distinct.map(col): _*)
      .groupBy(key.map(col): _*)
      .agg(sort_array(collect_list(struct(fields.map(col): _*))).as("_series"))
    val series = transform(col("_series"), s => s.getField(yCol).cast("long"))
    val states = org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.HoltWintersStatesExpr(
        org.apache.spark.sql.graft.Bridge.expression(series),
        alpha, beta, gamma, period))
    packed.withColumn("_states", states)
      .select(key.map(col) :+
        explode(arrays_zip(col("_series"), col("_states"))).as("_z"): _*)
      .select(key.map(col) ++
        order.map(o => col(s"_z._series.$o").as(o)) ++ Seq(
        col(s"_z._series.$yCol").as(yCol),
        (col("_z._states.level") + lit(0.0)).as("level"),
        (col("_z._states.trend") + lit(0.0)).as("trend"),
        (col("_z._states.seasonal") + lit(0.0)).as("seasonal")): _*)
  }

  /** [[holtWinters]]' pure per-step transition, for specs and a
    * future streaming twin. Returns (level, trend, seasonal). */
  def holtWintersStep(l: Double, b: Double, sOld: Double, y: Double,
      alpha: Double, beta: Double, gamma: Double): (Double, Double, Double) = {
    val lNew = alpha * (y - sOld) + (1.0 - alpha) * (l + b)
    val bNew = beta * (lNew - l) + (1.0 - beta) * b
    val sNew = gamma * (y - lNew) + (1.0 - gamma) * sOld
    (lNew, bNew, sNew)
  }

  /** W14 — rolling z-score anomaly flag over the trailing `n` rows.
    * The flag is decided in EXACT integer arithmetic — |x − μ| > z·σ
    * rewritten denominator-free as (c·x − S₁)² > z²·(c·S₂ − S₁²) with
    * c = rows present — so boundary cases never flip on float
    * rounding; the reported z-score is the one final float. Warm-up
    * rows (fewer than `minRows` in the window) are never flagged. */
  def rollingAnomaly(df: DataFrame, key: Seq[String], order: Seq[Column],
      y: Column, n: Int = 16, z: Int = 2, minRows: Int = 4,
      digits: Int = 4): DataFrame = {
    require(n >= 2 && z >= 1 && minRows >= 2 && minRows <= n,
      s"need n >= 2, z >= 1, 2 <= minRows <= n (got n=$n z=$z minRows=$minRows)")
    Seq("_c", "_s1", "_s2").foreach(cn =>
      require(!df.columns.contains(cn),
        s"input already has a '$cn' column — it would be overwritten and dropped"))
    val w = Window.partitionBy(key.map(col): _*).orderBy(order: _*)
      .rowsBetween(-(n - 1), 0)
    val yl = y.cast("long")
    // materialize the three window aggregates in ONE projection — window
    // exprs split across withColumn layers extract into TWO Window execs
    val base = df.select(col("*"), count(yl).over(w).as("_c"),
      sum(yl).over(w).as("_s1"), sum(yl * yl).over(w).as("_s2"))
    val dev = col("_c") * yl - col("_s1")             // c·(x − μ)
    val varc = col("_c") * col("_s2") - col("_s1") * col("_s1") // c²·σ²
    base.withColumn("zscore",
        round(try_divide(dev.cast("double"),
          sqrt(varc.cast("double"))), digits) + 0.0)
      .withColumn("is_anomaly",
        col("_c") >= minRows && dev * dev > lit(z.toLong * z) * varc)
      .drop("_c", "_s1", "_s2")
  }
}
