package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** W15 — Holt double-exponential smoothing over one key's ORDERED
  * series (reference basis: the "habitual movements" trend analytics
  * the reference declares, README.md:16-17 — level + trend is the
  * minimal model that extrapolates a movement, where single smoothing
  * only tracks it).
  *
  * The recursion
  *   ℓ_t = α·y_t + (1−α)·(ℓ_{t−1} + b_{t−1})
  *   b_t = β·(ℓ_t − ℓ_{t−1}) + (1−β)·b_{t−1}
  * carries TWO coupled state variables, so — unlike the w13 EWMA,
  * whose α=1/2 truncation reduces to a fixed lag window — it cannot
  * unroll into a bounded window: it is a genuine sequential fold per
  * key. This expression IS that fold, native and allocation-lean:
  * array<long> (the quantized series, oldest first) → array<struct<
  * level double, trend double>>, one pass, O(series) state. Exact
  * engine-replay discipline: the oracle's recursive CTE performs the
  * IDENTICAL IEEE-754 double operations in the identical order
  * (including recomputing ℓ_t inside b_t's formula), so both engines
  * produce bit-identical doubles before the final display rounding.
  *
  * Init: ℓ_1 = y_1, b_1 = 0 (the deterministic no-lookahead init; the
  * classic b_1 = y_2 − y_1 needs the future). */
case class HoltStatesExpr(child: Expression, alpha: Double, beta: Double)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("level", DoubleType, nullable = false),
    StructField("trend", DoubleType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_holt_states"

  protected override def nullSafeEval(input: Any): Any =
    HoltStatesExpr.compute(input.asInstanceOf[ArrayData], alpha, beta)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.HoltStatesExpr.compute($c, ${alpha}D, ${beta}D)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HoltStatesExpr {
  /** Single implementation — interpreted eval and codegen both call it.
    * A null element (impossible under the sort_array(collect_list(…))
    * producer, which never emits nulls) is treated as absent: it
    * carries the prior state forward unchanged. */
  def compute(arr: ArrayData, alpha: Double, beta: Double): ArrayData = {
    val n = arr.numElements()
    val rows = new Array[Any](n)
    var l = 0.0
    var b = 0.0
    var seeded = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val y = arr.getLong(i).toDouble
        if (!seeded) { l = y; b = 0.0; seeded = true }
        else {
          val lNew = alpha * y + (1.0 - alpha) * (l + b)
          val bNew = beta * (lNew - l) + (1.0 - beta) * b
          l = lNew; b = bNew
        }
      }
      rows(i) = InternalRow(l, b)
      i += 1
    }
    new GenericArrayData(rows)
  }
}

/** W15b — Holt-Winters ADDITIVE triple smoothing: [[HoltStatesExpr]]'s
  * level + trend plus a `period`-slot seasonal state ring, completing
  * the smoothing ladder (single w13 → double w15 → triple w15b). The
  * recursion per step t (sOld = the seasonal value written `period`
  * steps ago, 0 until a full season has passed; deterministic
  * no-lookahead init ℓ₁ = y₁, b₁ = 0):
  *   ℓ_t = α·(y_t − sOld) + (1−α)·(ℓ_{t−1} + b_{t−1})
  *   b_t = β·(ℓ_t − ℓ_{t−1}) + (1−β)·b_{t−1}
  *   s_t = γ·(y_t − ℓ_t) + (1−γ)·sOld
  * Same engine-replay discipline: the oracle's recursive CTE carries
  * the ring as a LIST column and performs the identical IEEE ops in
  * the identical order (ℓ_t recomputed inline inside b_t and s_t). */
case class HoltWintersStatesExpr(child: Expression, alpha: Double,
    beta: Double, gamma: Double, period: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("level", DoubleType, nullable = false),
    StructField("trend", DoubleType, nullable = false),
    StructField("seasonal", DoubleType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_holt_winters_states"

  protected override def nullSafeEval(input: Any): Any =
    HoltWintersStatesExpr.compute(input.asInstanceOf[ArrayData],
      alpha, beta, gamma, period)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.sql.graft.HoltWintersStatesExpr.compute(" +
        s"$c, ${alpha}D, ${beta}D, ${gamma}D, $period)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HoltWintersStatesExpr {
  def compute(arr: ArrayData, alpha: Double, beta: Double, gamma: Double,
      period: Int): ArrayData = {
    val n = arr.numElements()
    val rows = new Array[Any](n)
    // ring of the last `period` seasonal values, oldest first — the
    // oracle carries the same queue as a LIST column
    val ring = new Array[Double](period)
    var l = 0.0
    var b = 0.0
    var seeded = false
    var s = 0.0
    var i = 0
    var step = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val y = arr.getLong(i).toDouble
        val sOld = ring(step % period)
        if (!seeded) { l = y; b = 0.0; seeded = true }
        else {
          val lNew = alpha * (y - sOld) + (1.0 - alpha) * (l + b)
          val bNew = beta * (lNew - l) + (1.0 - beta) * b
          l = lNew; b = bNew
        }
        s = gamma * (y - l) + (1.0 - gamma) * sOld
        ring(step % period) = s
        step += 1
      }
      rows(i) = InternalRow(l, b, s)
      i += 1
    }
    new GenericArrayData(rows)
  }
}
