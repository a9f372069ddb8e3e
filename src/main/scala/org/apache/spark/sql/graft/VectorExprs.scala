package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType}

/** Codegen'd vector expressions (see graft.functions.expressions
  * .VectorExpressions for the public Column API and rationale). Lives in
  * the sql package namespace because ExpectsInputTypes/AbstractDataType
  * are private[sql] in Spark 4.
  */
abstract class FloatVectorBinaryExpr extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
}

case class DotProductExpr(left: Expression, right: Expression)
    extends FloatVectorBinaryExpr {

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i).toDouble * y(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |float[] $x = $a.toFloatArray();
         |float[] $y = $b.toFloatArray();
         |int $n = Math.min($x.length, $y.length);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += (double) $x[$i] * (double) $y[$i]; }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class CosineSimExpr(left: Expression, right: Expression)
    extends FloatVectorBinaryExpr {

  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(x.length, y.length)
    var d = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x(i).toDouble; val yi = y(i).toDouble
      d += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    // full-array norms (beyond the common prefix) to match norm(a)·norm(b)
    i = n; while (i < x.length) { val xi = x(i).toDouble; nx += xi * xi; i += 1 }
    i = n; while (i < y.length) { val yi = y(i).toDouble; ny += yi * yi; i += 1 }
    if (nx == 0.0 || ny == 0.0) 0.0 else d / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      s"""
         |float[] $x = $a.toFloatArray();
         |float[] $y = $b.toFloatArray();
         |int $n = Math.min($x.length, $y.length);
         |double $d = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xi = (double) $x[$i]; double yi = (double) $y[$i];
         |  $d += xi * yi; $nx += xi * xi; $ny += yi * yi;
         |}
         |for (int $i = $n; $i < $x.length; $i++) { double xi = (double) $x[$i]; $nx += xi * xi; }
         |for (int $i = $n; $i < $y.length; $i++) { double yi = (double) $y[$i]; $ny += yi * yi; }
         |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0 : $d / (Math.sqrt($nx) * Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Hilbert curve index d(x, y) — the classic xy→d rotate-and-walk, as
  * ONE imperative loop instead of a Column-tree unroll. The Column
  * formulation doubles its expression tree every bit level (each
  * round's rotated x references BOTH prior coordinates, so 8 levels ≈
  * 2⁸ nested whens): codegen blows past JIT limits and evaluation
  * re-walks exponential subtrees — measured 214 s on 60 k rows and an
  * executor OOM at sf0.1. This expression is the same math at a few
  * ns/row, inside whole-stage codegen. */
case class HilbertIndexExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31] (got $bits)")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hilbert"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndexExpr.compute(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"org.apache.spark.sql.graft.HilbertIndexExpr.compute($x, $y, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndexExpr {
  /** Identical per-level rotation to the (retired) Column unroll:
    * ry=0 ∧ rx=1 → (x,y) ← (s−1−y, s−1−x); ry=0 ∧ rx=0 → swap. */
  def compute(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
