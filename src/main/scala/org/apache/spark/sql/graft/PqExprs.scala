package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization (PQ) expressions — the memory side of the ANN
  * story (operator rationale in graft.operators.SimilarityPq): a
  * `dim`-float vector compresses to `m` small integer codes, and
  * query-to-code distances evaluate through a per-query lookup table
  * (ADC — asymmetric distance computation) without ever reconstructing
  * the vector. All three are codegen'd primitive loops over the
  * codebooks attached as reference objects (same pattern as
  * CellAssignExpr).
  *
  * Subspace layout is derived from the codebooks themselves: subspace i
  * spans the `codebooks(i)(0).length` dimensions starting where subspace
  * i−1 ended — so encode/LUT/ADC can never disagree about boundaries.
  * Vector elements beyond the codebooks' total span are ignored; missing
  * or null elements read as 0.0 (consistent across encode and LUT, so
  * the approximation stays internally coherent).
  */
object PqExprs {

  /** Nearest-centroid code for subspace starting at `lo`, length `d`. */
  def subCode(arr: ArrayData, cb: Array[Array[Float]], lo: Int, d: Int): Int = {
    val n = arr.numElements()
    var best = 0
    var bestDist = Double.MaxValue
    var j = 0
    while (j < cb.length) {
      val c = cb(j)
      var dist = 0.0
      var i = 0
      while (i < d) {
        val idx = lo + i
        val v = if (idx < n && !arr.isNullAt(idx)) arr.getFloat(idx).toDouble else 0.0
        val diff = v - c(i).toDouble
        dist += diff * diff
        i += 1
      }
      if (dist < bestDist) { bestDist = dist; best = j }
      j += 1
    }
    best
  }

  def encode(arr: ArrayData, cbs: Array[Array[Array[Float]]]): ArrayData = {
    val codes = new Array[Int](cbs.length)
    var lo = 0
    var s = 0
    while (s < cbs.length) {
      val d = cbs(s)(0).length
      codes(s) = subCode(arr, cbs(s), lo, d)
      lo += d
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** Flattened LUT: entry s·k + j = squared L2 distance between the
    * query's subspace-s slice and centroid j of codebook s. */
  def lut(arr: ArrayData, cbs: Array[Array[Array[Float]]], k: Int): ArrayData = {
    val out = new Array[Float](cbs.length * k)
    val n = arr.numElements()
    var lo = 0
    var s = 0
    while (s < cbs.length) {
      val cb = cbs(s)
      val d = cb(0).length
      var j = 0
      while (j < cb.length) {
        val c = cb(j)
        var dist = 0.0
        var i = 0
        while (i < d) {
          val idx = lo + i
          val v = if (idx < n && !arr.isNullAt(idx)) arr.getFloat(idx).toDouble else 0.0
          val diff = v - c(i).toDouble
          dist += diff * diff
          i += 1
        }
        out(s * k + j) = dist.toFloat
        j += 1
      }
      lo += d
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC distance: Σ_s lut(s·k + codes(s)), k inferred from the array
    * lengths. Null/short inputs are the caller's bug — encode/lut always
    * emit full-length non-null arrays. */
  def adc(lutArr: ArrayData, codes: ArrayData): Double = {
    val m = codes.numElements()
    if (m == 0) return 0.0
    val k = lutArr.numElements() / m
    var sum = 0.0
    var s = 0
    while (s < m) {
      sum += lutArr.getFloat(s * k + codes.getInt(s)).toDouble
      s += 1
    }
    sum
  }

  /** L2-normalize: v / ‖v‖₂ in ONE pass (norm + scale); zero-norm and
    * empty vectors pass through unchanged. Nulls read as 0.0. A
    * `transform(v, x -> x / sqrt(dot(v, v)))` lambda would re-evaluate
    * the norm subtree per element and run interpreted — this is the
    * same per-row loop, codegen'd. */
  def l2normalize(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Float](n)
    var norm2 = 0.0
    var i = 0
    while (i < n) {
      val v = if (arr.isNullAt(i)) 0.0 else arr.getFloat(i).toDouble
      out(i) = v.toFloat
      norm2 += v * v
      i += 1
    }
    if (norm2 > 0.0) {
      val inv = 1.0 / math.sqrt(norm2)
      i = 0
      while (i < n) { out(i) = (out(i).toDouble * inv).toFloat; i += 1 }
    }
    new GenericArrayData(out)
  }
}

/** array<float> → array<int> PQ codes (m = codebooks.length entries). */
case class PqEncodeExpr(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  protected override def nullSafeEval(input: Any): Any =
    PqExprs.encode(input.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.PqExprs.encode($c, $cbRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<float> query → flattened array<float> distance LUT (m·k). */
case class PqLutExpr(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression with ExpectsInputTypes {
  require(codebooks.nonEmpty && codebooks.forall(_.length == codebooks(0).length),
    "all subquantizers must have the same number of centroids")

  private val k = codebooks(0).length

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pq_lut"

  protected override def nullSafeEval(input: Any): Any =
    PqExprs.lut(input.asInstanceOf[ArrayData], codebooks, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.PqExprs.lut($c, $cbRef, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (lut, codes) → approximate squared L2 distance (double). */
case class PqAdcExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(a: Any, b: Any): Any =
    PqExprs.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.PqExprs.adc($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** array<float> → unit-norm array<float>. */
case class L2NormalizeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_l2_normalize"

  protected override def nullSafeEval(input: Any): Any =
    PqExprs.l2normalize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.PqExprs.l2normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
