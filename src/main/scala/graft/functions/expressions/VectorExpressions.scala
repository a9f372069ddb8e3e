package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{Bridge => ExpressionUtils}
import org.apache.spark.sql.graft.{CosineSimExpr, DotProductExpr}

/** Native Catalyst expressions for the embedding hot path (SURVEY.md
  * §2.10 L2/L3). The `functions.aggregate`/`zip_with` lambda formulation
  * is semantically identical but runs interpreted (higher-order functions
  * don't participate in whole-stage codegen) and allocates an
  * intermediate array per row — measured ~20× slower on the all-pairs
  * cosine joins. These are `doGenCode`'d primitive loops: no boxing, no
  * intermediate arrays, fully inside whole-stage codegen.
  *
  * Math is strict left-to-right double accumulation — the same order as
  * the lambda version and the DuckDB oracle's list_cosine_similarity, so
  * round(x, 4) comparisons are stable across all three.
  */
object VectorExpressions {

  /** dot(a, b): Σ a(i)·b(i) over array<float> — codegen'd primitive loop. */
  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** cosine(a, b) in one pass (dot and both norms in a single loop);
    * 0.0 when either vector has zero norm (matches VectorFunctions.cosine). */
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
