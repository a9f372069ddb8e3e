package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector expression library (SURVEY.md §2.10 L3): dot product,
  * norms, cosine — as array-lambda expressions over `array<float>`
  * columns, cast element-wise to double FIRST so accumulation order and
  * precision are identical to the DuckDB oracle (strict left-to-right
  * fold in both engines).
  */
object VectorFunctions {

  /** Element-wise double cast (float embeddings → stable double math). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product via zip_with + left-to-right aggregate. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm. */
  def normSq(v: Column): Column =
    aggregate(asDouble(v), lit(0.0), (acc, x) => acc + x * x)

  /** L2 norm. */
  def norm(v: Column): Column = sqrt(normSq(v))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }

  /** Random-hyperplane LSH bucket id: sign-bit signature of the vector
    * against `bits` fixed pseudo-random hyperplanes. The hyperplanes are
    * a deterministic xorshift mix of (bit, dim), so executors need no
    * broadcast. Native expression: the Column fold built a bits×dim
    * (~512-node) tree that cost seconds of Janino compile time per plan.
    */
  def rhpBucket(v: Column, bits: Int, dim: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.RhpBucketExpr(
        org.apache.spark.sql.graft.Bridge.expression(v), bits, dim))

  // (A sign-pattern signBucket variant was removed: unused, and its
  // ANSI element_at threw on vectors shorter than `bits` — rhpBucket
  // above is the maintained bucketing primitive.)
}
