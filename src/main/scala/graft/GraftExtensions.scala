package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft._

/** SQL front door for the native expression library (SURVEY §3.2: the
  * DataFrame DSL and SQL text reach the identical Catalyst pipeline).
  * Register via `spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`; the
  * sketch/vector expressions then resolve in plain SQL:
  *
  *   SELECT graft_cosine(a.embedding, b.embedding) FROM ...
  *   SELECT graft_simhash60(tokens), graft_minhash_md5(shingles, 8) ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def one(name: String)(f: Expression => Expression) =
    (FunctionIdentifier(name), info(name, s"$name(arr)"),
      (args: Seq[Expression]) => f(args.head))

  private def two(name: String)(f: (Expression, Expression) => Expression) =
    (FunctionIdentifier(name), info(name, s"$name(a, b)"),
      (args: Seq[Expression]) => f(args(0), args(1)))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(two("graft_cosine")(CosineSimExpr(_, _)))
    ext.injectFunction(two("graft_dot")(DotProductExpr(_, _)))
    ext.injectFunction(one("graft_simhash60")(SimHash60Expr(_)))
    ext.injectFunction(two("graft_sorted_intersect_count")(SortedLongIntersectCountExpr(_, _)))
    ext.injectFunction((FunctionIdentifier("graft_minhash_md5"),
      info("graft_minhash_md5", "graft_minhash_md5(shingles, numHashes)"),
      (args: Seq[Expression]) => MinHashSigExpr(args(0),
        args(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("graft_minhash_xx"),
      info("graft_minhash_xx", "graft_minhash_xx(shingles, numHashes)"),
      (args: Seq[Expression]) => XxMinHashSigExpr(args(0),
        args(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("graft_rhp_bucket"),
      info("graft_rhp_bucket", "graft_rhp_bucket(vec, bits, dim)"),
      (args: Seq[Expression]) => RhpBucketExpr(args(0),
        args(1).eval().asInstanceOf[Int], args(2).eval().asInstanceOf[Int])))
  }
}
