package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.VectorFunctions
import graft.functions.expressions.VectorExpressions._

/** The codegen'd vector expressions vs independent models AND vs the
  * lambda (functions.aggregate/zip_with) formulation they replaced. */
class VectorExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): List[A] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(7L))(_.next)
      .map(s => gen.apply(params, s))
      .collect { case Some(v) => v }
      .take(n).toList
  }

  private val vec = Gen.chooseNum(1, 16).flatMap(d =>
    Gen.listOfN(d, Gen.chooseNum(-10.0f, 10.0f)))

  test("cosineSim/dotProduct == scala model, == lambda formulation") {
    val pairs = samples(for { a <- vec; b <- vec } yield (a, b), 50)
      .map { case (a, b) => val d = math.min(a.size, b.size)
        (a.take(d), b.take(d)) }  // equal dims, the operator contract
    val df = pairs.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("id", "a", "b")
    val got = df.select(col("id"),
        cosineSim(col("a"), col("b")).as("cos"),
        dotProduct(col("a"), col("b")).as("dot"),
        VectorFunctions.cosine(col("a"), col("b")).as("cos_lambda"),
        VectorFunctions.dot(col("a"), col("b")).as("dot_lambda"))
      .orderBy("id").collect()
    got.zip(pairs).foreach { case (r, (a, b)) =>
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      val cos = if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
      assert(math.abs(r.getDouble(1) - cos) < 1e-9)
      assert(math.abs(r.getDouble(2) - dot) < 1e-9)
      // exact equality with the lambda formulation (same fold order)
      assert(r.getDouble(1) == r.getDouble(3) || math.abs(r.getDouble(1) - r.getDouble(3)) < 1e-12)
      assert(r.getDouble(2) == r.getDouble(4))
    }
  }

  test("zero vectors and nulls") {
    val df = Seq(
      (1, Some(Seq(0f, 0f)), Some(Seq(1f, 2f))),
      (2, None, Some(Seq(1f, 2f))),
      (3, Some(Seq(1f, 2f)), None))
      .toDF("id", "a", "b")
    val got = df.select(col("id"), cosineSim(col("a"), col("b")).as("c"))
      .orderBy("id").collect()
    assert(got(0).getDouble(1) == 0.0)   // zero-norm -> 0
    assert(got(1).isNullAt(1))           // null propagates
    assert(got(2).isNullAt(1))
  }

  test("cosine is scale-invariant and symmetric") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(2f, 4f, 6f))).toDF("a", "b")
    val r = df.select(
      cosineSim(col("a"), col("b")).as("ab"),
      cosineSim(col("b"), col("a")).as("ba")).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(0) == r.getDouble(1))
  }
}
