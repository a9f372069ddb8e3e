package graft

import org.apache.spark.sql.functions._

import graft.operators.CountMin

/** Relational count-min sketch: one-sided error, exactness without
  * collisions, cell-wise mergeability, partitioning-independence. */
class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  // zipf-ish skew: key k appears ~ 1000/k times
  private lazy val skewed = (1 to 40).flatMap(k =>
    Seq.fill(1000 / k)(s"key$k")).toDF("k")
  private lazy val exact = skewed.groupBy("k").agg(count(lit(1)).as("n"))
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def estimates(depth: Int, width: Int): Map[String, Long] = {
    val cms = CountMin.build(skewed, col("k"), depth, width, "t")
    CountMin.estimate(cms, skewed.select("k").distinct(), "k", depth, width, "t")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("estimates never undercount (one-sided error), even under heavy collision") {
    val est = estimates(depth = 3, width = 8) // 40 keys into 8 buckets: collisions certain
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k: est ${est(k)} < exact $n")
    }
    assert(est.exists { case (k, e) => e > exact(k) },
      "8 buckets for 40 keys must inflate something — else the test is vacuous")
  }

  test("a wide sketch resolves every key exactly") {
    val est = estimates(depth = 4, width = 4096)
    assert(est == exact)
  }

  test("sketches merge cell-wise: build(A ∪ B) == build(A) + build(B)") {
    val a = skewed.limit(2000)
    val b = skewed.exceptAll(a)
    val merged = CountMin.build(a, col("k"), 3, 32, "t")
      .union(CountMin.build(b, col("k"), 3, 32, "t"))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val direct = CountMin.build(skewed, col("k"), 3, 32, "t")
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }

  test("sketch content is independent of input partitioning") {
    val a = CountMin.build(skewed, col("k"), 4, 64, "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = CountMin.build(skewed.repartition(11), col("k"), 4, 64, "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("probing a key absent from the corpus reads only collision mass") {
    val cms = CountMin.build(skewed, col("k"), 4, 4096, "t")
    val ghost = Seq("never-seen").toDF("k")
    val est = CountMin.estimate(cms, ghost, "k", 4, 4096, "t")
      .collect().head.getLong(1)
    assert(est >= 0L && est < 100L,
      s"a 4096-wide sketch should leave a ghost key near zero: $est")
  }
}
