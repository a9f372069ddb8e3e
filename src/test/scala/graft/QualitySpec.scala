package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality

/** Expectation checks and TVD drift: hand models, NULL-category safety,
  * and the metric's boundary values. */
class QualitySpec extends SparkTestBase {
  import spark.implicits._

  test("validate: per-rule counts from one pass; pass flag only when zero violations") {
    val df = Seq((1L, Some("ok"), 5L), (2L, None, -1L), (3L, Some("ok"), 5L))
      .toDF("id", "v", "n")
    val got = Quality.validate(df, Seq(
      "v_null" -> col("v").isNull,
      "n_negative" -> (col("n") < 0),
      "never" -> lit(false)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(
      "v_null" -> ((3L, 1L, false)),
      "n_negative" -> ((3L, 1L, false)),
      "never" -> ((3L, 0L, true))))
  }

  test("validate rejects duplicate rule names") {
    val df = Seq(1L).toDF("x")
    intercept[IllegalArgumentException] {
      Quality.validate(df, Seq("a" -> lit(true), "a" -> lit(false)))
    }
  }

  test("drift: identical distributions score 0; disjoint score 10^9 (TVD=1)") {
    val a = Seq("x", "x", "y").toDF("c")
    val sameTotal = Quality.driftTvd(a, a, "c")
      .filter(col("cat") === "ALL").collect().head.getLong(3)
    assert(sameTotal == 0L)
    val b = Seq("z", "z").toDF("c")
    val disjoint = Quality.driftTvd(a, b, "c")
      .filter(col("cat") === "ALL").collect().head.getLong(3)
    // per-category floor quantization biases down < |categories| nanos
    assert(disjoint <= 1000000000L && disjoint > 1000000000L - 3L,
      s"disjoint TVD must be ~1.0: $disjoint")
  }

  test("drift: a NULL category is one category on both sides, not two rows") {
    val a = Seq(Some("x"), None, None).toDF("c")
    val b = Seq(Some("x"), None).toDF("c")
    val rows = Quality.driftTvd(a, b, "c").collect()
    assert(rows.count(_.isNullAt(0)) == 1, "exactly one NULL-category row")
    val nullRow = rows.filter(_.isNullAt(0)).head
    assert((nullRow.getLong(1), nullRow.getLong(2)) == ((2L, 1L)))
  }

  test("drift: hand-computed mix shift") {
    // old: x=3/4, y=1/4; new: x=1/4, y=3/4 → TVD = ½(|½|+|−½|) = 0.5
    val a = Seq("x", "x", "x", "y").toDF("c")
    val b = Seq("x", "y", "y", "y").toDF("c")
    val total = Quality.driftTvd(a, b, "c")
      .filter(col("cat") === "ALL").collect().head.getLong(3)
    assert(total == 500000000L)
  }
}
