package graft

import org.apache.spark.sql.functions._

/** DataSketches HLL mergeability — the incremental-census property the
  * 100 TB posture rests on (A2c): per-partition sketches union into
  * exactly the sketch of the whole, so a day's new partition updates
  * the global cardinality without re-reading history. */
class SketchSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val rows = {
    val rnd = new scala.util.Random(11)
    (1 to 20000).map { i =>
      (rnd.nextInt(997).toLong, i % 7) // 997 distinct users over 7 "days"
    }.toDF("user_id", "day")
  }

  test("union of per-day HLL sketches == one whole-table sketch, near exact count") {
    val direct = rows
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .head.getLong(0)
    val merged = rows
      .groupBy("day").agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head.getLong(0)
    assert(merged == direct,
      s"merged=$merged direct=$direct — sketch union must be lossless")
    val exact = rows.select(countDistinct("user_id")).head.getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"estimate $merged vs exact $exact drifted > 5%")
  }

  test("a2c_hll_union query returns one sane row on testdata") {
    val df = SparkEntry.queries("a2c_hll_union")(spark, "/root/testdata/sf0.001")
    val est = df.head.getLong(0)
    assert(df.count() == 1 && est > 0)
  }
}
