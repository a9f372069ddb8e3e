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

  // A11: on a skewed corpus whose distinct-key count fits the sketch
  // width, the frequent-items sketch is EXACT — top-k items and counts
  // must equal the true heavy hitters, and partial sketches must
  // combine losslessly (the per-partition merge that makes "top
  // talkers over 100 TB" a map-side pass + tiny final union).
  private lazy val skewed = {
    // key k appears 2^(10-k) times, k=0..9: unambiguous ranking
    (0 to 9).flatMap(k => Seq.fill(1 << (10 - k))(k.toLong))
      .zipWithIndex.map { case (k, i) => (k, i % 5) }
      .toDF("key", "part")
  }

  test("a11: approx_top_k == exact heavy hitters on a sketch-width corpus") {
    val got = skewed
      .agg(expr("approx_top_k(key, 4)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("key"), col("e.count").as("est"))
      .orderBy(col("est").desc, col("key"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = skewed.groupBy("key").count()
      .orderBy(col("count").desc, col("key")).limit(4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sameElements(exact),
      s"sketch ${got.toSeq} != exact ${exact.toSeq}")
  }

  test("a11: accumulate per group + combine == direct sketch") {
    val direct = skewed
      .agg(expr("approx_top_k_estimate(approx_top_k_accumulate(key), 4)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.count"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val merged = skewed
      .groupBy("part").agg(expr("approx_top_k_accumulate(key)").as("sk"))
      .agg(expr("approx_top_k_estimate(approx_top_k_combine(sk), 4)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.count"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(merged == direct,
      s"merged=$merged direct=$direct — partial sketches must combine losslessly")
  }

  test("a11_topk_sketch query returns ranked rows on testdata") {
    val rows = SparkEntry.queries("a11_topk_sketch")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 10)
    val ests = rows.map(_.getLong(1))
    assert(ests.sameElements(ests.sorted(Ordering[Long].reverse)))
  }
}
