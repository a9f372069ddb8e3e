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

  test("HLL census under Structured Streaming: per-batch sketches union to the batch truth") {
    // the LIVE census path: each micro-batch appends a sketch of the
    // devices it saw; the global census is the union of all sketch rows
    // — no re-aggregation of history, state is one sketch per batch.
    // Incremental result == one batch sketch over everything.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit def sqlCtx = spark.sqlContext
    val in = MemoryStream[Long]
    val q = in.toDF().toDF("user_id")
      .groupBy().agg(hll_sketch_agg(col("user_id")).as("sk"))
      .writeStream.format("memory").queryName("hll_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(1L to 400L: _*)
      q.processAllAvailable()
      in.addData(201L to 600L: _*)   // overlap: 200 repeats, 200 new
      q.processAllAvailable()
      val streamed = spark.table("hll_out")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
        .head.getLong(0)
      val direct = (1L to 600L).toDF("user_id")
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
        .head.getLong(0)
      // NOT bit-equal to the one-shot sketch: the streaming state path
      // merges across triggers through a union operator that promotes
      // the sketch's internal representation, which can shift the
      // estimate by a register or two (measured 592 vs 595 on 600).
      // The census CLAIM is accuracy, and both paths must hold it.
      assert(math.abs(streamed - 600L) <= 30, s"streamed census $streamed vs 600")
      assert(math.abs(direct - 600L) <= 30, s"batch census $direct vs 600")
      assert(math.abs(streamed - direct).toDouble / direct < 0.02,
        s"streamed $streamed drifted from batch $direct")
    } finally q.stop()
  }

  test("a11_topk_sketch query returns ranked rows on testdata") {
    val rows = SparkEntry.queries("a11_topk_sketch")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 10)
    val ests = rows.map(_.getLong(1))
    assert(ests.sameElements(ests.sorted(Ordering[Long].reverse)))
  }
}
