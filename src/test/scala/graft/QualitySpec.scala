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

  test("observedChecks: metrics ride the query's own action — batch Observation path") {
    val df = Seq((1L, Some("ok"), 5L), (2L, None, -1L), (3L, Some("ok"), 5L))
      .toDF("id", "v", "n")
    val obs = new org.apache.spark.sql.Observation("gate")
    val instrumented = Quality.observedChecks(df, obs, Seq(
      "v_null" -> col("v").isNull,
      "n_negative" -> (col("n") < 0)))
    // the instrumented frame computes exactly what df computes
    assert(instrumented.collect().toSet == df.collect().toSet)
    val m = obs.get
    assert(m("n_rows") == 3L, m.toString)
    assert(m("v_v_null") == 1L && m("v_n_negative") == 1L, m.toString)
  }

  test("observedChecks: per-micro-batch metrics on the streaming progress") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val instrumented = Quality.observedChecks(
      in.toDF().toDF("id", "n"), "gate", Seq("n_negative" -> (col("n") < 0)))
    val q = instrumented.writeStream.format("noop").start()
    try {
      in.addData((1L, 5L), (2L, -1L), (3L, -2L))
      q.processAllAvailable()
      in.addData((4L, 7L))
      q.processAllAvailable()
      val perBatch = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("gate")))
        .map(r => (r.getAs[Long]("n_rows"), r.getAs[Long]("v_n_negative")))
        .filter(_._1 > 0L)
      assert(perBatch == Seq((3L, 2L), (1L, 0L)), perBatch.toString)
    } finally q.stop()
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

  test("validate: an empty-but-healthy table reads 0 violations / pass, not NULLs") {
    val df = Seq((1L, "x")).toDF("id", "v").filter(col("id") < 0)
    val got = Quality.validate(df, Seq("v_null" -> col("v").isNull)).collect()
    assert(got.length == 1)
    val r = got.head
    assert(!r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(3))
    assert((r.getLong(1), r.getLong(2), r.getBoolean(3)) == ((0L, 0L, true)))
  }

  test("drift: one empty snapshot is maximal drift (10^9), both empty is 0 — never NULL") {
    val a = Seq("x", "y").toDF("c")
    val empty = a.filter(col("c") === "zzz")
    for (df <- Seq(Quality.driftTvd(a, empty, "c"), Quality.driftTvd(empty, a, "c"))) {
      val rows = df.collect()
      assert(rows.forall(r => !r.isNullAt(3)), "per-category absdiff_u defined")
      assert(rows.filter(_.getString(0) == "ALL").head.getLong(3) == 1000000000L)
    }
    val bothEmpty = Quality.driftTvd(empty, empty, "c")
      .filter(col("cat") === "ALL").collect().head
    assert((bothEmpty.getLong(1), bothEmpty.getLong(2), bothEmpty.getLong(3)) ==
      ((0L, 0L, 0L)))
  }

  test("drift: hand-computed mix shift") {
    // old: x=3/4, y=1/4; new: x=1/4, y=3/4 → TVD = ½(|½|+|−½|) = 0.5
    val a = Seq("x", "x", "x", "y").toDF("c")
    val b = Seq("x", "y", "y", "y").toDF("c")
    val total = Quality.driftTvd(a, b, "c")
      .filter(col("cat") === "ALL").collect().head.getLong(3)
    assert(total == 500000000L)
  }

  test("referential integrity: orphans counted, NULL keys separate, clean edge passes") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), None, Some(3L))
      .toDF("ck")
    val got = Quality.referentialIntegrity(Seq(
        ("bad", child, "ck", parent, "pk"),
        ("self", parent, "pk", parent, "pk")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got("bad") == ((5L, 1L, 1L, false)))   // 9 orphaned, NULL not
    assert(got("self") == ((3L, 0L, 0L, true)))
    intercept[IllegalArgumentException](
      Quality.referentialIntegrity(Seq.empty))
  }

  test("L4w readability: hand-computed Flesch, terminator runs, fragment clamp") {
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"),  // 6 words, 2 sentences, 6 syllables
      (2L, "no terminator here"),          // fragment: sentences clamp to 1
      (3L, "")                             // empty: zero words, NULL score
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.readability(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    val f1 = math.floor((206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0)) * 1000.0).toLong
    assert(got(1L) == ((6L, 2L, 6L, Some(f1))), got)
    assert(got(2L)._2 == 1L, "fragments clamp to one sentence")
    assert(got(3L) == ((0L, 1L, 0L, None)), "empty doc: no words, no score")
    // "?!" is ONE boundary (a terminator RUN), not two sentences
    val runs = Seq((1L, "What?! Really?!")).toDF("doc_id", "text")
    assert(graft.operators.TextAnalysis.readability(runs)
      .collect().head.getLong(2) == 2L)
  }

  test("L4t unigram KL: an on-distribution source scores ~0, a divergent one scores high") {
    val docs = Seq(
      (1L, "a", "x x y y"), (2L, "a", "x y x y"),   // source a ≈ pooled mix
      (3L, "b", "x x y y"),                          // source b ≈ pooled mix
      (4L, "c", "z z z z z z z z")                   // source c: alien vocab
    ).toDF("doc_id", "source", "text")
    val got = graft.operators.TextAnalysis.unigramKl(docs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // c's tokens are rare in the pool relative to within-c → the alien
    // source diverges far beyond the in-mix ones (absolute values are
    // smoothing-inflated on a 20-token fixture; the ORDERING is the
    // contract, with a clear margin)
    assert(got("c")._4 > (got("a")._4 max got("b")._4) * 3 / 2, got)
    assert(got("a")._1 == 8L && got("c")._1 == 8L) // token totals
    assert(got("c")._2 == 1L, "alien source has a single distinct token")
    // determinism
    assert(got == graft.operators.TextAnalysis.unigramKl(docs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap)
  }
}
