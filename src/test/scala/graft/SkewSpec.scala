package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Skew utilities: results must be EXACTLY those of the plain
  * formulations on a power-law keyed dataset (one key owning ~90% of
  * rows), while the salted plans spread the hot key over many reducers. */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // hot key "whale" ~ 9000 rows; 50 cold keys share 1000
  private lazy val skewed = ((1 to 9000).map(i => ("whale", i % 400)) ++
    (1 to 1000).map(i => ("k" + (i % 50), i % 37)))
    .toDF("mac", "ssid_id")

  test("saltedCount == plain groupBy count") {
    val plain = skewed.groupBy("mac").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, "mac")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(plain("whale") == 9000L)
  }

  test("saltedCountDistinct == plain countDistinct") {
    val plain = skewed.groupBy("mac").agg(countDistinct("ssid_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCountDistinct(skewed, "mac", "ssid_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(plain("whale") == 400L)
  }

  test("saltedJoin == plain inner join, row for row") {
    val dim = (Seq("whale") ++ (0 until 50).map("k" + _)).zipWithIndex
      .map { case (m, i) => (m, s"label$i") }.toDF("mac", "label")
    val plain = skewed.join(dim, "mac")
      .groupBy("mac", "label").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val salted = Skew.saltedJoin(skewed, dim, "mac")
      .groupBy("mac", "label").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(salted == plain)
  }

  test("salt derivation tolerates map-typed columns (excluded from the hash)") {
    import org.apache.spark.sql.functions.{col, map, lit}
    val df = spark.range(1000)
      .select((col("id") % 3).as("k"), col("id").as("v"),
        map(lit("a"), col("id")).as("props"))
    val got = graft.operators.Skew.saltedCount(df, "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 334L, 1L -> 333L, 2L -> 333L))
  }

  test("AQE converts a skewed sort-merge join at runtime (skew=true)") {
    // the OTHER half of the skew story (§4.2): salting is the
    // deterministic pre-plan defense, AQE's OptimizeSkewedJoin is the
    // runtime one — a hot partition in a sort-merge join is split into
    // sub-partitions after the map stage reports sizes. Thresholds are
    // shrunk so testdata-scale partitions register as skewed.
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      // left: 100k rows, 95% on ONE key → one shuffle partition dwarfs the rest
      val left = spark.range(0, 100000)
        .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val right = spark.range(0, 2000).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = left.join(right, "k")
      // collect() executes THIS dataset's QueryExecution, so its adaptive
      // plan finalizes in place (a write action would plan a fresh one)
      joined.collect()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${finalPlan.take(1200)}")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted aggregation really spreads the hot key across reducers") {
    // phase-1 output must contain multiple (whale, salt) groups
    val phase1Groups = skewed.withColumn("_salt",
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(16)))
      .groupBy("mac", "_salt").count()
      .filter($"mac" === "whale").count()
    assert(phase1Groups > 4, s"hot key only hit $phase1Groups salt buckets")
  }

  test("skew report: uniform keys read gini 0, concentration reads hand-computed ppm") {
    // uniform: 4 keys x 3 rows -> gini exactly 0, top share 1/4
    val uniform = (for { k <- 1 to 4; _ <- 1 to 3 } yield ("u", k.toLong))
      .toDF("g", "k")
    // skewed: counts (1,1,1,5) -> gini = 12/32 = 0.375, top 5/8
    val skew = (Seq(1L, 2L, 3L) ++ Seq.fill(5)(4L)).map(("s", _)).toDF("g", "k")
    val got = Skew.skewReport(uniform.unionByName(skew), Seq("g"), col("k"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got("u") == ((4L, 12L, 3L, 250000L, 0L)))
    assert(got("s") == ((4L, 8L, 5L, 625000L, 375000L)))
  }

  test("partition probe: per-bucket totals and heaviest key match a hand reference") {
    import graft.operators.Sampling
    val counts = Map("w" -> 5, "x" -> 2, "y" -> 1, "z" -> 1)
    val df = counts.toSeq.flatMap { case (k, n) => Seq.fill(n)(k) }.toDF("k")
    def bucketOf(k: String): Long = spark.range(1)
      .select(pmod(Sampling.hashGate(lit(k), "t"), lit(4L))).head().getLong(0)
    val expected = counts.keys.toSeq.groupBy(bucketOf).map { case (b, ks) =>
      val n = ks.map(counts).sum.toLong
      // heaviest key: max count, min key on ties — the probe's contract
      val top = ks.toSeq.sortBy(k => (-counts(k), k)).head
      b -> ((n, ks.size.toLong, top, counts(top).toLong,
        1000000L * counts(top) / n))
    }
    val got = Skew.partitionProbe(df, col("k"), nParts = 4, salt = "t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, s"got $got, expected $expected")
    assert(got.values.map(_._1).sum == 9L, "every row lands in exactly one bucket")
  }

  test("join cardinality probe: exact per-key output sizes, shares, and total") {
    val left = (Seq.fill(2)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val right = (Seq.fill(4)("a") ++ Seq("b") ++ Seq.fill(5)("d")).toDF("j")
    val got = Skew.joinCardinality(left, col("k"), right, col("j"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // only overlapping keys contribute: a -> 2·4 = 8, b -> 3·1 = 3
    assert(got.toSeq == Seq(
      ("a", 2L, 4L, 8L, 727272L, 11L),
      ("b", 3L, 1L, 3L, 272727L, 11L)), got.toSeq)
    // the probe's total equals the join it predicts
    assert(left.join(right, col("k") === col("j")).count() == 11L)
    // disjoint key spaces: empty report, not a division error
    assert(Skew.joinCardinality(left, col("k"),
      Seq("z").toDF("j"), col("j")).collect().isEmpty)
  }
}
