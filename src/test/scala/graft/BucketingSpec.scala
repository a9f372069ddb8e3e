package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Bucketing (SURVEY §4.2 physical posture): the 100 TB fact table is
  * written bucketed by `mac` so per-device aggregations and self-joins
  * are co-located — no exchange at read time. Asserted on the actual
  * physical plans of a bucketed saveAsTable round-trip. */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  override def afterAll(): Unit = {
    spark.sql("DROP TABLE IF EXISTS obs_bucketed")
    super.afterAll()
  }

  private lazy val table: String = {
    // spark.sql.warehouse.dir is static; the default ./spark-warehouse
    // (gitignored) is used and the table dropped after the suite
    val obs = (1 to 10000)
      .map(i => ("MAC" + (i % 200), i.toLong, -30 - (i % 60)))
      .toDF("mac", "seq", "rssi")
    obs.write.mode("overwrite")
      .bucketBy(8, "mac").sortBy("mac")
      .saveAsTable("obs_bucketed")
    "obs_bucketed"
  }

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("per-device aggregation on a bucketed table needs no exchange") {
    val p = plan(spark.table(table).groupBy("mac").agg(avg("rssi"), count(lit(1))))
    assert(p.contains("Bucketed: true"), "scan must recognize buckets")
    assert(!p.contains("hashpartitioning"),
      s"bucketed groupBy must not shuffle:\n$p")
  }

  test("self-join on the bucket key is co-located (no shuffle on either side)") {
    val t = spark.table(table)
    val p = plan(t.as("a").join(t.as("b"), "mac"))
    assert(!p.contains("hashpartitioning"),
      s"bucketed self-join must not shuffle:\n$p")
  }

  test("non-bucket-key aggregation still shuffles (sanity)") {
    val p = plan(spark.table(table).groupBy("rssi").count())
    assert(p.contains("hashpartitioning"))
  }

  test("dynamic partition pruning fires on the date-partitioned fact table") {
    // the 100 TB layout partitions by obs_date; a selective dim join
    // must prune fact partitions at RUNTIME (DPP), not scan all dates
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    (0 until 2000).map(i => (s"2026-01-${"%02d".format(i % 20 + 1)}", i.toLong, i % 100))
      .toDF("obs_date", "seq", "metric")
      .write.partitionBy("obs_date").parquet(s"$dir/fact")
    val fact = spark.read.parquet(s"$dir/fact")
    // the dim must be file-backed: a local relation's filter constant-
    // folds away before the DPP rule can see a selective predicate
    (1 to 20).map(i => (s"2026-01-${"%02d".format(i)}", i % 4))
      .toDF("d_date", "d_class").write.parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
    val q = fact.join(dim.filter(col("d_class") === 1),
      col("obs_date") === col("d_date"))
    val p = plan(q)
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic partition pruning in:\n${p.take(3000)}")
  }

  test("runtime bloom filter prunes fact rows from a selective dim join") {
    // DPP prunes whole PARTITIONS; the runtime bloom filter is its
    // row-level sibling — a selective dim filter injects might_contain
    // on the fact's join key so non-matching rows die at the scan
    // instead of shuffling. At 100 TB this is the difference between
    // shuffling the whole fact table and shuffling the matching slice.
    // Thresholds: creation side must be under the creation threshold
    // (it is), and the application side must look big enough to be
    // worth protecting — 0 makes any scan eligible in a local test.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val d = "/root/testdata/sf0.01"
      val li = spark.read.parquet(s"$d/lineitem.parquet")
      val ord = spark.read.parquet(s"$d/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val q = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val p = q.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        s"expected a runtime bloom filter in:\n${p.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE coalesces the fixed shuffle-partition count on small stages") {
    // spark.sql.shuffle.partitions is a static guess; at runtime AQE
    // must size post-shuffle partitions to the data (so the same job
    // spec scales from sf0.001 to 100 TB without retuning)
    val df = (1 to 1000).map(i => (i % 7, i)).toDF("k", "v")
      .groupBy("k").count()
    df.collect() // materialize THIS QueryExecution so AQE finalizes it
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("AQEShuffleRead coalesced"),
      s"expected AQE coalesced read in:\n${executed.take(3000)}")
  }
}
