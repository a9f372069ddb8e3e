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
}
