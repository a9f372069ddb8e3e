package graft

import org.apache.spark.sql.functions._

/** SURVEY §3.2 entry point 2: ad-hoc SQL text over registered views IS
  * the reference's query API (`ssidentity.c:17-18` points operators at
  * the SQLite C API); here the same SQL text and the DataFrame DSL
  * reach the identical Catalyst pipeline. */
class SqlViewsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("SQL text over temp views == DataFrame DSL, same engine") {
    graft.sources.Tables.events(spark, sf).createOrReplaceTempView("obs_events")
    val viaSql = spark.sql(
      """SELECT user_id, count(*) AS n, min(value) AS min_v
        |FROM obs_events WHERE event_type <> 'view'
        |GROUP BY user_id ORDER BY user_id""".stripMargin).collect()
    val viaDsl = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") =!= "view")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), min("value").as("min_v"))
      .orderBy("user_id").collect()
    assert(viaSql.length == viaDsl.length && viaSql.nonEmpty)
    assert(viaSql.map(_.toString).toSeq == viaDsl.map(_.toString).toSeq)
  }

  test("SQL and DSL produce the same optimized plan shape") {
    graft.sources.Tables.lineitem(spark, sf).createOrReplaceTempView("obs_li")
    val sqlPlan = spark.sql(
      "SELECT l_returnflag, sum(l_quantity) s FROM obs_li GROUP BY l_returnflag")
      .queryExecution.optimizedPlan.toString.replaceAll("#\\d+L?", "")
    val dslPlan = graft.sources.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      .queryExecution.optimizedPlan.toString.replaceAll("#\\d+L?", "")
    assert(sqlPlan == dslPlan)
  }
}
