package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch probe — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.01")
    ev.printSchema()
    ev.orderBy("event_id")
      .select(col("ts"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSS").as("fmt"),
        unix_millis(col("ts")).as("ms"),
        date_format(col("ts"), "MM/dd/yy - hh:mma").as("ref_fmt"))
      .show(3, false)
    spark.stop()
  }
}
