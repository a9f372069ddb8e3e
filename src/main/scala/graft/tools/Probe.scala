package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    def force(df: org.apache.spark.sql.DataFrame): String = {
      df.write.format("noop").mode("overwrite").save(); "forced"
    }
    val e = graft.sources.Tables.events(spark, sf)
    val hexFrame = format_string(
      ("0" * 38) + "%04X" + "00" + "%02X" + "00" + "0000" + "40" +
        "000000" + "FFFFFFFFFFFF" + "%012X" + ("0" * 38) + "%02X" + "%s",
      lit(2412) + (col("event_id") % 13) * 5,
      lit(165) + (col("event_id") % 30),
      col("user_id"),
      length(col("event_type")),
      upper(hex(encode(col("event_type"), "US-ASCII"))))
    val frames = e.select(col("ts"), col("event_id").as("sensorId"), unhex(hexFrame).as("bytes"))
    time("events scan")(force(e.select("ts", "event_id", "user_id", "event_type")))
    time("frame build")(force(frames))
    val parsed = graft.operators.FrameParser.parse(frames)
    time("build+parse")(force(parsed))
    time("full query with sort")(force(graft.SparkEntry.queries("s2_frame_parse")(spark, sf)))
    spark.stop()
  }
}
