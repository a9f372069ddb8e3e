package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

object Probe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val e = graft.sources.Tables.events(spark, sf)
    // dense telemetry: every event against every event (same stream) per user
    val left = e.select((col("user_id") % 100).as("user_id"), col("event_id").as("lid"), col("ts"))
    val right = e.select((col("user_id") % 100).as("r_user"), col("event_id").as("rid"), col("ts").as("rts"))
    def custom() = graft.operators.AsOf.join2(left, right,
      Seq("user_id"), Seq("r_user"), "ts", "rts", -1L).count()
    def compose() = {
      val w = Window.partitionBy("lid").orderBy(col("rts").desc, col("rid").desc)
      left.join(right, col("user_id") === col("r_user") && col("rts") <= col("ts"), "left_outer")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).count()
    }
    time("warmup")(e.count())
    time("custom as-of (100k x 100k)")(custom())
    time("custom as-of 2nd")(custom())
    time("compose as-of (range+window)")(compose())
    time("compose 2nd")(compose())
    spark.stop()
  }
}
