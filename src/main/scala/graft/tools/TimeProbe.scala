package graft.tools

import org.apache.spark.sql.SparkSession

/** Times named SparkEntry queries (args) at sf0.1 under the same
  * local[32]/noop-sink setup as Bench — for isolating bench outliers. */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // match Bench: low AQE coalesce floor for CPU-dense stages (r16)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
      // match Bench: codegen compile cache sized for a multi-query session
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val all = graft.SparkEntry.queries ++ graft.SparkEntry.benchOnly
    for (name <- args; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      all(name)(spark, sf)
        .write.format("noop").mode("overwrite").save()
      println(f"[time] $name%-24s run$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
