package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolate ONE SparkEntry pipeline's wall time (the bench runs them
  * only as a batch pre-build, so a suspicious pipeline number cannot
  * be re-measured without paying the whole surface):
  * `run.sh graft.tools.TimePipeline <name> [sfDir]`. Same session
  * shape as [[graft.Bench]]; fresh temp copy semantics are the
  * pipeline's own (capstone stores build under java.io.tmpdir). */
object TimePipeline {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val fn = graft.SparkEntry.pipelines(name)
    val t0 = System.nanoTime()
    fn(spark, sfDir)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"pipeline":"$name","sec":$sec%.2f}""")
    spark.stop()
  }
}
