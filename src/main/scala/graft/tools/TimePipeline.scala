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
      // match Bench: low AQE coalesce floor for CPU-dense stages (r16)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
      // match Bench: codegen compile cache sized for a multi-query session
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // GRAFT_PROBE_JOBS: per-job wall/gap breakdown (guide §1 — a store
    // build is dozens of tiny driver-sequenced jobs; the gaps ARE the
    // driver-side commit protocol cost)
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    if (sys.env.contains("GRAFT_PROBE_JOBS")) {
      val last = new java.util.concurrent.atomic.AtomicLong(0L)
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(e.jobId, (e.time, e.stageInfos.lastOption.map(_.name).getOrElse("?")))
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.get(e.jobId)).foreach { case (t, n) =>
            val gap = if (last.get == 0L) 0L else t - last.get
            jobLog.add(f"job ${e.jobId}%4d ${(e.time - t) / 1e3}%6.2f s (gap ${gap / 1e3}%6.2f) $n")
          }
          last.set(e.time)
        }
      })
    }
    try graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    jobLog.clear()
    val fn = graft.SparkEntry.pipelines(name)
    val t0 = System.nanoTime()
    fn(spark, sfDir)
    val sec = (System.nanoTime() - t0) / 1e9
    jobLog.forEach(l => System.err.println(l))
    println(f"""{"pipeline":"$name","sec":$sec%.2f}""")
    spark.stop()
  }
}
