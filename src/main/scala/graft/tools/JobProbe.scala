package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-JOB wall-clock breakdown for one SparkEntry query (guide §1:
  * measure first). Wall ≫ task-CPU on many bench queries — the time is
  * in sequential job/stage latency, not compute — so the unit that
  * matters is the job: this prints every job's wall, task count, task
  * time, and the first line of its call site, plus the gaps BETWEEN
  * jobs (pure driver work: planning, codegen, collects, file I/O).
  *
  * Usage: scripts/run.sh graft.tools.JobProbe <query> [<query>...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var b = SparkSession.builder().master(s"local[$cpus]")
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
    // A/B experiment knob: GRAFT_PROBE_CONF="k=v;k=v" applies extra
    // session confs so a hypothesis (AQE off? bigger advisory size?)
    // is one env var, not a recompile.
    sys.env.get("GRAFT_PROBE_CONF").foreach(_.split(';').foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b = b.config(k.trim, v.trim)
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    case class JobRec(id: Int, start: Long, var end: Long = 0L,
      var nTasks: Int = 0, var taskMs: Long = 0L, desc: String)
    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val d = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        jobs(e.jobId) = JobRec(e.jobId, e.time, desc = d)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = jobs.synchronized {
        // stageId -> job mapping is implicit via the active job; good
        // enough: attribute to the LAST started unfinished job
        val m = e.taskMetrics
        jobs.values.toSeq.reverse.find(_.end == 0L).foreach { j =>
          j.nTasks += 1
          if (m != null) j.taskMs += m.executorRunTime
        }
      }
    })
    // warm-up: session + codegen machinery
    try graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val all = graft.SparkEntry.queries ++ graft.SparkEntry.benchOnly
    val passes = sys.env.get("GRAFT_PROBE_PASSES").flatMap(_.toIntOption).getOrElse(2)
    for (name <- args) {
      var best = Double.MaxValue
      for (pass <- 1 to passes) {
        jobs.synchronized(jobs.clear())
        val t0 = System.nanoTime()
        all(name)(spark, sf).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        best = math.min(best, wall)
        org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
        println(f"== $name pass $pass: total $wall%.2f s" +
          (if (pass == passes) f" | min $best%.2f s" else ""))
        if (pass == passes && sys.env.contains("GRAFT_PROBE_JOBS")) jobs.synchronized {
          var lastEnd = jobs.values.headOption.map(_.start).getOrElse(0L)
          var gapSum = 0.0
          var jobSum = 0.0
          for (j <- jobs.values) {
            val gap = (j.start - lastEnd) / 1e3
            gapSum += math.max(gap, 0)
            jobSum += (j.end - j.start) / 1e3
            println(f"  gap ${math.max(gap, 0)}%6.2f s | job ${j.id}%3d " +
              f"${(j.end - j.start) / 1e3}%6.2f s tasks=${j.nTasks}%4d " +
              f"taskTime=${j.taskMs / 1e3}%7.2f s  ${j.desc.take(70)}")
            lastEnd = j.end
          }
          println(f"  == jobs: ${jobs.size} | in-job $jobSum%.2f s | " +
            f"driver gaps $gapSum%.2f s")
        }
      }
    }
    spark.stop()
  }
}
