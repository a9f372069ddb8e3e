package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for named SparkEntry queries to files —
  * the r16 optimization-round evidence artifacts
  * (`plans/r16/<query>_<tag>.txt`).
  *
  * Usage: scripts/run.sh graft.tools.PlanDump <tag> <query> [<query>...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), GRAFT_PLAN_DIR (default plans/r16).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.head
    val names = args.tail
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = Paths.get(sys.env.getOrElse("GRAFT_PLAN_DIR", "plans/r16"))
    Files.createDirectories(outDir)
    val all = graft.SparkEntry.queries ++ graft.SparkEntry.benchOnly
    for (name <- names) {
      val df = all(name)(spark, sf)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.write(outDir.resolve(s"${name}_$tag.txt"), plan.getBytes("UTF-8"))
      println(s"wrote ${name}_$tag.txt (${plan.length} chars)")
      // GRAFT_PLAN_METRICS: additionally execute via the noop sink and
      // append the FINAL adaptive plan with per-node metric values —
      // the local stand-in for the UI's SQL tab (guide §7.2)
      if (sys.env.contains("GRAFT_PLAN_METRICS")) {
        // execute THIS QueryExecution (not a fresh one under a writer)
        // so its plan's metric accumulators are the ones populated
        df.queryExecution.toRdd.foreach(_ => ())
        val ep = df.queryExecution.executedPlan
        val sb = new StringBuilder
        def walk(p: org.apache.spark.sql.execution.SparkPlan, d: Int): Unit = {
          val m = p.metrics.collect {
            case (k, v) if v.value > 0 => s"$k=${v.value}"
          }.mkString(", ")
          sb.append("  " * d).append(p.nodeName)
            .append(if (m.nonEmpty) s" [$m]" else "").append('\n')
          p.children.foreach(walk(_, d + 1))
          p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              walk(a.executedPlan, d + 1)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              walk(q.plan, d + 1)
            case s: org.apache.spark.sql.execution.ReusedSubqueryExec =>
              walk(s.child, d + 1)
            case b: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
              walk(b.child, d + 1)
            case _ =>
          }
          p.subqueries.foreach(walk(_, d + 2))
        }
        walk(ep, 0)
        Files.write(outDir.resolve(s"${name}_${tag}_metrics.txt"),
          sb.toString.getBytes("UTF-8"))
        println(s"wrote ${name}_${tag}_metrics.txt")
      }
    }
    spark.stop()
  }
}
