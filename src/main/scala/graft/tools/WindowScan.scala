package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec

/** One-off audit: list every catalog query whose physical plan carries
  * a PARTITIONLESS WindowExec (the single-task stage WindowExec itself
  * warns about — the plan shape that cannot scale). */
object WindowScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // AQE's AdaptiveSparkPlanExec hides its subtree from collect();
      // disable it so the WindowExec nodes are visible to the audit
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, d).queryExecution.executedPlan
        val bad = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        if (bad.nonEmpty)
          println(s"PARTITIONLESS_WINDOW $name (${bad.size})")
      } catch { case e: Throwable =>
        println(s"ERROR $name ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
