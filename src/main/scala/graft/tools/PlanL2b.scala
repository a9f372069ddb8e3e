package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off probe: is l2b's banded exchange reused and the signature
  * computed once? (diagnosing the md5-family runtime). */
object PlanL2b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("l2b_minhash_pairs")(spark, "/root/testdata/sf0.001")
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    println("minhash_md5 occurrences: " + "graft_minhash_md5".r.findAllIn(plan).size)
    println("hashed_shingles occurrences: " + "graft_hashed_shingles".r.findAllIn(plan).size)
    println("ReusedExchange: " + "ReusedExchange".r.findAllIn(plan).size)
    println("Exchange: " + "Exchange".r.findAllIn(plan).size)
    spark.stop()
  }
}
