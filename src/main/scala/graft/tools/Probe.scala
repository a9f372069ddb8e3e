package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(spark, sf)
    import graft.functions.TextFunctions._
    import graft.operators.Dedup
    def force(df: org.apache.spark.sql.DataFrame): String = { df.write.format("noop").mode("overwrite").save(); "ok" }
    time("warmup")(docs.count())
    val sh = docs.select(col("doc_id"), lower(col("text")).as("lt"))
      .select(col("doc_id"), shinglesOfLowered(col("lt"), 5).as("sh"))
    time("shingling only")(force(sh))
    val sig = sh.select(col("doc_id"), xxMinHashSignature(col("sh"), 32).as("sig"))
    time("shingle+sig")(force(sig))
    time("candidates")(Dedup.minHashCandidatePairs(docs).count())
    time("near dups full")(Dedup.minHashNearDups(docs, threshold = 0.5).count())
    time("near dups 2nd")(Dedup.minHashNearDups(docs, threshold = 0.5).count())
    spark.stop()
  }
}
