package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val e = graft.sources.Tables.embeddings(spark, sf)
    time("warmup count")(e.count())
    time("train centroids")(graft.operators.SimilarityIvf.trainCentroids(e, 16).length)
    time("train 2nd")(graft.operators.SimilarityIvf.trainCentroids(e, 16).length)
    time("full ivfTopK")(graft.operators.SimilarityIvf.ivfTopK(
      e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5), 3).count())
    time("full ivfTopK 2nd")(graft.operators.SimilarityIvf.ivfTopK(
      e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5), 3).count())
    spark.stop()
  }
}
