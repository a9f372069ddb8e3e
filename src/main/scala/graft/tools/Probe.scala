package graft.tools
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[1]")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def ts(ms: Long) = new Timestamp(1700000000000L + ms)
    val lDf = Seq((0L, "a", ts(100)), (1L, "a", ts(300)), (2L, "b", ts(200))).toDF("lid", "k", "t")
    val rDf = Seq((10L, "a", ts(50)), (11L, "a", ts(250)), (12L, "b", ts(150)), (13L, "b", ts(220))).toDF("rv", "rk", "rt")
    val out = graft.operators.AsOf.join2(lDf, rDf, Seq("k"), Seq("rk"), "t", "rt", -1L)
    out.show(false)
    out.explain()
    spark.stop()
  }
}
