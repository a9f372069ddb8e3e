package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Similarity, SimilarityPq}

/** Recall grid sweep for the PQ ANN path (SimilarityPq docstring quotes
  * these numbers): recall@10 vs exact brute force at several (m, k)
  * quantizer sizes over the sf0.001 embeddings. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val cands = emb.filter(col("vec_id") >= 10)
    val k = 10
    val brute = Similarity.bruteForceTopK(queries, cands, k)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((m, kc) <- Seq((8, 16), (8, 64), (16, 16), (16, 64), (32, 32), (16, 128), (32, 128))) {
      val pq = SimilarityPq.pqTopK(queries, cands, k, m = m, kCode = kc)
        .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = brute.intersect(pq).size.toDouble / brute.size
      println(s"m=$m k=$kc recall=$recall")
    }
    spark.stop()
  }
}
