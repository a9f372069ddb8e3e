package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch probe — not part of the library surface. */
object Probe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.sources.Tables.documents(spark, sf)
    import graft.functions.TextFunctions._
    import graft.operators.Dedup

    def force(df: org.apache.spark.sql.DataFrame): String = {
      df.write.format("noop").mode("overwrite").save(); "forced"
    }
    val sk = Dedup.simHashSketches(docs)
    time("simhash sketches")(force(sk))
    time("simhash pairs")(Dedup.simHashNearDups(docs, maxHamming = 3).count())
    time("ngram jaccard pairs")(Dedup.ngramJaccardPairs(docs, "source", 3, 0.2).count())
    time("minhash near dups")(Dedup.minHashNearDups(docs, threshold = 0.5).count())
    val emb = graft.sources.Tables.embeddings(spark, sf)
    time("embedding near dups")(Dedup.embeddingNearDups(emb, 0.4).count())
    time("l3 brute topk")(graft.operators.Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 5), emb.filter(col("vec_id") >= 5), 3).count())
    time("l3 lsh topk")(graft.operators.Similarity.lshTopK(
      emb.filter(col("vec_id") < 5), emb.filter(col("vec_id") >= 5), 3).count())
    spark.stop()
  }
}
