package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline BPE merge-table trainer (classic Sennrich 2016 shape): count
  * pre-tokenizer units over the corpus, then greedily merge the most
  * frequent adjacent symbol pair N times. Run once against testdata;
  * the resulting table is pasted into TextFunctions.DefaultBpeMerges as
  * LITERAL data (so the tokenizer — and its DuckDB oracle replay — are
  * pure functions of the code, not of training-time state).
  *
  * The unit-frequency aggregation is distributed (one map-combined
  * groupBy over the corpus); the merge loop runs driver-side over the
  * aggregated vocabulary — vocab-sized, not corpus-sized, which is how
  * production BPE trainers work too (at 100 TB you train on the
  * aggregated word-count table or a sample, never the raw corpus).
  *
  * Usage: scripts/run.sh graft.tools.BpeTrain [sfDir] [nMerges]
  */
object BpeTrain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nMerges = args.lift(1).map(_.toInt).getOrElse(48)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // pre-tokenizer units + counts (distributed; vocab-sized result)
    val units = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(regexp_extract_all(col("text"),
        lit(graft.functions.TextFunctions.BpePattern), lit(0))).as("u"))
      .groupBy("u").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))

    // classic BPE training over the (word → count) table
    var vocab: Map[Vector[String], Long] =
      units.groupMapReduce(_._1.map(_.toString).toVector)(_._2)(_ + _)
    val merges = Vector.newBuilder[(String, String)]
    for (_ <- 0 until nMerges) {
      val pairCounts = mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      // self-pairs (a,a) are EXCLUDED: with distinct symbols, (a,b)
      // redexes can never overlap, so one left-to-right pass per rank
      // is confluent and the space-joined replace() oracle replay is
      // exactly equivalent (see BpeExprs). A self-pair would make the
      // two strategies diverge on runs of 6+ identical symbols.
      val eligible = pairCounts.filter { case ((a, b), _) => a != b }
      if (eligible.nonEmpty) {
        // deterministic tie-break: count desc, then lexicographic
        val best = eligible.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val merged = best._1 + best._2
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += merged; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result()
        }(_._2)(_ + _)
      }
    }
    println(merges.result()
      .map { case (a, b) => "(\"" + a + "\", \"" + b + "\")" }
      .mkString("Vector(\n    ", ",\n    ", ")"))
    spark.stop()
  }
}
