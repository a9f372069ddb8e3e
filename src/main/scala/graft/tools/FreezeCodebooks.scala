package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, exists, xxhash64}

import graft.operators.KMeansLite

/** One-shot generator for [[graft.operators.FrozenCodebooks]]: trains the
  * IVF coarse quantizer and the PQ subquantizers on the sf0.01 embeddings
  * (same deterministic hash-ordered draw as SimilarityIvf.trainingSample),
  * quantizes every centroid coordinate to the dyadic grid k/1024 — exactly
  * representable in BOTH float32 and float64, so the engine's literals and
  * the DuckDB oracle's literals denote the SAME real number with no
  * decimal-parse drift — and prints the Scala integer arrays to paste into
  * FrozenCodebooks.scala. Run once; the output is frozen DATA (the BPE
  * merge-table / SemanticHyperplanes precedent), not a training pipeline.
  */
object FreezeCodebooks {

  private def quant(v: Array[Float]): String =
    v.map(f => math.round(f * 1024f)).mkString("Array(", ", ", ")")

  private def unitNorm(v: Array[Float]): Array[Float] = {
    var n2 = 0.0; var i = 0
    while (i < v.length) { n2 += v(i).toDouble * v(i).toDouble; i += 1 }
    if (n2 == 0.0) v
    else { val inv = 1.0 / math.sqrt(n2); v.map(x => (x * inv).toFloat) }
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("embedding")
      .filter(col("embedding").isNotNull && !exists(col("embedding"), _.isNull))
      .orderBy(xxhash64(col("embedding")))
      .limit(10000)
      .collect().map(_.getSeq[Float](0).toArray)
    val unit = raw.map(unitNorm)

    val ivfRaw = KMeansLite.lloyd(raw, 8, iters = 10, seed = 42L)
    val ivfUnit = KMeansLite.lloyd(unit, 8, iters = 10, seed = 42L)
    // m=4 subspaces of 16 dims, 8 centroids each, over unit vectors
    val dim = unit.head.length
    val m = 4; val k = 8
    val pq = (0 until m).map { i =>
      val lo = dim * i / m; val hi = dim * (i + 1) / m
      KMeansLite.lloyd(unit.map(_.slice(lo, hi)), k, iters = 10, seed = 42L + i)
    }

    println("  private val ivfRawQ: Array[Array[Int]] = Array(")
    println(ivfRaw.map(c => "    " + quant(c)).mkString(",\n") + ")")
    println("  private val ivfUnitQ: Array[Array[Int]] = Array(")
    println(ivfUnit.map(c => "    " + quant(c)).mkString(",\n") + ")")
    println("  private val pqQ: Array[Array[Array[Int]]] = Array(")
    println(pq.map(cb => "    Array(\n" + cb.map(c => "      " + quant(c)).mkString(",\n") + ")")
      .mkString(",\n") + ")")
    spark.stop()
  }
}
