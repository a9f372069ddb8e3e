package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expressions.VectorExpressions

/** L3 scale path #2 — IVF (inverted-file) approximate nearest neighbor:
  * a coarse k-means quantizer partitions the corpus into `nlist` cells;
  * each query scores only the `nprobe` cells whose centroids are
  * closest to it. Complements the random-hyperplane LSH path
  * (Similarity.lshTopK): IVF adapts to the data distribution (learned
  * centroids) where RHP-LSH is oblivious and needs no training pass.
  *
  * Plan shape at scale: train once on a sample, write the corpus
  * partitioned/bucketed by `cell` (one-time shuffle), then every query
  * batch is a broadcast of (query, probe-cell) pairs against a
  * cell-pruned scan — the corpus embeddings never move. Centroids are
  * a tiny local model (nlist × dim floats) broadcast by Spark ML.
  */
object SimilarityIvf {

  /** Assign every row of `emb(vec_id, embedding)` to its coarse cell. */
  def assignCells(emb: DataFrame, nlist: Int, seed: Long = 42L): (DataFrame, Array[Vector]) = {
    val withVec = emb.withColumn("_v", array_to_vector(col("embedding")))
    val model = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("_v").setPredictionCol("cell")
      .fit(withVec)
    (model.transform(withVec).drop("_v"), model.clusterCenters)
  }

  /** Approximate cosine top-k: probe the `nprobe` nearest cells per
    * query (by centroid euclidean distance — the standard IVF coarse
    * metric), exact-score only those cells' members. */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L): DataFrame = {
    val (cells, centers) = assignCells(candidates, nlist, seed)
    val spark = candidates.sparkSession

    // tiny centroid table: (cell, center) — crossJoin'd with the query
    // set (both broadcast-small) to rank probe cells per query
    import spark.implicits._
    val centroids = centers.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("cell", "center")

    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("_dist",
        VectorExpressions.dotProduct(col("qv"), col("qv")) -
          lit(2.0) * VectorExpressions.dotProduct(col("qv"), col("center")) +
          VectorExpressions.dotProduct(col("center"), col("center")))
      .withColumn("_rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("_dist"), col("cell"))))
      .filter(col("_rank") <= nprobe)
      .select(col("qid"), col("qv"), col("cell"))

    val scored = cells.select(col("vec_id").as("cid"), col("embedding").as("cv"), col("cell"))
      .join(broadcast(probes), "cell")
      .select(col("qid"), col("cid"),
        round(VectorExpressions.cosineSim(col("qv"), col("cv")), 4).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }
}
