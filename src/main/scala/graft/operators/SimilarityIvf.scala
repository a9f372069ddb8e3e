package graft.operators

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
  * Training runs Lloyd's algorithm on a bounded driver-side sample —
  * the FAISS-style recipe: a coarse quantizer needs thousands of
  * points, not the corpus, and the model is nlist×dim floats
  * (kilobytes). Per-iteration Spark jobs (the MLlib route) cost more
  * in scheduling than this entire training does. Assignment is a
  * codegen'd nearest-centroid expression — map-only over the corpus,
  * no shuffle of embeddings.
  *
  * Plan shape at scale: train once on a sample, write the corpus
  * partitioned/bucketed by `cell` (one-time shuffle), then every query
  * batch broadcasts (query, probe-cell) pairs against a cell-pruned
  * scan — corpus embeddings never move at query time.
  */
object SimilarityIvf {

  /** Deterministic Lloyd's k-means over a sample of the corpus.
    *
    * The sample orders by a content hash before the limit: a bare
    * limit() takes the FIRST partitions' rows, so a corpus written
    * sorted/clustered (by category, time…) would train centroids on
    * one region and collapse recall everywhere else. Hash order is a
    * deterministic pseudo-random draw — same sample every run. NULL
    * embeddings and null elements are excluded (they would NPE the
    * driver-side collect). */
  def trainCentroids(emb: DataFrame, nlist: Int, sampleSize: Int = 10000,
      iters: Int = 10, seed: Long = 42L): Array[Array[Float]] =
    KMeansLite.lloyd(trainingSample(emb, sampleSize), nlist, iters, seed)

  /** Bounded hash-ordered training draw (shared with [[SimilarityPq]]). */
  private[operators] def trainingSample(emb: DataFrame,
      sampleSize: Int): Array[Array[Float]] = {
    import org.apache.spark.sql.functions.{col, exists, xxhash64}
    emb.select("embedding")
      .filter(col("embedding").isNotNull && !exists(col("embedding"), _.isNull))
      .orderBy(xxhash64(col("embedding")))
      .limit(sampleSize)
      .collect().map(_.getSeq[Float](0).toArray)
  }

  /** Corpus rows with their coarse cell (map-only, codegen'd). */
  def assignCells(emb: DataFrame, centroids: Array[Array[Float]]): DataFrame =
    emb.withColumn("cell", org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.CellAssignExpr(
        org.apache.spark.sql.graft.Bridge.expression(col("embedding")), centroids)))

  /** Approximate cosine top-k: probe the `nprobe` nearest cells per
    * query, exact-score only those cells' members. */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L): DataFrame =
    ivfTopKWith(queries, candidates, k,
      trainCentroids(candidates, nlist, seed = seed), nprobe)

  /** [[ivfTopK]] with a CALLER-SUPPLIED coarse quantizer — the search
    * half alone (assignment, nprobe pruning, exact in-cell scoring) is a
    * deterministic function of (vectors, centroids), which is what lets
    * the l3c_ivf_pinned oracle replay it on [[FrozenCodebooks]]'
    * literal centroids while training stays spec-verified. */
  def ivfTopKWith(queries: DataFrame, candidates: DataFrame, k: Int,
      centroids: Array[Array[Float]], nprobe: Int): DataFrame =
    ivfTopKPreassigned(queries, assignCells(candidates, centroids), k,
      centroids, nprobe)

  /** The search half over ALREADY-ASSIGNED candidates (vec_id,
    * embedding, cell) — what a PERSISTED cell-assigned index serves
    * directly ([[graft.streaming.StoreAnn]] maintains one from a
    * store's change feed, so query time pays no assignment pass over
    * the corpus); [[ivfTopKWith]] is this after a scan-side
    * assignment. */
  def ivfTopKPreassigned(queries: DataFrame, cells: DataFrame, k: Int,
      centroids: Array[Array[Float]], nprobe: Int): DataFrame = {
    val spark = cells.sparkSession

    import spark.implicits._
    val centroidDf = centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq.toDF("cell", "center")

    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val probes = q.crossJoin(broadcast(centroidDf))
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
