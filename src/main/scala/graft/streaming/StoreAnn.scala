package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.SimilarityIvf

/** INCREMENTAL ANN index maintenance off the table format — the ST10s →
  * L3c composition: embeddings live in a bucketed MERGE store (the
  * corpus of record), and the IVF index — (vec_id, cell, embedding)
  * under the frozen coarse quantizer — is MAINTAINED from the change
  * feed at O(changeset) per commit range. Re-indexing a 100 TB corpus
  * per refresh is the non-starter this exists to avoid: upserts
  * cell-assign MAP-SIDE (one codegen'd expression against the
  * broadcast-sized centroid table), deletes drop their rows, and the
  * index store's `applyBucketedBatch` keyed on the delivered `to`
  * version makes maintenance exactly-once under feed redelivery.
  *
  * The index is itself a store: time travel gives INDEX-AS-OF (search
  * yesterday's corpus exactly), and an `optimizeStore(orderBy =
  * col("cell"))` maintenance pass clusters each bucket's parquet row
  * groups by cell so nprobe-pruned scans skip at row-group
  * granularity. Queries serve from [[SimilarityIvf.ivfTopKPreassigned]]
  * — no assignment pass over the corpus at query time. */
object StoreAnn {

  /** Apply one delivered feed range to the index store. Public so
    * tests and batch consumers drive ranges deterministically.
    * `embCol` is the embedding (array<float>) value column of the
    * source store. */
  def applyRange(spark: SparkSession, indexDir: String, embCol: String,
      centroids: Array[Array[Float]], nBuckets: Int)(
      feed: DataFrame, from: Long, to: Long): Unit = {
    val keyName = feed.columns.head
    val ups = SimilarityIvf.assignCells(
        feed.filter(col("change") =!= "delete")
          .select(col(keyName), col(s"${embCol}_new").as("embedding")),
        centroids)
      .select(col(keyName), lit("upsert").as("_op"), lit(to).as("_ver"),
        col("cell"), col("embedding"))
    val dels = feed.filter(col("change") === "delete")
      .select(col(keyName), lit("delete").as("_op"), lit(to).as("_ver"),
        lit(null).cast("int").as("cell"),
        lit(null).cast("array<float>").as("embedding"))
    MergeSink.applyBucketedBatch(ups.unionByName(dels), to, indexDir,
      keyName, "_op", "_ver", Seq("cell", "embedding"), nBuckets)
  }

  /** The live wiring: subscribe from before history (the first
    * delivery indexes the existing population) and maintain the index
    * per commit range. Wire to `.start()`. */
  def maintainIndex(spark: SparkSession, embStore: String, subscriber: String,
      indexDir: String, checkpoint: String, embCol: String,
      centroids: Array[Array[Float]], nBuckets: Int = 64,
      versionsPerTrigger: Int = 10,
      clock: Option[DataFrame] = None): DataStreamWriter[Row] =
    MergeSink.changeFeedStream(spark, embStore, subscriber, checkpoint,
      versionsPerTrigger, startAtVersion = Some(-1L), clock)(
      applyRange(spark, indexDir, embCol, centroids, nBuckets))

  /** Approximate cosine top-k against the MAINTAINED index's current
    * snapshot — nprobe-pruned, no corpus-side assignment. `queries`:
    * (vec_id, embedding). */
  def search(spark: SparkSession, indexDir: String, queries: DataFrame,
      centroids: Array[Array[Float]], k: Int, nprobe: Int = 4): DataFrame = {
    val snap = MergeSink.currentBucketedSnapshot(spark, indexDir).getOrElse(
      throw new IllegalStateException(
        s"StoreAnn: $indexDir has no committed index to search"))
    val keyName = snap.columns.head
    SimilarityIvf.ivfTopKPreassigned(queries,
      snap.select(col(keyName).as("vec_id"), col("embedding"), col("cell")),
      k, centroids, nprobe)
  }
}
