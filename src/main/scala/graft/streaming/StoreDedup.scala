package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Dedup

/** The LLM-pipeline dedup riding the TABLE FORMAT: documents land in a
  * bucketed MERGE store (the corpus of record), and each committed
  * range is near-dup-ADJUDICATED against the pre-range corpus snapshot
  * through the change-feed subscription — the ST10s → L2r composition.
  * "Did today's commits introduce duplicates?" is answered per commit
  * range at O(batch + candidates), never by re-pairing the settled
  * corpus against itself; the corpus side is the store's own
  * partition-pruned snapshot, and the probe is [[Dedup
  * .incrementalNearDups]]'s banded index meet (at fleet scale the
  * band index is a persisted table keyed by band hash — pass it via
  * `corpusIndex` to skip its derivation per range).
  *
  * Emission is at-least-once under crash-replay (the feed contract);
  * the (from, to] range accompanies every report so an idempotent
  * sink dedups on it. */
object StoreDedup {

  /** Adjudicate one delivered feed range: upserted documents (inserts
    * + updates) probe the corpus AS OF the range start. Public so
    * tests and batch consumers drive ranges deterministically. */
  def dedupRange(spark: SparkSession, storeDir: String, textCol: String,
      k: Int = 5, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5,
      corpusIndex: Option[DataFrame] = None)(
      onDups: (DataFrame, Long, Long) => Unit)(
      feed: DataFrame, from: Long, to: Long): Unit = {
    val keyName = feed.columns.head
    val newDocs = feed.filter(col("change") =!= "delete")
      .select(col(keyName).cast("string").as("doc_id"),
        col(s"${textCol}_new").as("text"))
    // the settled corpus = the store at the range START (from-before-
    // history ranges adjudicate the initial population against nothing
    // — its dups surface as new_new pairs)
    val corpus =
      if (from >= 0)
        MergeSink.bucketedSnapshotAt(spark, storeDir, from)
          .select(col(keyName).cast("string").as("doc_id"),
            col(textCol).as("text"))
      else newDocs.limit(0)
    onDups(Dedup.incrementalNearDups(newDocs, corpus, k, numHashes, bands,
      threshold, corpusIndex = corpusIndex), from, to)
  }

  /** The live wiring: subscribe from before history and adjudicate
    * every commit range as it lands. Wire to `.start()`. */
  def dedupStream(spark: SparkSession, storeDir: String, subscriber: String,
      checkpoint: String, textCol: String, k: Int = 5, numHashes: Int = 32,
      bands: Int = 8, threshold: Double = 0.5, versionsPerTrigger: Int = 10,
      clock: Option[DataFrame] = None)(
      onDups: (DataFrame, Long, Long) => Unit): DataStreamWriter[Row] =
    MergeSink.changeFeedStream(spark, storeDir, subscriber, checkpoint,
      versionsPerTrigger, startAtVersion = Some(-1L), clock)(
      dedupRange(spark, storeDir, textCol, k, numHashes, bands,
        threshold)(onDups))
}
