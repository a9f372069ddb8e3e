package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.Dedup

/** L2r LIVE — near-dup detection on a DOCUMENT STREAM against the
  * settled corpus: each arriving document computes its MinHash band
  * keys map-side ([[Dedup.minHashProbeRows]]), meets the corpus's
  * persisted band index in a stream-static equi join, and verifies
  * candidates with the exact hashed-shingle Jaccard — the streaming
  * twin of [[Dedup.incrementalNearDups]]'s batch form ("is this
  * document already in the corpus?" answered at ingest time, not at
  * the next batch compaction).
  *
  * Shape: the stream side is map-only until the joins; both joins are
  * stream-STATIC (the index and the corpus shingle table are loaded
  * tables — at fleet scale bk-bucketed and doc_id-bucketed
  * respectively, so the probe is partition-local). A pair found via
  * several shared bands collapses through
  * `dropDuplicatesWithinWatermark`, the same bounded-state discipline
  * as ST6's frame dedup: state is O(rate · delay), and a duplicate
  * band-hit separated by more than `delay` re-emits (the documented
  * watermarked-dedup trade).
  */
object NearDupStream {

  /** `docs`: streaming (doc_id, text, `tsCol`). `corpus`: static
    * (doc_id, text) — the settled documents, fetched for verify.
    * `corpusIndex`: [[Dedup.minHashBandIndex]] rows for `corpus`
    * (pass the persisted table; derived here only if absent). Emits
    * (doc_id, corpus_id, `tsCol`, jaccard ≥ threshold). */
  def probe(docs: DataFrame, tsCol: String, delay: String,
      corpus: DataFrame, corpusIndex: Option[DataFrame] = None,
      k: Int = 5, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    val idx = corpusIndex.getOrElse(
        Dedup.minHashBandIndex(corpus, k, numHashes, bands))
      .select(col("doc_id").as("corpus_id"), col("bk"))
    val corpusSh = corpus
      .select(col("doc_id").as("corpus_id"),
        hashedShingles(lower(col("text")), k).as("_csh"))
    Dedup.minHashProbeRows(docs, k, numHashes, bands)
      .withWatermark(tsCol, delay)
      .join(idx, "bk")
      .filter(col("doc_id") =!= col("corpus_id"))
      .join(corpusSh, "corpus_id")
      .select(col("doc_id"), col("corpus_id"), col(tsCol),
        round(hashedJaccard(col("sh"), col("_csh")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .dropDuplicatesWithinWatermark("doc_id", "corpus_id")
  }
}
