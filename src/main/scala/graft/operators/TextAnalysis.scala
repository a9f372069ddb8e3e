package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** L4 — text analysis over the `documents` table (SURVEY.md §2.10):
  * token statistics, term frequencies, language ID, quality scoring,
  * fingerprinting. All map-only scans except term frequency (one
  * hash-partitioned groupBy on the token — the canonical word-count
  * shuffle, partial-aggregated map-side by Catalyst).
  */
object TextAnalysis {

  /** Per-doc token statistics — map-only, codegen'd. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      round(meanTokenLen(col("text")), 4).as("mean_tok_len"),
      round(punctRatio(col("text")), 4).as("punct_ratio"))

  /** Corpus term frequencies, top `limit` by count. */
  def termFrequencies(docs: DataFrame, limit: Int = 50): DataFrame =
    docs.select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(limit)

  /** Heuristic language ID (stopword n-gram voting) next to the labeled
    * `lang` column for eyeball/accuracy checks. */
  def languageId(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), langGuess(tokens(col("text"))).as("guess"),
      col("lang").as("labeled"))

  /** Composite quality score (length / punctuation / stopword fluency). */
  def qualityScores(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      qualityScore(col("text"), col("n_chars")).as("quality"))

  /** Rolling-hash + content fingerprints (dedup keys, doc identity). */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      rollingFingerprint(col("text")).as("rolling_fp"),
      contentFingerprint(col("text")).as("content_fp"))
}
