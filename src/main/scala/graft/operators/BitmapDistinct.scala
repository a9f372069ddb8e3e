package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distinct counting over integer keys via word-aligned bitmaps
  * (the relational core of a roaring bitmap index — SURVEY.md §2.11).
  *
  * `count(DISTINCT k)` at 100 TB has a classic failure mode: the
  * distinct shuffle carries every (group, k) OCCURRENCE until the
  * exchange dedups it, and re-aggregating two pre-computed results
  * requires going back to the raw rows. The bitmap formulation fixes
  * both: rows fold map-side into (group, word = k DIV 64) partial
  * bitmaps with `bit_or` (one long per 64 adjacent keys, duplicate
  * occurrences of a key OR into the same bit and vanish BEFORE the
  * exchange), the exchange carries at most one long per (group, word),
  * and the final count is `sum(bit_count(bits))`. Unlike HLL
  * ([[graft.SparkEntry]] a2b) this is EXACT, and unlike
  * `count(DISTINCT)` the per-(group, word) bitmaps are MERGEABLE
  * state: two corpora's bitmap tables union with one more `bit_or`
  * groupBy ([[mergeBitmaps]]) — the incremental-ingest shape, where
  * the persisted bitmap table IS the distinct-count state.
  *
  * Density trade: bitmaps win when keys are dense in their domain
  * (user ids, enum codes) — 64 keys per long beats a 64-bit hash per
  * key. For sparse domains the word table degenerates to one bit per
  * long and HLL or plain distinct is cheaper; roaring's container
  * switch automates that choice, this operator states it in the doc.
  */
object BitmapDistinct {

  /** Per-group word-level bitmaps: one row per (group, word) with a
    * 64-key occupancy mask. The persistable / mergeable state. */
  def bitmaps(df: DataFrame, group: Seq[String], key: Column): DataFrame = {
    val bit = pmod(key.cast("long"), lit(64L))
    df.select(group.map(col) :+ key.cast("long").as("_k") :+ bit.as("bit"): _*)
      // (_k − bit) is an exact multiple of 64, so integer DIV is exact
      // for the full long range (a double-division path is not past 2⁵³)
      .withColumn("word", expr("(_k - bit) DIV 64"))
      .groupBy((group :+ "word").map(col): _*)
      .agg(expr("bit_or(shiftleft(1L, int(bit)))").as("bits"))
  }

  /** Exact distinct count per group from the raw rows. */
  def distinctCount(df: DataFrame, group: Seq[String], key: Column): DataFrame =
    bitmaps(df, group, key)
      .groupBy(group.map(col): _*)
      .agg(sum(bit_count(col("bits"))).as("n_distinct"))

  /** Merge two bitmap tables (same group/word schema) — the distinct
    * count of the UNION of the underlying key sets, without revisiting
    * either side's raw rows. */
  def mergeBitmaps(a: DataFrame, b: DataFrame, group: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((group :+ "word").map(col): _*)
      .agg(expr("bit_or(bits)").as("bits"))
}
