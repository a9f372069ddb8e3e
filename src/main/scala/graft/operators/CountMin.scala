package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A12 — count-min sketch (Cormode/Muthukrishnan '05) built
  * RELATIONALLY: the d×w counter matrix is a (row, bucket, cnt)
  * DataFrame, so the whole sketch — build, merge, and point query — is
  * plain Spark SQL and replays bit-identically in any engine (the
  * DuckDB oracle re-derives the same matrix from the same md5 bucket
  * hashes; contrast approx_top_k / HLL, whose sketch internals are
  * library-private and only rows-only checkable).
  *
  * Why at 100 TB: exact per-key counts (A1) shuffle every key; the CMS
  * is a FIXED d·w cells no matter how many distinct keys exist. The
  * build is one map-combined groupBy on (row, bucket) — partial
  * aggregation collapses each partition to ≤ d·w cells before the
  * exchange, so the shuffle carries O(partitions · d · w) rows total.
  * Sketches of shards MERGE by cell-wise addition (the same groupBy),
  * giving incremental / per-day census like the HLL union path.
  * Guarantee: est ≥ true count always; est ≤ true + ε·N with prob
  * 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  */
object CountMin {

  /** Bucket of `key` in hash row `row`: first 8 hex chars of
    * md5(key ‖ salt ‖ row) mod `width`. Delegates to
    * [[Sampling.hashGate]] — ONE definition of the uint32 gate
    * arithmetic, so a fix there (null handling, hex width) propagates
    * here; concat_ws("", key, salt+row) produces the identical string
    * to the oracle's concat_ws('', key, salt, row). */
  def bucket(key: Column, row: Int, width: Int, salt: String): Column =
    pmod(Sampling.hashGate(key, salt + row.toString), lit(width.toLong))

  /** Build the sketch matrix: one (row, bucket, cnt) cell per occupied
    * counter (absent cells are zero). */
  def build(df: DataFrame, key: Column, depth: Int = 4, width: Int = 64,
      salt: String = ""): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad sketch shape ${depth}x$width")
    val rows = array((0 until depth).map(i =>
      struct(lit(i.toLong).as("row"), bucket(key, i, width, salt).as("bucket"))): _*)
    df.select(explode(rows).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query `keys` (one column `keyCol`) against a built sketch:
    * est(k) = min over rows of the k-bucket counter. The sketch is
    * d·w cells — broadcast it; the probe side never shuffles. */
  def estimate(cms: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 64, salt: String = ""): DataFrame = {
    val probes = keys.select(col(keyCol), explode(array((0 until depth).map(i =>
      struct(lit(i.toLong).as("row"),
        bucket(col(keyCol), i, width, salt).as("bucket"))): _*)).as("rb"))
      .select(col(keyCol), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
    probes.join(broadcast(cms), Seq("row", "bucket"), "left_outer")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
