package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomSemiJoin

/** J10 — Bloom-pruned equi join: the explicit library form of the
  * runtime-filter optimization for joins whose build side is too large
  * to broadcast exactly but whose *bitset* fits everywhere.
  *
  * A plain shuffled inner join moves EVERY probe-side row through the
  * exchange, including the (often vast) majority that match nothing.
  * Here the build side first collapses distributively into one
  * serialized Bloom filter (map-side partial blooms OR-merge — one
  * exchange of bitset-sized blobs, never of rows), which reaches every
  * probe task as a scalar-subquery literal; the probe side then drops
  * definite non-matches INSIDE its scan stage, before its shuffle. The
  * exact join still runs afterwards, so Bloom false positives are
  * eliminated and the result is BIT-IDENTICAL to the plain join — the
  * filter only changes how many rows pay the exchange.
  *
  * Spark's own `InjectRuntimeFilter` plants the same shape implicitly,
  * but only under its heuristics (selective build side, size windows);
  * this operator is the deterministic library surface for when the
  * pipeline KNOWS the probe side is mostly non-matching — the 100 TB
  * fact-table-vs-selected-dimension case.
  *
  * Keys hash through xxhash64 on BOTH sides (BloomFilterAggregate
  * ingests LONG); hashing is consistent, so zero false negatives. */
object BloomJoin {

  /** Inner equi join of `probe` ⋈ `build` on `key`, with the probe side
    * Bloom-pruned before its exchange. No distinct on the build side:
    * Bloom insertion is idempotent, and a pre-distinct would cost the
    * very shuffle the filter exists to avoid. */
  def bloomPrunedJoin(probe: DataFrame, build: DataFrame, key: String,
      expectedItems: Long = 1L << 20, numBits: Long = 1L << 23): DataFrame = {
    require(probe.columns.contains(key) && build.columns.contains(key),
      s"both sides need the join key column '$key'")
    val bloom = BloomSemiJoin.bloomOf(build, xxhash64(col(key)),
      expectedItems, numBits)
    probe.filter(BloomSemiJoin.mightContain(bloom, xxhash64(col(key))))
      .join(build, Seq(key))
  }
}
