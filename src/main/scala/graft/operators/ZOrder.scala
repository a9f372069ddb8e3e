package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout — multidimensional clustering for the
  * 100 TB fact table. A single-column sort prunes scans on ONE
  * predicate dimension; interleaving the bits of two dimensions into
  * one sort key gives every written file a tight bounding box in BOTH,
  * so parquet footer min/max (and any file-skipping index over them)
  * prunes 2-D box queries — the technique behind Delta/Iceberg
  * `ZORDER BY`. Pure column arithmetic, codegen'd; no shuffle beyond
  * the one range partition that any clustered write already pays.
  */
object ZOrder {

  /** Interleaves the low `bits` bits of two non-negative integral
    * columns: x occupies even bit positions, y odd. Inputs must fit in
    * `bits` bits (mask-checked by the caller or pre-bucketed — values
    * beyond the mask alias, they do not error, same as any hash/curve
    * bucketing). */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31] (got $bits)")
    val xl = x.cast("long"); val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Hilbert-curve index of (x, y) — the locality upgrade over
    * [[zValue]]: the Hilbert curve never makes the Morton curve's
    * long diagonal jumps (z's "seams" at power-of-two boundaries), so
    * consecutive curve positions are ALWAYS adjacent cells and each
    * written file's (x, y) bounding box is tighter — measurably fewer
    * files overlap a box predicate (ZOrderSpec quantifies it). The
    * standard iterative xy→d walk (one rotate-and-accumulate step per
    * bit, top bit first) unrolled into pure column arithmetic:
    * codegen'd, branch-free, no UDF. Inputs must fit in `bits` bits,
    * same aliasing contract as [[zValue]]. */
  def hilbertIndex(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31] (got $bits)")
    // NOT a Column-tree unroll: each level's rotated coordinate
    // references BOTH prior coordinates, so an unrolled tree doubles
    // per level (2^bits nested whens — measured 214 s on 60 k rows and
    // an sf0.1 executor OOM before this was made a native expression).
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.HilbertIndexExpr(
        org.apache.spark.sql.graft.Bridge.expression(x.cast("long")),
        org.apache.spark.sql.graft.Bridge.expression(y.cast("long")), bits))
  }

  /** Range-partitions and sorts `df` along the z-curve of (x, y) —
    * the write-side layout step. Each of the `numFiles` output splits
    * covers a contiguous z-range = a small set of aligned squares in
    * (x, y) space, so its per-file min/max are tight in both
    * dimensions. ZOrderSpec measures the effect: a box predicate
    * overlaps a fraction of z-clustered files where a 1-D sort
    * overlaps all of them. */
  def clusterByZ(df: DataFrame, x: Column, y: Column,
      bits: Int = 16, numFiles: Int = 32): DataFrame = {
    require(!df.columns.contains("_z"),
      "input already has a '_z' column — clustering would shadow it")
    df.withColumn("_z", zValue(x, y, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** O4c — zone-map effectiveness report: the number a layout decision
    * is actually judged by. Cut the table into `nFiles` equal-row files
    * in the given total `order` (the simulated write layout), record
    * each file's (min, max) of the `probe` column — its zone map — and
    * flag which files a range predicate probe ∈ [lo, hi] skips without
    * reading ("can_skip" ⇔ the file's zone misses the range). Run once
    * per candidate layout and compare skip counts: THE empirical
    * answer to "did z-ordering/Hilbert-clustering pay for itself?".
    *
    * Shape: one [[DenseSequence.withSeq]] global layout sort (range-
    * partitioned — no partitionless window), the 1-row total as a
    * broadcast scalar join, then one map-combined groupBy on file_id;
    * balanced file cuts via (pos−1)·nFiles DIV n — integer-exact at any
    * row count. */
  def zoneMapReport(df: DataFrame, order: Seq[org.apache.spark.sql.Column],
      probe: org.apache.spark.sql.Column, nFiles: Int,
      lo: Long, hi: Long): DataFrame = {
    require(nFiles >= 1, s"nFiles must be >= 1 (got $nFiles)")
    require(lo <= hi, s"empty probe range [$lo, $hi]")
    val seqd = DenseSequence.withSeq(
      df.withColumn("_zm_p", probe.cast("long")), order, seqCol = "_zm_pos")
    val total = seqd.groupBy().agg(count(lit(1)).as("_n"))
    seqd.crossJoin(broadcast(total))
      .withColumn("file_id", expr(s"((_zm_pos - 1) * ${nFiles}L) DIV _n"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col("_zm_p")).as("min_probe"),
        max(col("_zm_p")).as("max_probe"))
      .withColumn("can_skip",
        col("max_probe") < lit(lo) || col("min_probe") > lit(hi))
  }
}
