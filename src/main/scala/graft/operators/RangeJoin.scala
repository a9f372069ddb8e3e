package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned interval (range) join — the scale path for J5-class time
  * correlations (SURVEY §2.3) when the join has NO selective equi key:
  * aligning observations across sensors within a tolerance
  * (ssidentity.c:35 trilateration prerequisite, README.md:16) or
  * counting global activity around each event.
  *
  * Spark plans a pure range-predicate join as BroadcastNestedLoopJoin:
  * every task streams the ENTIRE broadcast side, O(|L|·|R|) work, and
  * the broadcast side must fit in memory — a dead end at 100 TB. The
  * standard fix (used by Databricks' range-join optimization and
  * industry Flink/Beam pipelines alike) is binning: quantize time into
  * fixed-width bins, emit each interval once per bin it overlaps, and
  * equi-join on the bin id. The residual range predicate then runs only
  * on co-binned pairs. The join becomes a plain shuffled equi join —
  * partition-parallel, AQE-sizable, skew-handled — with shuffle volume
  * O(|points| + |intervals| · (len/width + 1)).
  *
  * Pick `binSeconds` ≈ the typical interval length: shorter bins
  * replicate intervals; longer bins admit more false candidate pairs
  * for the residual filter. Both are linear knobs, not correctness
  * knobs.
  */
object RangeJoin {

  /** Inner-joins `points` rows to every `intervals` row whose
    * [`startCol`, `endCol`] (inclusive) contains `pointTs`, plus
    * optional equi `keys` (left name → right name). Column names must
    * be disjoint enough to express the residual predicate: `pointTs`,
    * `startCol`, `endCol` must each resolve unambiguously after the
    * join (rename before calling, as with any self-join).
    *
    * Intervals with `end < start` match nothing and are dropped (the
    * bin `sequence` would otherwise fail); NULL bounds or timestamps
    * likewise match nothing, per SQL range-predicate semantics.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointTs: String, startCol: String, endCol: String,
      keys: Seq[(String, String)] = Nil, binSeconds: Long = 60L): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive (got $binSeconds)")
    Seq("_bin", "_us", "_us_end").foreach { c =>
      require(!points.columns.contains(c) && !intervals.columns.contains(c),
        s"input already has a '$c' column — binning would shadow it")
    }
    val w = binSeconds * 1000000L
    // `div` (integer truncating division), NOT `/`: Spark's long / long
    // is DOUBLE division, which loses precision past 2^53 µs and could
    // bin a boundary point and its containing interval differently —
    // a silently dropped match. Truncating div by a positive width is
    // monotone non-decreasing, so interval bin ranges still cover every
    // contained point's bin exactly, for negative epochs too.
    val pb = points.withColumn("_us", unix_micros(col(pointTs)))
      .withColumn("_bin", expr(s"_us div ${w}L")).drop("_us")
    val ib = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol) >= col(startCol))
      .withColumn("_us", unix_micros(col(startCol)))
      .withColumn("_us_end", unix_micros(col(endCol)))
      .withColumn("_bin", explode(sequence(
        expr(s"_us div ${w}L"), expr(s"_us_end div ${w}L"))))
      .drop("_us", "_us_end")
    val keyCond = keys.map { case (l, r) => pb(l) === ib(r) }
    val cond = (keyCond :+ (pb("_bin") === ib("_bin"))).reduce(_ && _) &&
      col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol)
    pb.join(ib, cond).drop("_bin")
  }
}
