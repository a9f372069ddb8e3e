package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampType}

/** Q3 — one-pass table profiling ("DESCRIBE at scale"): per-column row
  * counts, null counts, exact distinct cardinalities, and formatted
  * min/max, from a SINGLE aggregate over a single scan. The report is
  * column-count-sized — the classic first query against an unknown
  * 100 TB drop, and the health check a curation pipeline runs per
  * ingest batch.
  *
  * Shape: all statistics fold map-side. The exact multi-column
  * count(DISTINCT) plans through Catalyst's Expand (each row fans out
  * once per profiled column before the partial aggregate), so the scan
  * cost is O(cols·rows) map-side work with combiner dedup — the price
  * of EXACT cardinalities; swap in approx_count_distinct when a ±2%
  * estimate is acceptable at fleet scale. min/max format per type
  * (timestamps to millisecond strings, everything else via cast) so
  * one report row fits every column type. */
object Profile {

  private def fmt(dt: DataType, c: Column): Column = dt match {
    case TimestampType => date_format(c, "yyyy-MM-dd HH:mm:ss.SSS")
    case _ => c.cast("string")
  }

  /** Profile `columns` (default: every column) of `df`. Returns one row
    * per column: (col_name, n_rows, n_null, n_distinct, min_val,
    * max_val), ordered as given. */
  def profile(df: DataFrame, columns: Seq[String] = Seq.empty): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val aggs = cols.flatMap { c =>
      val dt = df.schema(c).dataType
      Seq(count(col(c)).as(s"_n_$c"),
        countDistinct(col(c)).as(s"_d_$c"),
        fmt(dt, min(col(c))).as(s"_min_$c"),
        fmt(dt, max(col(c))).as(s"_max_$c"))
    }
    val row = df.agg(count(lit(1)).as("_total"), aggs: _*)
    row.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("_total").as("n_rows"),
        (col("_total") - col(s"_n_$c")).as("n_null"),
        col(s"_d_$c").as("n_distinct"),
        col(s"_min_$c").as("min_val"),
        col(s"_max_$c").as("max_val"))): _*)).as("p"))
      .select("p.*")
  }

  /** Q3b — profile DRIFT between two snapshots of the same table (the
    * per-ingest-batch health gate: "did yesterday's load change the
    * shape of this table?"). Two [[profile]] passes joined on the
    * column name — still one scan per side, and the join input is
    * column-count-sized, so the report costs two aggregates no matter
    * the table size. Null rates compare in integer ppm (floor — exact
    * and engine-replayable; NULL for an empty side rather than a
    * divide-by-zero, the Quality.validate posture); min/max movement
    * is a null-safe string inequality, so a type-agnostic report row
    * works for every column. */
  /** Q7 — AUTO-GENERATED expectation suite: learn per-column bounds
    * from a trusted reference snapshot's profile and validate a target
    * snapshot against them — the "yesterday profiles, today validates"
    * gate (the auto-test idiom), with no hand-written rules. Checks
    * are type-agnostic integers, so one suite covers every column:
    *   null_ok     — target null-ppm ≤ reference + `nullSlackPpm`
    *   distinct_ok — target distinct count within 2× either way of the
    *                 reference (integer cross-products, no division)
    *   rows_ok     — the target side is non-empty
    * `pass` = all three. Same cost shape as [[profileDrift]]: two
    * single-scan profiles and a column-count-sized join. */
  def autoExpectations(reference: DataFrame, target: DataFrame,
      columns: Seq[String] = Seq.empty, nullSlackPpm: Long = 10000L): DataFrame = {
    require(nullSlackPpm >= 0, s"nullSlackPpm must be >= 0 (got $nullSlackPpm)")
    def ppm(nNull: Column, nRows: Column): Column =
      when(nRows > 0,
        floor(nNull.cast("double") * lit(1000000.0) / nRows.cast("double"))
          .cast("long")).otherwise(lit(0L))
    val pr = profile(reference, columns)
    val pt = profile(target, columns)
    pr.as("r").join(pt.as("t"), Seq("col_name"))
      .select(col("col_name"),
        ppm(col("r.n_null"), col("r.n_rows")).as("null_ppm_ref"),
        ppm(col("t.n_null"), col("t.n_rows")).as("null_ppm_tgt"),
        col("r.n_distinct").as("n_distinct_ref"),
        col("t.n_distinct").as("n_distinct_tgt"),
        (ppm(col("t.n_null"), col("t.n_rows")) <=
          ppm(col("r.n_null"), col("r.n_rows")) + lit(nullSlackPpm)).as("null_ok"),
        (col("t.n_distinct") * 2 >= col("r.n_distinct") &&
          col("t.n_distinct") <= col("r.n_distinct") * 2).as("distinct_ok"),
        (col("t.n_rows") > 0).as("rows_ok"))
      .withColumn("pass",
        col("null_ok") && col("distinct_ok") && col("rows_ok"))
  }

  def profileDrift(before: DataFrame, after: DataFrame,
      columns: Seq[String] = Seq.empty): DataFrame = {
    def ppm(nNull: Column, nRows: Column): Column =
      when(nRows > 0,
        floor(nNull.cast("double") * lit(1000000.0) / nRows.cast("double"))
          .cast("long"))
    val pa = profile(before, columns)
    val pb = profile(after, columns)
    pa.as("a").join(pb.as("b"), Seq("col_name"))
      .select(col("col_name"),
        col("a.n_rows").as("n_rows_before"),
        col("b.n_rows").as("n_rows_after"),
        ppm(col("a.n_null"), col("a.n_rows")).as("null_ppm_before"),
        ppm(col("b.n_null"), col("b.n_rows")).as("null_ppm_after"),
        col("a.n_distinct").as("n_distinct_before"),
        col("b.n_distinct").as("n_distinct_after"),
        not(col("a.min_val") <=> col("b.min_val")).as("min_changed"),
        not(col("a.max_val") <=> col("b.max_val")).as("max_changed"))
  }
}
