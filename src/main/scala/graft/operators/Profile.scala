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
}
