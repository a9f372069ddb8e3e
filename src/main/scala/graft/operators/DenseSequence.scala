package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** W4 — dense global sequence (the reference's AUTOINCREMENT id,
  * schema:2) WITHOUT the empty-partition window: `row_number() OVER
  * (ORDER BY …)` with no PARTITION BY moves every row to a single task
  * (WindowExec warns and serializes — the one plan shape that cannot
  * scale). The scale-correct formulation: a range-partitioned global
  * sort (parallel), then RDD `zipWithIndex` — which computes per-
  * partition counts with one lightweight job and assigns contiguous
  * offsets, keeping every partition's numbering local. Identical
  * result, no single-task stage. (The RDD hop is the documented
  * exception for genuinely imperative per-partition logic.)
  */
object DenseSequence {

  /** Appends a dense 1-based `seqCol` in the total order given by
    * `order` (which must be a total order for determinism).
    *
    * Cost note: zipWithIndex launches its per-partition-count job
    * EAGERLY (at call time), and the uncached sorted RDD's reduce-side
    * sort re-runs when the result is consumed — inherent to the
    * pattern. Dense ids are a bulk-assignment operation; call it where
    * the result is materialized once, not inside a lazily-reused
    * plan. */
  def withSeq(df: DataFrame, order: Seq[Column], seqCol: String = "seq"): DataFrame = {
    require(!df.columns.contains(seqCol),
      s"input already has a '$seqCol' column — pass a different seqCol")
    val spark = df.sparkSession
    val sorted = df.orderBy(order: _*)
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(indexed, sorted.schema.add(seqCol, LongType, nullable = false))
  }
}
