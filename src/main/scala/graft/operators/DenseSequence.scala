package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.{lit, raise_error, when}
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

  /** Appends the INCLUSIVE running total of `value` in the total order
    * given by `order` — `sum(v) OVER (ORDER BY …)` without the
    * partitionless window. Same two-pass shape as [[withSeq]]: a
    * range-partitioned global sort (parallel), one lightweight job
    * collecting ONE long per partition (the per-partition sum — a
    * bounded #partitions-sized driver array, the zipWithIndex
    * pattern), then each partition prefixes locally from its offset.
    * The global-layout primitive under token-level sequence packing
    * and file-layout planning. */
  def withRunningTotal(df: DataFrame, order: Seq[Column], value: Column,
      totalCol: String = "running_total"): DataFrame = {
    require(!df.columns.contains(totalCol),
      s"input already has a '$totalCol' column — pass a different totalCol")
    require(!df.columns.contains("_rt_v"), "input may not have an '_rt_v' column")
    val spark = df.sparkSession
    // the value column must be NON-NULL: a null would otherwise reach
    // r.getLong in the partition fold below as an opaque executor NPE.
    // Guard at plan level with a clear message (callers that want
    // null ≡ 0 should coalesce upstream, explicitly).
    val v = value.cast("long")
    val guarded = when(v.isNull, raise_error(lit(
        "withRunningTotal: NULL in the value column — running totals " +
          "require non-null values (coalesce upstream if null means 0)"))
        .cast("long"))
      .otherwise(v)
    val sorted = df.withColumn("_rt_v", guarded).orderBy(order: _*)
    val rdd = sorted.rdd
    val vIdx = sorted.schema.fieldIndex("_rt_v")
    // pass 1 (eager, lightweight): one long per partition. The sorted
    // RDD re-evaluates on consumption exactly like withSeq's
    // zipWithIndex — `order` must be a total order, so the re-sort is
    // bit-identical; cache the input upstream if the double scan hurts.
    val partSums = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L; it.foreach(r => s += r.getLong(vIdx)); Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val summed = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { row =>
        acc += row.getLong(vIdx)
        Row.fromSeq(row.toSeq.dropRight(1) :+ acc)
      }
    }
    spark.createDataFrame(summed,
      org.apache.spark.sql.types.StructType(
        sorted.schema.fields.dropRight(1)).add(totalCol, LongType, nullable = false))
  }
}
