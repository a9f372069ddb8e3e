package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Explicit Bloom-filter semi-join building blocks.
  *
  * Spark already ships the machinery — `BloomFilterAggregate` builds a
  * partial-aggregatable serialized filter and `BloomFilterMightContain`
  * probes it codegen'd — but only wires it up implicitly inside
  * `InjectRuntimeFilter` (exercised by PlanSpec's runtime-filter proof).
  * This object exposes the same two expressions as a LIBRARY surface for
  * pipelines where the small side is too large to broadcast EXACTLY but
  * its *bits* still fit everywhere: the filter builds distributively
  * (map-side partial blooms OR-merge — one exchange of bitset-sized
  * blobs), ships to every probe task once via a scalar subquery, and the
  * probe is a map-side reject with zero false negatives.
  *
  * The canonical consumer is [[graft.operators.Dedup.decontaminateBloom]]:
  * eval-set n-grams at benchmark scale broadcast exactly; at contaminated-
  * crawl scale (dedup against another 100 TB corpus) only a Bloom of the
  * grams fits, and the exact verify join runs on the tiny survivor set.
  */
object BloomSemiJoin {

  /** Aggregate `value` (LONG — hash wider values first) into ONE row
    * holding the serialized Bloom filter of every input value. */
  def bloomOf(df: DataFrame, value: Column, expectedItems: Long,
      numBits: Long): DataFrame = {
    require(expectedItems > 0 && numBits > 0,
      s"expectedItems ($expectedItems) and numBits ($numBits) must be positive")
    df.select(Bridge.column(
      new BloomFilterAggregate(Bridge.expression(value),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
      .as("bloom"))
  }

  /** Probe predicate: can `bloomDf` (one row, one binary column — the
    * [[bloomOf]] output) contain `value`? False ⇒ definitely absent;
    * true ⇒ present or false positive (rate set by numBits/items), so
    * follow with an exact verify join when exactness matters.
    *
    * Planned as a scalar subquery — the same shape `InjectRuntimeFilter`
    * emits — so the filter build executes once and its result reaches
    * every probe task as a literal, never a per-row re-evaluation. */
  def mightContain(bloomDf: DataFrame, value: Column): Column = {
    val plan = bloomDf.queryExecution.analyzed
    require(plan.output.length == 1,
      s"bloomDf must have exactly one column (got ${plan.output.map(_.name).mkString(", ")})")
    Bridge.column(BloomFilterMightContain(
      ScalarSubquery(plan), Bridge.expression(value)))
  }
}
