package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{SupportsReportStatistics, V1Scan, Statistics => V2Statistics}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, PushedDownOperators, V1ScanWrapper}

/** STATIC-PLANNER statistics for graft store scans (VERDICT r13 #4).
  *
  * The store's DSv2 scan ([[graft.sources.GraftScanBuilder]]) reports
  * its true on-disk bytes through `SupportsReportStatistics` —
  * version- and bucket-pruning-aware — but Spark's
  * `V2ScanRelationPushDown` wraps every V1Scan in a [[V1ScanWrapper]]
  * that implements only `Scan`, so
  * `DataSourceV2ScanRelation.computeStats` (which pattern-matches the
  * SCAN for `SupportsReportStatistics`) falls back to the
  * conservative session default. The consequence at fleet scale: the
  * FIRST attempt of every store⋈dim join plans as a two-sided
  * shuffle, and only AQE's runtime re-planning converts it to a
  * broadcast — pure wasted exchange on the first stage, and no
  * broadcast at all with AQE off.
  *
  * [[GraftStatsRule]] closes the gap with the minimal forwarding
  * shim: after push-down (the `Pre CBO Rules` batch sits after `Early
  * Filter and Projection Push-Down` in the optimizer), every
  * graft-backed `V1ScanWrapper` is replaced by
  * [[GraftStatsV1ScanWrapper]] — the same wrapper, plus
  * `SupportsReportStatistics` delegated to the wrapped scan. Pattern
  * matches on `V1ScanWrapper(...)` in the physical strategy still see
  * the subclass, so execution is untouched; only `computeStats`
  * changes, and a dimension-sized (or bucket-pruned) store scan now
  * sits under `spark.sql.autoBroadcastJoinThreshold` at STATIC
  * planning time. Registered via [[graft.GraftExtensions]]
  * (`injectPreCBORule`). */
class GraftStatsV1ScanWrapper(scan: V1Scan,
    handled: Seq[org.apache.spark.sql.sources.Filter],
    operators: PushedDownOperators)
    extends V1ScanWrapper(scan, handled, operators)
    with SupportsReportStatistics {
  override def estimateStatistics(): V2Statistics =
    scan.asInstanceOf[SupportsReportStatistics].estimateStatistics()

  // V1ScanWrapper is a CASE CLASS, so the subclass inherits structural
  // equality — and Catalyst's transform() drops a rewrite whose result
  // `==` the original node (TreeNode.fastEquals), which silently made
  // the swap a NO-OP: the rule returned an equal-looking node and the
  // plan kept the stats-less wrapper (caught by FileSkippingSpec's
  // rowCount pin — the r14 broadcast spec passed with the FACT side
  // broadcasting). Class-aware equality makes the swapped node
  // distinguishable, so transform actually installs it.
  override def canEqual(that: Any): Boolean =
    that.isInstanceOf[GraftStatsV1ScanWrapper]
  override def equals(that: Any): Boolean = that match {
    case g: GraftStatsV1ScanWrapper => super.equals(g)
    case _ => false
  }
  override def hashCode(): Int = super.hashCode() * 31 + 1
}

case class GraftStatsRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case r: DataSourceV2ScanRelation if r.relation.table.isInstanceOf[graft.sources.GraftTable] =>
      r.scan match {
        case w: V1ScanWrapper if !w.isInstanceOf[GraftStatsV1ScanWrapper] &&
            w.v1Scan.isInstanceOf[SupportsReportStatistics] =>
          r.copy(scan = new GraftStatsV1ScanWrapper(
            w.v1Scan, w.handledFilters, w.pushedDownOperators))
        case _ => r
      }
  }
}
