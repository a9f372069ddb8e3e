package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Q5/Q6 — data-governance operators. The reference stores raw MAC
  * addresses keyed to people and places (`ssidentity.c:26` makes MAC
  * the primary key; README.md:16-19 declares habitual-movement
  * profiling on top) — exactly the data a real deployment must audit
  * for re-identification risk and honor deletion requests against.
  * These run as engine operators so the audit and the erasure happen
  * in the same plans that produced the tables.
  */
object Governance {

  /** Q5 — k-anonymity audit over a quasi-identifier tuple: every
    * equivalence class (distinct QI combination) with its population,
    * flagging classes smaller than k (those rows are re-identifiable by
    * joining the QIs against any outside table). One map-combined
    * groupBy over the QI columns — the only pass over the data; the
    * output is equivalence-class-sized. NULL QI values form their own
    * class (groupBy's null-safe grouping), matching the attacker model:
    * a missing value is still a matchable value. */
  def kAnonymity(df: DataFrame, quasiIds: Seq[String], k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1 (got $k)")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < k)
  }

  /** Q5 summary — the scalar view a release gate consumes: the
    * dataset's achieved k (smallest class), class counts, and how many
    * ROWS sit in sub-k classes. Derived from [[kAnonymity]]'s
    * class-sized output, so the data is still read once. */
  def kAnonymitySummary(df: DataFrame, quasiIds: Seq[String], k: Long): DataFrame =
    kAnonymity(df, quasiIds, k)
      .agg(coalesce(min("n"), lit(0L)).as("achieved_k"),
        count(lit(1)).as("n_classes"),
        coalesce(sum(when(col("at_risk"), lit(1L)).otherwise(0L)), lit(0L))
          .as("n_classes_at_risk"),
        coalesce(sum(when(col("at_risk"), col("n")).otherwise(0L)), lit(0L))
          .as("n_rows_at_risk"))

  /** Q6 — erasure propagation (the right-to-be-forgotten sweep): given
    * a request set of subject keys, report per table how many rows
    * would be erased. The request set is broadcast (deletion batches
    * are small by nature) and each fact table is scanned once with a
    * map-side probe — no fact-side shuffle anywhere. NULL subject keys
    * never match a request (SQL join semantics): an anonymous row is
    * not erasable. Report is tables-sized. */
  def erasureReport(requests: DataFrame, requestKey: String,
      tables: Seq[(String, DataFrame, String)]): DataFrame = {
    require(tables.nonEmpty, "need at least one table to sweep")
    require(tables.map(_._1).distinct.size == tables.size,
      "table names must be unique")
    val req = broadcast(requests.select(col(requestKey).as("_req_k"))
      .where(col("_req_k").isNotNull).distinct()
      .withColumn("_hit", lit(1)))
    tables.map { case (name, df, keyCol) =>
      df.select(col(keyCol).as("_k"))
        .join(req, col("_k") === col("_req_k"), "left")
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("_hit").isNotNull, 1)).as("n_to_erase"))
        .select(lit(name).as("table_name"), col("n_rows"), col("n_to_erase"),
          (col("n_rows") - col("n_to_erase")).as("n_after"))
    }.reduce(_.unionByName(_))
  }

  /** Q5c — l-diversity audit (Machanavajjhala et al. 2007): k-anonymity's
    * necessary complement. A class can be k-large yet leak everything —
    * if all k rows share ONE sensitive value, matching the QIs reveals
    * it (the homogeneity attack). Each equivalence class must therefore
    * see at least `l` DISTINCT sensitive values. Same single
    * map-combined groupBy shape as [[kAnonymity]]; count(DISTINCT)
    * ignores NULL sensitive values in both engines (an absent sensitive
    * value discloses nothing), and NULL QI values form their own class
    * exactly as in the k audit. */
  def lDiversity(df: DataFrame, quasiIds: Seq[String], sensitiveCol: String,
      l: Long): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier column")
    require(!quasiIds.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    require(l >= 1, s"l must be >= 1 (got $l)")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= lit(l))
  }

  /** Q5d — t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007):
    * the distribution refinement completing the k → l → t ladder. An
    * l-diverse class can still leak: if its sensitive-value
    * DISTRIBUTION differs sharply from the table's (90% of one band
    * vs 10% globally), matching the QIs alone shifts the adversary's
    * posterior. Each class's distance to the global distribution must
    * stay ≤ t, measured for an ORDINAL sensitive attribute by the
    * ordered earth-mover's distance
    *   t = (1/(m−1)) · Σ_i |CumP(i) − CumQ(i)|   (m ordered bins).
    *
    * Exact arithmetic: with per-class cumulative counts C_i (class
    * size n) and global G_i (table size N), each term is
    * |N·C_i − n·G_i| / (n·N); the numerators sum as plain longs
    * (≤ m·n·N — inside 2^63 and, crucially, ≤ 2^53 at any audited
    * scale so the ONE final double division is of exactly-represented
    * integers: correctly rounded, hence identical in any IEEE engine),
    * then micro-floored. m ≤ 1 means every class trivially matches
    * the global distribution: t = 0.
    *
    * Scale shape: one map-combined (class, bin) count; the global
    * distribution is a |bins|-row MODEL table (the caller bins the
    * sensitive attribute — already the t-closeness methodology) that
    * broadcasts onto the class table; per-class cums run under a
    * window PARTITIONED by class. The one partitionless window and
    * the two 1-/m-row broadcast cross joins are over model tables
    * bounded by the binning, never by data (skyline / er_fs_weights
    * precedents). NULL sensitive values disclose nothing and are
    * excluded from BOTH distributions; NULL QIs form their own class
    * exactly as in the k/l audits (null-safe joins throughout). */
  def tCloseness(df: DataFrame, quasiIds: Seq[String], sensitiveCol: String,
      tMicro: Long): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier column")
    require(!quasiIds.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    require(tMicro >= 0L, s"tMicro must be >= 0 (got $tMicro)")
    val qs = quasiIds.map(col)
    val base = df.filter(col(sensitiveCol).isNotNull)
      .select(qs :+ col(sensitiveCol).cast("long").as("_v"): _*)
    val g0 = base.groupBy("_v").agg(count(lit(1)).as("_g"))
    val gw = org.apache.spark.sql.expressions.Window.orderBy("_v")
    val gcum = g0.select(col("_v"), sum("_g").over(gw).as("_gc"))
    val totals = g0.agg(coalesce(sum("_g"), lit(0L)).as("_N"),
      count(lit(1)).as("_m"))
    val classes = base.groupBy(qs: _*).agg(count(lit(1)).as("class_size"))
    val cv = base.groupBy(qs :+ col("_v"): _*).agg(count(lit(1)).as("_c"))
      .select(quasiIds.map(q => col(q).as(s"_cv_$q")) :+
        col("_v").as("_cv_v") :+ col("_c"): _*)
    val cells = classes.crossJoin(broadcast(gcum))
      .join(cv, quasiIds.map(q => col(q) <=> col(s"_cv_$q"))
        .reduce(_ && _) && col("_v") === col("_cv_v"), "left")
      .select(qs ++ Seq(col("class_size"), col("_v"), col("_gc"),
        coalesce(col("_c"), lit(0L)).as("_c")): _*)
    val cw = org.apache.spark.sql.expressions.Window
      .partitionBy(qs: _*).orderBy("_v")
    val terms = cells.withColumn("_cc", sum("_c").over(cw))
      .crossJoin(broadcast(totals))
      .groupBy(qs :+ col("class_size"): _*)
      .agg(coalesce(sum(abs(col("_N") * col("_cc")
          - col("class_size") * col("_gc"))), lit(0L)).as("_s"),
        max("_N").as("_N"), max("_m").as("_m"))
    terms.select(qs ++ Seq(col("class_size"),
      when(col("_m") <= 1L, lit(0L)).otherwise(
        floor(col("_s").cast("double")
          / (col("class_size").cast("double") * col("_N").cast("double")
            * (col("_m") - 1L).cast("double")) * lit(1000000.0))
          .cast("long")).as("t_micro")): _*)
      .withColumn("close", col("t_micro") <= lit(tMicro))
  }

  /** Q6 apply — the erased view of one table: a broadcast left-anti
    * join against the request keys. Same probe as [[erasureReport]], so
    * report and apply cannot disagree. */
  def erase(df: DataFrame, keyCol: String, requests: DataFrame,
      requestKey: String): DataFrame =
    df.join(broadcast(requests.select(col(requestKey).as(keyCol))
        .where(col(keyCol).isNotNull).distinct()),
      Seq(keyCol), "left_anti")
}
