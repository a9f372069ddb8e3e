package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** E-family — model-evaluation metrics for the classifiers and scorers
  * the curation pipeline itself depends on (the quality gate l4p, the
  * language-ID heuristic, dedup adjudicators): exact ROC-AUC, expected
  * calibration error, and inter-rater agreement (Cohen's kappa).
  *
  * The reference declares "interests"/profiling analytics over its obs
  * store (README.md:16-19) but ships no evaluation of them; a 100 TB
  * pipeline cannot deploy a filter model without measuring it on the
  * same engine that runs it. All three metrics are EXACT: every
  * numerator stays in 64-bit integer arithmetic (bounds documented per
  * metric) and quantizes to 1e-9 nano-units at the single final
  * division (the a16_drift_tvd idiom), so the DuckDB oracle replays
  * them bit-for-bit — no float-accumulation ordering hazards.
  */
object Eval {

  private val Nano = 1000000000L

  /** Exact ROC-AUC per group via the Mann-Whitney U statistic with the
    * standard tie correction (each tied score block contributes half of
    * its pos×neg cross pairs).
    *
    * Scale shape: the per-row table first collapses to the DISTINCT
    * (group, score) histogram with a map-combined aggregate — the only
    * per-row pass. The rank window then runs over that score-cardinality
    * table (bounded by score quantization, e.g. 1e4 distinct values for
    * a 4-dp probability), partitioned by group — never a partitionless
    * window, never a sort of the raw rows. In doubled-pair units the
    * count stays integral:
    *   2·U = Σ_s n_pos_s · (2·cumNegBelow_s + n_neg_s)
    *   AUC = 2·U / (2·P·N)
    * quantized to nano at the one division. Integer bound: 2U·1e9 <
    * 2^63 ⇔ P·N < 4.6e9 per group (~68k balanced labels); past that,
    * quantize to micro-units instead (×1000 headroom) — the driver
    * queries sit orders of magnitude under the bound. Degenerate groups
    * (P=0 or N=0) yield NULL auc_nano (undefined, not 0). */
  def rocAuc(df: DataFrame, group: String, label: Column, score: Column): DataFrame = {
    val hist = df.groupBy(col(group), score.as("_s"))
      .agg(sum(when(label, 1L).otherwise(0L)).as("_np"),
        sum(when(label, 0L).otherwise(1L)).as("_nn"))
    val w = Window.partitionBy(group).orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val u2 = hist
      .withColumn("_cumNegBelow", coalesce(sum(col("_nn")).over(w), lit(0L)))
      .groupBy(group)
      .agg(sum(col("_np")).as("n_pos"), sum(col("_nn")).as("n_neg"),
        sum(col("_np") * (lit(2L) * col("_cumNegBelow") + col("_nn"))).as("_u2"))
    u2.select(col(group), col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0L && col("n_neg") > 0L,
        floor((col("_u2") * lit(Nano)).cast("double") /
          (lit(2L) * col("n_pos") * col("n_neg")).cast("double"))
          .cast("long")).as("auc_nano"))
  }

  /** Expected calibration error with fixed-width probability bins.
    * Input probabilities arrive as exact MILLI-units (0..1000 BIGINT —
    * the caller quantizes once at the edge), so per-bin confidence sums
    * are integral. Per bin b: |acc_b − conf_b| = |1000·n_pos_b −
    * Σp_milli,b| / (1000·n_b); the ECE total re-weights by n_b/N so the
    * n_b cancels: ECE = Σ_b |1000·n_pos_b − Σp_milli,b| / (1000·N).
    * One map-combined groupBy(bin) — report-sized output: a row per
    * non-empty bin plus the 'ALL' row (bin = -1) whose conf_nano column
    * carries the ECE itself. Integer bound: Σp·1e6 ≤ N·1e9 < 2^63 ⇔
    * N < 9.2e9 rows. */
  def calibrationEce(df: DataFrame, label: Column, probMilli: Column,
      nBins: Int = 10): DataFrame = {
    require(nBins > 0, s"nBins must be positive (got $nBins)")
    val bin = least(floor(probMilli * nBins / lit(1000L)), lit(nBins - 1L))
      .cast("long")
    val perBin = df
      .select(bin.as("bin"), when(label, 1L).otherwise(0L).as("_y"),
        probMilli.cast("long").as("_p"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("_y")).as("n_pos"),
        sum(col("_p")).as("_psum"))
    perBin.select(col("bin"), col("n"), col("n_pos"),
        floor((col("_psum") * lit(1000000L)).cast("double") /
          col("n").cast("double")).cast("long").as("conf_nano"),
        floor((col("n_pos") * lit(Nano)).cast("double") /
          col("n").cast("double")).cast("long").as("acc_nano"))
      .unionByName(perBin
        .agg(coalesce(sum("n"), lit(0L)).as("n"),
          coalesce(sum("n_pos"), lit(0L)).as("n_pos"),
          coalesce(sum(abs(lit(1000L) * col("n_pos") - col("_psum"))), lit(0L))
            .as("_gap"), coalesce(sum("n"), lit(0L)).as("_nTot"))
        .select(lit(-1L).as("bin"), col("n"), col("n_pos"),
          when(col("_nTot") > 0L,
            floor((col("_gap") * lit(1000000L)).cast("double") /
              col("_nTot").cast("double")).cast("long"))
            .otherwise(lit(0L)).as("conf_nano"),
          lit(null).cast("long").as("acc_nano")))
  }

  /** Cohen's kappa — chance-corrected agreement between two categorical
    * raters (e.g. the language-ID guess vs the labeled language):
    *   kappa = (p_o − p_e) / (1 − p_e)
    * computed entirely from the |A|×|B| contingency table: one
    * map-combined groupBy(a,b), then class-marginal joins on the
    * (classes-sized) counts table — the corpus is read once and never
    * re-shuffled. Integer numerators: p_o = diag/N, p_e = Σ_k rT_k·cT_k
    * / N², so kappa = (diag·N − Σ rT·cT) / (N² − Σ rT·cT), all LONG
    * until the one division (bound: N²·1e9 < 2^63 ⇔ N < 3.0e6 rated
    * items; past that drop to micro-units). floor rounds toward −∞ on
    * both engines, so a negative kappa quantizes identically. Returns
    * one row: n, po_nano, pe_nano, kappa_nano (NULL when p_e = 1). */
  def cohenKappa(df: DataFrame, raterA: String, raterB: String): DataFrame = {
    val counts = df.groupBy(col(raterA).as("_a"), col(raterB).as("_b"))
      .agg(count(lit(1)).as("_n"))
    val rowT = counts.groupBy("_a").agg(sum("_n").as("_rt"))
    val colT = counts.groupBy("_b").agg(sum("_n").as("_ct"))
    val peNum = rowT.join(colT, col("_a") <=> col("_b"), "inner")
      .agg(coalesce(sum(col("_rt") * col("_ct")), lit(0L)).as("_pe_num"))
    val tot = counts.agg(coalesce(sum("_n"), lit(0L)).as("n"),
      coalesce(sum(when(col("_a") <=> col("_b"), col("_n"))), lit(0L))
        .as("_diag"))
    tot.crossJoin(broadcast(peNum))
      .select(col("n"),
        when(col("n") > 0L, floor((col("_diag") * lit(Nano)).cast("double") /
          col("n").cast("double")).cast("long")).as("po_nano"),
        when(col("n") > 0L, floor((col("_pe_num") * lit(Nano)).cast("double") /
          (col("n") * col("n")).cast("double")).cast("long")).as("pe_nano"),
        when(col("n") * col("n") - col("_pe_num") =!= 0L,
          floor(((col("_diag") * col("n") - col("_pe_num")) * lit(Nano))
            .cast("double") /
            (col("n") * col("n") - col("_pe_num")).cast("double"))
            .cast("long")).as("kappa_nano"))
  }
}
