package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assigning documents to fixed token-budget bins,
  * the shape of concat-and-chunk training-sequence construction: docs
  * are laid out in a deterministic order per group (e.g. language),
  * token counts accumulate, and each doc's bin is the budget-window its
  * first token lands in. Deterministic by construction (no RNG, no
  * partition-order dependence: the cumulative sum runs over an explicit
  * total order), so the same corpus always packs identically — shards
  * can be built independently per group and re-verified. One window
  * exchange per group column; integer arithmetic end to end.
  */
object Packing {

  /** Adds `bin` (0-based budget window) and `bin_offset` (token offset
    * of the doc's start within its bin) per `groupCol`, ordering docs
    * by `order` — which MUST be a total order within each group (pass
    * a unique id as the last column): a running sum over duplicate
    * order keys is partition-order dependent, exactly the drift this
    * operator exists to prevent. Docs longer than `budget` keep
    * advancing the cursor — they span bins, exactly like concatenated
    * token streams chunked at budget boundaries. */
  def packBins(docs: DataFrame, groupCol: String, order: Seq[Column],
      tokens: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive (got $budget)")
    require(order.nonEmpty, "order columns must be non-empty")
    Seq("n_tokens", "bin", "bin_offset", "_n_tokens", "_start").foreach(c =>
      require(!docs.columns.contains(c),
        s"input already has a '$c' column — packBins would shadow it"))
    val w = Window.partitionBy(groupCol).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("_n_tokens", tokens.cast("long"))
      .withColumn("_start", sum(col("_n_tokens")).over(w) - col("_n_tokens"))
      // integral DIV, not double `/`: a long→double round-trip could
      // misplace a bin once cumulative counts pass 2^53
      .withColumn("bin", expr(s"_start DIV ${budget}L"))
      .withColumn("bin_offset", (col("_start") % budget).cast("long"))
      .drop("_start")
      .withColumnRenamed("_n_tokens", "n_tokens")
  }
}
