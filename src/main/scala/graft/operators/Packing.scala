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

  /** PACK2 — token-level SEQUENCE packing (the actual pretraining data
    * layout): concatenate all docs in one explicit GLOBAL total order
    * and cut the token stream into fixed `seqLen` windows; a document
    * crossing a boundary SPLITS, emitting one row per (sequence, doc)
    * overlap with the in-sequence token range it occupies. [[packBins]]
    * assigns whole docs to budget windows; this materializes the
    * per-sequence layout those windows imply — what the training-data
    * loader actually reads.
    *
    * 100 TB shape: the global cumulative position comes from
    * [[DenseSequence.withRunningTotal]] (range sort + per-partition
    * offsets — no partitionless window), then everything is map-only
    * integer arithmetic: each doc explodes into only the sequences it
    * touches (fan-out = ceil(len/seqLen) + 1 worst case), so output is
    * O(tokens/seqLen + docs) rows. Deterministic by construction —
    * shards can be cut independently and re-verified byte-for-byte. */
  def packSequences(docs: DataFrame, order: Seq[Column], tokens: Column,
      seqLen: Long, idCols: Seq[String]): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive (got $seqLen)")
    require(order.nonEmpty, "order columns must be non-empty")
    Seq("seq_id", "n_from_doc", "doc_tok_start", "seq_tok_start",
      "is_doc_head", "is_doc_tail", "_cum_end").foreach(c =>
      require(!docs.columns.contains(c),
        s"input already has a '$c' column — packSequences would shadow it"))
    val withCum = DenseSequence.withRunningTotal(
      docs.select(idCols.map(col) :+ tokens.cast("long").as("_n_toks"): _*),
      order.map(c => c), col("_n_toks"), totalCol = "_cum_end")
    withCum
      .filter(col("_n_toks") > 0)
      .withColumn("_cum_start", col("_cum_end") - col("_n_toks"))
      .withColumn("seq_id", explode(sequence(
        expr(s"_cum_start DIV ${seqLen}L"),
        expr(s"(_cum_end - 1) DIV ${seqLen}L"))))
      .select(
        (idCols.map(col) :+
          col("seq_id") :+
          (least(col("_cum_end"), (col("seq_id") + 1) * seqLen) -
            greatest(col("_cum_start"), col("seq_id") * seqLen)).as("n_from_doc") :+
          (greatest(col("_cum_start"), col("seq_id") * seqLen) -
            col("_cum_start")).as("doc_tok_start") :+
          (greatest(col("_cum_start"), col("seq_id") * seqLen) -
            col("seq_id") * seqLen).as("seq_tok_start") :+
          (col("_cum_start") >= col("seq_id") * seqLen).as("is_doc_head") :+
          (col("_cum_end") <= (col("seq_id") + 1) * seqLen).as("is_doc_tail")): _*)
  }
}
