package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage: Fellegi–Sunter match/unmatch weight
  * calibration and pair scoring (Fellegi & Sunter 1969, "A Theory for
  * Record Linkage", JASA 64(328)).
  *
  * The reference resolves identities by exact device key (the
  * `manufacturers`/sightings join keyed on MAC, `ssidentity.c:239-261`)
  * and the ER capstone ([[Components.resolveEntities]]) generalizes
  * that to fuzzy string identity via edit-distance clusters. FS is the
  * calibration layer on top: given a blocked candidate space and a
  * truth signal, it LEARNS how much evidence each field-agreement
  * carries (log-odds weights), so downstream linkage can rank pairs by
  * total evidence instead of hand-tuned rules — the standard MDM /
  * identity-stitching scorer.
  *
  * Scale design — calibration never materializes pairs:
  *   - Every count FS needs is a sum of C(n,2) over GROUP SIZES:
  *     in-block pairs = Σ_blk C(n_blk,2); same-entity (match) pairs =
  *     Σ_{blk,ent} C(n,2); pairs agreeing on field f = Σ_{blk,v_f}
  *     C(n,2); agreeing AND matching = Σ_{blk,ent,v_f} C(n,2). So the
  *     whole calibration is four map-combinable count aggregates over
  *     a slim projection — O(records), not O(pairs), where the naive
  *     pair-enumeration calibration is quadratic in block size. At
  *     100 TB the block self-join is the thing you cannot afford;
  *     this shape never runs it.
  *   - The per-field aggregates share ONE scan: fields unpivot through
  *     a `stack` generator into (field, blk, ent, value) rows, then
  *     two groupBys produce every field's agree counts together.
  *   - Counts are exact longs; C(n,2) = n(n−1) div 2 is exact while
  *     n < ~4.3e9 rows per group (then n(n−1) overflows 2^63 — far
  *     beyond any honest block; enforce blocking upstream).
  *
  * Semantics notes:
  *   - Agreement is VALUE-GROUP equality: two records agree on f iff
  *     their (string-cast) values are identical; two NULLs agree
  *     (they land in the same group). Mirrored by `<=>` in
  *     [[scorePairs]].
  *   - Weights are Laplace-smoothed (add-1 on numerators, add-2 on
  *     denominators) so zero-count cells never divide by zero, and
  *     floor-quantized to 1e-6 log-odds units (BIGINT micro-units) —
  *     the repo-wide representation-proof discipline for anything an
  *     oracle replays.
  *   - FS assumes conditional independence across fields (the classic
  *     naive-Bayes caveat); correlated fields (e.g. a suffix and the
  *     token it ends) double-count evidence. Calibration output makes
  *     that visible rather than hiding it.
  */
object Linkage {

  private def choose2(n: Column): Column =
    (n * (n - lit(1L))).divide(lit(2L)).cast("long")

  /** Field names travel into generated SQL (`stack(...)`) and into
    * backticked aliases — a quote or backtick in a name would break
    * parsing or silently alter the generated expression. Restrict to
    * plain identifiers, consistent with the uniqueness require. */
  private def requireSafeNames(fields: Seq[(String, Column)]): Unit =
    fields.foreach { case (n, _) =>
      require(n.matches("[A-Za-z0-9_]+"),
        s"field name '$n' must match [A-Za-z0-9_]+ — names are " +
          "interpolated into generated SQL and column aliases")
    }

  /** FS calibration. `records`: one row per record. `block`: blocking
    * key (pairs are only ever considered within a block — the FS
    * candidate space). `entity`: truth label (same entity = match);
    * in production this is a labeled sample or a high-precision rule,
    * here the ER capstone's cluster id. `fields`: (name, value)
    * comparison fields evaluated on each record.
    *
    * Returns one row per field, ordered by field name:
    * (field, n_match, n_nonmatch, n_agree_match, n_agree_nonmatch,
    *  w_agree_micro, w_disagree_micro) — all counts BIGINT, weights
    * floor(ln(ratio)·1e6) BIGINT.
    */
  def fellegiSunterWeights(records: DataFrame, block: Column,
      entity: Column, fields: Seq[(String, Column)]): DataFrame = {
    require(fields.nonEmpty, "fellegiSunterWeights needs at least one field")
    require(fields.map(_._1).distinct.size == fields.size,
      "field names must be unique")
    requireSafeNames(fields)
    val base = records.select(
      block.cast("string").as("_blk") +:
        entity.cast("string").as("_ent") +:
        fields.map { case (n, c) => c.cast("string").as(s"_f_$n") }: _*)
    // total in-block pairs and same-entity (match) pairs: two bounded
    // aggregates (one row each) — broadcast onto the per-field rows
    val totals = base.groupBy("_blk").agg(count(lit(1)).as("_n"))
      .agg(coalesce(sum(choose2(col("_n"))), lit(0L)).as("_np"))
    val matches = base.groupBy("_blk", "_ent").agg(count(lit(1)).as("_n"))
      .agg(coalesce(sum(choose2(col("_n"))), lit(0L)).as("_nm"))
    // unpivot the fields once; both agree-count aggregates read this
    // single projection (one scan, two map-combinable exchanges)
    val stackSql = fields
      .map { case (n, _) => s"'$n', `_f_$n`" }.mkString(", ")
    val long = base.select(col("_blk"), col("_ent"),
      expr(s"stack(${fields.size}, $stackSql) AS (_field, _v)"))
    val agree = long.groupBy("_field", "_blk", "_v")
      .agg(count(lit(1)).as("_n"))
      .groupBy("_field").agg(sum(choose2(col("_n"))).as("_na"))
    val agreeM = long.groupBy("_field", "_blk", "_ent", "_v")
      .agg(count(lit(1)).as("_n"))
      .groupBy("_field").agg(sum(choose2(col("_n"))).as("_nam"))
    // Laplace-smoothed log-odds; every factor cast to double BEFORE
    // the product (a long product can wrap past 2^63 silently under
    // non-ANSI Spark; the log only needs the ratio)
    val mNum = (col("_nam") + lit(1L)).cast("double")
    val mDen = (col("_nm") + lit(2L)).cast("double")
    val uNum = (col("_na") - col("_nam") + lit(1L)).cast("double")
    val uDen = (col("_np") - col("_nm") + lit(2L)).cast("double")
    agree.join(agreeM, "_field")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(matches))
      .select(
        col("_field").as("field"),
        col("_nm").as("n_match"),
        (col("_np") - col("_nm")).as("n_nonmatch"),
        col("_nam").as("n_agree_match"),
        (col("_na") - col("_nam")).as("n_agree_nonmatch"),
        floor(log(mNum * uDen / (mDen * uNum)) * lit(1000000.0))
          .cast("long").as("w_agree_micro"),
        floor(log((mDen - mNum) * uDen / (mDen * (uDen - uNum)))
          * lit(1000000.0)).cast("long").as("w_disagree_micro"))
      .orderBy("field")
  }

  /** Frequency-based (VALUE-SPECIFIC) agreement weights — the classic
    * FS refinement (Fellegi & Sunter 1969 §3.3; Winkler 1989):
    * agreement on a RARE value is stronger evidence than on a common
    * one ("Smith" vs "Zylberschtein"), so the u-probability (and m-)
    * is estimated PER VALUE instead of per field. Same pair-free
    * Σ C(n,2) machinery as [[fellegiSunterWeights]], one grouping
    * level deeper — the per-(block, value) groups the calibration
    * already counts simply keep their value key through the final
    * aggregate, so the whole table still costs O(records) with no
    * pair join anywhere; output is O(distinct values) rows (the
    * standard frequency table a linkage run broadcasts beside its
    * field weights).
    *
    * Smoothing matches the field-level calibration (add-1/add-2
    * Laplace against the SAME match/non-match totals), so a value
    * observed often among matches and rarely among non-matches gets a
    * large positive w_agree_micro and a saturated common value decays
    * toward (or below) the field-level weight. Disagreement carries no
    * value (which value would it be?) — pairs that disagree score with
    * the field-level w_disagree, the standard practice.
    *
    * Returns one row per (field, value) that generates at least one
    * in-block agreeing pair: (field, value, n_agree_match,
    * n_agree_nonmatch, w_agree_micro), ordered by (field, value). */
  def fellegiSunterValueWeights(records: DataFrame, block: Column,
      entity: Column, fields: Seq[(String, Column)]): DataFrame = {
    require(fields.nonEmpty, "fellegiSunterValueWeights needs at least one field")
    require(fields.map(_._1).distinct.size == fields.size,
      "field names must be unique")
    requireSafeNames(fields)
    val base = records.select(
      block.cast("string").as("_blk") +:
        entity.cast("string").as("_ent") +:
        fields.map { case (n, c) => c.cast("string").as(s"_f_$n") }: _*)
    val totals = base.groupBy("_blk").agg(count(lit(1)).as("_n"))
      .agg(coalesce(sum(choose2(col("_n"))), lit(0L)).as("_np"))
    val matches = base.groupBy("_blk", "_ent").agg(count(lit(1)).as("_n"))
      .agg(coalesce(sum(choose2(col("_n"))), lit(0L)).as("_nm"))
    val stackSql = fields
      .map { case (n, _) => s"'$n', `_f_$n`" }.mkString(", ")
    val long = base.select(col("_blk"), col("_ent"),
      expr(s"stack(${fields.size}, $stackSql) AS (_field, _v)"))
    // the same two agree-count aggregates as the field calibration,
    // WITHOUT folding the value key away; only values that actually
    // generate an in-block pair make the table
    val agree = long.groupBy("_field", "_blk", "_v")
      .agg(count(lit(1)).as("_n"))
      .groupBy("_field", "_v").agg(sum(choose2(col("_n"))).as("_na"))
      .filter(col("_na") > 0L)
    val agreeM = long.groupBy("_field", "_blk", "_ent", "_v")
      .agg(count(lit(1)).as("_n"))
      .groupBy("_field", "_v").agg(sum(choose2(col("_n"))).as("_nam"))
    val mNum = (col("_nam") + lit(1L)).cast("double")
    val mDen = (col("_nm") + lit(2L)).cast("double")
    val uNum = (col("_na") - col("_nam") + lit(1L)).cast("double")
    val uDen = (col("_np") - col("_nm") + lit(2L)).cast("double")
    agree.join(agreeM, Seq("_field", "_v"))
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(matches))
      .select(
        col("_field").as("field"),
        col("_v").as("value"),
        col("_nam").as("n_agree_match"),
        (col("_na") - col("_nam")).as("n_agree_nonmatch"),
        floor(log(mNum * uDen / (mDen * uNum)) * lit(1000000.0))
          .cast("long").as("w_agree_micro"))
      .orderBy("field", "value")
  }

  /** Both calibrations in ONE pass over the records: the field-level
    * agree counts are EXACTLY the value-level counts summed over
    * values (field pairs agreeing = Σ_v pairs agreeing on v — the
    * per-(block, value) groups partition the agreeing pairs), so a
    * consumer that needs both tables (the value-weighted linkage
    * decision scores agreements per value but falls back to field
    * weights for disagreements) should not pay the stack + grouped
    * Σ C(n,2) pipeline twice. Computes the shared per-(field, value)
    * count table once ([[Checkpoint]]ed — it is O(distinct values)),
    * then folds it two ways. Integer-exact: both outputs are
    * bit-identical to [[fellegiSunterWeights]] /
    * [[fellegiSunterValueWeights]] run separately.
    * Returns (fieldWeights, valueWeights). */
  def fellegiSunterBothWeights(records: DataFrame, block: Column,
      entity: Column, fields: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    require(fields.nonEmpty, "fellegiSunterBothWeights needs at least one field")
    require(fields.map(_._1).distinct.size == fields.size,
      "field names must be unique")
    requireSafeNames(fields)
    val base = records.select(
      block.cast("string").as("_blk") +:
        entity.cast("string").as("_ent") +:
        fields.map { case (n, c) => c.cast("string").as(s"_f_$n") }: _*)
    val totals = base.groupBy("_blk").agg(count(lit(1)).as("_n"))
      .agg(coalesce(sum(choose2(col("_n"))), lit(0L)).as("_np"))
    val matches = base.groupBy("_blk", "_ent").agg(count(lit(1)).as("_n"))
      .agg(coalesce(sum(choose2(col("_n"))), lit(0L)).as("_nm"))
    val stackSql = fields
      .map { case (n, _) => s"'$n', `_f_$n`" }.mkString(", ")
    val long = base.select(col("_blk"), col("_ent"),
      expr(s"stack(${fields.size}, $stackSql) AS (_field, _v)"))
    val agree = long.groupBy("_field", "_blk", "_v")
      .agg(count(lit(1)).as("_n"))
      .groupBy("_field", "_v").agg(sum(choose2(col("_n"))).as("_na"))
    val agreeM = long.groupBy("_field", "_blk", "_ent", "_v")
      .agg(count(lit(1)).as("_n"))
      .groupBy("_field", "_v").agg(sum(choose2(col("_n"))).as("_nam"))
    val counts = Checkpoint(agree.join(agreeM, Seq("_field", "_v")))
    val mNum = (col("_nam") + lit(1L)).cast("double")
    val mDen = (col("_nm") + lit(2L)).cast("double")
    val uNum = (col("_na") - col("_nam") + lit(1L)).cast("double")
    val uDen = (col("_np") - col("_nm") + lit(2L)).cast("double")
    val fieldW = counts.groupBy("_field")
      .agg(sum("_na").as("_na"), sum("_nam").as("_nam"))
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(matches))
      .select(
        col("_field").as("field"),
        col("_nm").as("n_match"),
        (col("_np") - col("_nm")).as("n_nonmatch"),
        col("_nam").as("n_agree_match"),
        (col("_na") - col("_nam")).as("n_agree_nonmatch"),
        floor(log(mNum * uDen / (mDen * uNum)) * lit(1000000.0))
          .cast("long").as("w_agree_micro"),
        floor(log((mDen - mNum) * uDen / (mDen * (uDen - uNum)))
          * lit(1000000.0)).cast("long").as("w_disagree_micro"))
      .orderBy("field")
    val valueW = counts.filter(col("_na") > 0L)
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(matches))
      .select(
        col("_field").as("field"),
        col("_v").as("value"),
        col("_nam").as("n_agree_match"),
        (col("_na") - col("_nam")).as("n_agree_nonmatch"),
        floor(log(mNum * uDen / (mDen * uNum)) * lit(1000000.0))
          .cast("long").as("w_agree_micro"))
      .orderBy("field", "value")
    (fieldW, valueW)
  }

  /** FS apply step: enumerate in-block candidate pairs, compare the
    * same fields, and score each pair with the calibrated weights
    * (Σ over fields of w_agree if the pair agrees else w_disagree).
    *
    * This is the one inherently pairwise stage, so it is blocked,
    * bounded, and SALTED:
    *   - `maxBlock` trims degenerate blocks the way
    *     minHashCandidatePairs' maxBucket does (a block past the bound
    *     means the blocking key is not doing its job; fix the key,
    *     don't melt the executor).
    *   - A plain equi self-join on the block key puts each block's
    *     whole quadratic pair space in ONE task — with few, large
    *     blocks that is a handful of straggler tasks no matter how
    *     many executors exist. So the join key is (block, salt):
    *     the a-side gets salt = hash(id) mod `salt`, the b-side
    *     replicates `salt`× (the standard skew treatment — ×salt
    *     shuffle volume on one slim side buys block-size-independent
    *     parallelism of |blocks|·salt).
    *   - Both join branches read ONE materialized slim projection
    *     ([[Checkpoint]]): a DataFrame self-join clones the plan, and
    *     the upstream here (truth labels from an iterative CC +
    *     calibration input) is far too expensive to run twice.
    *   - The |fields|-row `weights` table folds to ONE broadcast row
    *     of per-field scalar columns (no per-row map lookups), so
    *     scoring is map-only arithmetic over the pair stream.
    *
    * `weights` is [[fellegiSunterWeights]] output (or any table with
    * field/w_agree_micro/w_disagree_micro). Returns
    * (a_id, b_id, is_match, score_micro) with a_id < b_id under the
    * id column's native ordering; `is_match` is the truth label
    * (BIGINT 0/1) carried for calibration-quality evaluation. Field
    * agreement is string-cast equality with NULL ≡ NULL — exactly the
    * value-group convention the calibration counts under.
    */
  /** The shared salted in-block pair stream: columns (_a, _b), each a
    * struct of (id, ent, f_<field>…) with _a.id < _b.id. See
    * [[scorePairs]] for the shape rationale. */
  private def saltedPairs(records: DataFrame, id: Column, block: Column,
      entity: Column, fields: Seq[(String, Column)],
      maxBlock: Int, salt: Int,
      scalarRow: DataFrame = null,
      carry: Seq[(String, Column)] = Nil): DataFrame = {
    require(maxBlock >= 2, s"maxBlock must be >= 2 (got $maxBlock)")
    require(salt >= 1, s"salt must be >= 1 (got $salt)")
    // `carry` columns ride the record struct UNcompared and UNcast —
    // payload (e.g. per-record value weights), not evidence fields
    val rec = struct(
      (id.as("id") +: entity.cast("string").as("ent") +:
        fields.map { case (n, c) => c.cast("string").as(s"f_$n") }) ++
        carry.map { case (n, c) => c.as(s"c_$n") }: _*)
    val base = records
      .select(block.cast("string").as("_blk"), rec.as("_r"))
    val sizes = base.groupBy("_blk").agg(count(lit(1)).as("_bn"))
    val slim = Checkpoint(base.join(sizes, "_blk")
      .filter(col("_bn").between(2L, maxBlock.toLong))
      .select("_blk", "_r"))
    val aS0 = slim.select(col("_blk"),
      pmod(xxhash64(col("_r.id")), lit(salt.toLong)).as("_s"),
      col("_r").as("_a"))
    // optional 1-row scalar payload joins the record-sized side HERE,
    // never the pair-sized output (see scorePairs)
    val aS = if (scalarRow == null) aS0
      else aS0.crossJoin(broadcast(scalarRow))
    val bS = slim.select(col("_blk"), col("_r").as("_b"),
      explode(sequence(lit(0L), lit(salt.toLong - 1))).as("_s"))
    aS.join(bS, Seq("_blk", "_s"))
      .filter(col("_a.id") < col("_b.id"))
      .select((col("_a") +: col("_b") +:
        (if (scalarRow == null) Nil
         else scalarRow.columns.toSeq.map(col))): _*)
  }

  /** The |fields|-row weight table folded to ONE row of per-field
    * scalar columns (_wa_<f>, _wd_<f>) for broadcast. */
  private def weightRow(weights: DataFrame,
      fields: Seq[(String, Column)]): DataFrame = {
    val wAggs = fields.flatMap { case (n, _) => Seq(
      max(when(col("field") === n, col("w_agree_micro")))
        .as(s"_wa_$n"),
      max(when(col("field") === n, col("w_disagree_micro")))
        .as(s"_wd_$n")) }
    weights.agg(wAggs.head, wAggs.tail: _*)
  }

  def scorePairs(records: DataFrame, id: Column, block: Column,
      entity: Column, fields: Seq[(String, Column)], weights: DataFrame,
      maxBlock: Int = 8192, salt: Int = 32): DataFrame = {
    requireSafeNames(fields)
    // the 1-row weight scalars attach to the RECORD-sized a-side and
    // ride through the pair join — a nested-loop join per OUTPUT pair
    // row (O(pairs) rows through a BNLJ) measured ~5× slower than the
    // whole SMJ pair stream; per-record it is noise
    val pairs = saltedPairs(records, id, block, entity, fields,
      maxBlock, salt, weightRow(weights, fields))
    val score = fields.map { case (n, _) =>
      when(col(s"_a.f_$n") <=> col(s"_b.f_$n"), col(s"_wa_$n"))
        .otherwise(col(s"_wd_$n"))
    }.reduce(_ + _)
    pairs
      .select(col("_a.id").as("a_id"), col("_b.id").as("b_id"),
        (col("_a.ent") <=> col("_b.ent")).cast("long").as("is_match"),
        score.as("score_micro"))
  }

  /** FS apply step with VALUE-specific agreement weights
    * ([[fellegiSunterValueWeights]] folded into the pair decision —
    * VERDICT r8 #5): a pair agreeing on field f scores the
    * frequency-conditional w_agree(f, v) for the SHARED value v
    * (falling back to the field-level weight for values absent from
    * the table — only possible when the weights were trained on other
    * data, since any in-block agreeing pair's value generates a table
    * row by construction); disagreement carries no value and scores
    * the field-level w_disagree, the standard practice.
    *
    * Scale shape: the O(distinct values) weight table joins the
    * O(records) side BEFORE pairing — an agreeing pair shares its
    * value, so either side's carried weight IS the pair's value
    * weight, and the pair stream stays map-only arithmetic (no
    * O(pairs) join anywhere, |fields| null-safe equi joins on the
    * record table).
    *
    * Why the pair-free star-link path ([[positiveEvidenceLinks]])
    * deliberately KEEPS field-level weights: its O(records) shape
    * rests on score being monotone in the agreement PATTERN — links
    * are generated from the up-set of minimal positive patterns, each
    * realized as per-(block, values) group stars. Value-conditional
    * agreement weights break that lattice argument: the same pattern
    * scores differently per value (a pattern positive for rare values
    * can be negative for common ones), so there is no value-free
    * minimal-pattern set to enumerate, and the decision genuinely
    * requires the (blocked, salted, bounded) pair stream below. */
  def scoreValuePairs(records: DataFrame, id: Column, block: Column,
      entity: Column, fields: Seq[(String, Column)], weights: DataFrame,
      valueWeights: DataFrame, maxBlock: Int = 8192,
      salt: Int = 32): DataFrame = {
    requireSafeNames(fields)
    var enriched = records
    val carry = fields.map { case (n, c) =>
      val vw = valueWeights.filter(col("field") === lit(n))
        .select(col("value").as(s"_vwv_$n"),
          col("w_agree_micro").as(s"_vwa_$n"))
      // explicit broadcast (guide §3.1): the per-field weight table is
      // comparison-vocabulary-sized (the scale argument above), but its
      // size ESTIMATE — an aggregate behind a filter — is opaque to the
      // planner, which fell back to 4 shuffle joins of the record table
      enriched = enriched
        .join(broadcast(vw), c.cast("string") <=> col(s"_vwv_$n"), "left")
        .drop(s"_vwv_$n")
      (s"vw_$n", col(s"_vwa_$n"))
    }
    val pairs = saltedPairs(enriched, id, block, entity, fields,
      maxBlock, salt, weightRow(weights, fields), carry)
    val score = fields.map { case (n, _) =>
      when(col(s"_a.f_$n") <=> col(s"_b.f_$n"),
        coalesce(col(s"_a.c_vw_$n"), col(s"_wa_$n")))
        .otherwise(col(s"_wd_$n"))
    }.reduce(_ + _)
    pairs
      .select(col("_a.id").as("a_id"), col("_b.id").as("b_id"),
        (col("_a.ent") <=> col("_b.ent")).cast("long").as("is_match"),
        score.as("score_micro"))
  }

  /** Match/non-match score-separation histogram:
    * (is_match, score_unit, n) where score_unit is the pair's total
    * FS log-odds floor-bucketed to whole units — the distribution an
    * MDM operator reads to place link/review/reject thresholds.
    *
    * Same candidate space and answer as histogramming [[scorePairs]],
    * but computed PAIR-FREE. A pair's score depends only on its
    * agreement PATTERN, and pattern counts are combinatorial, like the
    * calibration counts, one inclusion–exclusion step further:
    *   - pairs agreeing on AT LEAST field-subset S (optionally same
    *     entity) = Σ over (block, [entity,] S-values) groups of
    *     C(n,2) — every such group count for every S comes out of ONE
    *     `cube` over (block, entity, fields…) (one shuffle; map-side
    *     partials collapse the 2^(|fields|+2) per-row grouping combos
    *     to distinct cells),
    *   - exact pattern counts follow by Möbius inversion
    *     (N_=(P) = Σ_{S⊇P} (−1)^{|S\P|} N_≥(S)) over a ONE-ROW pivot
    *     of the per-grouping-set sums — 3^|fields| scalar terms of
    *     driver-free column arithmetic,
    *   - non-match = all-pairs − match, per pattern; weights and
    *     bucketing then run on ≤2^(|fields|+1) pattern rows.
    * So the whole histogram costs O(records·2^|fields|) map work and
    * shuffles O(distinct cells) — no quadratic stage at any block
    * size, which is why this (not the salted pair join) is the
    * 100 TB-shape threshold-picker. `maxBlock` still trims degenerate
    * blocks so the answer matches [[scorePairs]]' candidate space.
    */
  def scoreSeparation(records: DataFrame, block: Column,
      entity: Column, fields: Seq[(String, Column)], weights: DataFrame,
      maxBlock: Int = 8192): DataFrame = {
    require(maxBlock >= 2, s"maxBlock must be >= 2 (got $maxBlock)")
    requireSafeNames(fields)
    val k = fields.size
    require(k >= 1 && k <= 8,
      s"scoreSeparation scales 3^|fields| in plan terms and 2^|fields|" +
        s" in cube combos — keep fields in [1,8] (got $k)")
    val base = records.select(
      block.cast("string").as("_blk") +:
        entity.cast("string").as("_ent") +:
        fields.map { case (n, c) => c.cast("string").as(s"_f_$n") }: _*)
    val sizes = base.groupBy("_blk").agg(count(lit(1)).as("_bn"))
    val kept = base.join(sizes, "_blk")
      .filter(col("_bn").between(2L, maxBlock.toLong)).drop("_bn")
    // one cube over (blk, ent, fields…): grouping_id bit j (LSB = last
    // dim) tells which dims each cell aggregates away; keep blk-active
    // cells and fold each grouping set's Σ C(n,2)
    val dims = col("_blk") +: col("_ent") +:
      fields.map { case (n, _) => col(s"_f_$n") }
    val perGid = kept.cube(dims: _*)
      .agg(count(lit(1)).as("_n"), grouping_id().as("_gid"))
      .filter(col("_gid") < lit(1L << (k + 1)))
      .groupBy("_gid")
      .agg(sum(expr("_n * (_n - 1) div 2")).as("_c2"))
    // gid of the grouping set keeping (blk, S[, ent]): ent contributes
    // bit k when aggregated away, field i bit (k-1-i) likewise
    def gidFor(withEnt: Boolean, s: Set[Int]): Long =
      (if (withEnt) 0L else 1L << k) +
        (0 until k).filterNot(s.contains).map(i => 1L << (k - 1 - i)).sum
    val pivots = (0 until (1 << (k + 1))).map(g =>
      coalesce(max(when(col("_gid") === g.toLong, col("_c2"))), lit(0L))
        .as(s"_g$g"))
    val row = perGid.agg(pivots.head, pivots.tail: _*)
    // Möbius inversion: exact-pattern count from the at-least sums
    def exact(withEnt: Boolean, p: Set[Int]): Column =
      (0 until k).filterNot(p.contains).toSet.subsets()
        .map { extra =>
          val sign = if (extra.size % 2 == 0) 1L else -1L
          lit(sign) * col(s"_g${gidFor(withEnt, p ++ extra)}")
        }.reduce(_ + _)
    val patRows = (0 until (1 << k)).flatMap { pm =>
      val p = (0 until k).filter(i => (pm & (1 << i)) != 0).toSet
      val eBits = fields.zipWithIndex.map { case ((n, _), i) =>
        lit(p.contains(i)).as(s"_e_$n") }
      Seq(
        struct(lit(1L).as("is_match") +: eBits :+
          exact(withEnt = true, p).as("_n"): _*),
        struct(lit(0L).as("is_match") +: eBits :+
          (exact(withEnt = false, p) - exact(withEnt = true, p))
            .as("_n"): _*))
    }
    val patterns = row
      .select(explode(array(patRows: _*)).as("_p"))
      .select(col("_p.*"))
      .filter(col("_n") > 0L)
    val score = fields.map { case (n, _) =>
      when(col(s"_e_$n"), col(s"_wa_$n")).otherwise(col(s"_wd_$n"))
    }.reduce(_ + _)
    patterns.crossJoin(broadcast(weightRow(weights, fields)))
      .select(col("is_match"),
        floor(score.cast("double") / lit(1000000.0)).cast("long")
          .as("score_unit"),
        col("_n"))
      .groupBy("is_match", "score_unit")
      .agg(sum(col("_n")).as("n"))
  }

  /** The positive-evidence LINK GRAPH without materializing a single
    * scored pair — connectivity-equivalent to
    * `scorePairs(...).filter(score_micro > 0)`:
    *
    *   - Monotonicity: every honest calibration has w_agree ≥
    *     w_disagree per field (m ≥ u), so a pair's score only grows as
    *     its agreement pattern grows ⇒ the positive patterns form an
    *     UP-SET, generated by its MINIMAL positive patterns (computed
    *     driver-side from the |fields|-row weight table).
    *   - Pairs agreeing on a field set S are exactly the cliques of
    *     the (block, S-values) groups, and a clique's connectivity is
    *     preserved by its per-group STAR (min id → each member). So
    *     the union over minimal positive patterns of per-group star
    *     edges has the SAME connected components as the full positive
    *     pair graph — O(records · |minimal patterns|) edges instead of
    *     O(pairs). (LinkageSpec pins the equivalence against the
    *     materialized scored pairs.)
    *
    * Each pattern costs one map-combinable groupBy + one group-keyed
    * join over the shared checkpointed projection. This is what makes
    * fully-unsupervised ER (EM calibration → links → components) run
    * with no quadratic stage anywhere. Throws if the weight table
    * violates w_agree ≥ w_disagree on some field (a calibration whose
    * agreement is evidence AGAINST matching breaks the up-set
    * argument — fall back to [[scorePairs]] for such exotic weights).
    * Returns (a_id, b_id) edges, a_id = the group minimum. */
  def positiveEvidenceLinks(records: DataFrame, id: Column,
      block: Column, fields: Seq[(String, Column)], weights: DataFrame,
      maxBlock: Int = 8192): DataFrame = {
    require(maxBlock >= 2, s"maxBlock must be >= 2 (got $maxBlock)")
    requireSafeNames(fields)
    val k = fields.size
    val byField = weights
      .select(col("field"), col("w_agree_micro"), col("w_disagree_micro"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val wa = fields.map { case (n, _) => byField(n)._1 }
    val wd = fields.map { case (n, _) => byField(n)._2 }
    fields.zipWithIndex.foreach { case ((n, _), i) =>
      require(wa(i) >= wd(i),
        s"field '$n' has w_agree < w_disagree — score is not monotone " +
          "in agreement; use scorePairs for non-monotone weights") }
    def score(p: Int): Long =
      (0 until k).map(i => if ((p & (1 << i)) != 0) wa(i) else wd(i)).sum
    val positive = (0 until (1 << k)).filter(score(_) > 0L)
    val minimal = positive.filter { p =>
      !positive.exists(q => q != p && (q & p) == q) }
    val base = records.select(
      id.as("_id") +: block.cast("string").as("_blk") +:
        fields.map { case (n, c) => c.cast("string").as(s"_f_$n") }: _*)
    val sizes = base.groupBy("_blk").agg(count(lit(1)).as("_bn"))
    val kept = Checkpoint(base.join(sizes, "_blk")
      .filter(col("_bn").between(2L, maxBlock.toLong)).drop("_bn"))
    val perPattern = minimal.map { p =>
      val keys = "_blk" +: fields.zipWithIndex.collect {
        case ((n, _), i) if (p & (1 << i)) != 0 => s"_f_$n" }
      val grp = kept.groupBy(keys.map(col): _*)
        .agg(min(col("_id")).as("_m"), count(lit(1)).as("_c"))
        .filter(col("_c") >= 2L)
      kept.join(grp, keys)
        .filter(col("_id") =!= col("_m"))
        .select(col("_m").as("a_id"), col("_id").as("b_id"))
    }
    if (perPattern.isEmpty)
      base.select(col("_id").as("a_id"), col("_id").as("b_id")).limit(0)
    else perPattern.reduce(_ union _).distinct()
  }

  /** Exact agreement-pattern counts WITHOUT a truth label — the
    * sufficient statistic for unsupervised calibration: (pattern, n)
    * where pattern bit i = the pair agrees on fields(i). Same pair-free
    * cube + Möbius machinery as [[scoreSeparation]] minus the entity
    * dimension: one cube over (block, fields…), Σ C(n,2) per grouping
    * set, inversion on a 1-row pivot. Only patterns with n > 0 return
    * (≤ 2^|fields| rows). */
  def agreementPatternCounts(records: DataFrame, block: Column,
      fields: Seq[(String, Column)], maxBlock: Int = 8192): DataFrame = {
    require(maxBlock >= 2, s"maxBlock must be >= 2 (got $maxBlock)")
    requireSafeNames(fields)
    val k = fields.size
    require(k >= 1 && k <= 8,
      s"pattern counting scales 3^|fields| in plan terms — keep fields" +
        s" in [1,8] (got $k)")
    val base = records.select(
      block.cast("string").as("_blk") +:
        fields.map { case (n, c) => c.cast("string").as(s"_f_$n") }: _*)
    val sizes = base.groupBy("_blk").agg(count(lit(1)).as("_bn"))
    val kept = base.join(sizes, "_blk")
      .filter(col("_bn").between(2L, maxBlock.toLong)).drop("_bn")
    val dims = col("_blk") +: fields.map { case (n, _) => col(s"_f_$n") }
    val perGid = kept.cube(dims: _*)
      .agg(count(lit(1)).as("_n"), grouping_id().as("_gid"))
      .filter(col("_gid") < lit(1L << k))
      .groupBy("_gid")
      .agg(sum(expr("_n * (_n - 1) div 2")).as("_c2"))
    def gidFor(s: Set[Int]): Long =
      (0 until k).filterNot(s.contains).map(i => 1L << (k - 1 - i)).sum
    val pivots = (0 until (1 << k)).map(g =>
      coalesce(max(when(col("_gid") === g.toLong, col("_c2"))), lit(0L))
        .as(s"_g$g"))
    val row = perGid.agg(pivots.head, pivots.tail: _*)
    def exact(p: Set[Int]): Column =
      (0 until k).filterNot(p.contains).toSet.subsets()
        .map { extra =>
          val sign = if (extra.size % 2 == 0) 1L else -1L
          lit(sign) * col(s"_g${gidFor(p ++ extra)}")
        }.reduce(_ + _)
    val patRows = (0 until (1 << k)).map { pm =>
      val p = (0 until k).filter(i => (pm & (1 << i)) != 0).toSet
      struct(lit(pm.toLong).as("pattern"), exact(p).as("n"))
    }
    row.select(explode(array(patRows: _*)).as("_p"))
      .select(col("_p.*")).filter(col("n") > 0L)
  }

  /** Micro-unit clamp to the open probability interval — keeps every
    * EM parameter in [1e-6, 1−1e-6] so no log or complement ever
    * degenerates; `greatest(1, least(999999, x))` in the oracle. */
  private def clampMicro(x: Long): Long = math.max(1L, math.min(999999L, x))

  /** Unsupervised Fellegi–Sunter calibration: EM over agreement-pattern
    * counts (Winkler 1988's application of EM to the FS latent-class
    * model) — no truth label anywhere. Pure driver-side function of the
    * BOUNDED (≤2^k-row) pattern statistic.
    *
    * Cross-engine replay discipline: every cross-pattern reduction is
    * an INTEGER sum (posterior g floor-quantized to micro-units per
    * pattern BEFORE summing), so engine summation order cannot change
    * a bit; per-pattern arithmetic is straight-line IEEE (products in
    * declared field order, then one divide + floor), which DuckDB
    * reproduces operation-for-operation in the unrolled oracle. All
    * integer sums stay < 2^63 while Σn·1e6 does (pairs < 9.2e12).
    *
    * Returns (pMicro, per-field (mMicro, uMicro)). Iterations are
    * FIXED (no convergence test) so the replay is a fixed-depth
    * expression on both engines; the fixture fixpoint lands well
    * inside the default 15. */
  def emCalibrate(patterns: Seq[(Long, Long)], k: Int, iters: Int = 15,
      initPMicro: Long = 100000L, initMMicro: Long = 900000L,
      initUMicro: Long = 100000L): (Long, IndexedSeq[(Long, Long)]) = {
    require(k >= 1 && k <= 8, s"fields in [1,8] (got $k)")
    require(patterns.nonEmpty, "emCalibrate needs at least one pattern")
    var p = initPMicro
    var m = IndexedSeq.fill(k)(initMMicro)
    var u = IndexedSeq.fill(k)(initUMicro)
    val nTot = patterns.map(_._2).sum
    for (_ <- 1 to iters) {
      val gs = patterns.map { case (pm, n) =>
        var a = p.toDouble
        var b = (1000000L - p).toDouble
        for (i <- 0 until k) {
          val agree = (pm & (1L << i)) != 0L
          a *= (if (agree) m(i) else 1000000L - m(i)).toDouble
          b *= (if (agree) u(i) else 1000000L - u(i)).toDouble
        }
        (pm, n, math.floor(a * 1000000.0 / (a + b)).toLong)
      }
      val dm = gs.map { case (_, n, g) => n * g }.sum
      val du = gs.map { case (_, n, g) => n * (1000000L - g) }.sum
      require(dm > 0L && du > 0L,
        "EM collapsed to a single class — the pattern counts carry no " +
          "mixture signal (all-identical or single-pattern input)")
      p = clampMicro(math.floor(dm.toDouble / nTot.toDouble).toLong)
      m = (0 until k).map { i =>
        val nm = gs.collect {
          case (pm, n, g) if (pm & (1L << i)) != 0L => n * g }.sum
        clampMicro(math.floor(nm.toDouble * 1000000.0 / dm.toDouble).toLong)
      }
      u = (0 until k).map { i =>
        val nu = gs.collect {
          case (pm, n, g) if (pm & (1L << i)) != 0L =>
            n * (1000000L - g) }.sum
        clampMicro(math.floor(nu.toDouble * 1000000.0 / du.toDouble).toLong)
      }
    }
    (p, m.zip(u))
  }

  /** ER3c — the unsupervised calibration query shape: pattern counts
    * (pair-free, one cube) → driver EM on the ≤2^k-row statistic (the
    * bounded-model collect, like IVF codebooks / the DSIR λ table) →
    * per-field (m, u, log-odds weights) in micro-units. The result is
    * a pure function of (records, fields, inits, iters): resumable and
    * shard-stable like every other calibration artifact here. */
  def fellegiSunterEmWeights(records: DataFrame, block: Column,
      fields: Seq[(String, Column)], maxBlock: Int = 8192,
      iters: Int = 15): DataFrame = {
    // a 2-binary-indicator latent-class mixture is NOT identifiable
    // (4 patterns < 5 free parameters — EM latches onto noise;
    // LinkageSpec documents the degeneracy). Three informative
    // indicators is the established floor for this model family
    // (cf. the three-indicator identifiability condition for
    // latent-class models, Allman/Matias/Rhodes 2009).
    require(fields.size >= 3,
      s"fellegiSunterEmWeights needs >= 3 comparison fields for the " +
        s"latent-class mixture to be identifiable (got ${fields.size}); " +
        "with fewer fields, supply a truth label and use " +
        "fellegiSunterWeights instead")
    val spark = records.sparkSession
    val pats = agreementPatternCounts(records, block, fields, maxBlock)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val (_, mu) = emCalibrate(pats, fields.size, iters)
    val rows = fields.zipWithIndex.map { case ((name, _), i) =>
      val (mM, uM) = mu(i)
      (name, mM, uM,
        math.floor(math.log(mM.toDouble / uM.toDouble) * 1e6).toLong,
        math.floor(math.log((1000000L - mM).toDouble
          / (1000000L - uM).toDouble) * 1e6).toLong)
    }
    import spark.implicits._
    rows.toDF("field", "m_micro", "u_micro",
      "w_agree_micro", "w_disagree_micro")
      .orderBy("field")
  }
}
