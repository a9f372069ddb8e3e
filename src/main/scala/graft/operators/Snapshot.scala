package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T6/W11 — dataset-version operators: what changed between two
  * snapshots, and the full validity-interval history of a changing
  * attribute. The reference's fleet design re-uploads sensor databases
  * wholesale (`ssidentity.c:30`); reconciling a re-upload against the
  * central store IS a snapshot diff, and "what SSID was this device
  * probing during June" is the SCD2 question. The same two operators
  * version 100 TB training corpora (corpus v2 vs v1; when each document
  * entered/left the mix).
  */
object Snapshot {

  /** T6 — keyed diff of two snapshots: one row per key present in
    * either side, with status `added` / `removed` / `changed` /
    * `unchanged`. Content compares via an md5 digest with an explicit
    * field frame: columns join on the 0x1F unit separator (a bare
    * concat would alias ("ab","c") with ("a","bc")) and NULL encodes
    * as 0x00 — distinct from the empty string, and NULL == NULL on
    * both sides compares unchanged instead of poisoning the digest.
    * Contract: values must not CONTAIN the 0x00/0x1F control bytes —
    * a value string equal to the 0x00 character digests like NULL, and an
    * embedded 0x1F shifts field boundaries. True for any textual or
    * numeric-rendered column; callers with raw-binary values should
    * hex them first (escaping inside the digest would cost a regex
    * pass per column per side at 100 TB for a case that sane schemas
    * never hit).
    *
    * One full outer join co-partitioned on the key; both sides carry
    * only (key, content-hash) through the exchange — value columns are
    * reduced to a fixed-width digest scan-side, so a wide table diffs
    * at key-column shuffle cost. */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "diff needs at least one value column")
    def digest(df: DataFrame, as: String) = df.select(col(key),
      md5(concat_ws("\u001f",
        valueCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)).as(as))
    digest(oldSnap, "_oh").join(digest(newSnap, "_nh"), Seq(key), "full_outer")
      .select(col(key),
        when(col("_oh").isNull, lit("added"))
          .when(col("_nh").isNull, lit("removed"))
          .when(col("_oh") =!= col("_nh"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** T7 — content fingerprints: one (group, n_rows, digest) row per
    * rollup group identifying the rows as a MULTISET — the "did this
    * input change since the last run?" gate that makes a 100 TB
    * pipeline resumable without diffing data (compare two digests, not
    * two tables), and the shard-merge identity that lets per-partition
    * digests combine into the table digest without a second scan.
    *
    * digest = Σ over rows of the 60-bit md5 of the framed row rendering
    * (same 0x1F/0x00 frame contract as [[diff]]), carried in
    * DECIMAL(38) and reduced mod 2⁶⁰. SUM, not bit_xor: xor cancels
    * duplicate rows in pairs (a table gaining two copies of one row
    * would digest unchanged), while the sum tracks multiplicity.
    * Addition is commutative/associative → partition-order-free,
    * map-combined, and mergeable: the rollup's ALL row equals the sum
    * of its group digests mod 2⁶⁰ by construction. */
  /** T8 — APPLY a CDC changeset to a base snapshot (the MERGE step
    * downstream of [[diff]]): upserts replace or insert, deletes
    * remove, and multiple changes to one key inside a batch settle by
    * the greatest (version, op) — at equal version 'upsert' outranks
    * 'delete' lexically, so the tie is deterministic (give real
    * changelogs monotone versions and the tie never fires). Deleting
    * an absent key is a no-op, not an error.
    *
    * Shape at 100 TB: the changeset first reduces to ONE winner per
    * key via a map-combined max-struct (a day's changelog collapses
    * before it meets the store), then a single co-partitioned full
    * outer join on the key the base is bucketed by — the base is never
    * windowed, never broadcast, never rewritten outside the touched
    * partitions when the writer is partition-aware.
    *
    * Measured and REJECTED (r17): rewriting the full outer as
    * anti-join ∪ upsert-winners (equivalent under this operator's
    * one-row-per-key base contract, and it lets the winner keys
    * broadcast so the base side skips its exchange). A/B on the store
    * builds read consistently WORSE locally (publish.write
    * 3.09-3.19 → 3.32-3.86 s per build): the extra broadcast round and
    * the union's second write branch cost more than the saved exchange,
    * which only ever carries the TOUCHED buckets' rows — the merge job
    * is already partition-pruned, so the exchange is batch-scale, not
    * store-scale, at any size. */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
      opCol: String, verCol: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "applyChanges needs at least one value column")
    // `key` may be COMPOUND (a comma-joined column list): the winner
    // reduction groups and the merge joins on the full tuple — a
    // single-key call degenerates to exactly the old per-column plan
    val ks = key.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val winners = changes.select(struct(ks.map(col): _*).as("_k"),
        struct(col(verCol).as("_v"), col(opCol).as("_op"),
          struct(valueCols.map(col): _*).as("_vals")).as("_c"))
      .groupBy("_k").agg(max("_c").as("_c"))
      .select(col("_k"), col("_c._op").as("_op"), col("_c._vals").as("_vals"))
    base.join(winners,
        struct(ks.map(base(_)): _*) === winners("_k"), "full_outer")
      .filter(col("_op").isNull || col("_op") === "upsert")
      .select(ks.map(k => coalesce(base(k), col(s"_k.$k")).as(k)) ++
        valueCols.map(c => when(col("_op") === "upsert",
          col(s"_vals.$c")).otherwise(base(c)).as(c)): _*)
  }

  def contentDigests(df: DataFrame, group: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "contentDigests needs at least one value column")
    val h = conv(substring(md5(concat_ws("\u001f",
      valueCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)),
      1, 15), 16, 10).cast("long")
    df.select(group.map(col) :+ h.as("_h"): _*)
      .rollup(group.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        expr("CAST(sum(CAST(_h AS DECIMAL(38,0))) % 1152921504606846976 AS BIGINT)")
          .as("digest"))
      .select(group.map(c => coalesce(col(c), lit("ALL")).as(c)) :+
        col("n_rows") :+ col("digest"): _*)
  }

  /** W11 — SCD2 history: collapse a per-key change log into validity
    * intervals [valid_from, valid_to) per observed state, consecutive
    * repeats merged (type-2 slowly-changing-dimension build). valid_to
    * is NULL on each key's current (open) interval.
    *
    * Two window passes: the change-mark lag and the run-id running sum
    * share ONE (key)-ordered exchange (same partitioning and ordering,
    * one Window exec); the lead() for valid_to runs over the already
    * run-collapsed table — interval-count rows, not event-count. */
  def scd2(events: DataFrame, key: String, ts: String, state: String,
      tie: String): DataFrame = {
    Seq("_chg", "_run").foreach(c =>
      require(!events.columns.contains(c),
        s"input already has a '$c' column — it would collide with the run marks"))
    Seq("valid_from", "valid_to", "n_events").foreach(c =>
      require(!Seq(key, state).contains(c),
        s"'$c' is an output column — rename the input '$c' first"))
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
    // run boundary = state IS DISTINCT FROM its predecessor. The first
    // row of an all-NULL run intentionally does NOT mark (NULL is not
    // distinct from NULL — consecutive NULL states are ONE interval,
    // matching the oracle's IS DISTINCT FROM); the first non-null row
    // marks via !(NULL <=> state)
    val marked = events
      .withColumn("_chg",
        when(!(lag(col(state), 1).over(w) <=> col(state)), 1L).otherwise(0L))
      .withColumn("_run", sum(col("_chg")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    val runs = marked.groupBy(col(key), col("_run"))
      .agg(min(col(state)).as(state), min(col(ts)).as("valid_from"),
        count(lit(1)).as("n_events"))
    val wRun = Window.partitionBy(col(key)).orderBy(col("_run"))
    runs.withColumn("valid_to", lead(col("valid_from"), 1).over(wRun))
      .select(col(key), col(state), col("valid_from"), col("valid_to"),
        col("n_events"))
  }

  /** W11b — AS-OF reconstruction (the time-travel read over [[scd2]]'s
    * interval table): the state of every key at instant `at` is the
    * interval containing it — valid_from ≤ at < valid_to (open current
    * intervals have NULL valid_to and match any later instant). One
    * codegen'd filter over the interval table: at 100 TB the SCD2 table
    * is run-count-sized (≪ event count) and, date-partitioned on
    * valid_from, the read prunes to intervals opened before `at` — a
    * time-travel query that costs a pruned scan, no joins, no windows.
    * At most one row per key by scd2's construction (intervals per key
    * partition time). */
  def asOf(scd2Rows: DataFrame, at: Column): DataFrame =
    scd2Rows.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || at < col("valid_to")))

  /** T9 — incremental aggregate maintenance (IVM for distributive
    * aggregates): given the persisted per-key state (`n`, `vsum`) of a
    * count/sum view and a signed changeset (+1 inserts, −1 retractions),
    * produce the updated state WITHOUT revisiting base rows — the
    * nightly "refresh the per-key rollup from today's CDC feed" that
    * makes a 100 TB materialized aggregate maintainable at
    * O(changeset), not O(history).
    *
    * The changeset collapses map-side to per-key deltas (one
    * map-combined groupBy); one co-partitioned full outer join merges
    * them into the state. Keys whose count reaches zero DROP from the
    * state (full retraction ≡ the key never existed — recompute
    * equivalence, asserted by the oracle's independent re-derivation).
    * Values must be INTEGRAL units (quantize floats at the edge):
    * integer sums commute, so merged state is bit-equal to recompute
    * regardless of delta arrival order. A merged count going NEGATIVE
    * means the changeset retracted a row the base never had — an
    * inconsistent feed, so the merge FAILS LOUDLY at runtime
    * (raise_error on the filter path) instead of silently dropping the
    * key and masking the corruption. */
  def incrementalAgg(baseState: DataFrame, changes: DataFrame,
      keys: Seq[String], valueCol: String, signCol: String): DataFrame = {
    require(keys.nonEmpty, "need at least one grouping key")
    require(baseState.columns.contains("n") && baseState.columns.contains("vsum"),
      "baseState must carry the ('n', 'vsum') state columns")
    Seq("_dn", "_dv").foreach(c =>
      require(!baseState.columns.contains(c),
        s"baseState already has a '$c' column — it would collide with the delta join"))
    val delta = changes.groupBy(keys.map(col): _*)
      .agg(sum(col(signCol)).cast("long").as("_dn"),
        sum(col(signCol) * col(valueCol)).cast("long").as("_dv"))
    baseState.join(delta, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("_dn"), lit(0L))).as("n"),
        (coalesce(col("vsum"), lit(0L)) + coalesce(col("_dv"), lit(0L)))
          .as("vsum")): _*)
      // the raise_error lives INSIDE the filter predicate (not a
      // dropped projection column, which the optimizer would prune):
      // n < 0 ⇒ the error branch evaluates and the job fails with the
      // offending count; otherwise plain n > 0 keeps live keys
      .filter(when(col("n") < 0L, raise_error(concat(
          lit("incrementalAgg: merged count went negative (n="),
          col("n").cast("string"),
          lit(") — the changeset retracts rows the base never had")))
          .cast("boolean"))
        .otherwise(col("n") > 0L))
  }
}
