package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — the batch twin of Structured Streaming's
  * `session_window` (ST4): segment each key's event sequence into
  * gap-bounded sessions ("visit/dwell" segmentation, README.md:17
  * "Habitual movements") over the at-rest fact table.
  *
  * Classic two-window formulation: a lag() marks session starts (gap
  * from the previous event > `gapSeconds`), a running sum of the marks
  * numbers the sessions per key. Both windows share ONE partitioning
  * (key) and ordering (time, tiebreak), so Spark plans a single sort +
  * a single Window exec — per-key-partition work, no extra shuffle. At
  * 100 TB the fact table is date/sensor-partitioned and clustered by
  * mac (SURVEY §4.2), so the window's hash exchange is the only data
  * movement and each device's timeline fits a task.
  */
object Sessionize {

  /** Adds `session_id` (1-based per key, in time order). `tiebreak`
    * makes the ordering total when timestamps collide.
    *
    * Boundary semantics match `session_window` exactly: Spark merges
    * TOUCHING windows (next.start == current.end extends the session),
    * so an event arriving exactly `gapSeconds` after its predecessor
    * stays in the SAME session — strict `>` splits, verified against
    * session_window itself on randomized boundary-heavy data in
    * SessionizeSpec. */
  def assign(events: DataFrame, keyCol: String, tsCol: String,
      tiebreak: Column, gapSeconds: Long): DataFrame = {
    Seq("_new_session", "session_id").foreach(c =>
      require(!events.columns.contains(c),
        s"input already has a '$c' column — sessionize would shadow it"))
    val byTime = Window.partitionBy(keyCol).orderBy(col(tsCol), tiebreak)
    val gapMs = unix_millis(col(tsCol)) -
      unix_millis(lag(col(tsCol), 1).over(byTime))
    events
      .withColumn("_new_session",
        when(gapMs.isNull || gapMs > gapSeconds * 1000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("_new_session")).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new_session")
  }

  /** One row per (key, session): event count, start/end, duration. */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
      tiebreak: Column, gapSeconds: Long): DataFrame =
    assign(events, keyCol, tsCol, tiebreak, gapSeconds)
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        // integral seconds (matching the name and the BIGINT oracle) —
        // Column `/` is double division, so truncate explicitly
        ((unix_millis(max(col(tsCol))) - unix_millis(min(col(tsCol)))) / 1000L)
          .cast("long").as("duration_s"))

  /** W9 — interval coalescing (gaps-and-islands over [start, end)
    * INTERVALS, where sessionize handles point events): merge each
    * key's overlapping-or-touching intervals into maximal disjoint
    * spans. The presence/visit primitive when observations carry a
    * dwell — an AP association window, a sensor's hold-time — rather
    * than an instant.
    *
    * Same single-exchange shape as [[assign]]: a running max of `end`
    * over the start-ordered timeline marks island breaks (strict `>`,
    * so touching intervals merge — matching session_window's
    * touching-windows rule), a running sum numbers them, one groupBy
    * collapses each island. The running MAX — not lag(end) — is what
    * makes it correct when a long interval fully contains later ones.
    * Both windows and the final agg share the key partitioning: one
    * shuffle total. `tiebreak` totalizes the order when starts collide
    * (island CONTENTS are order-insensitive; only deterministic
    * numbering needs it). */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String, tiebreak: Column): DataFrame = {
    Seq("_new_island", "interval_id").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column — mergeIntervals would shadow it"))
    val byStart = Window.partitionBy(keyCol).orderBy(col(startCol), tiebreak)
    val maxEndBefore = max(col(endCol)).over(
      byStart.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("_new_island",
        when(maxEndBefore.isNull || col(startCol) > maxEndBefore, 1L)
          .otherwise(0L))
      .withColumn("interval_id", sum(col("_new_island")).over(
        byStart.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("interval_id"))
      .agg(
        min(col(startCol)).as("merged_start"),
        max(col(endCol)).as("merged_end"),
        count(lit(1)).as("n_rows"))
  }

  /** J11 — Allen interval-algebra classification (Allen 1983): every
    * within-key interval pair labeled with its one of the 13 temporal
    * relations. The temporal-reasoning layer over the interval ops —
    * [[mergeIntervals]] collapses overlap, the interval join finds it;
    * this NAMES it (precedes/meets/overlaps/during/starts/finishes/
    * equals + inverses), which is what habit analysis consumes ("work
    * Wi-Fi CONTAINS lunch café"). Closed intervals; the CASE ladder is
    * ordered so each pair matches exactly one arm, and the oracle
    * replays the SAME ladder — classification can't drift.
    *
    * Shape: one co-partitioned equi self-join on the key; pair count is
    * quadratic only in the per-key interval count (bounded — interval
    * sets per subject are small), never across keys. */
  def allenRelations(intervals: DataFrame, keyCol: String, idCol: String,
      startCol: String, endCol: String): DataFrame = {
    val a = intervals.select(col(keyCol).as("_k"), col(idCol).as("a_id"),
      col(startCol).as("a_s"), col(endCol).as("a_e"))
    val b = intervals.select(col(keyCol).as("_k"), col(idCol).as("b_id"),
      col(startCol).as("b_s"), col(endCol).as("b_e"))
    a.join(b, Seq("_k")).filter(col("a_id") < col("b_id"))
      .withColumn("relation",
        when(col("a_s") === col("b_s") && col("a_e") === col("b_e"), "equals")
          .when(col("a_e") < col("b_s"), "precedes")
          .when(col("a_e") === col("b_s"), "meets")
          .when(col("b_e") < col("a_s"), "preceded_by")
          .when(col("b_e") === col("a_s"), "met_by")
          .when(col("a_s") === col("b_s") && col("a_e") < col("b_e"), "starts")
          .when(col("a_s") === col("b_s"), "started_by")
          .when(col("a_e") === col("b_e") && col("a_s") > col("b_s"), "finishes")
          .when(col("a_e") === col("b_e"), "finished_by")
          .when(col("a_s") > col("b_s") && col("a_e") < col("b_e"), "during")
          .when(col("a_s") < col("b_s") && col("a_e") > col("b_e"), "contains")
          .when(col("a_s") < col("b_s"), "overlaps")
          .otherwise("overlapped_by"))
      .select(col("_k").as(keyCol), col("a_id"), col("b_id"), col("relation"))
  }
}
