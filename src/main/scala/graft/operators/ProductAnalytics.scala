package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the (user, ts, event_type) log — the
  * server-side reports the reference declares ("Habitual movements",
  * "Active hours", "Tracking/Arrival alerts", README.md:17-19) grow
  * into: ordered funnels, cohort retention, and first-order transition
  * structure. All three are plain relational compositions — conditional
  * aggregates, self-aligned windows, one groupBy per stage — chosen for
  * their shuffle shape at fleet scale, not just correctness.
  */
object ProductAnalytics {

  /** A13 — ordered funnel: per user, the earliest time of step 1, the
    * earliest step-2 event STRICTLY AFTER that, the earliest step-3
    * after that, and so on. Returns one row per step-1 user with the
    * per-step timestamps (NULL once the chain breaks).
    *
    * Each later step is one conditional min-aggregate over a left join
    * back to that step's events, co-partitioned on the user key — every
    * aggregate map-combines, the exchange on user_id is reused across
    * stages, and no window touches the full log (a power user with 10⁶
    * events carries no per-user array state). */
  def funnelTimes(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var acc = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("t1"))
    var i = 1
    steps.drop(1).foreach { step =>
      val prev = s"t$i"; i += 1; val cur = s"t$i"
      val next = events.filter(col(typeCol) === step)
        .select(col(userCol), col(tsCol).as("_ts"))
      val joined = acc.join(next, Seq(userCol), "left_outer")
      val carried = (1 until i).map(j => first(col(s"t$j")).as(s"t$j"))
      acc = joined
        .groupBy(col(userCol))
        .agg(carried.head, carried.tail :+
          min(when(col("_ts") > col(prev), col("_ts"))).as(cur): _*)
    }
    acc
  }

  /** A14 — cohort retention: users cohorted by first-seen day; cell
    * (cohort_day, day_offset) counts the distinct users of that cohort
    * active `day_offset` days later. The classic retention triangle.
    *
    * Shape: one min-aggregate per user (map-combined), joined back to
    * the log co-partitioned on user_id, then one (cohort, offset)
    * groupBy. The cohort table is |users| rows — at fleet scale it
    * stays a co-partitioned equi join (never broadcast), and the final
    * cell table is tiny (days × days). */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstDay = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    events.select(col(userCol), to_date(col(tsCol)).as("_day"))
      .join(firstDay, Seq(userCol))
      .groupBy(col("cohort_day"),
        datediff(col("_day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** A15 — first-order transition matrix: counts and row-normalized
    * probabilities of consecutive (event_type → event_type) moves per
    * user ordered by (ts, tiebreaker). The Markov structure of device
    * behavior — what follows what.
    *
    * One window over (user, time) produces the bigrams in a single
    * exchange — state per row is one lag value, nothing accumulates —
    * then a tiny (|types|²) groupBy. Row totals come from a second
    * window OVER THE COUNTS TABLE (|types|² rows), not a re-aggregation
    * of the log: a self-join formulation would plan the log-wide window
    * twice (Spark physical plans don't share subtrees), doubling the
    * scan. The probability divides two longs cast to double (single
    * correctly-rounded op, engine-exact; round at the edge). */
  /** A22 — frequent sequential patterns: every run of `n` CONSECUTIVE
    * same-user events (ordered by ts, tie) becomes an n-gram of event
    * types; the top `k` patterns by global occurrence count, with the
    * distinct-user support alongside (how many devices exhibit the
    * habit — the "habitual movements" report generalized past bigrams,
    * README.md:17). Consecutive-only is the deliberate semantics: gap
    * patterns (skip-grams) explode combinatorially at 100 TB; run the
    * operator at n=2..4 instead.
    *
    * Shape: ONE key-partitioned window produces all n−1 leads in a
    * single exchange (per-row state is n−1 strings, nothing
    * accumulates), the pattern groupBy map-combines to a ≤|types|ⁿ
    * table, and top-k is an orderBy+limit (TakeOrderedAndProject —
    * never a partitionless rank window). Ties at the k boundary break
    * on the pattern string, so the cut is total and engine-replayable. */
  def sequencePatterns(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, n: Int = 3, k: Int = 20): DataFrame = {
    require(n >= 2, s"pattern length n must be >= 2 (got $n)")
    require(k >= 1, s"top-k must be >= 1 (got $k)")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val leads = (1 until n).map(i => lead(col(typeCol), i).over(w).as(s"_e$i"))
    events
      .select(col(userCol) +: col(typeCol).as("_e0") +: leads: _*)
      .filter((1 until n).map(i => col(s"_e$i").isNotNull).reduce(_ && _))
      .select(col(userCol),
        concat_ws(">", (0 until n).map(i => col(s"_e$i")): _*).as("pattern"))
      .groupBy("pattern")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col(userCol)).as("n_users"))
      .orderBy(col("n_occurrences").desc, col("pattern"))
      .limit(k)
  }

  def transitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val bigrams = events
      .select(col(userCol), col(typeCol).as("to_type"),
        lag(col(typeCol), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
    val counts = bigrams.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val rowSum = sum(col("n")).over(Window.partitionBy(col("from_type")))
    counts.select(col("from_type"), col("to_type"), col("n"),
      (round(col("n").cast("double") / rowSum, 4) + lit(0.0)).as("p"))
  }
}
