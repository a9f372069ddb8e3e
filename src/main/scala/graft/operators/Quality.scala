package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Q2/A16 — dataset health operators: declarative expectation checks
  * (the Deequ-style contract gate that runs before a corpus version
  * ships) and distribution drift between two snapshots (did the
  * event-type / source / length mix move?).
  */
object Quality {

  /** Q2 — expectation report: each rule is a named VIOLATION predicate;
    * the report is one row per rule with row/violation counts and a
    * pass flag. ALL rules evaluate in ONE aggregate over ONE scan
    * (conditional counts map-combine; adding a rule adds a column to
    * the agg, not a pass over 100 TB). The single agg row unpivots to
    * per-rule rows — report-sized, not data-sized. */
  def validate(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "validate needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size, "rule names must be unique")
    // coalesce: sum over ZERO rows is NULL — an empty-but-healthy table
    // must read as 0 violations / pass=true, not NULL/NULL
    val aggs = count(lit(1)).as("_n") +:
      rules.map { case (name, violation) =>
        coalesce(sum(when(violation, 1L).otherwise(0L)), lit(0L)).as(s"_v_$name") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(col("_n"), explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("rule"), col(s"_v_$name").as("n_violations"))
      }: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("_n").as("n_rows"),
        col("r.n_violations").as("n_violations"),
        (col("r.n_violations") === 0L).as("pass"))
  }

  /** Q2b — the same conditional-count rule metrics as [[validate]],
    * but IN-FLIGHT: an `observe` node rides a query that is already
    * running, so the gate costs ZERO extra scans (validate pays one
    * pass — at 100 TB the check you can afford on every production
    * job is the one that is free). Returns the instrumented frame,
    * which computes exactly what `df` computes; the metrics
    * (`n_rows`, one `v_<rule>` violation count per rule) surface as
    * observed metrics after the frame's next action.
    *
    * Batch: pass an [[org.apache.spark.sql.Observation]] — its `get`
    * blocks until the first action and yields the metric row.
    * Streaming: use the name overload; each micro-batch's metrics
    * arrive on `StreamingQueryProgress.observedMetrics(name)`
    * (spec-verified for both arrival paths). Rules are the
    * violation-predicate shapes [[validate]] takes — they compile to
    * aggregate expressions, which is exactly observe's contract. */
  def observedChecks(df: DataFrame, obs: org.apache.spark.sql.Observation,
      rules: Seq[(String, Column)]): DataFrame = {
    val ms = checkMetrics(rules)
    df.observe(obs, ms.head, ms.tail: _*)
  }

  /** Streaming-capable overload (a named observation; per-micro-batch
    * metrics on the query progress). */
  def observedChecks(df: DataFrame, name: String,
      rules: Seq[(String, Column)]): DataFrame = {
    val ms = checkMetrics(rules)
    df.observe(name, ms.head, ms.tail: _*)
  }

  private def checkMetrics(rules: Seq[(String, Column)]): Seq[Column] = {
    require(rules.nonEmpty, "observedChecks needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size, "rule names must be unique")
    count(lit(1)).as("n_rows") +:
      rules.map { case (n, violation) =>
        coalesce(sum(when(violation, 1L).otherwise(0L)), lit(0L)).as(s"v_$n") }
  }

  /** A16 — total-variation distance between the categorical
    * distributions of two snapshots: TVD = ½ Σ |p_c − q_c| over the
    * union of categories. A log-free drift score (unlike PSI/KL it
    * needs no epsilon smoothing and stays rational, so the oracle is
    * bit-exact): 0 = identical mix, 1 = disjoint.
    *
    * Per-category |p−q| quantizes to 1e-9 units (BIGINT) BEFORE the
    * sum — associative-exact, with a downward floor bias bounded by
    * |categories| nano-units (irrelevant at drift-alerting precision,
    * and the price of an engine-replayable exact integer) — and the
    * category table is
    * |categories|-sized, so everything after the two map-combined
    * count aggregates is report-sized. Output: one row per category
    * plus the 'ALL' total row (the TVD itself, in nano-units). */
  def driftTvd(oldSnap: DataFrame, newSnap: DataFrame, category: String): DataFrame = {
    def dist(df: DataFrame, catAs: String, n: String) =
      df.groupBy(col(category).as(catAs)).agg(count(lit(1)).as(n))
    // null-SAFE full outer join: a NULL category is one category, not
    // two unmatched rows
    val joined = dist(oldSnap, "_co", "n_old")
      .join(dist(newSnap, "_cn", "n_new"), col("_co") <=> col("_cn"), "full_outer")
      .select(coalesce(col("_co"), col("_cn")).as("cat"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val totals = joined.agg(sum("n_old").as("_to"), sum("n_new").as("_tn"))
    // An EMPTY side has total 0 — ANSI-safe try_divide yields NULL
    // there, coalesced to 0 (the zero measure) so per-category rows
    // stay defined instead of failing or going NULL.
    val perCat = joined.crossJoin(broadcast(totals))
      .select(col("cat"), col("n_old"), col("n_new"),
        floor(abs(coalesce(try_divide(col("n_old").cast("double"), col("_to")), lit(0.0)) -
          coalesce(try_divide(col("n_new").cast("double"), col("_tn")), lit(0.0))) * lit(1000000000.0))
          .cast("long").as("absdiff_u"))
    // ALL row: definitional TVD=1 when exactly one snapshot is empty
    // (disjoint distributions — maximum drift, which is the alert a
    // monitor wants); 0 when both are empty (identical emptiness).
    // Otherwise ½ Σ |p−q| as usual; coalesce guards the both-empty
    // case where perCat has zero rows and the sums are NULL.
    perCat.unionByName(perCat
      .agg(coalesce(sum("n_old"), lit(0L)).as("n_old"),
        coalesce(sum("n_new"), lit(0L)).as("n_new"),
        coalesce(floor(sum("absdiff_u").cast("double") / lit(2.0)).cast("long"), lit(0L))
          .as("_half"))
      .select(lit("ALL").as("cat"), col("n_old"), col("n_new"),
        when((col("n_old") === 0L) =!= (col("n_new") === 0L), lit(1000000000L))
          .otherwise(col("_half")).as("absdiff_u")))
  }

  /** Q4 — cross-table referential integrity: for each declared FK edge
    * (name, child, childKey, parent, parentKey), how many child rows
    * point at a parent key that does not exist. The join-health check a
    * pipeline runs before fanning a new table into downstream joins —
    * an orphaned key silently DROPS rows from every inner join later.
    *
    * Per edge: the child contributes only its key column, the parent
    * side is its DISTINCT key (dimension-sized → broadcast where small;
    * both sides hash-partition on the key otherwise), and one left
    * outer + conditional count reduces to a single report row. SQL FK
    * semantics: NULL child keys are counted separately, never as
    * orphans. The report is edges-sized. */
  def referentialIntegrity(
      edges: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(edges.nonEmpty, "need at least one FK edge")
    require(edges.map(_._1).distinct.size == edges.size,
      "edge names must be unique")
    edges.map { case (name, child, childKey, parent, parentKey) =>
      // aggregate the child BEFORE the join (guide §2.3): the exchange
      // and the probe side carry one (key, count) row per DISTINCT
      // child key — O(keys), not O(child rows); the map-side partial
      // aggregate absorbs the fact-table row count
      child.select(col(childKey).as("_k"))
        .groupBy("_k").agg(count(lit(1)).as("_cn"))
        .join(parent.select(col(parentKey).as("_k")).distinct()
          .withColumn("_hit", lit(1)), Seq("_k"), "left")
        .agg(coalesce(sum("_cn"), lit(0L)).as("n_rows"),
          coalesce(sum(when(col("_k").isNull, col("_cn"))), lit(0L))
            .as("n_null_keys"),
          coalesce(sum(when(col("_k").isNotNull && col("_hit").isNull,
            col("_cn"))), lit(0L)).as("n_orphans"))
        .select(lit(name).as("fk"), col("n_rows"), col("n_null_keys"),
          col("n_orphans"), (col("n_orphans") === 0L).as("pass"))
    }.reduce(_.unionByName(_))
  }
}
