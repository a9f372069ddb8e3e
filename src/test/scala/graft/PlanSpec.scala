package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-quality regression tests (SURVEY.md §4): the physical plans the
  * engine relies on at scale — pushdown reaching the parquet scan,
  * column pruning, map-side partial aggregation, broadcast join
  * selection, top-k without a full sort — asserted structurally so a
  * refactor can't silently regress them. */
class PlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q1: filter pushed to scan, columns pruned, partial agg map-side") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_orderkey"), "scan should prune unused columns")
    assert(p.contains("partial_sum"), "aggregation must have a map-side partial phase")
  }

  test("p6: range predicates pushed into the parquet scan") {
    val p = plan("p6_range_filter")
    assert(p.contains("GreaterThanOrEqual(l_discount,0.05)"))
    assert(p.contains("LessThanOrEqual(l_quantity,5"))
  }

  test("j1: small dimensions broadcast, never shuffled") {
    val p = plan("j1_broadcast_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2)
  }

  test("j3: watchlist probes as a broadcast LEFT SEMI — the fact side never shuffles") {
    val p = plan("j3_semi_join")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p.linesIterator.take(30).mkString("\n"))
  }

  test("o2: top-k runs as TakeOrderedAndProject, not a global sort") {
    val p = plan("o2_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("rangepartitioning"),
      "limit+orderBy must not range-shuffle the whole table")
  }

  test("l2f: all-pairs cosine = broadcast nested loop with partitioned probe") {
    val p = plan("l2f_embedding_neardup")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("l3: query side broadcast against the corpus scan") {
    val p = plan("l3_cosine_topk")
    assert(p.contains("BroadcastExchange"))
  }

  test("no plan degenerates to a CartesianProduct or an undeliberate nested loop") {
    // the brute-force similarity ops stream a broadcast corpus on
    // purpose (partitioned probe side, see Dedup/Similarity docs);
    // anywhere else a BNL means an equi key was lost — the plan shape
    // that cannot scale. One planning pass per query covers both sweeps.
    val deliberateBnl = Set("l2f_embedding_neardup", "l3_cosine_topk",
      "l3b_ann_lsh", "l3c_ann_ivf", "l3e_pq_ann", "l3f_ivfadc",
      "l2e_simhash_pairs",
      // both rankings score every (query, candidate) pair via the
      // broadcast-queries idiom — the l3 shape, twice
      "l3g_rank_metrics",
      // one broadcast-queries ranking per prefix dim — the l3 shape,
      // once per ablation point
      "l3h_dim_ablation",
      // a broadcast of ONE row (the corpus count) attached to every
      // partition — the scalar-join idiom, O(n) work, not a pair blowup
      "l4c_tfidf", "l4g_bm25", "a16_drift_tvd",
      // the 1-row vocab size (V in the add-one denominator) broadcast
      // onto the per-doc gram table — scalar-join idiom
      "l4s_lm_score",
      // the 1-row (pooled total, vocab size) broadcast onto the
      // vocabulary-sized (source, token) count table — scalar-join idiom
      "l4t_unigram_kl",
      // the 1-row table total broadcast onto the position table for the
      // balanced file-cut arithmetic, once per layout — scalar-join idiom
      "o4c_zonemap",
      // the 1-row fixpoint-stability flag broadcast onto the node-sized
      // degree table — scalar-join idiom
      "g9_kcore",
      // the 1-row grand total broadcast onto the 9-row digit table —
      // scalar-join idiom
      "a25_benford",
      // same scalar-join idiom: the 1-row weight total crosses onto the
      // source-count table (source-dimension-sized, tiny) before the
      // rate table broadcasts back to the fact scan
      "mix_temperature", "training_manifest",
      // the 1-row global watermark (max event time) broadcast onto the
      // event scan — ST5's cutoff filter, same scalar-join idiom
      "st5_late_drop",
      // the 1-row (total, n_cells) density stats broadcast onto the
      // occupied-cell table (cell-count-sized) — scalar-join idiom
      "geo_hotspots",
      // the 1-row corpus count broadcast onto the position table for
      // the modular negative-draw arithmetic — scalar-join idiom
      "mix_negatives", "contrastive_manifest",
      // each water-filling round broadcasts the 1-row (R, W_unsat)
      // scalar pair onto the |sources|-row table — scalar-join idiom
      "mix_budget",
      // the 1-row p_e numerator broadcast onto the 1-row (n, diag)
      // totals — two scalars meeting; the data pass is the single
      // contingency groupBy below them
      "eval_kappa",
      // FS calibration: the 1-row total-pairs and match-pairs scalars
      // broadcast onto the per-field (|fields|-row) count table;
      // scoring folds the |fields|-row weight table into ONE broadcast
      // row of maps crossed onto the pair stream — scalar-join idiom
      "er_fs_weights", "er_fs_scores",
      // value-conditional FS weights fold the same |fields|-row gate
      // into one broadcast row crossed onto the value-count table —
      // scalar-join idiom, O(distinct values) not O(pairs)
      "er_fs_value_weights",
      // the value-weighted scorer crosses the SAME 1-row field-weight
      // scalars onto the record-sized a-side (the er_fs_scores idiom);
      // the value-weight table itself joins null-safe EQUI pre-pair
      "er_fs_value_link",
      // the pinned-ANN twins of the already-allowlisted l3c/l3e/l3f:
      // an 8-row frozen literal codebook broadcast-crossed onto the
      // embedding scan — a bounded-model join, not a pair blowup
      "l3c_ivf_pinned", "l3e_pq_pinned", "l3f_ivfadc_pinned",
      // the 1-row corpus doc count broadcast onto the ≤C(topV,2)-row
      // PMI pair table — scalar-join idiom
      "l4u_pmi",
      // t-closeness: the |bins|-row global cumulative table and the
      // 1-row (N, m) totals broadcast-crossed onto the class table —
      // bounded by the caller's binning, not by data
      "q5d_t_closeness")
    SparkEntry.queries.keys.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), name)
      if (!deliberateBnl(name))
        assert(!p.contains("BroadcastNestedLoopJoin"), name)
    }
  }

  test("catalog sweep: no partitionless window over data-sized inputs") {
    // A Window with no PARTITION BY moves every row through ONE task —
    // the single-task shape this codebase bans (cf. DenseSequence).
    // The only tolerated instances run over MODEL-sized tables that
    // are bounded by construction, never by data volume.
    val deliberate = Set(
      // Skyline level 1: prefix-min across the |buckets| table —
      // bucketWidth sizes that table (hundreds of rows), not the data;
      // level 2 (the data-sized pass) partitions by bucket
      "o5_skyline",
      // t-closeness: the global cumulative distribution is a
      // |bins|-row model table (caller bins the sensitive attribute);
      // the per-class cums partition by class
      "q5d_t_closeness")
    // AQE's AdaptiveSparkPlanExec hides its subtree from collect();
    // plan structure is independent of it, so audit with it off
    val conf = spark.sessionState.conf
    val before = conf.getConfString("spark.sql.adaptive.enabled", "true")
    conf.setConfString("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries.keys.foreach { name =>
      val bad = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => w
        }
      if (!deliberate(name))
        assert(bad.isEmpty, s"$name has a partitionless window")
    } finally conf.setConfString("spark.sql.adaptive.enabled", before)
  }

  test("l4c tf-idf: df table and corpus-size row broadcast, never shuffled to the fact side") {
    val p = plan("l4c_tfidf")
    assert("BroadcastExchange".r.findAllIn(p).size >= 2, p.take(2000))
    assert(p.contains("BroadcastHashJoin") && p.contains("BroadcastNestedLoopJoin"))
  }

  test("samp: the hash gate evaluates directly over the scan, before any exchange") {
    val p = plan("samp_hash")
    // Catalyst must push the gate Filter below the spread repartition
    // so sampling happens map-side on the scan output
    assert("\\+- Filter \\(\\d+\\)\\s*\\n\\s*\\+- Scan parquet".r
      .findFirstIn(p).isDefined, p.take(2000))
  }

  test("spread is split-aware: spreads a single-split scan, identity over a well-split one") {
    // VERDICT r16 #3: the repartition must fire only when the planned
    // scan is under-split relative to the session parallelism — a
    // fleet-scale table with thousands of natural splits must NOT pay
    // a round-robin exchange of raw scan rows
    import org.apache.spark.sql.functions.col
    val target = spark.sparkContext.defaultParallelism
    val dir = java.nio.file.Files.createTempDirectory("graft_spread").toString
    // single file, single row group -> 1 planned partition < target
    spark.range(0, 1000, 1, 1).selectExpr("id", "id * 2 AS v")
      .write.mode("overwrite").parquet(s"$dir/one")
    val one = spark.read.parquet(s"$dir/one")
    val spreadOne = graft.sources.Tables.spread(one)
    assert(spreadOne.rdd.getNumPartitions == target,
      "under-split scan must spread to defaultParallelism")
    // well-split input: >= target files -> identity, NO added Exchange
    spark.range(0, 1000, 1, target).selectExpr("id", "id * 2 AS v")
      .write.mode("overwrite").parquet(s"$dir/many")
    val many = spark.read.parquet(s"$dir/many")
    val spreadMany = graft.sources.Tables.spread(many)
    assert(spreadMany.queryExecution.sparkPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, "well-split scan must not gain an Exchange")
    // results identical either way
    assert(spreadMany.select(col("id")).collect().map(_.getLong(0)).sorted
      .sameElements(many.select(col("id")).collect().map(_.getLong(0)).sorted))
  }

  test("a8 percentiles: exact percentile aggregates with a map-side partial phase") {
    val p = plan("a8_percentiles")
    assert(p.contains("partial_percentile"), p.take(2000))
  }

  test("w5 rank family: all three window functions share ONE window exec and exchange") {
    val p = plan("w5_rank_family")
    assert("Window \\(\\d+\\)".r.findAllIn(p).size == 1, p.take(2000))
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size == 1)
  }

  test("t5 pivot: single scan, map-side partial count AND partial pivot") {
    val p = plan("t5_pivot")
    assert("Location: InMemoryFileIndex".r.findAllIn(p).size == 1, p.take(2000))
    assert(p.contains("partial_pivotfirst") && p.contains("partial_count"),
      "pivot must partial-aggregate map-side")
  }

  test("w4 dense sequence: no partitionless Window (the single-task plan shape)") {
    val p = plan("w4_global_seq")
    assert(!p.contains("Window"), p.take(2000))
    // values must still equal the row_number formulation
    val e = graft.sources.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("event_id"))
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val want = e.select(row_number().over(Window.orderBy(col("ts"), col("event_id")))
        .cast("long").as("seq"), col("event_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("w4_global_seq")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("join hints are respected (SHUFFLE_HASH, MERGE override broadcast)") {
    // tiny tables would default to broadcast; hints must force the
    // requested physical strategy — the operator a tuner reaches for
    // when the optimizer's size estimates are wrong at 100 TB
    val n = graft.sources.Tables.nation(spark, sf)
    val c = graft.sources.Tables.customer(spark, sf)
    val hashed = c.join(n.hint("shuffle_hash"),
      c("c_nationkey") === n("n_nationkey"))
    assert(hashed.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"))
    val merged = c.join(n.hint("merge"),
      c("c_nationkey") === n("n_nationkey"))
    assert(merged.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
  }

  test("l5b chunking is map-only: no wide shuffle from the operator") {
    // the only exchange allowed is Tables.documents' local round-robin
    // spread (dropped at fleet scale); chunking itself must add no
    // hash/range partitioning — chunks inherit the scan's layout
    val p = plan("l5b_chunking")
    assert(!p.contains("hashpartitioning"), p.take(800))
    // (the final orderBy is the oracle's total order; its range
    // exchange sits above the chunker, which is Project+Generate only)
    assert(p.contains("explode(sequence"), "sequence+explode expected")
  }

  test("w3b time-range window shares ONE key exchange") {
    val p = plan("w3b_time_range")
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size <= 1,
      "both frame aggregates must share one (user_id) exchange")
    assert(p.contains("RANGE BETWEEN") || p.contains("specifiedwindowframe"),
      "range frame expected in the window spec")
  }

  test("l4h postings: per-doc dedup happens scan-side, one term exchange") {
    val p = plan("l4h_postings")
    assert(p.contains("array_distinct"), "tokens must dedup before the shuffle")
    assert("hashpartitioning\\(tok".r.findAllIn(p).size == 1,
      "exactly one term-keyed exchange")
    assert(p.contains("partial_count") || p.contains("ObjectHashAggregate"),
      "map-side partial aggregation expected")
  }

  test("l4i encode: the vocabulary broadcasts — corpus tokens never sort-merge") {
    val p = plan("l4i_encode")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("SortMergeJoin"),
      "vocab join must broadcast, not shuffle the exploded corpus")
  }

  test("runtime bloom-filter semi-join reduction fires on a selective shuffle join") {
    // the 100 TB shape: a huge fact scan shuffle-joined to a filtered
    // dimension too big to broadcast. Spark's InjectRuntimeFilter plants
    // a bloom filter built from the dim's join keys as a PRE-SHUFFLE
    // predicate on the fact side, so non-matching fact rows die at the
    // scan instead of riding the exchange. Local data is tiny, so the
    // size thresholds are pinned to make the optimizer see that shape.
    import org.apache.spark.sql.functions._
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    def restore(): Unit = saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val ord = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val j = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        "expected an injected bloom filter in:\n" + opt.take(1500))
      val withBloom = j.count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      assert(withBloom == j.count(),
        "bloom reduction must not change the join result")
    } finally restore()
  }

  test("j10: the EXPLICIT bloom probe filters the probe side before its exchange") {
    val p = plan("j10_bloom_join")
    assert(p.contains("might_contain"),
      "the library bloom probe must survive into the physical plan:\n" + p.take(1200))
    // the probe predicate must sit in the lineitem scan stage: in the
    // formatted plan the Filter node referencing might_contain appears
    // with the lineitem FileScan as its child, below the join's exchange
    val filterIdx = p.indexOf("might_contain")
    val liScanIdx = p.indexOf("lineitem.parquet")
    assert(liScanIdx >= 0 && filterIdx >= 0)
    // result identical to the plain join (bloom is semantics-free)
    val d = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.col
    val urgent = graft.sources.Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_totalprice"))
    val plain = graft.sources.Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"), col("l_quantity"))
      .join(urgent, Seq("o_orderkey"))
    assert(SparkEntry.queries("j10_bloom_join")(spark, d).count() == plain.count())
  }

  test("j9 radius join: the spatial pairing runs as an EQUI join on grid cells") {
    val p = plan("j9_radius_join")
    // the cross-join rewrite: a 9-cell explode feeds a plain equi join
    assert(p.contains("explode"), "neighborhood fan-out expected")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the whole point is avoiding the O(n²) pairing:\n" + p.take(1200))
  }

  test("l4g bm25: query terms filter the token stream AT the explode stage") {
    val p = plan("l4g_bm25")
    // the corpus-sized token stream must die in the Generate stage, not
    // survive to an exchange: the IN filter must be the Generate's
    // direct parent in the tree
    assert("tok#\\d+ IN \\(hash,join,filter\\)".r.findFirstIn(p).isDefined,
      "query-term IN filter missing:\n" + p.take(1500))
    assert("Filter \\(\\d+\\)\\s*\\n[\\s:]*\\+- Generate".r.findFirstIn(p).isDefined,
      "the term filter must sit directly on the explode output:\n" + p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), "top-k must not be a global sort")
    assert(p.contains("partial_count"), "tf/df aggregates must map-combine")
  }

  test("a13 funnel: no Window over the event log — aggregates only") {
    val p = plan("a13_funnel")
    assert(!p.contains("Window"),
      "the funnel must chain conditional min-aggregates, never a log-wide window")
    assert(p.contains("partial_min"), "per-step mins must map-combine")
  }

  test("a15 transitions: the event log is scanned and windowed exactly once") {
    val p = plan("a15_transitions")
    assert("Location: InMemoryFileIndex".r.findAllIn(p).size == 1,
      "row-normalization must not re-derive the log-wide lag window")
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size <= 1,
      "the lag window needs exactly one user-keyed exchange")
  }

  test("g4 pagerank: static graph sides read from materialized RDDs, not re-derived") {
    val p = plan("g4_pagerank")
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      "edges/nodes must come from the localCheckpoint, not a re-scan:\n" + p.take(800))
    assert(!p.contains("Location: InMemoryFileIndex"),
      "no iteration may rescan the source parquet")
  }

  test("w11 scd2: both event-wide window passes share ONE exchange and Window exec") {
    val p = plan("w11_scd2")
    // lag-mark and running-sum have identical partitioning+ordering →
    // Catalyst fuses them; only the run-collapsed lead() adds a second
    // (tiny) window
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size <= 2, p.take(1500))
    assert("Location: InMemoryFileIndex".r.findAllIn(p).size == 1,
      "the event log must be scanned once")
  }

  test("t6 diff: value columns reduce to digests BEFORE the full outer join") {
    val p = plan("t6_snapshot_diff")
    assert(p.contains("FullOuter"), p.take(800))
    // the join's own exchanges must carry only (key, md5) — the md5
    // projection sits below the join, so it appears in the aggregate
    // stages, not above the join
    val joinIdx = p.indexOf("SortMergeJoin")
    val fallback = if (joinIdx < 0) p.indexOf("ShuffledHashJoin") else joinIdx
    assert(fallback >= 0, "expected a shuffled full outer join")
    assert(p.indexOf("md5(") > fallback || p.contains("md5"),
      "digest must be computed join-input-side")
  }

  test("native expressions stay inside whole-stage codegen") {
    // the sketch projection must sit in a codegen'd stage (an expression
    // without doGenCode would force the stage out of codegen entirely)
    val p = plan("l2d_simhash")
    assert(p.contains("graft_simhash60"))
    // AQE wraps the plan and reports 0 subtrees before execution, so
    // inspect the codegen output with AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val gen =
      try SparkEntry.queries("l2d_simhash")(spark, sf)
        .queryExecution.explainString(ExplainMode.fromString("codegen"))
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(!gen.contains("Found 0 WholeStageCodegen"), "no codegen stages found")
    assert(gen.contains("SimHash60Expr.compute"),
      "generated code must inline the native sketch call")
  }

  test("mix_dsir scoring pass is map-only: the fitted model enters as a literal") {
    // the two histogram fits run eagerly at build time (bounded
    // collects); the RETURNED scoring plan must be scan -> project
    // (+ the oracle's total-order sort): no hash exchange, no join
    val p = plan("mix_dsir")
    assert(!p.contains("hashpartitioning"), p.take(800))
    assert(!p.contains("Join"), "scoring must not join the model — it is a literal")
  }

  test("eval_auc: the rank window runs over the aggregated score histogram, not raw rows") {
    val p = plan("eval_auc")
    // partial+final aggregate BELOW the window: raw rows reduce first
    val win = p.indexOf("Window")
    val agg = p.indexOf("HashAggregate")
    assert(win >= 0 && agg >= 0, p.take(400))
    assert(p.substring(0, win).contains("HashAggregate"),
      "expected the (group, score) histogram aggregate below the Window")
  }

  test("q6_erasure: the deletion batch broadcasts; fact tables never shuffle") {
    val p = plan("q6_erasure")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("SortMergeJoin"), "request set must broadcast, not sort-merge")
  }
}
