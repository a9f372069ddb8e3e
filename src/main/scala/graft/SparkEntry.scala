package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.SignalFunctions
import graft.functions.TextFunctions
import graft.functions.VectorFunctions
import graft.operators.{Dedup, LivingArea, Multimodal, Similarity, TextAnalysis, Trilateration}
import graft.sources.Tables

/** Driver contract (SURVEY.md §7): one named query per implemented
  * operator row of SURVEY.md §2, each with a DuckDB-runnable ANSI-SQL
  * twin in [[oracleSql]] over the same parquet tables.
  *
  * Determinism rules (SURVEY.md §7.5): every query totally ordered,
  * float aggregates rounded, timestamps rendered as strings at the edge,
  * computed integers widened to BIGINT on both sides, UTC session tz.
  */
object SparkEntry {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  /** Deterministic synthetic URL per document (testdata carries no URL
    * column): case/subdomain/TLD/slash/query variants keyed off
    * decorrelated doc_id moduli, so canonicalization and domain
    * extraction have real work to do. The DuckDB twin re-derives the
    * identical string ([[UrlSynthSql]]). */
  private def synthUrl: org.apache.spark.sql.Column = {
    val sub = when(col("doc_id") % 7 < 4, lit("www.")).otherwise(lit("cdn."))
    val hostCore = when(col("doc_id") % 5 === 0, upper(col("source"))).otherwise(col("source"))
    val tld = when(col("doc_id") % 11 < 6, lit(".com")).otherwise(lit(".org"))
    val slash = when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit(""))
    val query = when(col("doc_id") % 2 === 0,
      concat(lit("?utm_source=feed&ref="), col("doc_id").cast("string"))).otherwise(lit(""))
    concat(lit("https://"), sub, hostCore, tld, lit("/docs/"),
      (col("doc_id") % 97).cast("string"), slash, query)
  }

  /** Synthetic multi-sensor geometry shared by living_area and
    * geo_cell_census: 50 devices on a 10×10 grid, sensor positions and
    * exact distances derived from lineitem keys (truth known, so the
    * trilateration solve is verifiable). */
  private def sensorGeometry(s: SparkSession, d: String) =
    li(s, d).select(
      (col("l_orderkey") % 50).as("mac"),
      month(col("l_shipdate")).as("bucket"),
      (col("l_suppkey") % 10).cast("double").as("x"),
      floor((col("l_suppkey") % 100) / 10).cast("double").as("y"))
      .withColumn("d", sqrt(
        pow(col("x") - (col("mac") % 10).cast("double"), 2) +
        pow(col("y") - ((col("mac") * 7) % 10).cast("double"), 2)))

  /** Flagship (TPC-H Q1 shape — scan, pushed filter, partial+final hash
    * agg, sort; SURVEY.md §7.3) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  // ================================================================
  // queries — name -> (spark, sfDir) => DataFrame
  // ================================================================
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- flagship: scan → filter → hash agg → sort (§7.3) ----
    "q1_agg" -> ((s, d) => li(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")),

    // ---- P6: range predicate pushed to the parquet scan ----
    "p6_range_filter" -> ((s, d) => li(s, d)
      .filter(col("l_quantity") <= 5 && col("l_discount") >= 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
      .orderBy("l_orderkey", "l_linenumber")),

    // ---- J1: equi inner join, small dims broadcast ----
    "j1_broadcast_join" -> ((s, d) => Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("n_name")
      .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("n_name")),

    // ---- J2: self-join on (key, time-bucket) — trilateration prereq ----
    "j2_self_join" -> ((s, d) => {
      val e = ev(s, d).select(col("user_id"), col("event_id"),
        date_trunc("hour", col("ts")).as("hb"))
      e.as("a").join(e.as("b"),
          col("a.user_id") === col("b.user_id") && col("a.hb") === col("b.hb") &&
          col("a.event_id") < col("b.event_id"))
        .groupBy(col("a.user_id").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    }),

    // ---- J3 (batch form): watchlist semi join — the stream-static
    //      broadcast-semi shape (StreamingSpec drives the live form).
    //      The watchlist derives small (users with a big purchase) and
    //      BROADCASTS, so the fact side never shuffles: at 100 TB the
    //      probe is a map-side bloom/hash check on the scan ----
    "j3_semi_join" -> ((s, d) => {
      val e = ev(s, d)
      val watch = e.filter(col("event_type") === "purchase" && col("value") >= 300)
        .select("user_id").distinct()
      e.join(broadcast(watch), Seq("user_id"), "left_semi")
        .select(col("event_id"), col("user_id"))
        .orderBy("event_id")
    }),

    // ---- J4: left anti (never-seen detection: parts never bulk-ordered) ----
    "j4_anti_join" -> ((s, d) => Tables.part(s, d)
      .join(li(s, d).filter(col("l_quantity") >= 45),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"))
      .orderBy("p_partkey")),

    // ---- J5: interval (as-of tolerance) join ----
    "j5_interval_join" -> ((s, d) => {
      val e = ev(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id").as("puser"), col("ts").as("pts"))
      p.join(e,
          col("user_id") === col("puser") &&
          col("ts") >= col("pts") - expr("INTERVAL 1 MINUTE") &&
          col("ts") <= col("pts") && col("event_id") =!= col("pid"), "left_outer")
        .groupBy("pid").agg(count(col("event_id")).as("n_prior"))
        .orderBy("pid")
    }),

    // ---- J5b: KEYLESS interval join via binning (RangeJoin) — global
    //      activity in the minute before each purchase. No equi key at
    //      all, so the naive plan is BroadcastNestedLoopJoin (O(n·m),
    //      memory-bound — dead at 100 TB); binning turns it into a
    //      shuffled equi join on the time bin (PlanSpec proves it) ----
    "j5b_binned_interval" -> ((s, d) => {
      val e = ev(s, d).select(col("event_id"), col("ts"))
      val p = ev(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"),
          (col("ts") - expr("INTERVAL 1 MINUTE")).as("w_start"),
          col("ts").as("w_end"))
      val pairs = graft.operators.RangeJoin.pointInInterval(
          e, p, "ts", "w_start", "w_end", keys = Nil, binSeconds = 60L)
        .filter(col("event_id") =!= col("pid"))
      p.select(col("pid"))
        .join(pairs.groupBy("pid").agg(count(lit(1)).as("n_win")),
          Seq("pid"), "left")
        .select(col("pid"), coalesce(col("n_win"), lit(0L)).as("n_win"))
        .orderBy("pid")
    }),

    // ---- J7: as-of join (custom LogicalPlan+Strategy+SparkPlan —
    //      sort-merge scan; latest purchase at-or-before each click) ----
    "j7_asof_join" -> ((s, d) => {
      val e = ev(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id").as("r_user"), col("ts").as("pts"))
        .agg(max("event_id").as("purchase_id"))
      graft.operators.AsOf.join2(clicks, purchases,
          Seq("user_id"), Seq("r_user"), "ts", "pts", toleranceUs = -1L)
        .select(col("click_id"), col("purchase_id"),
          (unix_millis(col("ts")) - unix_millis(col("pts"))).as("gap_ms"))
        .orderBy("click_id")
    }),

    // ---- J7b: FORWARD as-of (earliest purchase at-or-after each
    //      click) — the same backward AsOfJoinExec run on negated
    //      epoch-micros: "latest at-or-before" on the negated axis IS
    //      "earliest at-or-after" on the real one. One operator, both
    //      directions; oracle = DuckDB ASOF with the <= inequality ----
    "j7b_asof_forward" -> ((s, d) => {
      val e = ev(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts"))
        .withColumn("neg_ts", -unix_micros(col("ts")))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id").as("r_user"), col("ts").as("pts"))
        .agg(max("event_id").as("purchase_id"))
        .withColumn("neg_pts", -unix_micros(col("pts")))
      graft.operators.AsOf.join2(clicks, purchases,
          Seq("user_id"), Seq("r_user"), "neg_ts", "neg_pts", toleranceUs = -1L)
        .select(col("click_id"), col("purchase_id"),
          (unix_millis(col("pts")) - unix_millis(col("ts"))).as("gap_ms"))
        .orderBy("click_id")
    }),

    // ---- J6: outer joins (network-tree completeness) ----
    "j6_left_outer" -> ((s, d) => Tables.nation(s, d)
      .join(Tables.customer(s, d), col("c_nationkey") === col("n_nationkey"), "left_outer")
      .groupBy("n_name").agg(count(col("c_custkey")).as("n_customers"))
      .orderBy("n_name")),

    "j6_full_outer" -> ((s, d) => {
      val e = ev(s, d)
      val c = e.filter(col("event_type") === "click").groupBy("user_id")
        .agg(count(lit(1)).as("n_clicks"))
      val p = e.filter(col("event_type") === "purchase").groupBy("user_id")
        .agg(count(lit(1)).as("n_purchases"))
      c.join(p, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
        .orderBy("user_id")
    }),

    // ---- J8: correlated EXISTS + scalar subquery (Catalyst
    //      decorrelates both into joins — §4.2; SQL front door) ----
    "j8_subqueries" -> ((s, d) => {
      Tables.part(s, d).createOrReplaceTempView("part_sq")
      li(s, d).createOrReplaceTempView("lineitem_sq")
      s.sql("""
        SELECT p_partkey, p_name
        FROM part_sq
        WHERE EXISTS (SELECT 1 FROM lineitem_sq
                      WHERE l_partkey = p_partkey AND l_quantity >= 48)
          AND p_retailprice > (SELECT avg(p_retailprice) FROM part_sq)
        ORDER BY p_partkey""")
    }),

    // ---- A1: group-count per device ----
    "a1_count_by_key" -> ((s, d) => ev(s, d)
      .groupBy("user_id").agg(count(lit(1)).as("n")).orderBy("user_id")),

    // ---- A2: distinct sets per key ----
    "a2_distinct_sets" -> ((s, d) => ev(s, d)
      .groupBy("user_id")
      .agg(countDistinct("event_type").as("n_types"),
        concat_ws(",", sort_array(collect_set(col("event_type")))).as("types"))
      .orderBy("user_id")),

    // A2 at fleet scale: HLL++ sketch (no oracle — approximate by design;
    // rows-only check + ScalaTest bounds it against the exact count).
    "a2b_approx_distinct" -> ((s, d) => ev(s, d)
      .groupBy("event_type")
      .agg(approx_count_distinct("user_id").as("approx_users"),
        countDistinct("user_id").as("exact_users"))
      .orderBy("event_type")),

    // A2c — MERGEABILITY is the 100 TB story: per-day DataSketches HLL
    // sketches union into the global cardinality without re-reading the
    // days (incremental census over a partitioned fact table). Rows-only
    // (approximate by design); SketchSpec pins union-estimate == direct
    // whole-table estimate and bounds it against the exact count.
    "a2c_hll_union" -> ((s, d) => ev(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))),

    // A11 — approximate heavy hitters (frequent-items sketch): the
    // exact per-key count (A1) needs a full shuffle of every key; the
    // sketch is fixed-size, map-combined, and MERGEABLE — per-partition
    // sketches combine like A2c's HLL, so "top talkers" over 100 TB is
    // one sketch per partition + a tiny final merge, no key shuffle.
    // Rows-only (approximate by design); SketchSpec pins
    // accumulate→combine→estimate == direct and == exact counts on a
    // skewed corpus.
    "a11_topk_sketch" -> ((s, d) => ev(s, d)
      .agg(expr("approx_top_k(user_id, 10)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("user_id"), col("e.count").as("est"))
      .orderBy(col("est").desc, col("user_id"))),

    // ---- A3: min/max/avg measures ----
    "a3_stats" -> ((s, d) => li(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(min("l_quantity").as("min_qty"),
        max("l_extendedprice").as("max_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")),

    // ---- A4: per-key ordered timestamp list (the ref's "CSV field") ----
    "a4_ts_lists" -> ((s, d) => ev(s, d)
      .groupBy("user_id")
      .agg(concat_ws(",", sort_array(collect_list(
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSS")))).as("ts_csv"))
      .orderBy("user_id")),

    // ---- A5: time-bucketed activity histogram ----
    "a5_active_hours" -> ((s, d) => ev(s, d)
      .groupBy(hour(col("ts")).cast("long").as("hr"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("hr", "event_type")),

    // ---- A6: rollup (multi-granularity census) ----
    "a6_rollup" -> ((s, d) => li(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("n"), col("sum_qty"))
      .orderBy("rflag", "lstatus")),

    // ---- A6b: cube (all granularity combinations) ----
    "a6b_cube" -> ((s, d) => ev(s, d)
      .cube(col("event_type"), dayofweek(col("ts")).as("dow"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v"))
      .select(coalesce(col("event_type"), lit("ALL")).as("etype"),
        coalesce(col("dow").cast("long"), lit(-1L)).as("dow"),
        col("n"), col("sum_v"))
      .orderBy("etype", "dow")),

    // ---- A7: trilateration (ssidentity.c:35) — least-squares in sums ----
    "a7_trilateration" -> ((s, d) => {
      val obs = li(s, d).select(
        (col("l_orderkey") % 50).as("mac"),
        (col("l_suppkey") % 10).cast("double").as("x"),
        floor((col("l_suppkey") % 100) / 10).cast("double").as("y"),
        (col("l_suppkey") % 100).as("sensor"))
        .withColumn("d", sqrt(
          pow(col("x") - (col("mac") % 10).cast("double"), 2) +
          pow(col("y") - ((col("mac") * 7) % 10).cast("double"), 2)))
      Trilateration.estimate(obs, Seq("mac"), col("x"), col("y"), col("d"))
        .orderBy("mac")
    }),

    // ---- §3.3: living-area pipeline (bucket → trilaterate → modal cell) ----
    "living_area" -> ((s, d) =>
      LivingArea.modalLocation(sensorGeometry(s, d)).orderBy("mac")),

    // ---- domain: spatial cell census over trilaterated homes — the
    //      z-value grid cell (O4's curve) as a geohash-style spatial
    //      index key: devices per cell, the heat-map/partition key a
    //      city-wide deployment reports and prunes by ----
    // ---- GEO: grid hotspots — 3×3 neighborhood sums via a 9-key
    //      map-side explode + one equi groupBy (never a distance
    //      join); hot flag in exact integer arithmetic. Oracle replays
    //      the neighborhood as a range self-join — a different
    //      algorithm agreeing is the stronger check. Input: the
    //      customer population on a (balance-band × nation) grid —
    //      occupancy varies, so both flag values occur ----
    // hot emitted as 0/1 BIGINT (not BOOLEAN) so the driver hash never
    // sees an engine-specific boolean rendering; DuckDB twin casts its
    // HUGEINT sums to BIGINT for the same reason
    "geo_hotspots" -> ((s, d) =>
      graft.operators.Hotspot.gridHotspots(
          Tables.customer(s, d).select(
            floor(col("c_acctbal") / 1000).as("cx"),
            col("c_nationkey").as("cy")),
          "cx", "cy", hotFactor = 1)
        .withColumn("hot", col("hot").cast("long"))
        .orderBy("cx", "cy")),

    "geo_cell_census" -> ((s, d) =>
      LivingArea.modalLocation(sensorGeometry(s, d))
        .select(graft.operators.ZOrder.zValue(
          pmod(col("home_x").cast("long"), lit(16)),
          pmod(col("home_y").cast("long"), lit(16)), bits = 4).as("zcell"))
        .groupBy("zcell").agg(count(lit(1)).as("n_devices"))
        .orderBy("zcell")),

    // ---- S2/P2/F1-F8 end-to-end: binary 802.11 frames built from events,
    //      parsed by the schema-on-read frame parser; the oracle predicts
    //      every decoded field directly from the event columns ----
    "s2_frame_parse" -> ((s, d) => {
      val e = Tables.spread(ev(s, d))  // per-row binary synth+parse is CPU-bound
      // layout per ssidentity.h:36-42 (0-based bytes): zeros 0-18,
      // freq BE 19-20, zero 21, rssi raw 22, proto 23, zeros 24-25,
      // subtype 0x40 at 26, zeros 27-29, broadcast dest 30-35,
      // src MAC 36-41, zeros 42-60, ssid len 61, ssid bytes 62+
      // hex pieces via lpad(hex(..)) — codegen'd string ops, not the
      // per-row java.util.Formatter that format_string compiles to
      // (measured ~2× on this synth-heavy query). Domain bound: the
      // src-MAC field is 48-bit by definition, so user_id must stay
      // below 2^48 — lpad would TRUNCATE longer hex (and the oracle's
      // printf would not), but a 13-hex-digit "MAC" is already outside
      // the frame format
      val hexFrame = concat(
        lit("0" * 38),
        lpad(hex(lit(2412) + (col("event_id") % 13) * 5), 4, "0"),
        lit("00"),
        lpad(hex(lit(165) + (col("event_id") % 30)), 2, "0"),
        lit("00" + "0000" + "40" + "000000" + "FFFFFFFFFFFF"),
        lpad(hex(col("user_id")), 12, "0"),
        lit("0" * 38),
        lpad(hex(length(col("event_type"))), 2, "0"),
        upper(hex(encode(col("event_type"), "US-ASCII"))))
      val frames = e.select(col("ts"), col("event_id").as("sensorId"),
        unhex(hexFrame).as("bytes"))
      graft.operators.FrameParser.parse(frames)
        .select(col("sensorId").as("event_id"), col("mac"), col("ssid"),
          col("rssi").cast("long").as("rssi"), col("freq").cast("long").as("freq"),
          col("dist"), col("valid"))
        .orderBy("event_id")
    }),

    // ---- W1: ranking — latest sighting per key ----
    "w1_latest_per_key" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      ev(s, d).withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .orderBy("user_id")
    }),

    // ---- W2: lag — inter-arrival gaps ----
    "w2_lag_gaps" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      ev(s, d)
        .withColumn("gap_ms", unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w)))
        .filter(col("gap_ms").isNotNull)
        .select(col("user_id"), col("event_id"), col("gap_ms"))
        .orderBy("user_id", "event_id")
    }),

    // ---- W3: frame-spec rolling aggregate ----
    "w3_rolling_avg" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-5, 0)
      ev(s, d)
        .select(col("user_id"), col("event_id"),
          round(avg(col("value")).over(w), 4).as("roll_avg"))
        .orderBy("user_id", "event_id")
    }),

    // ---- W4: global sequence (the obs.ID AUTOINCREMENT) ----
    // ---- W4: dense global sequence — sort + zipWithIndex, NOT a
    //      partitionless window (which would single-task every row) ----
    "w4_global_seq" -> ((s, d) =>
      graft.operators.DenseSequence
        .withSeq(ev(s, d).select(col("ts"), col("event_id")),
          Seq(col("ts"), col("event_id")))
        .select(col("seq"), col("event_id"))
        .orderBy("seq")),

    // ---- O1: global sort (+ pushdown-friendly projection) ----
    "o1_sort" -> ((s, d) => li(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
      .orderBy(col("ship_date"), col("l_orderkey"), col("l_linenumber"))
      .limit(1000)),

    // ---- O2: top-k (TakeOrderedAndProject, no full sort) ----
    "o2_topk" -> ((s, d) => Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)),

    // ---- O3: per-group top-k ("Interests", README.md:18) ----
    "o3_group_topk" -> ((s, d) => {
      val counts = ev(s, d).groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("user_id").orderBy(col("n").desc, col("event_type"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("event_type"), col("n"))
        .orderBy(col("user_id"), col("n").desc, col("event_type"))
    }),

    // ---- T1: union (sensor-fleet merge S5) ----
    "t1_union" -> ((s, d) => {
      val e = ev(s, d)
      e.filter(col("value") > 450).select("event_type")
        .unionByName(e.filter(col("value") < 5).select("event_type"))
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // ---- T2: intersect (co-location) ----
    "t2_intersect" -> ((s, d) => {
      val e = ev(s, d)
      e.filter(col("event_type") === "click")
        .select(col("user_id"), hour(col("ts")).cast("long").as("hr"))
        .intersect(e.filter(col("event_type") === "purchase")
          .select(col("user_id"), hour(col("ts")).cast("long").as("hr")))
        .orderBy("user_id", "hr")
    }),

    // ---- T3: except (arrived/departed diff) ----
    "t3_except" -> ((s, d) => {
      val e = ev(s, d)
      e.filter(col("event_type") === "click")
        .select(col("user_id"), hour(col("ts")).cast("long").as("hr"))
        .except(e.filter(col("event_type") === "purchase")
          .select(col("user_id"), hour(col("ts")).cast("long").as("hr")))
        .orderBy("user_id", "hr")
    }),

    // ---- T2b/T3b: MULTISET set ops (bag semantics — multiplicities
    //      survive, unlike the distinct-set t2/t3 forms). Output
    //      re-aggregated to (key, multiplicity) for a stable order ----
    "t2b_intersect_all" -> ((s, d) => {
      val e = ev(s, d)
      e.filter(col("event_type") === "view").select("user_id")
        .intersectAll(e.filter(col("event_type") === "click").select("user_id"))
        .groupBy("user_id").agg(count(lit(1)).as("multiplicity"))
        .orderBy("user_id")
    }),

    "t3b_except_all" -> ((s, d) => {
      val e = ev(s, d)
      e.filter(col("event_type") === "view").select("user_id")
        .exceptAll(e.filter(col("event_type") === "click").select("user_id"))
        .groupBy("user_id").agg(count(lit(1)).as("multiplicity"))
        .orderBy("user_id")
    }),

    // ---- T4: dedup (duplicate frames, fixture rows 3-4) ----
    "t4_dedup" -> ((s, d) => ev(s, d)
      .dropDuplicates("user_id", "event_type")
      .select("user_id", "event_type")
      .orderBy("user_id", "event_type")),

    // ---- F4: MAC format (%012lX, ssidentity.c:181) ----
    "f4_mac_format" -> ((s, d) => Tables.orders(s, d)
      .select(col("o_orderkey"), SignalFunctions.formatMac(col("o_orderkey")).as("mac"))
      .orderBy("o_orderkey").limit(1000)),

    // ---- F5: printable check / non-printable census (sanitize flag) ----
    "f5_printable" -> ((s, d) => Tables.documents(s, d)
      .select(col("doc_id"),
        SignalFunctions.isPrintable(col("text")).as("is_printable"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[\\x20-\\x7E]", ""))).cast("long")
          .as("n_printable"))
      .orderBy("doc_id")),

    // ---- F6: display timestamp (strftime "%x - %I:%M%p") ----
    "f6_ts_render" -> ((s, d) => ev(s, d)
      .select(col("event_id"), SignalFunctions.renderTs(col("ts")).as("ts_fmt"))
      .orderBy("event_id").limit(2000)),

    // ---- F8: FSPL distance (signalToDistance, ssidentity.c:283-286) ----
    "f8_fspl" -> ((s, d) => ev(s, d)
      .select(col("event_id"),
        (-(col("event_id") % 60 + 30)).as("rssi"),
        (lit(2412) + (col("event_id") % 13) * 5).as("freq"))
      .withColumn("dist_m", SignalFunctions.fsplDistance2dp(col("rssi"), col("freq")))
      .orderBy("event_id")),

    // ---- F10: console row render (printf, ssidentity.c:89-95) ----
    "f10_render" -> ((s, d) => ev(s, d)
      .select(col("event_id"), SignalFunctions.renderRow(
        col("ts"), SignalFunctions.formatMac(col("user_id")), col("event_type"),
        (-(col("event_id") % 60 + 30)).cast("int"),
        (lit(2412) + (col("event_id") % 13) * 5).cast("int"),
        SignalFunctions.fsplDistance(-(col("event_id") % 60 + 30),
          lit(2412) + (col("event_id") % 13) * 5)).as("line"))
      .orderBy("event_id").limit(2000)),

    // ---- F13: keyed pseudonymization — device MACs are PII; the fleet
    //      design (S5, "deploy en masse") needs stable, irreversible
    //      per-device tokens that survive cross-sensor joins. One
    //      codegen'd hash pass, referential integrity preserved ----
    // md5 (not sha2): the driver's DuckDB version is unknown and
    // sha256() only exists in duckdb >= 0.10; md5() is universal. The
    // demo property (stable, keyed, irreversible-enough token) is
    // identical — swap in sha2 for production strength.
    "f13_pseudonymize" -> ((s, d) => ev(s, d)
      .select(col("event_id"),
        substring(md5(concat(lit("pepper:"),
          col("user_id").cast("string"))), 1, 16).as("pseudo_user"))
      .orderBy("event_id")),

    // ---- F11: JSON extraction (events.props) ----
    "f11_json" -> ((s, d) => ev(s, d)
      .groupBy("event_type")
      .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
        count(lit(1)).as("n"))
      .orderBy("event_type")),

    // ---- F14: VARIANT semi-structured path (Spark 4) — parse once
    //      into the binary-encoded VARIANT, then typed field reads:
    //      no per-field JSON re-parse (f11's get_json_object re-walks
    //      the string per extraction — the 100 TB telemetry table
    //      wants the one-parse encoding). try_variant_get on a
    //      missing path degrades to NULL, never a thrown row ----
    "f14_variant" -> ((s, d) => ev(s, d)
      .select(col("event_id"), col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"),
        expr("try_variant_get(parse_json(props), '$.missing', 'bigint')")
          .as("missing_path"),
        expr("schema_of_variant(parse_json(props))").as("sch"))
      .orderBy("event_id")),

    // ---- F12: array ops over embeddings ----
    "f12_array_ops" -> ((s, d) => Tables.embeddings(s, d)
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(VectorFunctions.norm(col("embedding")), 4).as("l2"),
        round(aggregate(VectorFunctions.asDouble(col("embedding")),
          lit(0.0), (a, x) => a + x), 4).as("sum_e"))
      .orderBy("vec_id")),

    // ---- ST2 (batch twin): tumbling event-time window ----
    "st2_tumbling_window" -> ((s, d) => ev(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"))
      .orderBy("window_start", "event_type")),

    // ---- ST3 (batch twin): sliding event-time window ----
    "st3_sliding_window" -> ((s, d) => ev(s, d)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"))
      .orderBy("window_start", "event_type")),

    // ---- ST4 (batch twin): session windows (dwell segmentation) ----
    "st4_session_window" -> ((s, d) => ev(s, d)
      .groupBy(session_window(col("ts"), "15 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSS").as("session_start"),
        col("n"))
      .orderBy("user_id", "session_start")),

    // ---- ST5 (batch twin): watermark late-drop — the watermark is
    //      max(event time) − delay; rows older than it are the ones a
    //      24h-watermark streaming agg would have dropped. The cutoff
    //      is a 1-row broadcast, then the same tumbling agg as ST2 ----
    "st5_late_drop" -> ((s, d) => {
      val e = ev(s, d)
      val wm = e.agg(max(col("ts")).as("_max_ts"))
      e.crossJoin(broadcast(wm))
        .filter(col("ts") >= col("_max_ts") - expr("INTERVAL 24 HOURS"))
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"))
        .orderBy("window_start", "event_type")
    }),

    // ---- ST6 (batch twin): dedup-within-watermark — first occurrence
    //      per (key, 1h window), a bounded-state dedup's batch replay:
    //      one map-combinable min/count aggregate, never a window over
    //      the hot content key (same shape as L2j) ----
    "st6_dedup_first" -> ((s, d) => ev(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("user_id"), col("event_type"))
      .agg(min("event_id").as("first_event_id"), count(lit(1)).as("n_heard"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("user_id"), col("event_type"), col("first_event_id"), col("n_heard"))
      .orderBy("window_start", "user_id", "event_type")),

    // ---- ST7 (batch twin): arrival/reappearance alerts (README.md:19)
    //      — the REAL flatMapGroupsWithState operator run in batch mode
    //      (one "micro-batch" per key, no prior state), oracle-replayed
    //      as a per-key lag-gap query. first_seen on a key's first
    //      sighting; reappeared when the gap exceeds 3600 s ----
    "st7_arrival_alerts" -> ((s, d) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val sightings = ev(s, d)
        .select(col("user_id").cast("string").as("mac"), col("ts"))
        .as[graft.streaming.ArrivalAlerts.Sighting]
      graft.streaming.ArrivalAlerts.alerts(sightings, gapSec = 3600L)
        .toDF()
        .select(col("mac"), col("kind"), unix_micros(col("ts")).as("ts_us"),
          col("gapSec").as("gap_sec"))
        .orderBy("mac", "ts_us")
    }),

    // ---- ST9 (batch twin): stream-stream co-observation join — the
    //      REAL coObservations operator (watermarks are no-ops on
    //      batch inputs, the tolerance-join predicate is identical) on
    //      a synthetic multi-sensor feed; pairDedup because both sides
    //      are the same feed. The oracle replays the tolerance join in
    //      SQL — VERDICT r6 #8: J2 covers only the equi case, this
    //      pins the watermarked interval semantics. r9: routed through
    //      the BOUNDED batch form (binned (mac, bin) equi key + the
    //      per-(mac, bin) density cap, mirrored in the oracle CTE) so
    //      one beacon-spamming mac can't go quadratic at scale ----
    "st9_co_observation" -> ((s, d) => {
      val obs = ev(s, d).select(col("user_id").as("mac"), col("ts"),
        (col("event_id") % 5).as("sensorId"))
      graft.streaming.PresenceAnalytics
        .boundedCoObservations(obs, obs, toleranceSec = 60,
          maxPerBucket = 32, pairDedup = true)
        .select(col("mac"), unix_micros(col("l_ts")).as("l_us"),
          col("l_sensor"), unix_micros(col("r_ts")).as("r_us"),
          col("r_sensor"))
        .orderBy("mac", "l_us", "l_sensor", "r_us", "r_sensor")
    }),

    // ---- CAPSTONE (VERDICT r8 #2): the reference's ENTIRE
    //      architecture end to end — sensor upload log → central
    //      store → query (README.md:12-13, ssidentity.c:30) — as one
    //      oracle-checkable row. The s2 frame-line contract
    //      (sensorId:epochMillis:base64(frame)) lands as four
    //      ver-ordered upload files; the REAL file-log streaming
    //      source consumes them (one micro-batch per file, offsets
    //      checkpointed), the REAL frame parser decodes them, and the
    //      bucketed MERGE store applies each batch exactly-once (the
    //      SinkSpec-hardened protocol). The returned snapshot replays
    //      in DuckDB as a T8-style winner-per-key CDC apply over the
    //      same log: batches are version-range ordered, so the store's
    //      last-batch-winner semantics reduce to global argmax(ver)
    //      per key, deletes dropping the key ----
    "capstone_ingest_store" -> ((s, d) =>
      graft.streaming.MergeSink
        .currentBucketedSnapshot(s, buildCapstoneStore(s, d, everyNth = 1L)).get
        .select("mac", "ssid", "rssi", "freq")
        .orderBy("mac")),

    // ---- CAPSTONE (r9): TIME TRAVEL over the same ingest→store
    //      pipeline — the store AS OF the second-to-last upload,
    //      replayed in DuckDB as the winner-per-key CDC apply over the
    //      matching PREFIX of the upload log (files split the ver
    //      range into quarters, so the 3-batch read point is exactly
    //      ver < (max+1)·3/4 — same integer arithmetic both sides).
    //      Pins bucketedSnapshotAt's manifest/schema resolution with a
    //      hard oracle, not just the SinkSpec fixture. Runs on the
    //      every-3rd-event slice to keep the second store build
    //      bench-honest ----
    "capstone_store_timetravel" -> ((s, d) => {
      val store = buildCapstoneStore(s, d, everyNth = 3L)
      val latest = graft.streaming.MergeSink.latestVersion(store).get
      require(latest == 3L,
        s"capstone expects 4 one-file micro-batches (got ${latest + 1})")
      graft.streaming.MergeSink.bucketedSnapshotAt(s, store, 2L)
        .select("mac", "ssid", "rssi", "freq")
        .orderBy("mac")
    }),

    // ---- CAPSTONE (r9): CHANGE DATA FEED over the same pipeline —
    //      the typed row-level changes between two store versions
    //      (table_changes v1→v3), computed with MANIFEST PRUNING:
    //      only buckets whose owning version differs between the two
    //      manifests are read (immutable version dirs make an
    //      unchanged owner proof of unchanged bytes). Replayed in
    //      DuckDB as the full-outer diff of the two winner-per-key
    //      prefix states (version v ↦ upload-log prefix
    //      ver < (max+1)·(v+1)/4 — the time-travel quarter
    //      arithmetic). Runs on the every-5th-event slice to keep the
    //      extra store build bench-honest ----
    "capstone_store_cdf" -> ((s, d) => {
      val store = buildCapstoneStore(s, d, everyNth = 5L)
      graft.streaming.MergeSink.storeChangesBetween(s, store, 1L, 3L)
        .orderBy("mac")
    }),

    // ---- CAPSTONE (r9): IVM driven by the change feed — the
    //      materialized per-ssid (count, rssi-sum) view at v1 is
    //      MAINTAINED to v3 by applying the typed feed as signed
    //      deltas (update = retract old + assert new), never
    //      rescanning the store; the oracle RECOMPUTES the v3 view
    //      from scratch, so a feed that missed, duplicated or
    //      misclassified any change would hash-mismatch. The
    //      delta-maintenance contract a 100 TB rollup lives by:
    //      O(changeset), not O(history). Every-7th-event slice ----
    "capstone_store_ivm" -> ((s, d) => {
      val store = buildCapstoneStore(s, d, everyNth = 7L)
      val MS = graft.streaming.MergeSink
      val baseState = MS.bucketedSnapshotAt(s, store, 1L)
        .groupBy("ssid")
        .agg(count(lit(1)).as("n"), sum("rssi").as("vsum"))
      // the feed is read by BOTH delta branches (retract old / assert
      // new) — materialize the changed-rows-sized table once
      val feed = graft.operators.Checkpoint(
        MS.storeChangesBetween(s, store, 1L, 3L))
      val changes = feed.filter(col("change") =!= "insert")
          .select(col("ssid_old").as("ssid"),
            col("rssi_old").as("v"), lit(-1L).as("sgn"))
        .unionByName(feed.filter(col("change") =!= "delete")
          .select(col("ssid_new").as("ssid"),
            col("rssi_new").as("v"), lit(1L).as("sgn")))
      graft.operators.Snapshot.incrementalAgg(baseState, changes,
          Seq("ssid"), "v", "sgn")
        .orderBy("ssid")
    }),

    // ---- CAPSTONE (r9): ERASURE (right-to-be-forgotten) over the
    //      store — every user_id ≡ 0 (mod 7) is erased from ALL
    //      retained history after ingest; the snapshot replays as the
    //      CDC apply MINUS the erased subjects. The history-wide
    //      removal itself (time travel no longer shows the subject)
    //      is the SinkSpec erasure case; this row pins the end state
    //      against DuckDB ----
    "capstone_store_erasure" -> ((s, d) =>
      // the build-and-erase is the PIPELINE (cached, timed by Bench's
      // pipelines section); the query is the post-erasure read
      graft.streaming.MergeSink
        .currentBucketedSnapshot(s, erasedCapstoneStore(s, d)).get
        .select("mac", "ssid", "rssi", "freq")
        .orderBy("mac")),

    // ---- CAPSTONE (r12, VERDICT r11 #1): the SQL FRONT DOOR — the
    //      same ingest→store state read back through
    //      spark.read.format("graft") (DSv2 TableProvider, V1Scan
    //      body, graft.sources.GraftDataSource) and queried as AD-HOC
    //      SQL over a registered view — the reference's declared query
    //      interface (ssidentity.c:17-18). Oracle UNCHANGED from
    //      capstone_ingest_store: the door must be a transparent
    //      window onto the store. Reuses the cached everyNth=1 store —
    //      zero extra pipeline cost ----
    "capstone_store_sql_door" -> ((s, d) => {
      val store = buildCapstoneStore(s, d, everyNth = 1L)
      s.read.format("graft").load(store).createOrReplaceTempView("graft_obs")
      s.sql("SELECT mac, ssid, rssi, freq FROM graft_obs ORDER BY mac")
    }),

    // ---- CAPSTONE (r12): TIME TRAVEL as a READ OPTION through the
    //      door (a table format's VERSION AS OF) — versionAsOf=2 over
    //      the cached everyNth=3 store; oracle UNCHANGED from
    //      capstone_store_timetravel ----
    "capstone_store_sql_asof" -> ((s, d) => {
      val store = buildCapstoneStore(s, d, everyNth = 3L)
      s.read.format("graft").option("versionAsOf", "2").load(store)
        .select("mac", "ssid", "rssi", "freq")
        .orderBy("mac")
    }),

    // ---- CAPSTONE (r15, VERDICT r14 #1): MANIFEST DATA SKIPPING on
    //      the driver surface — a NON-KEY range predicate through the
    //      door: the pushed filters prune FILES via the commit-time
    //      `_stats` sidecars before any footer is read
    //      (FileSkippingSpec proves the physical skip with corrupted
    //      excluded files; this pins the ANSWER under the pruned
    //      plan). Oracle = the ingest_store replay with the same
    //      range predicate. Reuses the cached everyNth=1 store ----
    "capstone_store_range_scan" -> ((s, d) => {
      val store = buildCapstoneStore(s, d, everyNth = 1L)
      s.read.format("graft").load(store)
        .filter(col("rssi") >= -70L && col("freq") <= 2437L)
        .select("mac", "ssid", "rssi", "freq")
        .orderBy("mac")
    }),

    // ---- CAPSTONE (r16, VERDICT r15 #3): COMPOUND MERGE KEY — the
    //      store keyed on (mac, ssid), routing hashed over the full
    //      tuple; an UPDATE rewrite and a deletion-vector DELETE land
    //      through the SQL door; the head reads back via
    //      format("graft"). Oracle replays the aggregate + the two
    //      DML layers ----
    "capstone_store_compound" -> ((s, d) => {
      val store = compoundCapstoneStore(s, d)
      s.read.format("graft").load(store)
        .select("mac", "ssid", "rssi", "freq")
        .orderBy("mac", "ssid")
    }),

    // ---- CAPSTONE (r12): the SQL door's WRITE half — an ad-hoc
    //      DataFrame append lands as a keyed MERGE upsert through the
    //      OCC commit protocol, then the head reads back through
    //      format("graft"): the full write→commit→read round trip,
    //      oracle-replayed as the base CDC apply overridden by the
    //      upsert layer. Every-11th slice, cached as pipeline ----
    "capstone_store_sql_write" -> ((s, d) => {
      val store = sqlWriteCapstoneStore(s, d)
      s.read.format("graft").load(store)
        .select("mac", "ssid", "rssi", "freq")
        .orderBy("mac")
    }),

    // ---- CAPSTONE (r12): SQL DELETE through the door — an arbitrary
    //      predicate retracts matching keys at HEAD in one OCC CDC
    //      commit; the oracle replays base CDC apply WITH the
    //      predicate excluded. History keeps the rows (erasure is the
    //      separate, history-destroying verb). Every-13th slice ----
    "capstone_store_sql_delete" -> ((s, d) =>
      graft.streaming.MergeSink
        .currentBucketedSnapshot(s, sqlDeleteCapstoneStore(s, d)).get
        .select("mac", "ssid", "rssi", "freq")
        .orderBy("mac")),

    // ---- CAPSTONE (r12, VERDICT r11 #2): SCHEMA EVOLUTION — ADD
    //      COLUMNS as a metadata-only commit over the ingest→store
    //      pipeline, then a write-NEW batch (supplies the new column)
    //      and a write-OLD batch (predates it — full-row upsert,
    //      column reads null). The oracle replays the null-backfill
    //      algebra: base CDC apply, overridden by the two post-
    //      evolution writer layers. Every-9th slice, steps cached as
    //      pipeline ----
    "capstone_store_evolution" -> ((s, d) =>
      graft.streaming.MergeSink
        .currentBucketedSnapshot(s, evolvedCapstoneStore(s, d)).get
        .select("mac", "ssid", "rssi", "freq", "tag")
        .orderBy("mac")),

    // ---- CAPSTONE (r14, VERDICT r13 #3): MERGE WITH SCHEMA
    //      EVOLUTION through the catalog door — one statement, two
    //      commits (metadata-only addColumns + the CDC batch). The
    //      oracle replays the base CDC apply overridden by the merge
    //      arms, with the evolved column null-backfilled elsewhere.
    //      Every-17th slice, cached as pipeline ----
    "capstone_store_merge_evolve" -> ((s, d) =>
      graft.streaming.MergeSink
        .currentBucketedSnapshot(s, mergeEvolveCapstoneStore(s, d)).get
        .select("mac", "ssid", "rssi", "freq", "note")
        .orderBy("mac")),

    // ---- domain: MAC↔SSID network tree (ssidentity.c:36) ----
    "net_tree_edges" -> ((s, d) =>
      graft.operators.NetworkTree.edges(
          ev(s, d).select(col("user_id").as("mac"), col("event_type").as("ssid")))
        .orderBy("mac", "ssid")),

    // ---- domain: device adjacency ("Interests" top SSIDs per device) ----
    "net_tree_adjacency" -> ((s, d) =>
      graft.operators.NetworkTree.deviceAdjacency(
          ev(s, d).select(col("user_id").as("mac"), col("event_type").as("ssid")))
        .select(col("mac"), col("degree"),
          concat_ws(",", col("ssids")).as("ssids_csv"))
        .orderBy("mac")),

    // ---- domain: triangle counts over the co-order graph (parts that
    //      ship together in ≥2 orders; the clustering signal — same
    //      shape as co-probe households on the MAC graph). Ordered
    //      orientation (pa < pb) counts each triangle once and bounds
    //      wedge fan-out under skew ----
    "net_tree_triangles" -> ((s, d) => {
      val items = li(s, d).select(col("l_orderkey").as("ord"), col("l_partkey").as("pk"))
      val e = items.as("a").join(items.as("b"),
          col("a.ord") === col("b.ord") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
        .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
      graft.operators.NetworkTree.triangleCounts(e, "pa", "pb")
        .orderBy("v")
    }),

    // ---- G7: local clustering coefficient — the per-node form of the
    //      triangle signal (inside-a-household vs thoroughfare);
    //      degree<2 nodes report NULL (no neighbor pairs to close) ----
    // ---- G8: label-propagation communities over the user↔event-type
    //      co-observation graph (synchronous, weight-argmax with
    //      min-label tie-break — deterministic, 3 unrolled rounds) ----
    "g8_lpa" -> ((s, d) => {
      val obs = ev(s, d).select(
        concat(lit("u:"), col("user_id")).as("mac"),
        concat(lit("t:"), col("event_type")).as("ssid"))
      val und = graft.operators.NetworkTree.edges(obs)
      val dir = und.select(col("mac").as("src"), col("ssid").as("dst"), col("weight"))
        .union(und.select(col("ssid").as("src"), col("mac").as("dst"), col("weight")))
      val lab = graft.operators.LabelPropagation
        .labelPropagationFixed(dir, "src", "dst", "weight", iters = 3)
      val sizes = lab.groupBy("lab").agg(count(lit(1)).as("n_members"))
      lab.join(sizes, "lab").select("node", "lab", "n_members")
        .orderBy("node")
    }),

    // ---- G10: Newman modularity of the G8 partition — the quality
    //      score that says whether those communities MEAN anything
    //      (Q ≈ 0 ⇒ no denser than a degree-preserving rewiring).
    //      Exact integer numerators per community (q_num / 4W²), so
    //      the score replays bit-identically in DuckDB on top of the
    //      same unrolled-LPA CTE chain as g8 ----
    "g10_modularity" -> ((s, d) => {
      val obs = ev(s, d).select(
        concat(lit("u:"), col("user_id")).as("mac"),
        concat(lit("t:"), col("event_type")).as("ssid"))
      val und = graft.operators.NetworkTree.edges(obs)
      val dir = und.select(col("mac").as("src"), col("ssid").as("dst"), col("weight"))
        .union(und.select(col("ssid").as("src"), col("mac").as("dst"), col("weight")))
      val lab = graft.operators.LabelPropagation
        .labelPropagationFixed(dir, "src", "dst", "weight", iters = 3)
      graft.operators.LabelPropagation.modularity(
          und.select(col("mac").as("src"), col("ssid").as("dst"), col("weight")),
          "src", "dst", "weight", lab)
        .orderBy("lab")
    }),

    "g7_clustering" -> ((s, d) => {
      val items = li(s, d).select(col("l_orderkey").as("ord"), col("l_partkey").as("pk"))
      val e = items.as("a").join(items.as("b"),
          col("a.ord") === col("b.ord") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
        .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
      graft.operators.NetworkTree.clusteringCoefficient(e, "pa", "pb")
        .orderBy("v")
    }),

    // ---- G9: k-core peeling over the same co-purchase graph (the
    //      dense-cluster extractor degree alone fakes; 4 unrolled
    //      peels, `stable` reports fixpoint honestly; k=2 on the
    //      w>=2 graph — the 3-core is empty at sf0.1) ----
    "g9_kcore" -> ((s, d) => {
      val items = li(s, d).select(col("l_orderkey").as("ord"), col("l_partkey").as("pk"))
      val e = items.as("a").join(items.as("b"),
          col("a.ord") === col("b.ord") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
        .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
      val dir = e.select(col("pa").as("src"), col("pb").as("dst"))
        .union(e.select(col("pb").as("src"), col("pa").as("dst")))
      graft.operators.KCore.kCoreFixed(dir, "src", "dst", k = 2, rounds = 4)
        .orderBy("node")
    }),

    // ---- domain: the same triangle counts under the DEGREE-ordered
    //      orientation — identical output (the oracle is the same
    //      enumeration), skew-optimal wedge fan-out (hub wedges land
    //      only on equal-or-higher-degree neighbors; NetworkTreeSpec
    //      proves the bound on a star graph) ----
    "net_tree_triangles_deg" -> ((s, d) => {
      val items = li(s, d).select(col("l_orderkey").as("ord"), col("l_partkey").as("pk"))
      val e = items.as("a").join(items.as("b"),
          col("a.ord") === col("b.ord") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
        .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
      graft.operators.NetworkTree.triangleCountsDegreeOrdered(e, "pa", "pb")
        .orderBy("v")
    }),

    // ---- L1: exact dedup ----
    "l1_exact_dedup" -> ((s, d) =>
      Dedup.exactGroups(Tables.documents(s, d)).orderBy("fp")),

    // ---- L2: MinHash signatures (oracle-checked hash pipeline) ----
    "l2_minhash_sig" -> ((s, d) => {
      val sig = Dedup.minHashSignatures(Tables.spread(Tables.documents(s, d)))
      sig.select(col("doc_id") +:
        (0 until 8).map(i => element_at(col("sig"), i + 1).as(s"s$i")): _*)
        .orderBy("doc_id")
    }),

    // L2: banded-LSH candidate pairs + exact-jaccard verify. md5
    // signature family → the banding itself (which pairs become
    // candidates, not just the verified survivors) replays in DuckDB;
    // the xx family (md5Family=false) is the string-free scale default
    // for library callers, spec-equivalence-tested in DedupSpec.
    "l2b_minhash_pairs" -> ((s, d) =>
      Dedup.minHashNearDups(Tables.spread(Tables.documents(s, d)), threshold = 0.5,
          md5Family = true)
        .orderBy("a_id", "b_id")),

    // ---- CAP: corpus refresh — the day's batch adjudicated against
    //      the settled corpus: exact fingerprint (corpus + earlier
    //      batch twin), then the incremental near-dup probe (corpus
    //      side, then earlier batch doc), then admission. The daily-
    //      ingest capstone: every stage is the incremental-state form
    //      (fingerprint table + band index), so the corpus is never
    //      re-scanned beyond by-key verify fetches ----
    "corpus_refresh" -> ((s, d) => {
      val docs = Tables.spread(Tables.documents(s, d))
      Dedup.corpusRefreshDecisions(
          docs.filter(col("doc_id") % 10 === 0),
          docs.filter(col("doc_id") % 10 =!= 0),
          threshold = 0.5, md5Family = true)
        // lineage barrier before the total sort (r17)
        .transform(graft.operators.Checkpoint.apply)
        .orderBy("doc_id")
    }),

    // ---- L2r: incremental near-dup — the day's batch (doc_id%10=0
    //      simulates it) probes the settled corpus's persisted band
    //      index: new×old and new×new pairs verify; old×old never
    //      materializes, so a daily ingest costs O(batch+candidates),
    //      not O(corpus) ----
    "l2r_incremental_neardup" -> ((s, d) => {
      val docs = Tables.spread(Tables.documents(s, d))
      Dedup.incrementalNearDups(
          docs.filter(col("doc_id") % 10 === 0),
          docs.filter(col("doc_id") % 10 =!= 0),
          threshold = 0.5, md5Family = true)
        .orderBy("a_id", "b_id")
    }),

    // ---- L2c: exact n-gram Jaccard near-dups (oracle) ----
    "l2c_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(Tables.spread(Tables.documents(s, d)), "source", n = 3, threshold = 0.2)
        .orderBy("a_id", "b_id")),

    // ---- L2d: SimHash sketches (oracle) + near-dup pairs (rows-only) ----
    "l2d_simhash" -> ((s, d) =>
      Dedup.simHashSketches(Tables.documents(s, d)).orderBy("doc_id")),

    "l2e_simhash_pairs" -> ((s, d) =>
      Dedup.simHashNearDups(Tables.documents(s, d), maxHamming = 3)
        .orderBy("a_id", "b_id")),

    // ---- L2f: embedding-cosine near-dups (exact, oracle) ----
    "l2f_embedding_neardup" -> ((s, d) =>
      Dedup.embeddingNearDups(Tables.spread(Tables.embeddings(s, d)), threshold = 0.4)
        .orderBy("a_id", "b_id")),

    // ---- L2t: near-CONTAINMENT pairs — the asymmetric-duplication
    //      detector (quote/excerpt/boilerplate-wrap) that Jaccard
    //      structurally misses; same blocked hashed-set verification
    //      as l2c ----
    "l2t_containment" -> ((s, d) =>
      Dedup.containmentPairs(Tables.spread(Tables.documents(s, d)), "source",
          n = 3, threshold = 0.5)
        // lineage barrier before the total sort (r17)
        .transform(graft.operators.Checkpoint.apply)
        .orderBy("a_id", "b_id")),

    // ---- L2u: LSH banding planner — the s-curve table that picks
    //      (bands, rows) for a target dedup threshold; pure parameter
    //      math, no data input ----
    "l2u_lsh_plan" -> ((s, _) =>
      Dedup.lshPlan(s, numHashes = 32)
        .orderBy("rows_per_band", "s_permille")),

    // ---- L2w: dedup-adjudication feature table — one blocked pass,
    //      every similarity feature per candidate pair (jaccard,
    //      containment ×2, length ratio, simhash hamming, exact flag);
    //      what a learned dedup adjudicator trains and serves on ----
    "l2w_pair_features" -> ((s, d) =>
      Dedup.pairFeatures(Tables.spread(Tables.documents(s, d)), "source", n = 3)
        // lineage barrier before the total sort: the range sampler
        // otherwise re-runs the fused per-pair feature stage — the
        // bench's top task-CPU stage (r17; see er_fs_value_link)
        .transform(graft.operators.Checkpoint.apply)
        .orderBy("a_id", "b_id")),

    // ---- L2v: the DATA half of threshold planning — the exact
    //      jaccard histogram over blocked pairs (where does THIS
    //      corpus's similarity mass sit; read against l2u's s-curves
    //      to place the dedup threshold) ----
    "l2v_jaccard_hist" -> ((s, d) =>
      Dedup.ngramJaccardPairs(Tables.spread(Tables.documents(s, d)), "source",
          n = 3, threshold = 0.0)
        .groupBy(floor(col("jaccard") * 20).cast("long").as("band"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("band")),

    // ---- L2s: SemDeDup — semantic near-dup pruning scoped within a
    //      precomputed cluster column (the paper's k-means role played
    //      by `label`): within-cluster cosine edges → components →
    //      one deterministic keeper per semantic group ----
    "l2s_semdedup" -> ((s, d) =>
      Dedup.semDedup(Tables.spread(Tables.embeddings(s, d)), "label",
          threshold = 0.4)
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
          col("sem_group"), col("is_kept"))
        .orderBy("vec_id")),

    // ---- L1b: incremental ingest dedup — a "new batch" (doc_id%10<3)
    //      admitted against the remaining corpus's fingerprint table:
    //      only content absent from the corpus AND first-in-batch
    //      survives (the daily-crawl update path) ----
    "l1b_incremental_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.incrementalDedup(
          docs.filter(col("doc_id") % 10 < 3),
          Dedup.exactGroups(docs.filter(col("doc_id") % 10 >= 3)))
        .orderBy("doc_id")
    }),

    // ---- L2p: LSH-bucketed embedding near-dup (l2f's documented scale
    //      path made oracle-checkable: literal hyperplanes → bit-exact
    //      cells in both engines; exact cosine within cells only) ----
    "l2p_embedding_neardup_lsh" -> ((s, d) =>
      Dedup.embeddingNearDupsBucketed(
          Tables.spread(Tables.embeddings(s, d)), threshold = 0.4)
        .orderBy("a_id", "b_id")),

    // ---- L2h: eval-set decontamination (benchmark n-gram overlap;
    //      eval grams broadcast — corpus text never shuffles) ----
    "l2h_decontaminate" -> ((s, d) => {
      val docs = Tables.spread(Tables.documents(s, d))
      Dedup.decontaminate(docs, docs.filter(col("doc_id") % 20 === 0),
          n = 3, minHits = 5L)
        .orderBy("doc_id")
    }),

    // ---- L2m: Bloom-prefiltered decontamination (the contamination-
    //      SOURCE-scale variant of l2h: eval grams become broadcast
    //      BITS, not an exact set; survivors exact-verify). numBits is
    //      deliberately undersized here so the bloom saturates and the
    //      verify join provably removes real false positives — the
    //      answer must still be bit-identical to exact overlap ----
    "l2m_bloom_decontaminate" -> ((s, d) => {
      val docs = Tables.spread(Tables.documents(s, d))
      Dedup.decontaminateBloom(docs, docs.filter(col("doc_id") % 17 === 0),
          n = 2, minHits = 3L, expectedItems = 1L << 14, numBits = 1L << 14)
        .orderBy("doc_id")
    }),

    // ---- L2i: edit-distance fuzzy matching (typo'd SSIDs / vendor
    //      name variants): Levenshtein over the DISTINCT vocabulary,
    //      blocked + length-banded + thresholded DP (Dedup docs) ----
    "l2i_editdist" -> ((s, d) =>
      Dedup.editDistancePairs(Tables.part(s, d), "p_name", maxDist = 3)
        .orderBy("a_val", "b_val")),

    // ---- L2j: cross-corpus duplicate-SEGMENT removal (CCNet-style
    //      line dedup): segments keyed by xxhash64, first occurrence
    //      kept via a map-combinable min-aggregate (never a window
    //      over the hot content key), docs reassembled in order ----
    "l2j_segment_dedup" -> ((s, d) =>
      Dedup.segmentDedup(Tables.documents(s, d), " value ", " | ")
        .orderBy("doc_id")),

    // ---- L2l: exact duplicate-SPAN detection (substring-level dedup
    //      signal — repeated 8-token windows merged into regions with
    //      integer coverage; Lee et al. 2022's gate) ----
    "l2l_dup_spans" -> ((s, d) =>
      Dedup.duplicateSpans(Tables.spread(Tables.documents(s, d)), k = 8)
        .orderBy("doc_id")),

    // ---- L2n: winnowing fingerprints (Schleimer et al. 2003 / MOSS):
    //      the min-hash gram of every w-gram window, deduplicated —
    //      the sparse deterministic substring index (density 2/(w+1),
    //      guaranteed hit for any shared w+k-1-token run) ----
    "l2n_winnowing" -> ((s, d) =>
      Dedup.winnowingFingerprints(Tables.spread(Tables.documents(s, d)),
          k = 5, w = 4)
        .orderBy("doc_id", "fp_pos")),

    // ---- L2o: winnowing match pairs — invert the l2n index, count
    //      shared fingerprints per doc pair (the MOSS match step;
    //      posting cap = stop-fingerprint removal) ----
    "l2o_winnow_matches" -> ((s, d) =>
      Dedup.winnowingMatches(Tables.spread(Tables.documents(s, d)),
          k = 5, w = 4, minShared = 2L, maxPostings = 50)
        .orderBy("a_id", "b_id")),

    // ---- L2q: EXACT set-similarity self-join (PPJoin prefix filter):
    //      every pair with 3-gram-set Jaccard >= 1/2, zero recall loss —
    //      the exact counterpart to the MinHash candidates; candidates
    //      come only from each doc's RAREST grams ----
    "l2q_setsim_join" -> ((s, d) =>
      Dedup.setSimJoin(Tables.spread(Tables.documents(s, d)),
          n = 3, tNum = 1, tDen = 2)
        // lineage barrier before the total sort: the range sampler
        // otherwise re-runs the fused prefix-filter verify stage
        // (r17; see er_fs_value_link)
        .transform(graft.operators.Checkpoint.apply)
        .orderBy("a_id", "b_id")),

    // ---- L2g: near-dup pairs → transitive dedup CLUSTERS (hash-min
    //      label propagation; oracle = DuckDB recursive CTE) ----
    "l2g_dedup_clusters" -> ((s, d) =>
      graft.operators.Components
        .dedupClusters(Tables.spread(Tables.documents(s, d)), "source", n = 3, threshold = 0.2)
        .orderBy("doc_id")),

    // ---- L2g via star contraction: the SAME clusters from the
    //      O(log n)-round large-star/small-star kernel (Kiveris et al.
    //      SOCC'14) — the adversarial-diameter path; the oracle is
    //      byte-identical to l2g's, pinning kernel interchangeability
    //      driver-side, not just in ComponentsSpec ----
    "l2g_star_clusters" -> ((s, d) =>
      graft.operators.Components
        .dedupClusters(Tables.spread(Tables.documents(s, d)), "source",
          n = 3, threshold = 0.2, star = true)
        .orderBy("doc_id")),

    // ---- L2g applied: one representative per near-dup cluster
    //      (longest doc, ties min id) — the APPLY step of dedup ----
    "l2g_cluster_reps" -> ((s, d) =>
      graft.operators.Components.clusterRepresentatives(
          Tables.spread(Tables.documents(s, d)), "source", col("n_chars"),
          n = 3, threshold = 0.2)
        .orderBy("cluster_id")),

    // ---- MIX4: leakage-guarded splits — train/val/test assignment
    //      keyed on the near-dup CLUSTER id, not the doc id, so a
    //      cluster of near-duplicates can never straddle splits (the
    //      eval-contamination channel plain per-doc splitting leaves
    //      open). Composition of l2g's components and samp_splits'
    //      deterministic gate: membership is a pure function of
    //      (cluster, salt) — resumable, shard-stable ----
    "mix_split_guard" -> ((s, d) => {
      val clusters = graft.operators.Components
        .dedupClusters(Tables.spread(Tables.documents(s, d)), "source",
          n = 3, threshold = 0.2)
      graft.operators.Sampling.assignSplits(clusters, col("cluster_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "leak")
        .select("doc_id", "cluster_id", "split")
        .orderBy("doc_id")
    }),

    // ---- L3: exact brute-force cosine top-k (oracle) ----
    "l3_cosine_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(e.filter(col("vec_id") < 5),
          e.filter(col("vec_id") >= 5), k = 3)
        .orderBy(col("qid"), col("sim").desc, col("cid"))
    }),

    // ---- L3h: matryoshka dim-ablation — how much of the full-dim
    //      top-10 survives ranking on a 8/16/32-dim prefix (the
    //      storage-vs-recall pricing table; dim=64 row ≡ k sanity) ----
    "l3h_dim_ablation" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.dimAblation(e.filter(col("vec_id") < 5),
          e.filter(col("vec_id") >= 5), dims = Seq(8, 16, 32, 64), k = 10)
        .orderBy("dim", "qid")
    }),

    // ---- L3g: retrieval evaluation — recall@k + first-relevant rank
    //      of a DOT-product ranking against the cosine truth (metric-
    //      choice drift made measurable; the same harness gates every
    //      ANN rung). Rational-only metrics → fully replayable ----
    "l3g_rank_metrics" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = e.filter(col("vec_id") >= 5)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val VE = graft.functions.expressions.VectorExpressions
      def ranked(score: org.apache.spark.sql.Column) = {
        val w = Window.partitionBy("qid").orderBy(col("s").desc, col("cid"))
        c.join(broadcast(q)).select(col("qid"), col("cid"), score.as("s"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 10).select("qid", "cid", "rank")
      }
      val truth = ranked(round(VE.cosineSim(col("qv"), col("cv")), 4))
      val cand = ranked(round(VE.dotProduct(col("qv"), col("cv")), 4))
      graft.operators.Similarity.rankingMetrics(truth, cand, k = 10)
        .orderBy("qid")
    }),

    // L3: LSH-bucketed ANN (scale path; approximate → rows-only +
    // recall-vs-brute-force ScalaTest).
    "l3b_ann_lsh" -> ((s, d) => {
      val e = Tables.spread(Tables.embeddings(s, d))
      Similarity.lshTopK(e.filter(col("vec_id") < 5),
          e.filter(col("vec_id") >= 5), k = 3)
        .orderBy(col("qid"), col("sim").desc, col("cid"))
    }),

    // L3: IVF (learned coarse quantizer) ANN — approximate → rows-only +
    // recall-vs-brute-force ScalaTest.
    "l3c_ann_ivf" -> ((s, d) => {
      val e = Tables.spread(Tables.embeddings(s, d))
      graft.operators.SimilarityIvf.ivfTopK(e.filter(col("vec_id") < 5),
          e.filter(col("vec_id") >= 5), k = 3)
        .orderBy(col("qid"), col("sim").desc, col("cid"))
    }),

    // L3: product-quantization ADC top-k (the memory scale path: codes
    // are m bytes/vector, embeddings never move at query time) —
    // approximate → rows-only + PqSpec ADC-identity and recall bound.
    "l3e_pq_ann" -> ((s, d) => {
      val e = Tables.spread(Tables.embeddings(s, d))
      graft.operators.SimilarityPq.pqTopK(e.filter(col("vec_id") < 5),
          e.filter(col("vec_id") >= 5), k = 3)
        .orderBy(col("qid"), col("rnk"))
    }),

    // L3: IVFADC — IVF cells prune, ADC scores the m-byte codes of the
    // survivors (the FAISS-shaped composition of l3c + l3e; the layout
    // that makes 100 TB of embeddings searchable). Approximate →
    // rows-only + PqSpec recall bound.
    "l3f_ivfadc" -> ((s, d) => {
      val e = Tables.spread(Tables.embeddings(s, d))
      graft.operators.SimilarityPq.ivfAdcTopK(e.filter(col("vec_id") < 5),
          e.filter(col("vec_id") >= 5), k = 3)
        .orderBy(col("qid"), col("rnk"))
    }),

    // ---- L3c/e/f PINNED twins: the same SEARCH math on FrozenCodebooks'
    //      literal quantizers, so the previously rows-only ANN ladder
    //      becomes oracle-checkable — cell assignment, nprobe pruning,
    //      PQ encode, LUT build and ADC scoring are deterministic
    //      functions of (vectors, codebook) and replay bit-exactly in
    //      DuckDB (AnnPinnedOracle); only k-means TRAINING stays
    //      spec-verified, exactly as BpeExprs pins merges but not the
    //      merge-training ----
    "l3c_ivf_pinned" -> ((s, d) => {
      val e = Tables.spread(Tables.embeddings(s, d))
      graft.operators.SimilarityIvf.ivfTopKWith(e.filter(col("vec_id") < 5),
          e.filter(col("vec_id") >= 5), k = 3,
          graft.operators.FrozenCodebooks.IvfRawCentroids, nprobe = 4)
        .orderBy(col("qid"), col("sim").desc, col("cid"))
    }),

    "l3e_pq_pinned" -> ((s, d) => {
      val e = Tables.spread(Tables.embeddings(s, d))
      graft.operators.SimilarityPq.pqTopKWith(e.filter(col("vec_id") < 5),
          e.filter(col("vec_id") >= 5), k = 3,
          graft.operators.FrozenCodebooks.PqCodebooks)
        .orderBy(col("qid"), col("rnk"))
    }),

    "l3f_ivfadc_pinned" -> ((s, d) => {
      val e = Tables.spread(Tables.embeddings(s, d))
      graft.operators.SimilarityPq.ivfAdcTopKWith(e.filter(col("vec_id") < 5),
          e.filter(col("vec_id") >= 5), k = 3,
          graft.operators.FrozenCodebooks.IvfUnitCentroids,
          graft.operators.FrozenCodebooks.PqCodebooks, nprobe = 4)
        .orderBy(col("qid"), col("rnk"))
    }),

    // ---- L4: token statistics ----
    "l4_token_stats" -> ((s, d) =>
      TextAnalysis.tokenStats(Tables.documents(s, d))
        .withColumn("n_tokens", col("n_tokens").cast("long"))
        .orderBy("doc_id")),

    "l4b_term_freq" -> ((s, d) =>
      TextAnalysis.termFrequencies(Tables.documents(s, d), 50)),

    // ---- L4d: repetition/boilerplate signals (integer counts only —
    //      callers derive dup-line and top-bigram fractions) ----
    "l4d_repetition" -> ((s, d) =>
      TextAnalysis.repetition(Tables.documents(s, d)).orderBy("doc_id")),

    // ---- L4f: PII scrubbing (emails + long digit runs redacted) ----
    "l4f_pii_scrub" -> ((s, d) =>
      TextAnalysis.piiScrub(Tables.documents(s, d)).orderBy("doc_id")),

    // ---- L4e: token budgets — whitespace words vs BPE-ish pre-token
    //      units (the number a packing/costing pipeline charges) ----
    "l4e_bpe_tokens" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_ws_tokens"),
        TextFunctions.bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"),
        TextFunctions.bpeMergedTokenCount(col("text")).as("n_bpe_merged"))
        .orderBy("doc_id")),

    // ---- L4p: model-based quality gate — linear classifier with
    //      literal micro-unit weights; input dirtied in-query (the
    //      l4g_normalize precedent) so the punct/digit/upper features
    //      fire on the punctuation-free synthetic corpus ----
    "l4p_quality_model" -> ((s, d) =>
      TextAnalysis.linearQualityGate(
        Tables.documents(s, d).select(col("doc_id"),
          concat(upper(substring(col("text"), 1, 20)), lit(" 12345!!! "),
            col("text")).as("text")))
        .orderBy("doc_id")),

    // ---- L4o: merged-BPE ENCODE — the tokenizer's apply step (l4e
    //      counts are this sequence's length). The sequence itself is
    //      what id-mapping / packing consume downstream ----
    "l4o_bpe_encode" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextFunctions.bpeEncode(col("text")).as("bpe_text"),
        TextFunctions.bpeMergedTokenCount(col("text")).as("n_bpe_merged"))
        .orderBy("doc_id")),

    // ---- L4g: canonical text normalization (the stage-zero transform
    //      of every curation pipeline). The input is deliberately
    //      dirtied INSIDE the query (case noise, accents, tabs, runs of
    //      spaces) so the oracle exercises every folding rule rather
    //      than passing vacuously on pre-clean synthetic text ----
    "l4g_normalize" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextFunctions.normalizeText(
          concat(lit("  \tÉL Ñiño — "), upper(substring(col("text"), 1, 40)),
            lit("\t\t"), col("text"), lit("  "))).as("norm_text"))
        .orderBy("doc_id")),

    // ---- L4h: inverted-index postings (term → df + sorted doc list) ----
    "l4h_postings" -> ((s, d) =>
      TextAnalysis.postings(Tables.documents(s, d), minDf = 2L)
        .orderBy("tok")),

    // ---- L4u: PMI collocations — co-occurrence bounded by a top-V
    //      document-frequency vocabulary (broadcast semi filter), pairs
    //      from per-doc in-array explode, never a doc self-join ----
    "l4u_pmi" -> ((s, d) =>
      TextAnalysis.pmiPairs(Tables.documents(s, d), topV = 24,
          minPairCount = 5L)
        .orderBy("a_tok", "b_tok")),

    // ---- L4i: vocabulary construction (term → dense frequency-ranked
    //      id; the tokenizer-prep pass) and corpus id-encoding ----
    "l4i_vocab" -> ((s, d) =>
      TextAnalysis.vocabulary(Tables.documents(s, d))
        .select(col("tok"), col("n"), col("id"))
        .orderBy("id")),

    "l4i_encode" -> ((s, d) =>
      TextAnalysis.encodeIds(Tables.documents(s, d))
        .select(col("doc_id"),
          concat_ws(",", transform(col("ids"), i => i.cast("string"))).as("ids_csv"))
        .orderBy("doc_id")),

    // ---- text: language-ID heuristic ----
    "lang_id" -> ((s, d) =>
      TextAnalysis.languageId(Tables.documents(s, d)).orderBy("doc_id")),

    // ---- text: the classifier-eval view of the same prediction —
    //      labeled×guess confusion counts (per-class precision/recall
    //      fall out of this table); one map-combined groupBy ----
    "lang_confusion" -> ((s, d) =>
      TextAnalysis.languageId(Tables.documents(s, d))
        .groupBy("labeled", "guess").agg(count(lit(1)).as("n"))
        .orderBy("labeled", "guess")),

    // ---- E1: exact per-group ROC-AUC (Mann-Whitney with tie
    //      correction) — grades a scorer against a binary label before
    //      it gates the corpus. Window runs over the DISTINCT
    //      (group, score) histogram, never the raw rows; integer until
    //      the one nano-quantized division ----
    "eval_auc" -> ((s, d) =>
      graft.operators.Eval.rocAuc(Tables.documents(s, d), "source",
          col("lang") === "en", (col("n_chars") % 97).cast("long"))
        .orderBy("source")),

    // ---- E2: calibration (ECE, 10 fixed bins) — probabilities enter
    //      as exact milli-units (a deterministic doc_id-keyed synthetic
    //      confidence; the corpus carries no model column), so per-bin
    //      confidence sums are integral and the oracle replays exactly.
    //      ALL row (bin = -1) carries the ECE in conf_nano ----
    "eval_ece" -> ((s, d) =>
      graft.operators.Eval.calibrationEce(Tables.documents(s, d),
          col("lang") === "en", (col("doc_id") * 37) % 1001, nBins = 10)
        .orderBy("bin")),

    // ---- E3: Cohen's kappa — chance-corrected agreement of the
    //      language-ID guess vs the labeled language (the scalar
    //      summary of lang_confusion's table); contingency counts only,
    //      corpus read once ----
    "eval_kappa" -> ((s, d) =>
      graft.operators.Eval.cohenKappa(
        TextAnalysis.languageId(Tables.documents(s, d)), "labeled", "guess")),

    // ---- text: quality scoring ----
    "quality_score" -> ((s, d) =>
      TextAnalysis.qualityScores(Tables.documents(s, d)).orderBy("doc_id")),

    // ---- L4j: robust per-source outlier gate (median/MAD over doc
    //      length — heavy-tail-safe, exact: integral values land the
    //      medians on .0/.5). Two tiny grouped percentile aggs
    //      broadcast back; the corpus never shuffles ----
    "quality_outliers" -> ((s, d) =>
      TextAnalysis.robustOutliers(Tables.documents(s, d), "source", "n_chars")
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("med"), col("mad"), col("is_outlier"))
        .orderBy("doc_id")),

    // ---- text: fingerprints (rolling hash + content hash) ----
    "fingerprints" -> ((s, d) =>
      TextAnalysis.fingerprints(Tables.documents(s, d)).orderBy("doc_id")),

    // ---- L5b: overlapping character-window chunks (context-window
    //      prep: size 200, stride 150 → 50-char overlap). Map-only;
    //      chunk rows inherit the scan's partitioning ----
    "l5b_chunking" -> ((s, d) =>
      graft.operators.Chunking
        .charChunks(Tables.documents(s, d).select("doc_id", "text"),
          "text", size = 200, stride = 150)
        .orderBy("doc_id", "off")),

    // ---- L5f: sentence-window chunks (RAG-ingest chunker: boundaries
    //      between sentences, stride<perChunk overlap). The corpus is
    //      punctuation-free, so terminators are injected in-query
    //      (l4g_normalize precedent) — three common words become
    //      './!/?' ends and the tail stays unterminated, so every
    //      branch of the split regex fires ----
    "l5f_sentence_chunks" -> ((s, d) =>
      graft.operators.Chunking.sentenceChunks(
        Tables.documents(s, d).select(col("doc_id"),
          replace(replace(replace(col("text"),
            lit(" value "), lit(". ")),
            lit(" table "), lit("! ")),
            lit(" query "), lit("? ")).as("text")),
        "text", perChunk = 4, stride = 3)
        .orderBy("doc_id", "chunk_id")),

    // L5d: content-defined chunks (gear-hash boundaries follow content,
    // so shared passages chunk identically anywhere — the dedup-friendly
    // chunker). Sequential stateful fold → not SQL-expressible →
    // rows-only; TextFunctionsSpec pins reassembly, bounds, and the
    // edit-locality property.
    // chunk_idx as BIGINT (posexplode yields INT) — the r7 oracle
    // replays the gear walk in DuckDB (CdcChunksSql), so the column
    // reaches the driver hash and follows the BIGINT discipline
    "l5d_cdc_chunks" -> ((s, d) =>
      graft.operators.Chunking
        .cdcChunks(Tables.documents(s, d).select("doc_id", "text"), "text",
          maskBits = 6, minLen = 16, maxLen = 256)
        .withColumn("chunk_idx", col("chunk_idx").cast("long"))
        .orderBy("doc_id", "chunk_idx")),

    // ---- L5: multimodal binary plumbing (stub codec → rows-only) ----
    "mm_media_features" -> ((s, d) =>  // spread: per-row PNG encode+decode is CPU-bound
      Multimodal.mediaFeatures(s, Tables.spread(Tables.documents(s, d)))),

    // ---- L5h: image near-dup via dHash perceptual fingerprints —
    //      REAL codec (ImageIO) behind a map-only hashing pass, then
    //      banded 16-bit-chunk buckets (pigeonhole recall ≤ hamming 3)
    //      so candidates are bucketed, never all-pairs. The corpus
    //      includes deterministic darker-export re-encodes (the case
    //      byte dedup can't catch) so the pair set is non-vacuous.
    //      Rows-only: the codec is not SQL-expressible; MultimodalSpec
    //      pins the invariances (re-encode, brightness, darken) ----
    "mm_phash_pairs" -> ((s, d) => {
      val media = Multimodal.asMediaTableWithReEncodes(
        Tables.spread(Tables.documents(s, d)))
      Multimodal.phashNearDups(
          Multimodal.perceptualHashes(s, media).toDF(), maxHamming = 3)
        .orderBy("a_id", "b_id")
    }),

    // ---- L5h oracle twin for the BANDING (r6 verdict #5): the codec
    //      stays rows-only, but the scale claim — 16-bit-chunk bucket
    //      candidate generation + exact popcount verify — is pinned by
    //      feeding phashNearDups a DETERMINISTIC md5-derived 60-bit
    //      hash family both engines can compute: doc groups (doc_id %
    //      250) share a base hash, most members flip one bit, so
    //      within-group pairs sit at hamming ≤ 2 (non-vacuous) and
    //      cross-group md5 bases verify away ----
    "mm_phash_band_pairs" -> ((s, d) => {
      val base = conv(substring(md5(
        concat(lit("ph:"), (col("doc_id") % 250).cast("string"))), 1, 15),
        16, 10).cast("long")
      val flip = when(col("doc_id") % 4 =!= 0,
          expr("shiftleft(CAST(1 AS BIGINT), CAST((doc_id * 7) % 60 AS INT))"))
        .otherwise(lit(0L))
      val hashes = Tables.documents(s, d)
        .select(col("doc_id"), base.bitwiseXOR(flip).as("phash"))
      Multimodal.phashNearDups(hashes, maxHamming = 3)
        .orderBy("a_id", "b_id")
    }),

    // ---- L5c: time-based frame-sampling schedule (uniform stride,
    //      per-asset frame budget — the decoder's work list; pure
    //      integer column arithmetic, so it IS oracle-checkable even
    //      though the decode behind it is a stub) ----
    "mm_frame_schedule" -> ((s, d) =>
      graft.operators.Multimodal.frameSchedule(
          Tables.documents(s, d)
            .select(col("doc_id"), (col("n_chars") * 100L).as("duration_ms")),
          "doc_id", "duration_ms", strideMs = 2000L, maxFrames = 8)
        .select(col("doc_id"), col("n_frames"), col("frame_idx"), col("ts_ms"))
        .orderBy("doc_id", "frame_idx")),

    // ---- L5e: container-header parse — PNG headers synthesized as
    //      real BINARY in-query (dims derived from doc_id, 1-in-17
    //      rows given a corrupted magic), then parsed back with
    //      substring-on-binary + conv(hex(..)) at fixed IHDR offsets.
    //      The oracle recomputes the fields arithmetically, so any
    //      error in the binary round-trip (endianness, offset, magic
    //      check) hash-mismatches ----
    "mm_header_parse" -> ((s, d) => {
      val w = lit(16L) + pmod(col("doc_id") * 37L, lit(4080L))
      val h = lit(16L) + pmod(col("doc_id") * 101L, lit(2160L))
      val magic = when(col("doc_id") % 17 === 0, lit("00504E470D0A1A0A"))
        .otherwise(lit(Multimodal.PngMagicHex))
      val payload = unhex(concat(magic, lit("0000000D49484452"),
        lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"), lit("0806000000")))
      Multimodal.parsePngHeader(
          Tables.documents(s, d).select(col("doc_id"), payload.as("payload")),
          "payload")
        .orderBy("doc_id")
    }),

    // ---- L5e audio twin: WAV/RIFF headers synthesized as real BINARY
    //      in-query (PCM fields derived from doc_id, little-endian
    //      bytes built with shift/pmod arithmetic; 1-in-17 corrupt
    //      magic), parsed back at fixed offsets. The oracle recomputes
    //      the fields arithmetically, so any endianness/offset error
    //      in the binary round-trip hash-mismatches ----
    // ---- mm: REAL PCM decode, oracle-CHECKED — synthesized square-
    //      wave WAVs whose decoded features (n, peak, Σs², rms) are
    //      arithmetically predictable from (doc_id, n_chars): the
    //      oracle validates the actual sample decoder without ever
    //      touching a byte (the s2_frame_parse discipline for audio) ----
    "mm_wav_features" -> ((s, d) =>
      graft.operators.Multimodal.wavPcmFeatures(s,
          graft.operators.Multimodal.asAudioTable(
            Tables.spread(Tables.documents(s, d))))
        .toDF().orderBy("doc_id")),

    "mm_wav_header" -> ((s, d) => {
      def leHex(v: org.apache.spark.sql.Column, n: Int) = concat((0 until n).map(k =>
        lpad(hex(pmod(shiftright(v, 8 * k), lit(256L))), 2, "0")): _*)
      val ch = lit(1L) + pmod(col("doc_id"), lit(2L))
      val sr = lit(8000L) + pmod(col("doc_id") * 13L, lit(32000L))
      val bits = lit(8L) * (lit(1L) + pmod(col("doc_id"), lit(3L)))
      val ba = ch * shiftright(bits, 3)
      val br = sr * ba
      val ds = (lit(100L) + pmod(col("doc_id"), lit(900L))) * ba
      val magic = when(col("doc_id") % 17 === 0, lit("52494647"))
        .otherwise(lit("52494646"))
      val payload = unhex(concat(magic, leHex(lit(36L) + ds, 4),
        lit("57415645666D7420"), leHex(lit(16L), 4), leHex(lit(1L), 2),
        leHex(ch, 2), leHex(sr, 4), leHex(br, 4), leHex(ba, 2),
        leHex(bits, 2), lit("64617461"), leHex(ds, 4)))
      Multimodal.parseWavHeader(
          Tables.documents(s, d).select(col("doc_id"), payload.as("payload")),
          "payload")
        .orderBy("doc_id")
    }),

    // ---- A8: exact percentiles (interpolated) per group. Weights are
    //      powers of two over INTEGER-VALUED quantities, so every
    //      interpolation step is exact in binary — the result is
    //      bit-identical across engines regardless of formula order ----
    "a8_percentiles" -> ((s, d) => li(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(percentile(col("l_quantity"), lit(0.25)), 4).as("p25"),
        round(percentile(col("l_quantity"), lit(0.5)), 4).as("p50"),
        round(percentile(col("l_quantity"), lit(0.75)), 4).as("p75"))
      .orderBy("l_returnflag")),

    // A8 at fleet scale: KLL/GK-style sketch via approx_percentile —
    // approximate by design, rows-only check (the exact twin above is
    // the oracle-facing form).
    "a8b_approx_percentiles" -> ((s, d) => li(s, d)
      .groupBy("l_returnflag")
      .agg(approx_percentile(col("l_quantity"), lit(0.5), lit(10000)).as("approx_p50"))
      .orderBy("l_returnflag")),

    // ---- A9: histogram via width_bucket (fixed [0,50) in 10 buckets) ----
    "a9_histogram" -> ((s, d) => li(s, d)
      .groupBy(width_bucket(col("l_quantity"), lit(0), lit(50), lit(10)).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")),

    // ---- A26: Freedman–Diaconis bin planning — the histogram-width
    //      rule (2·IQR/∛n) from exact quartiles; what a19/a9 binning
    //      should be configured WITH rather than guessed ----
    "a26_fd_binwidth" -> ((s, d) => {
      val agg = ev(s, d).groupBy("event_type").agg(
        count(lit(1)).as("n"),
        round(expr("percentile(value, 0.25)"), 4).as("q1"),
        round(expr("percentile(value, 0.75)"), 4).as("q3"),
        round(min("value"), 4).as("vmin"),
        round(max("value"), 4).as("vmax"))
      agg.withColumn("width_milli",
          floor((col("q3") - col("q1")) * 2.0
            / pow(col("n").cast("double"), 1.0 / 3.0) * 1000.0).cast("long"))
        .withColumn("n_bins",
          when(col("width_milli") > 0,
            ceil((col("vmax") - col("vmin")) * 1000.0
              / col("width_milli").cast("double")).cast("long")))
        .orderBy("event_type")
    }),

    // ---- A24: exact weighted median per group (weights = replication
    //      factor; lower-median definition, tie-safe) ----
    "a24_weighted_median" -> ((s, d) =>
      graft.operators.WeightedStats.weightedMedian(
        ev(s, d), "event_type", col("value"), (col("user_id") % 5) + 1)
        .orderBy("event_type")),

    // ---- A25: Benford first-digit audit over the measure column —
    //      observed vs expected in integer micro-counts; digit from the
    //      string rendering, no log on the data path ----
    "a25_benford" -> ((s, d) =>
      graft.operators.WeightedStats.benfordAudit(ev(s, d), col("value"))
        .orderBy("digit")),

    // ---- A8c: mergeable histogram quantiles — p50/p90/p99 per event
    //      type from an equi-width integer-count state; estimate within
    //      one bin width of exact, STRUCTURALLY (not probabilistically),
    //      and engine-replayable unlike sketch quantiles ----
    "a8c_hist_quantiles" -> ((s, d) => {
      import graft.operators.QuantileHistogram
      val base = ev(s, d).select(col("event_type"),
        round(col("value") * 100).cast("long").as("v"))
      val st = QuantileHistogram.histogramState(base, Seq("event_type"),
        col("v"), lo = 0L, hi = 64000L, nBins = 64)
      // q emitted as milli-unit BIGINT (500/900/990) — a raw DOUBLE
      // literal column is hash-fragile across engine float renderings
      QuantileHistogram.quantiles(st, Seq("event_type"),
          Seq(0.5, 0.9, 0.99), lo = 0L, hi = 64000L, nBins = 64)
        .withColumn("q", round(col("q") * 1000).cast("long"))
        .orderBy("event_type", "q")
    }),

    // ---- A8d: the merge identity as driver-visible rows — two shard
    //      states (event_id parity) summed reproduce the full-corpus
    //      histogram exactly (the a17b pattern for quantile state) ----
    "a8d_hist_merge" -> ((s, d) => {
      import graft.operators.QuantileHistogram
      val base = ev(s, d).select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("v"))
      def shard(p: Int) = QuantileHistogram.histogramState(
        base.filter(col("event_id") % 2 === p), Seq("event_type"),
        col("v"), lo = 0L, hi = 64000L, nBins = 64)
      QuantileHistogram.mergeStates(Seq(shard(0), shard(1)), Seq("event_type"))
        .orderBy("event_type", "bin")
    }),

    // ---- A10: mode (most frequent value) per key — deterministic
    //      tiebreak (count desc, then value asc), unlike builtin mode() ----
    "a10_mode_per_key" -> ((s, d) => {
      val counts = ev(s, d).groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("n").desc, col("event_type"))
      counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("top_type"), col("n"))
        .orderBy("user_id")
    }),

    // ---- W5: distribution ranking family (ntile / percent_rank / cume_dist) ----
    "w5_rank_family" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      ev(s, d)
        .select(col("user_id"), col("event_id"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy("user_id", "event_id")
    }),

    // ---- W6: batch sessionization (gap-based; batch twin of ST4) ----
    "w6_sessionize" -> ((s, d) =>
      graft.operators.Sessionize
        .sessions(ev(s, d), "user_id", "ts", col("event_id"), gapSeconds = 1800L)
        .select(col("user_id"), col("session_id"), col("n_events"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSS").as("session_start"),
          col("duration_s").cast("long").as("duration_s"))
        .orderBy("user_id", "session_id")),

    // ---- O4: z-order curve values (write-side layout key; ZOrderSpec
    //      measures the 2-D file-pruning win, this pins the bit math) ----
    "o4_zorder_curve" -> ((s, d) => li(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.operators.ZOrder.zValue(
          col("l_partkey") % 1024, col("l_suppkey") % 1024, bits = 10).as("z"))
      .orderBy("l_orderkey", "l_linenumber")),

    // ---- O4c: zone-map effectiveness — the SAME table cut into 32
    //      files under three write layouts (arrival order, z-order,
    //      probe-clustered); per-file zones + skip flags for
    //      user_id ∈ [100, 120]. The judge of every layout op above ----
    "o4c_zonemap" -> ((s, d) => {
      val e = ev(s, d).select(col("event_id"), col("user_id"),
        (hour(col("ts")) + dayofmonth(col("ts")) * 24).as("hr"))
      def rep(name: String, order: Seq[org.apache.spark.sql.Column]) =
        graft.operators.ZOrder
          .zoneMapReport(e, order, col("user_id"), nFiles = 32, lo = 100L, hi = 120L)
          .withColumn("layout", lit(name))
      rep("a_natural", Seq(col("event_id")))
        .unionByName(rep("b_zorder", Seq(graft.operators.ZOrder.zValue(
          col("user_id") % 1024, col("hr") % 1024, bits = 10), col("event_id"))))
        .unionByName(rep("c_clustered", Seq(col("user_id"), col("event_id"))))
        .select("layout", "file_id", "n_rows", "min_probe", "max_probe", "can_skip")
        .orderBy("layout", "file_id")
    }),

    // ---- O4b: Hilbert-curve layout key — the locality upgrade over
    //      the Morton curve (no power-of-two seam jumps; consecutive
    //      positions always adjacent cells → tighter per-file bounding
    //      boxes). Unrolled rotate-and-accumulate, branch-free column
    //      arithmetic; oracle replays the identical 8-step walk ----
    "o4b_hilbert" -> ((s, d) => li(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.operators.ZOrder.hilbertIndex(
          col("l_partkey") % 256, col("l_suppkey") % 256, bits = 8).as("h"))
      .orderBy("l_orderkey", "l_linenumber")),

    // ---- W7: running DISTINCT count per key ("how many different
    //      SSIDs has this device probed so far") — windowed
    //      count(DISTINCT) is illegal/O(n²); the first-seen flag
    //      (rank 1 within (key, value)) + running sum is O(n) and
    //      shares ONE (key)-partitioned sort pipeline ----
    "w7_cumulative_distinct" -> ((s, d) => {
      val byKV = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      val run = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, d)
        .withColumn("_first", when(row_number().over(byKV) === 1, 1L).otherwise(0L))
        .withColumn("n_types_so_far", sum(col("_first")).over(run))
        .select(col("user_id"), col("event_id"), col("n_types_so_far"))
        .orderBy("user_id", "event_id")
    }),

    // ---- W8: value family (first_value / last_value / nth_value over
    //      an explicit full frame — the frame spec is the semantics:
    //      default frames make last_value = current row) ----
    "w8_first_last" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      ev(s, d).select(col("event_id"),
          first("event_id").over(w).as("first_ev"),
          last("event_id").over(w).as("last_ev"),
          nth_value(col("event_id"), 2).over(w).as("second_ev"))
        .orderBy("event_id")
    }),

    // ---- W3b: TIME-range frame (RANGE BETWEEN interval) — the frame
    //      is defined by the clock, not row counts: trailing 5-minute
    //      activity per device regardless of how many rows landed in
    //      it. Epoch-MICROS as the order key on both engines (integer,
    //      exact at any timestamp precision); same single (key)-hash
    //      exchange + sort pipeline as the rank family ----
    "w3b_time_range" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
        .rangeBetween(-300000000L, 0L)
      ev(s, d).select(col("user_id"), col("event_id"),
          count(lit(1)).over(w).as("n_5m"),
          round(sum("value").over(w), 2).as("val_5m"))
        .orderBy("user_id", "event_id")
    }),

    // ---- W9: interval coalescing (gaps-and-islands over INTERVALS:
    //      each event holds its device "present" for 2 minutes;
    //      overlapping/touching holds merge into maximal presence
    //      spans — running-MAX island detection, one exchange) ----
    "w9_interval_merge" -> ((s, d) => {
      val iv = ev(s, d).select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("s_ms"),
        (unix_millis(col("ts")) + 120000L).as("e_ms"))
      graft.operators.Sessionize
        .mergeIntervals(iv, "user_id", "s_ms", "e_ms", col("event_id"))
        .orderBy("user_id", "interval_id")
    }),

    // ---- T5: pivot (conditional aggregation over a fixed column set) ----
    "t5_pivot" -> ((s, d) => ev(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")),

    // ---- A6c: explicit GROUPING SETS with grouping_id ----
    "a6c_grouping_sets" -> ((s, d) => li(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("gid"), col("n"), col("sum_qty"))
      .orderBy("rflag", "lstatus", "gid")),

    // ---- L4c: TF-IDF top terms per doc ----
    "l4c_tfidf" -> ((s, d) =>
      TextAnalysis.tfIdfTopTerms(Tables.documents(s, d), 3)
        .orderBy("doc_id", "rnk")),

    // ---- SAMP: deterministic hash-gate sample (reproducible splits) ----
    "samp_hash" -> ((s, d) =>
      graft.operators.Sampling
        .hashSample(Tables.documents(s, d), col("doc_id"), 0.25, "s1")
        .select(col("doc_id"), col("lang")).orderBy("doc_id")),

    // ---- SAMP: stratified mixture weights (per-language rates) ----
    "samp_stratified" -> ((s, d) =>
      graft.operators.Sampling
        .stratifiedHashSample(Tables.documents(s, d), col("lang"), col("doc_id"),
          Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.1),
          defaultFraction = 0.05, salt = "mix")
        .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
        .orderBy("lang")),

    // ---- MIX: temperature-flattened source mixing (T=0.5 — rare
    //      languages upweighted; en is 4× fr in the corpus but samples
    //      at ~half fr's rate). Rates + kept-count per stratum ----
    "mix_temperature" -> ((s, d) =>
      graft.operators.Mixing
        .temperatureMix(Tables.documents(s, d), col("lang"), col("doc_id"),
          targetRows = 200L, temperature = 0.5, salt = "mixT")
        .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
        .orderBy("lang")),

    // ---- MIX: DSIR importance selection (Xie et al. 2023) — score
    //      every doc by hashed-bigram log-likelihood ratio vs the
    //      target domain (lang='en' sample); the fitted 64-bucket
    //      model collects once (bounded) and re-enters as a literal,
    //      so the scoring pass is map-only. Micro-quantized per-bucket
    //      log-ratios make doc scores exact integers ----
    "mix_dsir" -> ((s, d) => {
      // spread: 3 md5-per-bigram passes (two histograms, the scoring
      // pass) over a single-row-group parquet otherwise run on ONE core
      val docs = Tables.spread(Tables.documents(s, d))
      graft.operators.Mixing
        .dsirSelect(docs, docs.filter(col("lang") === "en"), "text",
          nBuckets = 64, minScoreMicro = 0L)
        .select("doc_id", "lang", "n_bigrams", "score_micro", "keep")
        .orderBy("doc_id")
    }),

    // ---- MIX: token-budget water-filling — split a 200k-token budget
    //      across sources by √-flattened weights, redistributing the
    //      surplus of sources too small to absorb their share; the
    //      corpus contributes ONE map-combined token sum, all rounds
    //      run on the |sources|-row table ----
    "mix_budget" -> ((s, d) =>
      graft.operators.Mixing
        .budgetAllocation(Tables.documents(s, d), col("source"), col("n_chars"),
          budget = 200000L, rounds = 3)
        .orderBy("source")),

    // ---- MIX5: deterministic multinomial upsampling — fractional
    //      epoch replication by language (mean copies = rate, realized
    //      copies a pure function of (doc_id, salt)); map-only
    //      explode, stable replica ids ----
    "mix_upsample" -> ((s, d) =>
      graft.operators.Mixing
        .upsample(Tables.documents(s, d).select("doc_id", "lang"),
          col("doc_id"),
          when(col("lang") === "en", lit(0.4))
            .when(col("lang") === "fr", lit(1.5))
            .when(col("lang") === "de", lit(2.25))
            .otherwise(lit(1.0)),
          salt = "ep1")
        .orderBy("doc_id", "copy_idx")),

    // ---- PACK2: token-level sequence packing — the concat-and-chunk
    //      pretraining layout: docs concatenated in doc_id order, cut
    //      at 512-token boundaries, boundary-crossing docs split with
    //      exact in-sequence token ranges ----
    "pack_sequences" -> ((s, d) =>
      graft.operators.Packing.packSequences(
          Tables.documents(s, d).select(col("doc_id"), col("text")),
          Seq(col("doc_id")),
          TextFunctions.tokenCount(col("text")).cast("long"),
          seqLen = 512L, idCols = Seq("doc_id"))
        .orderBy("seq_id", "doc_id")),

    // ---- MIX6: curriculum order — length-banded difficulty ramp
    //      (short docs first), deterministic shuffle within a band ----
    "mix_curriculum" -> ((s, d) =>
      graft.operators.Mixing
        .curriculumOrder(
          Tables.documents(s, d).select(col("doc_id"),
            floor(col("n_chars") / 500.0).cast("long").as("band")),
          col("band"), col("doc_id"), salt = "cur0")
        .select("doc_id", "band", "pos")
        .orderBy("pos")),

    // ---- MIX: reproducible global shuffle (training order as a pure
    //      function of (key, salt); scale-safe dense sequence — no
    //      partitionless window) ----
    "mix_shuffle" -> ((s, d) =>
      graft.operators.Mixing
        .deterministicShuffle(Tables.documents(s, d).select("doc_id"),
          col("doc_id"), salt = "ep0")
        .select(col("doc_id"), col("pos"))
        .orderBy("pos")),

    // ---- T5b: unpivot (wide measures → long (measure, value) rows) ----
    "t5b_unpivot" -> ((s, d) => li(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_discount"), col("l_tax"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "measure", "value")
      .orderBy("l_orderkey", "l_linenumber", "measure")),

    // ---- L3d: per-label embedding centroids (array-column aggregate).
    //      Means via floor-scaled integer sums: long addition is
    //      order-free, so the distributed partial-sum order can't
    //      perturb the result (float summation order would) ----
    "l3d_centroids" -> ((s, d) => {
      def dim(i: Int) =
        round(sum(floor(element_at(col("embedding"), i + 1).cast("double") * 1000.0)
          .cast("long")).cast("double") / (count(lit(1)) * 1000.0), 4) + lit(0.0)
      Tables.embeddings(s, d)
        .groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("n_vecs"),
          dim(0).as("c0"), dim(1).as("c1"), dim(2).as("c2"), dim(3).as("c3"))
        .orderBy("label")
    }),

    // ---- A21: winsorization — clamp into the per-group [p2, p98]
    //      percentile band; one percentile agg + broadcast + map-side
    //      least/greatest, corpus never shuffles ----
    "a21_winsorize" -> ((s, d) =>
      graft.operators.Binning.winsorize(
          Tables.events(s, d).select(col("event_type"), col("event_id"),
            round(col("value") * 100).cast("long").as("y")),
          Seq("event_type"), col("y"), pLowPct = 2, pHighPct = 98)
        .select("event_type", "event_id", "y", "y_w")
        .orderBy("event_type", "event_id")),

    // ---- A20: key-skew diagnosis (run BEFORE the big join): exact
    //      integer top-share and Gini ppm per group; one count exchange
    //      + a rank window over the KEY table, never data rows ----
    "a20_skew_report" -> ((s, d) =>
      graft.operators.Skew.skewReport(
          Tables.events(s, d), Seq("event_type"), col("user_id"))
        .orderBy("event_type")),

    // ---- A19: per-group equal-frequency binning — exact-percentile
    //      boundaries (one aggregate) + broadcast-join + map-side
    //      assignment; NEVER ntile's partitionless corpus sort ----
    "a19_eqfreq_bins" -> ((s, d) =>
      graft.operators.Binning.equalFreqBins(
          Tables.events(s, d).select(col("event_type"), col("event_id"),
            round(col("value") * 100).cast("long").as("y")),
          Seq("event_type"), col("y"), nBins = 4)
        .groupBy("event_type", "bin")
        .agg(count(lit(1)).as("n"), min("y").as("y_min"), max("y").as("y_max"))
        .orderBy("event_type", "bin")),

    // ---- ER: entity-resolution capstone — blocked edit-distance link
    //      → vocabulary-graph components → canonical election (most
    //      frequent variant). Oracle replays with a recursive CTE ----
    "entity_resolution" -> ((s, d) =>
      graft.operators.Components.resolveEntities(
          Tables.part(s, d), "p_name", maxDist = 2)
        .orderBy("variant")),

    // ---- ER2: field-level survivorship — each entity cluster merges
    //      into ONE golden record with per-field election rules (max
    //      price, freshest brand, modal size/type): the MDM merge step
    //      downstream of entity_resolution. Every rule is a
    //      map-combinable aggregate (arg-max struct for Latest, a
    //      grouped-count election for Mode) — no window over records ----
    "er_golden_record" -> ((s, d) => {
      import graft.operators.Survivorship
      val parts = Tables.part(s, d)
      val ents = graft.operators.Components
        .resolveEntities(parts, "p_name", maxDist = 2)
        .select(col("variant"), col("entity_id"), col("canonical"))
      val recs = parts.join(ents, parts("p_name") === ents("variant"))
      Survivorship.goldenRecord(recs, "entity_id", Seq(
          "canonical" -> Survivorship.MinOf("canonical"),
          "price_max" -> Survivorship.MaxOf("p_retailprice"),
          "brand_latest" -> Survivorship.LatestOf("p_brand", "p_partkey", "p_partkey"),
          "size_mode" -> Survivorship.ModeOf("p_size"),
          "type_mode" -> Survivorship.ModeOf("p_type")))
        .select(col("entity_id"), col("canonical"), col("n_records"),
          round(col("price_max"), 2).as("price_max"), col("brand_latest"),
          col("size_mode").cast("long").as("size_mode"), col("type_mode"))
        .orderBy("entity_id")
    }),

    // ---- ER3: Fellegi–Sunter calibration — learn per-field log-odds
    //      match weights from the ER clusters as truth. Count-based:
    //      every m/u cell is a Σ C(n,2) over group sizes (block,
    //      block×entity, block×value, block×entity×value), so the
    //      calibration never materializes a pair. `size_eq` is a
    //      deliberately uninformative field: FS drives its weight to
    //      ~0, which is the point of calibrating instead of hand-tuning ----
    "er_fs_weights" -> ((s, d) => {
      val parts = Tables.part(s, d)
      val ents = graft.operators.Components
        .resolveEntities(parts, "p_name", maxDist = 2)
        .select(col("variant"), col("entity_id"))
      val recs = parts.join(ents, parts("p_name") === ents("variant"))
      graft.operators.Linkage.fellegiSunterWeights(recs,
        element_at(split(col("p_name"), " "), 1), col("entity_id"),
        FsFields)
    }),

    // ---- ER3e: frequency-based (value-specific) agreement weights —
    //      the classic FS refinement: agreement on a RARE value (few
    //      in-block agreeing pairs) carries more log-odds evidence
    //      than on a common one. Same pair-free Σ C(n,2) counts, one
    //      grouping level deeper (per-(field, value)); the oracle
    //      replays value-level counts + identical smoothing against
    //      the same ER-cluster truth ----
    "er_fs_value_weights" -> ((s, d) => {
      val parts = Tables.part(s, d)
      val ents = graft.operators.Components
        .resolveEntities(parts, "p_name", maxDist = 2)
        .select(col("variant"), col("entity_id"))
      val recs = parts.join(ents, parts("p_name") === ents("variant"))
      graft.operators.Linkage.fellegiSunterValueWeights(recs,
        element_at(split(col("p_name"), " "), 1), col("entity_id"),
        Seq("suf3_eq" -> substring(col("p_name"), -3, 3),
          "size_eq" -> col("p_size")))
    }),

    // ---- ER3b: FS apply step — the match/non-match score-separation
    //      histogram an MDM operator reads to pick link/review/reject
    //      thresholds. Salted blocked pair stream reduces to agreement-
    //      PATTERN counts (map-side combined, ≤2^(fields+1) rows)
    //      before any weight arithmetic: shuffle O(patterns), not
    //      O(pairs) ----
    "er_fs_scores" -> ((s, d) => {
      val parts = Tables.part(s, d)
      val ents = graft.operators.Components
        .resolveEntities(parts, "p_name", maxDist = 2)
        .select(col("variant"), col("entity_id"))
      val recs = parts.join(ents, parts("p_name") === ents("variant"))
      val blk = element_at(split(col("p_name"), " "), 1)
      val w = graft.operators.Linkage.fellegiSunterWeights(
        recs, blk, col("entity_id"), FsFields)
      graft.operators.Linkage.scoreSeparation(recs,
          blk, col("entity_id"), FsFields, w)
        .orderBy("is_match", "score_unit")
    }),

    // ---- ER3c: UNSUPERVISED FS calibration — EM over the pair-free
    //      agreement-pattern counts (Winkler's latent-class fit), no
    //      truth label anywhere. Pattern statistic ≤2^4 rows (bounded-
    //      model collect), every cross-pattern reduction an integer
    //      sum so the unrolled DuckDB replay is bit-exact ----
    "er_fs_em" -> ((s, d) =>
      graft.operators.Linkage.fellegiSunterEmWeights(
        Tables.part(s, d), element_at(split(col("p_name"), " "), 1),
        FsFields)),

    // ---- ER3d: UNSUPERVISED entity resolution end to end — the
    //      linkage capstone with no truth label at any stage: EM
    //      calibrates the weights (ER3c), the salted blocked scorer
    //      ranks candidate pairs, positive total evidence links them,
    //      and star contraction closes the link graph transitively.
    //      Oracle replays the whole chain: unrolled EM → scored pair
    //      join → recursive-CTE closure ----
    "er_fs_link" -> ((s, d) => {
      val parts = Tables.part(s, d)
      val blk = element_at(split(col("p_name"), " "), 1)
      val w = graft.operators.Linkage.fellegiSunterEmWeights(
        parts, blk, FsFields)
      // only DISCRIMINATING fields link (w_agree ≥ w_disagree — a
      // field whose agreement is not positive evidence relative to
      // disagreement is excluded from the decision, the standard
      // linkage practice; the oracle applies the same guard). Then
      // links WITHOUT scoring a single pair: score is monotone in the
      // agreement pattern, so minimal positive patterns generate the
      // link graph as per-(block, values) group STARS — O(records)
      val mono = w.collect()
        .filter(r => r.getLong(3) >= r.getLong(4))
        .map(_.getString(0)).toSet
      val linkFields = FsFields.filter { case (n, _) => mono(n) }
      val links = graft.operators.Linkage.positiveEvidenceLinks(
        parts, col("p_partkey"), blk, linkFields, w)
      graft.operators.Components.connectedComponents(
          parts.select(col("p_partkey")), links)
        .select(col("p_partkey").as("pk"),
          col("component").as("entity_id"))
        .withColumn("n_records", count(lit(1))
          .over(Window.partitionBy("entity_id")).cast("long"))
        .orderBy("pk")
    }),

    // ---- ER3f: value-specific weights IN the linkage decision
    //      (VERDICT r8 #5): the supervised field calibration plus the
    //      frequency table score every candidate pair — agreement on a
    //      rare value outscores the same pattern on a common one —
    //      and score ≥ 0 is the link decision. The O(values) weight
    //      table joins the O(records) side pre-pair, so the pair
    //      stream stays map-only; the star-link path keeps field-level
    //      weights by design (monotonicity argument in
    //      Linkage.scoreValuePairs' scaladoc) ----
    "er_fs_value_link" -> ((s, d) => {
      val parts = Tables.part(s, d)
      // three consumers (field weights, value weights, the scorer) read
      // the ER truth — materialize the vocabulary-sized resolution once
      // instead of re-running the iterative closure per branch
      val ents = graft.operators.Checkpoint(graft.operators.Components
        .resolveEntities(parts, "p_name", maxDist = 2)
        .select(col("variant"), col("entity_id")))
      // the resolved record table ALSO feeds all three consumers —
      // checkpoint it too, or each re-runs the parts⋈ents join
      val recs = graft.operators.Checkpoint(
        parts.join(ents, parts("p_name") === ents("variant")))
      val blk = element_at(split(col("p_name"), " "), 1)
      // one calibration pass yields BOTH tables (field = value folded)
      val (w, vw) = graft.operators.Linkage.fellegiSunterBothWeights(
        recs, blk, col("entity_id"), FsFields)
      graft.operators.Linkage.scoreValuePairs(recs, col("p_partkey"),
          blk, col("entity_id"), FsFields, w, vw)
        .filter(col("score_micro") >= 0L)
        // materialize the scored pairs before the declared total sort
        // (r17, guide §2.4): orderBy's RangePartitioner SAMPLES its
        // input, and the sampler re-executed the whole fused 6.6M-pair
        // scoring stage (executed-plan metrics: the pair exchange read
        // 2x its written rows; JobProbe: two 28-task stages of 11.5 s
        // and 14.2 s task time for one scoring pass of declared work).
        // The checkpoint is rows-out-sized and recomputed per run —
        // a lineage barrier, not a cross-run cache.
        .transform(graft.operators.Checkpoint.apply)
        .orderBy("a_id", "b_id")
    }),

    // ---- PROFILE: capstone composed report (README.md:15-19 — the
    //      per-device server profile: census + active hour + top
    //      interest + dwell sessions, one multi-join report) ----
    "device_profile" -> ((s, d) => {
      val e = ev(s, d)
      val census = e.groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        countDistinct("event_type").as("n_types"))
      val hourW = Window.partitionBy("user_id")
        .orderBy(col("n").desc, col("hr"))
      val modalHour = e.groupBy(col("user_id"), hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(hourW)).filter(col("rn") === 1)
        .select(col("user_id"), col("hr").cast("long").as("modal_hour"))
      val typeW = Window.partitionBy("user_id")
        .orderBy(col("n").desc, col("event_type"))
      val topType = e.groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(typeW)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("top_type"))
      val sess = graft.operators.Sessionize
        .sessions(e, "user_id", "ts", col("event_id"), gapSeconds = 1800L)
        .groupBy("user_id").agg(
          count(lit(1)).as("n_sessions"),
          // long sum (order-free) then ONE division — deterministic
          round(sum(col("duration_s").cast("long")).cast("double")
            / count(lit(1)), 2).as("avg_session_s"))
      census.join(modalHour, "user_id").join(topType, "user_id")
        .join(sess, "user_id")
        .orderBy("user_id")
    }),

    // ---- PACK: fixed-token-budget sequence packing per language ----
    "pack_bins" -> ((s, d) =>
      graft.operators.Packing.packBins(
          Tables.documents(s, d).select(col("doc_id"), col("lang"), col("text")),
          "lang", Seq(col("doc_id")), TextFunctions.tokenCount(col("text")), budget = 2048L)
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("bin"), col("bin_offset"))
        .orderBy("lang", "doc_id")),

    // ---- PACK (BPE budget): same packer, but the budget counts
    //      MERGED BPE tokens (the unit a trainer actually pays for),
    //      not whitespace words — the l4e merge table applied by the
    //      native tokenizer, replayed in the oracle via the same
    //      recursive CTE ----
    "pack_bins_bpe" -> ((s, d) =>
      graft.operators.Packing.packBins(
          Tables.documents(s, d).select(col("doc_id"), col("lang"), col("text")),
          "lang", Seq(col("doc_id")),
          TextFunctions.bpeMergedTokenCount(col("text")), budget = 2048L)
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("bin"), col("bin_offset"))
        .orderBy("lang", "doc_id")),

    // ---- CURATE: composed training-data pipeline — exact dedup →
    //      language filter → quality gates → deterministic 50% sample ----
    "curated_corpus" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val kept = Dedup.dropExactDuplicates(docs)
      val filtered = kept.filter(col("lang") === "en")
        .withColumn("n_tokens", TextFunctions.tokenCount(col("text")).cast("long"))
        .withColumn("punct_ratio", round(TextFunctions.punctRatio(col("text")), 4))
        .filter(col("n_tokens") >= 50 && col("punct_ratio") <= 0.10)
      graft.operators.Sampling.hashSample(filtered, col("doc_id"), 0.5, "cur")
        .select(col("doc_id"), col("n_tokens"), col("punct_ratio"))
        .orderBy("doc_id")
    }),

    // ---- CAPSTONE (curation): the end-to-end training-manifest
    //      pipeline — normalize → exact-dedup on canonical content →
    //      token gate → temperature-flattened language mix →
    //      reproducible global shuffle → fixed-budget packing. Output
    //      is the manifest a trainer consumes: every row knows its
    //      epoch position and its (bin, offset) in the token stream,
    //      and the whole thing is a pure function of (corpus, salts) ----
    // ---- CAPSTONE: corpus ADMISSION — the daily-ingest decision
    //      pipeline composed from this round's primitives: a new batch
    //      dedupes against the existing corpus's fingerprint STATE
    //      (l1b), survivors pass the learned quality gate on raw text
    //      (l4p), decontaminate against the eval set (l2h), and land
    //      in deterministic train/val/test splits (samp_splits). Every
    //      stage is exact/integer, so one DuckDB query replays the
    //      whole admission decision ----
    "corpus_admission" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val batch = docs.filter(col("doc_id") % 10 < 3)
      val admitted = Dedup.incrementalDedup(batch,
        Dedup.exactGroups(docs.filter(col("doc_id") % 10 >= 3)))
      val quality = TextAnalysis.linearQualityGate(batch)
        .select(col("doc_id"), col("margin_micro"), col("pass"))
      val clean = Dedup.decontaminate(batch,
          docs.filter(col("doc_id") % 20 === 0), n = 3, minHits = 5L)
        .filter(!col("contaminated")).select("doc_id")
      val out = admitted
        .join(quality, "doc_id").filter(col("pass")).drop("pass")
        .join(clean, "doc_id")
      graft.operators.Sampling.assignSplits(out, col("doc_id"),
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05), salt = "adm")
        .select(col("doc_id"), col("fp"), col("n_in_batch"),
          col("margin_micro"), col("split"))
        .orderBy("doc_id")
    }),

    "training_manifest" -> ((s, d) => {
      val dedupW = Window.partitionBy(md5(col("norm_text"))).orderBy(col("doc_id"))
      val gated = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          TextFunctions.normalizeText(col("text")).as("norm_text"))
        .withColumn("toks", TextFunctions.tokenCount(col("norm_text")).cast("long"))
        .withColumn("_rn", row_number().over(dedupW))
        .filter(col("_rn") === 1 && col("toks") >= 20)
        .select("doc_id", "lang", "toks")
      val mixed = graft.operators.Mixing
        .temperatureMix(gated, col("lang"), col("doc_id"),
          targetRows = 150L, temperature = 0.5, salt = "tm")
      val shuffled = graft.operators.Mixing
        .deterministicShuffle(mixed, col("doc_id"), "tm-order", "pos")
      graft.operators.Packing
        .packBins(shuffled, "lang", Seq(col("pos")), col("toks"), budget = 256L)
        .select(col("doc_id"), col("lang"), col("pos"), col("n_tokens"),
          col("bin"), col("bin_offset"))
        .orderBy("pos")
    }),

    // ---- CAPSTONE: epoch manifest — the round-6 additions composed
    //      end-to-end into the artifact a training job actually reads:
    //      fractional per-language upsampling (MIX5) → curriculum
    //      order over the REPLICAS (MIX6, band = length decade) →
    //      token-level 512-sequence packing (PACK2). Every stage
    //      deterministic, the whole chain replayed in one oracle ----
    "epoch_manifest" -> ((s, d) => {
      val reps = graft.operators.Mixing
        .upsample(Tables.documents(s, d)
            .select(col("doc_id"), col("lang"), col("text"), col("n_chars")),
          col("doc_id"),
          when(col("lang") === "en", lit(0.4))
            .when(col("lang") === "fr", lit(1.5))
            .when(col("lang") === "de", lit(2.25))
            .otherwise(lit(1.0)),
          salt = "em")
        .withColumn("band", floor(col("n_chars") / 500.0).cast("long"))
      val ordered = graft.operators.Mixing
        .curriculumOrder(reps, col("band"), col("replica_id"), salt = "em-order")
      graft.operators.Packing.packSequences(
          ordered.withColumn("toks",
            TextFunctions.tokenCount(col("text")).cast("long")),
          Seq(col("pos")), col("toks"), seqLen = 512L,
          idCols = Seq("replica_id", "doc_id", "copy_idx", "band", "pos", "toks"))
        .select(col("seq_id"), col("doc_id"), col("copy_idx"), col("band"),
          col("pos"), col("n_from_doc"), col("seq_tok_start"),
          col("is_doc_head"), col("is_doc_tail"))
        .orderBy("seq_id", "pos")
    }),

    // ---- SAMP: deterministic disjoint train/val/test assignment —
    //      one gate draw, half-open cumulative intervals; map-only ----
    "samp_splits" -> ((s, d) =>
      graft.operators.Sampling.assignSplits(Tables.documents(s, d),
          col("doc_id"), Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05), "sp")
        .select(col("doc_id"), col("split"))
        .orderBy("doc_id")),

    // ---- SAMP: A-Res weighted sample — length-proportional draw
    //      ("sample by tokens, not by documents"); map-only score +
    //      TakeOrderedAndProject top-k, no full sort ----
    "samp_weighted" -> ((s, d) =>
      graft.operators.Sampling
        .weightedSample(Tables.documents(s, d), col("doc_id"), col("n_chars"),
          k = 40, salt = "w1")
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id")),

    // ---- SAMP: per-stratum A-Res (k per language, weight-proportional
    //      within the stratum) — one hash exchange + window, no global
    //      ordering ----
    "samp_weighted_group" -> ((s, d) =>
      graft.operators.Sampling
        .weightedSamplePerGroup(Tables.documents(s, d), col("lang"),
          col("doc_id"), col("n_chars"), k = 5, salt = "w2")
        .select(col("lang"), col("doc_id"), col("n_chars"))
        .orderBy("lang", "doc_id")),

    // ---- L4g: BM25 keyword retrieval (log-free rational idf,
    //      micro-unit integer scores — exact across engines) ----
    "l4g_bm25" -> ((s, d) =>
      TextAnalysis.bm25TopDocs(Tables.documents(s, d),
        Seq("hash", "join", "filter"), k = 10)),

    // ---- G4: fixed-iteration integer PageRank over the symmetrized
    //      device↔SSID bipartite graph ("which APs anchor the
    //      neighborhood") — 3 unrolled (join + map-combined sum)
    //      rounds, BIGINT micro-units end to end ----
    "g4_pagerank" -> ((s, d) => {
      val obs = ev(s, d).select(
        concat(lit("u:"), col("user_id")).as("mac"),
        concat(lit("t:"), col("event_type")).as("ssid"))
      val und = graft.operators.NetworkTree.edges(obs)
      val dir = und.select(col("mac").as("src"), col("ssid").as("dst"), col("weight"))
        .union(und.select(col("ssid").as("src"), col("mac").as("dst"), col("weight")))
      graft.operators.PageRank.pageRankFixed(dir, "src", "dst", "weight", iters = 3)
        .orderBy("node")
    }),

    // ---- G5: personalized PageRank — restart mass pinned to a seed
    //      set (the "what surrounds this watchlist" form of G4:
    //      proximity to the seeds, exact 0 for nodes their mass cannot
    //      reach in `iters` hops). Same integer-quantized unrolled
    //      plan; the seed set is watchlist-sized and broadcast ----
    "g5_ppr" -> ((s, d) => {
      import s.implicits._
      val obs = ev(s, d).select(
        concat(lit("u:"), col("user_id")).as("mac"),
        concat(lit("t:"), col("event_type")).as("ssid"))
      val und = graft.operators.NetworkTree.edges(obs)
      val dir = und.select(col("mac").as("src"), col("ssid").as("dst"), col("weight"))
        .union(und.select(col("ssid").as("src"), col("mac").as("dst"), col("weight")))
      val seeds = Seq("t:purchase", "t:signup").toDF("node")
      graft.operators.PageRank
        .personalizedPageRankFixed(dir, "src", "dst", "weight", seeds, iters = 3)
        .orderBy("node")
    }),

    // ---- G6: bounded-hop BFS from the same seed set — the blast-
    //      radius audit pairing G5's seeded-zero ranks: every node
    //      within 3 hops with its min distance; unreachable absent ----
    "g6_bfs_hops" -> ((s, d) => {
      import s.implicits._
      val obs = ev(s, d).select(
        concat(lit("u:"), col("user_id")).as("mac"),
        concat(lit("t:"), col("event_type")).as("ssid"))
      val und = graft.operators.NetworkTree.edges(obs)
      val dir = und.select(col("mac").as("src"), col("ssid").as("dst"))
        .union(und.select(col("ssid").as("src"), col("mac").as("dst")))
      val seeds = Seq("t:purchase", "t:signup").toDF("node")
      graft.operators.Components.bfsHops(dir, "src", "dst", seeds, maxHops = 3)
        .orderBy("node")
    }),

    // ---- J9: grid-bucketed radius self-join (all point pairs within
    //      r=6) — the equi-join rewrite of an O(n²) spatial cross join.
    //      Prime-moduli scatter (13s mod 97, 29s mod 89) spreads the
    //      keys pseudo-uniformly over a true 2-D field (a shared
    //      modulus would collapse the points onto a 1-D lattice) ----
    "j9_radius_join" -> ((s, d) => {
      val pts = Tables.supplier(s, d).select(col("s_suppkey").as("pid"),
        ((col("s_suppkey") * 13) % 97).as("x"), ((col("s_suppkey") * 29) % 89).as("y"))
      graft.operators.SpatialJoin.radiusPairs(pts, "pid", "x", "y", r = 6.0)
        .orderBy("id_a", "id_b")
    }),

    // ---- J11: Allen interval algebra — every within-user pair of
    //      per-event-type activity spans named with its temporal
    //      relation (the habit-analysis layer over interval ops) ----
    "j11_allen_relations" -> ((s, d) => {
      val iv = ev(s, d).groupBy(col("user_id"), col("event_type"))
        .agg(min(col("ts")).as("s"), max(col("ts")).as("e"))
      graft.operators.Sessionize
        .allenRelations(iv, "user_id", "event_type", "s", "e")
        .orderBy("user_id", "a_id", "b_id")
    }),

    // ---- J10: Bloom-pruned equi join — the probe side (lineitem)
    //      drops definite non-matches inside its scan, BEFORE its
    //      exchange; the exact join then kills false positives, so the
    //      result is bit-identical to the plain join (the oracle IS the
    //      plain join). PlanSpec proves the filter sits pre-shuffle ----
    "j10_bloom_join" -> ((s, d) => {
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_totalprice"))
      graft.operators.BloomJoin.bloomPrunedJoin(
          li(s, d).select(col("l_orderkey").as("o_orderkey"),
            col("l_linenumber"), col("l_quantity")),
          urgent, "o_orderkey")
        .orderBy("o_orderkey", "l_linenumber")
    }),

    // ---- A12: relational count-min sketch — fixed 4×1024 counter
    //      matrix replayed exactly by the oracle; est ≥ exact always ----
    "a12_cms_heavy" -> ((s, d) => {
      val e = ev(s, d)
      val cms = graft.operators.CountMin.build(e, col("user_id"),
        depth = 4, width = 1024, salt = "cm")
      val keys = e.select(col("user_id")).distinct()
      val est = graft.operators.CountMin.estimate(cms, keys, "user_id",
        depth = 4, width = 1024, salt = "cm")
      val exact = e.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
      est.join(exact, "user_id")
        .filter(col("est") >= 60L)
        .select(col("user_id"), col("exact_n"), col("est"))
        .orderBy("user_id")
    }),

    // ---- A13: ordered funnel (view → click → purchase): chained
    //      conditional min-aggregates co-partitioned on user_id — no
    //      window over the log, no per-user arrays ----
    "a13_funnel" -> ((s, d) =>
      graft.operators.ProductAnalytics
        .funnelTimes(ev(s, d), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))
        .select(col("user_id"),
          date_format(col("t1"), "yyyy-MM-dd HH:mm:ss.SSS").as("t1"),
          date_format(col("t2"), "yyyy-MM-dd HH:mm:ss.SSS").as("t2"),
          date_format(col("t3"), "yyyy-MM-dd HH:mm:ss.SSS").as("t3"))
        .orderBy("user_id")),

    // ---- A14: cohort retention triangle (first-seen day × offset) ----
    "a14_retention" -> ((s, d) =>
      graft.operators.ProductAnalytics.retention(ev(s, d), "user_id", "ts")
        .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
          col("day_offset"), col("n_users"))
        .orderBy("cohort_day", "day_offset")),

    // ---- A15: first-order event-type transition matrix (Markov
    //      structure of device behavior) ----
    "a15_transitions" -> ((s, d) =>
      graft.operators.ProductAnalytics
        .transitions(ev(s, d), "user_id", "ts", "event_type", "event_id")
        .orderBy("from_type", "to_type")),

    // ---- A22: frequent sequential patterns — top consecutive
    //      event-type trigrams (occurrences + distinct-device support):
    //      transitions generalized past bigrams; one key-partitioned
    //      window, map-combined groupBy, TakeOrderedAndProject top-k ----
    "a22_seq_patterns" -> ((s, d) =>
      graft.operators.ProductAnalytics
        .sequencePatterns(ev(s, d), "user_id", "ts", "event_type", "event_id",
          n = 3, k = 20)),

    // ---- L2k: URL canonicalization dedup — case drift, trailing
    //      slashes, and tracking params collapse to one crawl key ----
    "l2k_url_canon" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.UrlFunctions.canonicalUrl(synthUrl).as("curl"))
        .groupBy("curl")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
        .orderBy("curl")),

    // ---- L4m: registered-domain census (the per-domain cap /
    //      allowlist gate runs off exactly this table) ----
    "l4m_domains" -> ((s, d) =>
      Tables.documents(s, d)
        .select(graft.functions.UrlFunctions.registeredDomain(synthUrl).as("domain"))
        .groupBy("domain").agg(count(lit(1)).as("n"))
        .orderBy("domain")),

    // ---- L4n: OOV-bigram fluency gate (log-free perplexity proxy:
    //      share of a doc's bigrams outside the top-1000 LM) ----
    "l4n_oov_rate" -> ((s, d) =>
      TextAnalysis.oovBigramRate(Tables.spread(Tables.documents(s, d)), lmSize = 1000)
        .orderBy("doc_id")),

    // ---- L4w: Flesch readability (vowel-group syllable heuristic,
    //      terminator-run sentences, integer milli floor) ----
    "l4w_readability" -> ((s, d) =>
      TextAnalysis.readability(Tables.spread(Tables.documents(s, d)))
        .orderBy("doc_id")),

    // ---- L4t: per-source unigram KL vs the pooled corpus — which
    //      sources pull the mix off-distribution (add-one smoothed,
    //      exact integer micro-nats) ----
    "l4t_unigram_kl" -> ((s, d) =>
      TextAnalysis.unigramKl(Tables.spread(Tables.documents(s, d)))
        .orderBy("source")),

    // ---- L4s: bigram-LM quality scoring (the CCNet filter) — model
    //      trained on the English slice, every doc scored by avg
    //      negative log-likelihood in exact integer micro-units ----
    "l4s_lm_score" -> ((s, d) => {
      val docs = Tables.spread(Tables.documents(s, d))
      TextAnalysis.lmScore(docs, docs.filter(col("lang") === "en"))
        .orderBy("doc_id")
    }),

    // ---- Q3: one-pass table profile (the first query against an
    //      unknown 100 TB drop): per-column nulls, EXACT distincts,
    //      typed min/max — one aggregate, one scan ----
    "q3_profile" -> ((s, d) =>
      // spread: N exact countDistincts expand the scan ×N through ONE
      // single-row-group split — the whole aggregate ran on one core
      graft.operators.Profile.profile(Tables.spread(Tables.events(s, d)))
        .orderBy("col_name")),

    // ---- Q7: auto-generated expectation suite — bounds learned from
    //      the even-id reference half gate the dirtied odd-id target
    //      (event_type's planted nulls must FAIL, the rest pass) ----
    "q7_auto_expectations" -> ((s, d) => {
      // spread: same ×N-expand profile aggregates as q3_profile
      val e = Tables.spread(
        ev(s, d).select("event_type", "value", "user_id", "event_id"))
      val reference = e.filter(col("event_id") % 2 === 0)
      val target = e.filter(col("event_id") % 2 === 1)
        .withColumn("event_type",
          when(col("user_id") % 10 === 0, lit(null: String))
            .otherwise(col("event_type")))
      graft.operators.Profile
        .autoExpectations(reference, target,
          Seq("event_type", "value", "user_id"), nullSlackPpm = 10000L)
        .orderBy("col_name")
    }),

    // ---- Q8: physical partition-skew probe — what each of the 32
    //      reducer partitions of an exchange on user_id would carry
    //      (rows, keys, heaviest key + share). The report you run
    //      BEFORE the 100 TB shuffle: ragged n_rows → raise partition
    //      count; top_share_ppm → 10⁶ → one hot key, salt it (a20 is
    //      the key-level view, this is the partition-level one) ----
    "q8_partition_skew" -> ((s, d) =>
      graft.operators.Skew
        .partitionProbe(ev(s, d), col("user_id"), nParts = 32)
        .orderBy("bucket")),

    // ---- Q9: pre-join cardinality probe — the EXACT output size the
    //      events⋈orders-by-customer join would produce, decomposed by
    //      key, BEFORE paying for it; the salt-or-rethink advisor for
    //      output explosions (strictly cheaper than the join: two
    //      map-combined counts + a key-table join) ----
    "q9_join_explosion" -> ((s, d) =>
      graft.operators.Skew.joinCardinality(
          ev(s, d), col("user_id"),
          Tables.orders(s, d), col("o_custkey"), topK = 20)
        .orderBy(col("out_rows").desc, col("key"))),

    // ---- Q3b: profile drift between two snapshots (per-batch health
    //      gate). Snapshots = event_id parity halves; the "after" side
    //      is dirtied in-query (nulled event_types for one user cohort)
    //      so the null-rate delta actually fires ----
    "q3b_profile_drift" -> ((s, d) => {
      // spread: same ×N-expand profile aggregates as q3_profile
      val e = Tables.spread(
        ev(s, d).select("event_type", "value", "user_id", "event_id"))
      val before = e.filter(col("event_id") % 2 === 0)
      val after = e.filter(col("event_id") % 2 === 1)
        .withColumn("event_type",
          when(col("user_id") % 10 === 0, lit(null: String))
            .otherwise(col("event_type")))
      graft.operators.Profile
        .profileDrift(before, after, Seq("event_type", "value", "user_id"))
        .orderBy("col_name")
    }),

    // ---- CAPSTONE: contrastive training manifest — positives = exact
    //      near-dup pairs (l2q), negatives = deterministic draws
    //      (mix_negatives) anti-joined against the positives, split
    //      assignment on the pair key; label-balanced, leak-free by
    //      construction, a pure function of (corpus, salts) ----
    "contrastive_manifest" -> ((s, d) => {
      // the positive set feeds the union AND the negatives' anti join —
      // checkpoint so the whole set-similarity subtree runs once
      val pos = graft.operators.Checkpoint(
        Dedup.setSimJoin(Tables.spread(Tables.documents(s, d)),
            n = 3, tNum = 1, tDen = 2)
          .select(col("a_id"), col("b_id"), lit(1).as("label")))
      val negs = graft.operators.Mixing.negativePairs(
          Tables.documents(s, d), "doc_id", k = 1, salt = "cm")
        .select(least(col("doc_id"), col("negative_id")).as("a_id"),
          greatest(col("doc_id"), col("negative_id")).as("b_id"))
        .distinct()
        .join(pos.select("a_id", "b_id"), Seq("a_id", "b_id"), "left_anti")
        .select(col("a_id"), col("b_id"), lit(0).as("label"))
      graft.operators.Sampling.assignSplits(pos.unionByName(negs),
          concat_ws(":", col("a_id"), col("b_id")),
          Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)), salt = "cm")
        .orderBy("a_id", "b_id")
    }),

    // ---- T7: content fingerprints — the "did this input change?"
    //      resume gate: order-free summed row digests per source +
    //      rollup ALL, mergeable across shards by construction ----
    "t7_table_digest" -> ((s, d) =>
      graft.operators.Snapshot.contentDigests(Tables.documents(s, d),
          Seq("source"), Seq("doc_id", "text", "lang", "n_chars"))
        .orderBy("source")),

    // ---- MIX: deterministic negative sampling (contrastive pairs):
    //      k content-addressed negatives per anchor via dense positions
    //      + modular offsets — ONE equi join, never a cross join with
    //      random filters; a pure function of (ids, salt, k) ----
    "mix_negatives" -> ((s, d) =>
      graft.operators.Mixing.negativePairs(
          Tables.documents(s, d), "doc_id", k = 3, salt = "r6")
        .orderBy("doc_id", "j")),

    // ---- L4r: the BPE TRAINER's distributed step (tools.BpeTrain's
    //      iteration 1): adjacent char-pair counts over the unit
    //      VOCABULARY (pairs weighted by unit frequency — the corpus
    //      reduces to word counts first, the classic trainer shape) ----
    "l4r_bpe_pairs" -> ((s, d) => {
      val units = Tables.spread(Tables.documents(s, d))
        .select(explode(regexp_extract_all(col("text"),
          lit(TextFunctions.BpePattern), lit(0))).as("u"))
        .groupBy("u").agg(count(lit(1)).as("nu"))
        .filter(length(col("u")) >= 2)
      units
        .select(explode(expr(
            "transform(sequence(1, length(u) - 1), i -> substring(u, i, 2))"))
          .as("pair"), col("nu"))
        .groupBy("pair").agg(sum("nu").as("n"))
        .orderBy(desc("n"), col("pair")).limit(20)
    }),

    // ---- Q4: cross-table referential integrity — per FK edge, child
    //      rows pointing at a missing parent key (the check before any
    //      inner join silently drops rows); events→customer is the
    //      deliberately non-vacuous edge ----
    "q4_ref_integrity" -> ((s, d) =>
      graft.operators.Quality.referentialIntegrity(Seq(
        ("customer.nationkey->nation", Tables.customer(s, d), "c_nationkey",
          Tables.nation(s, d), "n_nationkey"),
        ("events.user_id->customer", Tables.events(s, d), "user_id",
          Tables.customer(s, d), "c_custkey"),
        ("lineitem.orderkey->orders", Tables.lineitem(s, d), "l_orderkey",
          Tables.orders(s, d), "o_orderkey"),
        ("lineitem.partkey->part", Tables.lineitem(s, d), "l_partkey",
          Tables.part(s, d), "p_partkey"),
        ("lineitem.suppkey->supplier", Tables.lineitem(s, d), "l_suppkey",
          Tables.supplier(s, d), "s_suppkey"),
        ("nation.regionkey->region", Tables.nation(s, d), "n_regionkey",
          Tables.region(s, d), "r_regionkey"),
        ("orders.custkey->customer", Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d), "c_custkey"),
        // deliberately broken edge — most custkeys have no event user,
        // proving the detector fires (every real edge is clean here)
        ("orders.custkey->event_users", Tables.orders(s, d), "o_custkey",
          Tables.events(s, d), "user_id"),
        ("supplier.nationkey->nation", Tables.supplier(s, d), "s_nationkey",
          Tables.nation(s, d), "n_nationkey")))
        .orderBy("fk")),

    // ---- Q5: k-anonymity audit — every quasi-identifier equivalence
    //      class with its population and a sub-k risk flag; one
    //      map-combined groupBy, class-sized output. QIs chosen so the
    //      sf tables produce both safe and at-risk classes ----
    "q5_k_anonymity" -> ((s, d) =>
      graft.operators.Governance.kAnonymity(
        ev(s, d).select(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("obs_date"),
          (col("user_id") % 25).as("cohort")),
        Seq("event_type", "obs_date", "cohort"), k = 5L)
        .orderBy("event_type", "obs_date", "cohort")),

    // ---- Q5b: the release-gate scalar — achieved k, class counts,
    //      rows in sub-k classes ----
    "q5b_k_anon_summary" -> ((s, d) =>
      graft.operators.Governance.kAnonymitySummary(
        ev(s, d).select(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("obs_date"),
          (col("user_id") % 25).as("cohort")),
        Seq("event_type", "obs_date", "cohort"), k = 5L)),

    // ---- Q5c: l-diversity — the homogeneity-attack audit k-anonymity
    //      misses (same QI classes as q5; sensitive = the measured
    //      value's decade band) ----
    "q5c_l_diversity" -> ((s, d) =>
      graft.operators.Governance.lDiversity(
        ev(s, d).select(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("obs_date"),
          (col("user_id") % 25).as("cohort"),
          floor(col("value") / 10.0).cast("long").as("value_band")),
        Seq("event_type", "obs_date", "cohort"), "value_band", l = 3L)
        .orderBy("event_type", "obs_date", "cohort")),

    // ---- Q5d: t-closeness — the distribution refinement completing
    //      the k → l → t privacy ladder: each class's value-band
    //      distribution must sit within ordered-EMD t of the global
    //      one. Integer numerators, one exactly-representable double
    //      division, micro-floored (identical IEEE result in DuckDB) ----
    "q5d_t_closeness" -> ((s, d) =>
      graft.operators.Governance.tCloseness(
        ev(s, d).select(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("obs_date"),
          (col("user_id") % 25).as("cohort"),
          floor(col("value") / 10.0).cast("long").as("value_band")),
        Seq("event_type", "obs_date", "cohort"), "value_band",
        tMicro = 200000L)
        .orderBy("event_type", "obs_date", "cohort")),

    // ---- Q6: erasure propagation — a broadcast deletion batch probed
    //      map-side against every subject-keyed table; per-table
    //      erase/survive counts, no fact-side shuffle ----
    "q6_erasure" -> ((s, d) =>
      graft.operators.Governance.erasureReport(
        Tables.customer(s, d).filter(col("c_custkey") % 97 === 0), "c_custkey",
        Seq(("customer", Tables.customer(s, d), "c_custkey"),
          ("orders", Tables.orders(s, d), "o_custkey"),
          ("events", ev(s, d), "user_id")))
        .orderBy("table_name")),

    // ---- Q2: declarative expectation report — every rule in ONE
    //      aggregate over ONE scan; adding a rule adds a column,
    //      not a pass over the corpus ----
    "q2_quality_checks" -> ((s, d) =>
      graft.operators.Quality.validate(Tables.documents(s, d), Seq(
        "text_null" -> col("text").isNull,
        "n_chars_negative" -> (col("n_chars") < 0),
        "n_chars_mismatch" -> (col("n_chars") =!= length(col("text"))),
        "lang_unknown" -> !col("lang").isin("en", "de", "fr", "ja"),
        "text_too_short" -> (length(col("text")) < 10)))
        .orderBy("rule")),

    // ---- T9: incremental aggregate maintenance (IVM) — the persisted
    //      per-key (n, vsum) state updated from a signed changeset
    //      (retract every 13th base row, insert the post-cut rows)
    //      at O(changeset); the ORACLE recomputes from the effective
    //      row set, proving merge ≡ recompute ----
    "t9_delta_agg" -> ((s, d) => {
      val e = ev(s, d)
      val cut = lit("2024-01-16").cast("timestamp")
      def vmilli = floor(col("value") * 1000).cast("long")
      val base = e.filter(col("ts") < cut)
      val baseState = base.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(vmilli).as("vsum"))
      val changes = base.filter(col("event_id") % 13 === 0)
        .select(col("event_type"), vmilli.as("v"), lit(-1L).as("sgn"))
        .unionByName(e.filter(col("ts") >= cut)
          .select(col("event_type"), vmilli.as("v"), lit(1L).as("sgn")))
      graft.operators.Snapshot.incrementalAgg(baseState, changes,
          Seq("event_type"), "v", "sgn")
        .orderBy("event_type")
    }),

    // ---- A16: distribution drift (total-variation distance) between
    //      two fleet windows — log-free, rational, no smoothing ----
    "a16_drift_tvd" -> ((s, d) => {
      val e = ev(s, d)
      val cut = lit("2024-01-16").cast("timestamp")
      graft.operators.Quality.driftTvd(
          e.filter(col("ts") < cut), e.filter(col("ts") >= cut), "event_type")
        .orderBy("cat")
    }),

    // ---- A17: EXACT distinct via mergeable word bitmaps (roaring-ish):
    //      dup occurrences vanish map-side in bit_or partials, the
    //      exchange carries one long per (group, 64-key word); oracle is
    //      an INDEPENDENT count(DISTINCT) derivation ----
    "a17_bitmap_distinct" -> ((s, d) =>
      graft.operators.BitmapDistinct.distinctCount(
          Tables.events(s, d), Seq("event_type"), col("user_id"))
        .orderBy("event_type")),

    // ---- A17b: the merge story — split the log at a date, persist two
    //      bitmap tables, merge WITHOUT the raw rows; equals a17 over
    //      the union by construction, and the oracle proves it ----
    "a17b_bitmap_merge" -> ((s, d) => {
      val e = Tables.events(s, d)
      val cut = lit("2024-01-16").cast("timestamp")
      val bd = graft.operators.BitmapDistinct
      val merged = bd.mergeBitmaps(
        bd.bitmaps(e.filter(col("ts") < cut), Seq("event_type"), col("user_id")),
        bd.bitmaps(e.filter(col("ts") >= cut), Seq("event_type"), col("user_id")),
        Seq("event_type"))
      merged.groupBy("event_type")
        .agg(sum(bit_count(col("bits"))).as("n_distinct"))
        .orderBy("event_type")
    }),

    // ---- A18: per-key OLS trend (slope/intercept/R² of value on
    //      hour-of-day) — five exact integer moments per group are the
    //      ONLY exchange; closed forms on the reduced row ----
    "a18_regression" -> ((s, d) =>
      graft.operators.Regression.ols(
          Tables.events(s, d), Seq("event_type"),
          hour(col("ts")),
          round(col("value") * 100).cast("long"), yScale = 100L)
        .orderBy("event_type")),

    // ---- T8: CDC apply (MERGE) — a changeset of upserts + deletes
    //      settles to one winner per key (map-combined max-struct),
    //      then ONE co-partitioned full outer join applies it; a
    //      same-key delete at higher version beats the upsert ----
    "t8_cdc_apply" -> ((s, d) => {
      val p = Tables.part(s, d)
      val base = p.filter(col("p_partkey") % 7 =!= 0)
        .select(col("p_partkey"), round(col("p_retailprice"), 2).as("price"))
      val upserts = p.filter(col("p_partkey") % 4 === 0)
        .select(col("p_partkey"), lit("upsert").as("op"), lit(1L).as("ver"),
          round(col("p_retailprice") + 100, 2).as("price"))
      val deletes = p.filter(col("p_partkey") % 6 === 0)
        .select(col("p_partkey"), lit("delete").as("op"), lit(2L).as("ver"),
          lit(null).cast("double").as("price"))
      graft.operators.Snapshot.applyChanges(base,
          upserts.unionByName(deletes), "p_partkey", "op", "ver", Seq("price"))
        .orderBy("p_partkey")
    }),

    // ---- A23: pairwise correlation matrix in ONE aggregate pass —
    //      every moment folds map-side into a single reduced row; the
    //      pair rows are reshaped from that row driver-free ----
    "a23_corr_matrix" -> ((s, d) =>
      graft.operators.Regression.correlationMatrix(
          li(s, d), Seq(
            "quantity" -> col("l_quantity").cast("long"),
            "discount_c" -> round(col("l_discount") * 100).cast("long"),
            "tax_c" -> round(col("l_tax") * 100).cast("long")))
        .orderBy("x_name", "y_name")),

    // ---- T6: keyed snapshot diff (fleet re-upload reconciliation /
    //      corpus-version CDC): added/removed/changed/unchanged per key,
    //      content reduced to a digest BEFORE the full outer join ----
    "t6_snapshot_diff" -> ((s, d) => {
      // two fleet uploads of per-device profiles: the old upload is
      // missing some devices (added), the new one dropped others
      // (removed), and a slice of devices kept recording past the old
      // cutoff (changed); the rest match bit-for-bit (unchanged)
      val e = ev(s, d)
      val cut = lit("2024-01-25").cast("timestamp")
      def profile(df: org.apache.spark.sql.DataFrame) = df.groupBy("user_id")
        .agg(count(lit(1)).as("n"), countDistinct(col("event_type")).as("t"))
      val old = profile(e.filter(col("ts") < cut))
        .filter(col("user_id") % 13 =!= 0)
      val neu = profile(e.filter(col("ts") < cut || col("user_id") % 3 === 0))
        .filter(col("user_id") % 11 =!= 0)
      graft.operators.Snapshot.diff(old, neu, "user_id", Seq("n", "t"))
        .orderBy("user_id")
    }),

    // ---- W11: SCD2 history build — consecutive same-state runs
    //      collapse to validity intervals; both event-wide windows
    //      share one (key)-ordered exchange ----
    "w11_scd2" -> ((s, d) =>
      graft.operators.Snapshot.scd2(ev(s, d), "user_id", "ts", "event_type", "event_id")
        .select(col("user_id"), col("event_type"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss.SSS").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss.SSS").as("valid_to"),
          col("n_events"))
        .orderBy("user_id", "valid_from")),

    // ---- W11b: time-travel read — every user's state AS OF a fixed
    //      instant, one codegen'd filter over the SCD2 intervals ----
    "w11b_asof_snapshot" -> ((s, d) =>
      graft.operators.Snapshot.asOf(
          graft.operators.Snapshot.scd2(ev(s, d), "user_id", "ts", "event_type", "event_id"),
          to_timestamp(lit("2024-01-15 00:00:00")))
        .select(col("user_id"), col("event_type"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss.SSS").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss.SSS").as("valid_to"),
          col("n_events"))
        .orderBy("user_id")),

    // ---- W10: dense hourly resample + forward fill (telemetry
    //      densification; sequence() bounded per key, one key window) ----
    "w10_gap_fill" -> ((s, d) =>
      graft.operators.Resample.hourlyForwardFill(ev(s, d), "user_id", "ts")
        .select(col("user_id"),
          date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hr"),
          col("n_obs"), col("n_filled"))
        .orderBy("user_id", "hr")),

    // ---- W12: linear interpolation at query instants via the UNION
    //      trick — one key window carries both bracketing samples past
    //      every query row; estimates each user's 'click' value at
    //      their 'view' times ----
    "w12_interpolate" -> ((s, d) => {
      val e = ev(s, d)
      graft.operators.Resample.interpolateAt(
          e.filter(col("event_type") === "click")
            .select(col("user_id"), col("ts"), round(col("value") * 100).cast("long").as("y")),
          e.filter(col("event_type") === "view"),
          "user_id", "ts", col("y"), yScale = 100L)
        .select(col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSS").as("ts"),
          col("interp"))
        .orderBy("user_id", "ts")
    }),

    // ---- W13: fixed-span EWMA (α = 1/2, newest heaviest) — exact
    //      integer numerator/denominator, one shared window ----
    "w13_ewma" -> ((s, d) =>
      graft.operators.Trend.ewma(
          ev(s, d).select(col("user_id"), col("event_id"), col("ts"),
            round(col("value") * 100).cast("long").as("y")),
          Seq("user_id"), Seq(col("ts"), col("event_id")), col("y"),
          span = 4, yScale = 100L)
        .select("user_id", "event_id", "ewma")
        .orderBy("user_id", "event_id")),

    // ---- W14: rolling z-score anomaly flag — the flag decided in
    //      integer arithmetic (no float boundary flips), score is the
    //      one final float ----
    "w14_anomaly" -> ((s, d) =>
      graft.operators.Trend.rollingAnomaly(
          ev(s, d).select(col("user_id"), col("event_id"), col("ts"),
            round(col("value") * 100).cast("long").as("y")),
          Seq("user_id"), Seq(col("ts"), col("event_id")), col("y"),
          n = 16, z = 2, minRows = 4)
        .select("user_id", "event_id", "zscore", "is_anomaly")
        .orderBy("user_id", "event_id")),

    // ---- W15: Holt double-exponential smoothing — level + trend,
    //      the two coupled recursive states single smoothing lacks.
    //      Genuinely unbounded recursion (no fixed-lag unroll): the
    //      engine runs a native per-key fold over the packed series;
    //      the oracle replays it as a recursive CTE performing the
    //      IDENTICAL IEEE double ops in the identical order — doubles
    //      are bit-equal before the display rounding ----
    "w15_holt" -> ((s, d) =>
      graft.operators.Trend.holt(
          ev(s, d).select(col("user_id"), col("event_id"), col("ts"),
            round(col("value") * 100).cast("long").as("y")),
          Seq("user_id"), Seq("ts", "event_id"), "y")
        // states quantized to integer centi-units: the doubles are
        // bit-identical across engines, and integer rounding's only
        // boundary (an exactly-representable .5) rounds the same both
        // sides — no fractional-display divergence
        .select(col("user_id"), col("event_id"),
          round(col("level")).cast("long").as("level_c"),
          round(col("trend")).cast("long").as("trend_c"),
          round(col("forecast")).cast("long").as("forecast_c"))
        .orderBy("user_id", "event_id")),

    // ---- W15b: Holt-Winters additive triple smoothing — the seasonal
    //      ring completes the ladder (single w13 → double w15 →
    //      triple w15b); the oracle's recursive CTE carries the ring
    //      as a LIST column, op order mirrored exactly ----
    "w15b_holt_winters" -> ((s, d) =>
      graft.operators.Trend.holtWinters(
          ev(s, d).select(col("user_id"), col("event_id"), col("ts"),
            round(col("value") * 100).cast("long").as("y")),
          Seq("user_id"), Seq("ts", "event_id"), "y", period = 4)
        .select(col("user_id"), col("event_id"),
          round(col("level")).cast("long").as("level_c"),
          round(col("trend")).cast("long").as("trend_c"),
          round(col("seasonal")).cast("long").as("seasonal_c"))
        .orderBy("user_id", "event_id")),

    // ---- O5: 2-D Pareto frontier (skyline) via the two-level bucketed
    //      running min — never a partitionless data-wide window. The
    //      oracle replays the QUADRATIC dominance definition (a
    //      different algorithm agreeing is the stronger check) ----
    "o5_skyline" -> ((s, d) => {
      val pts = Tables.part(s, d).select(col("p_retailprice").as("x"),
        pmod(conv(substring(md5(col("p_partkey").cast("string")), 1, 8), 16, 10)
          .cast("long"), lit(100000L)).as("y"))
      graft.operators.Skyline.paretoFrontier2D(pts, "x", "y", bucketWidth = 10.0)
        .orderBy("x", "y")
    })
  )

  // ================================================================
  // oracleSql — DuckDB twins (ANSI SQL over the same parquet tables)
  // ================================================================

  /** DuckDB expr: whitespace tokens of lowercased trimmed text. */
  private val ToksSql = "string_split_regex(trim(lower(text)), '\\s+')"

  /** DuckDB CTE chain shared by living_area and geo_cell_census: the
    * synthetic sensor geometry, the linearized least-squares normal
    * equations (Cramer solve), and the per-device modal cell `r`. */
  private val LivingAreaCteSql: String = {
    val det = "m11 * (m22*m33 - m23*m23) - m12 * (m12*m33 - m23*m13) + m13 * (m12*m23 - m22*m13)"
    val detX = "v1 * (m22*m33 - m23*m23) - m12 * (v2*m33 - m23*v3) + m13 * (v2*m23 - m22*v3)"
    val detY = "m11 * (v2*m33 - m23*v3) - v1 * (m12*m33 - m23*m13) + m13 * (m12*v3 - v2*m13)"
    s"""WITH obs AS (
       |  SELECT l_orderkey % 50 AS mac, month(l_shipdate) AS bucket,
       |         (l_suppkey % 10)::DOUBLE AS x,
       |         floor((l_suppkey % 100) / 10)::DOUBLE AS y,
       |         sqrt(pow((l_suppkey % 10)::DOUBLE - ((l_orderkey % 50) % 10)::DOUBLE, 2)
       |            + pow(floor((l_suppkey % 100) / 10)::DOUBLE - (((l_orderkey % 50) * 7) % 10)::DOUBLE, 2)) AS d
       |  FROM lineitem),
       |a AS (
       |  SELECT mac, bucket, count(DISTINCT (x, y)) AS n_sensors,
       |    sum((x * -2.0) * (x * -2.0)) AS m11, sum((x * -2.0) * (y * -2.0)) AS m12,
       |    sum(x * -2.0) AS m13, sum((y * -2.0) * (y * -2.0)) AS m22,
       |    sum(y * -2.0) AS m23, count(*)::DOUBLE AS m33,
       |    sum((x * -2.0) * (d*d - x*x - y*y)) AS v1,
       |    sum((y * -2.0) * (d*d - x*x - y*y)) AS v2,
       |    sum(d*d - x*x - y*y) AS v3
       |  FROM obs GROUP BY mac, bucket),
       |e AS (
       |  SELECT mac, round(($detX) / ($det), 3) + 0.0 AS est_x,
       |         round(($detY) / ($det), 3) + 0.0 AS est_y
       |  FROM a WHERE n_sensors >= 3 AND abs($det) > 1e-9 * pow(greatest(abs(m11), abs(m12), abs(m13), abs(m22), abs(m23), abs(m33)), 3)),
       |c AS (SELECT mac, round(est_x, 0) + 0.0 AS cx, round(est_y, 0) + 0.0 AS cy,
       |             count(*) AS n_buckets
       |      FROM e GROUP BY 1, 2, 3),
       |r AS (SELECT mac, cx, cy, n_buckets,
       |        row_number() OVER (PARTITION BY mac ORDER BY n_buckets DESC, cx, cy) AS rn
       |      FROM c)""".stripMargin
  }

  /** DuckDB expr: TextFunctions.normalizeText over `arg` (lower →
    * accent fold → control strip → whitespace collapse → trim). */
  private def NormSql(arg: String) =
    s"trim(regexp_replace(regexp_replace(translate(lower($arg), " +
      s"'${TextFunctions.AccentedChars}', '${TextFunctions.AccentFolded}'), " +
      "'[\\x00-\\x1F\\x7F]', ' ', 'g'), ' +', ' ', 'g'))"

  /** DuckDB expr: the engine's md5Hash60 (TextFunctions.md5Hash60). */
  private def h60(seedExpr: String, arg: String) =
    s"('0x' || substr(md5($seedExpr || ':' || $arg), 1, 15))::BIGINT"

  /** DuckDB CTE chain replaying Dedup.winnowingFingerprints (k=5, w=4):
    * token-5-gram md5Hash60 stream → fixed-width (hash, pos) priority
    * string → per-doc w-window varchar MIN → distinct selections.
    * Yields `sels(doc_id, sel)`; shared by l2n (decode to fingerprint
    * rows) and l2o (invert to cross-doc match pairs). */
  private lazy val WinnowCte: String = {
    val (k, w) = (5, 4)
    s"""t AS (SELECT doc_id, $ToksSql AS toks,
       |    CASE WHEN length(trim(text)) = 0 THEN 0::BIGINT ELSE len($ToksSql)::BIGINT END AS n_tokens
       |  FROM documents),
       |g AS (SELECT doc_id, (n_tokens - ${k - 1})::BIGINT AS n_grams,
       |    unnest(generate_series(1, greatest(len(toks) - ${k - 1}, 0))) AS pos,
       |    unnest(list_transform(generate_series(1, greatest(len(toks) - ${k - 1}, 0)),
       |      i -> ${h60("'0'", s"array_to_string(toks[i:i+${k - 1}], ' ')")})) AS h
       |  FROM t WHERE n_tokens >= $k),
       |p AS (SELECT doc_id, n_grams, pos,
       |    printf('%015x', h) || '-' || lpad(pos::VARCHAR, 7, '0') AS pri FROM g),
       |w AS (SELECT doc_id, n_grams, pos,
       |    min(pri) OVER (PARTITION BY doc_id ORDER BY pos
       |                   ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS sel
       |  FROM p),
       |sels AS (SELECT DISTINCT doc_id, sel FROM w WHERE pos >= least($w, n_grams))""".stripMargin
  }

  /** DuckDB expr: distinct char-5 shingles of lowercased text. */
  private val Shingles5Sql =
    "list_distinct(list_transform(generate_series(1, greatest(length(lower(text))-4, 0)), i -> (lower(text))[i:i+4]))"

  /** DuckDB RE2 literal of TextFunctions.BpePattern (raw string — the
    * escapes must reach RE2 as backslash sequences). */
  private val BpePatSql = """[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\r\f\x0B]"""

  /** Recursive-CTE replay of the merged-BPE tokenizer: the literal
    * merge table (rank, ' a b ', ' ab '), distinct pre-tokenizer units,
    * and per-rank iterated replace on the space-joined symbol sequence
    * — exactly BpeExprs' semantics (one increasing rank sweep; iterated
    * replace reaches each rank's fixpoint, confluent because merge
    * symbols are distinct). Yields `bpe(doc_id, n_bpe_merged)`; vocab-
    * sized recursion, corpus-sized only in the final unit join. */
  private lazy val BpeCorePrefix: String = {
    val merges = TextFunctions.DefaultBpeMerges
    val mv = merges.zipWithIndex
      .map { case ((a, b), r) => s"($r, ' $a $b ', ' $a$b ')" }.mkString(", ")
    s"""m(r, pat, rep) AS (VALUES $mv),
       |bdocs AS (SELECT doc_id, regexp_extract_all(text, '$BpePatSql') AS us FROM documents),
       |bunits AS (SELECT doc_id, unnest(us) AS u FROM bdocs),
       |bvocab AS (SELECT DISTINCT u FROM bunits),
       |benc(u, seq, r) AS (
       |  SELECT u, ' ' || array_to_string(list_transform(generate_series(1, length(u)), i -> u[i:i]), ' ') || ' ', 0 FROM bvocab
       |  UNION ALL
       |  SELECT e.u,
       |    CASE WHEN position(m.pat IN e.seq) > 0 THEN replace(e.seq, m.pat, m.rep) ELSE e.seq END,
       |    CASE WHEN position(m.pat IN e.seq) > 0 THEN e.r ELSE e.r + 1 END
       |  FROM benc e JOIN m ON m.r = e.r),
       |bseq AS (SELECT u, trim(seq) AS seq FROM benc WHERE r = ${merges.size})""".stripMargin
  }

  private lazy val BpeCountsCte: String =
    s"""$BpeCorePrefix,
       |bfinal AS (SELECT u, len(string_split(seq, ' ')) AS n FROM bseq),
       |bpe AS (
       |  SELECT d.doc_id, coalesce(c.n, 0)::BIGINT AS n_bpe_merged
       |  FROM documents d LEFT JOIN (
       |    SELECT doc_id, sum(n)::BIGINT AS n FROM bunits JOIN bfinal USING (u) GROUP BY doc_id) c
       |  USING (doc_id))""".stripMargin

  /** The encode twin of [[BpeCountsCte]]: positions zip with units
    * (parallel unnest), each unit joins its vocab-level merge fixpoint
    * `seq`, and the doc's token sequence is the position-ordered join of
    * those — `bpetext(doc_id, bpe_text)`. */
  private lazy val BpeEncodeCte: String =
    s"""$BpeCorePrefix,
       |bpos AS (SELECT doc_id, unnest(generate_series(1, len(us))) AS pos, unnest(us) AS u FROM bdocs),
       |bpetext AS (
       |  SELECT d.doc_id, coalesce(e.t, '') AS bpe_text
       |  FROM documents d LEFT JOIN (
       |    SELECT doc_id, string_agg(s.seq, ' ' ORDER BY pos) AS t
       |    FROM bpos JOIN bseq s USING (u) GROUP BY doc_id) e
       |  USING (doc_id))""".stripMargin

  /** DuckDB CTE chain: near-dup n-gram-jaccard clusters via recursive
    * transitive closure (min reachable label == hash-min fixpoint).
    * Yields `cc(doc_id, cluster_id)`; shared by l2g_dedup_clusters and
    * l2g_cluster_reps. */
  private lazy val ClustersCteSql: String =
    s"""g AS (SELECT doc_id, source, $Ngrams3Sql AS ng FROM documents),
       |pairs AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
       |  WHERE CASE WHEN len(list_distinct(list_concat(a.ng, b.ng))) = 0 THEN 0.0
       |        ELSE len(list_intersect(a.ng, b.ng))::DOUBLE / len(list_distinct(list_concat(a.ng, b.ng)))::DOUBLE END >= 0.2),
       |edges AS (SELECT a_id AS s, b_id AS d FROM pairs
       |          UNION ALL SELECT b_id, a_id FROM pairs),
       |reach(node, lab) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.d, r.lab FROM edges e JOIN reach r ON r.node = e.s),
       |cc AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node)""".stripMargin

  /** DuckDB expr: the 60-bit simhash sketch rebuilt from a column `th`
    * of per-token md5Hash60 values (mirror of SimHash60Expr: bit i =
    * sign of Σ±1 over tokens). Shared by l2d (sketches) and l2e
    * (banded near-dup pairs). */
  private lazy val SimhashAccSql: String = {
    val bitSums = (0 until 60).map(i =>
      s"list_aggregate(list_transform(th, h -> CASE WHEN ((h >> $i) & 1) = 1 THEN 1::BIGINT ELSE (-1)::BIGINT END), 'sum')")
    bitSums.zipWithIndex
      .map { case (e, i) => s"CASE WHEN ($e) > 0 THEN ${1L << i}::BIGINT ELSE 0::BIGINT END" }
      .mkString(" + ")
  }

  /** DuckDB expr: distinct word n-grams (mirror of TextFunctions
    * .wordNgrams — DuckDB list slices are INCLUSIVE, so [i:i+n-1] is n
    * elements). One definition for every gram width. */
  private def NgramsSql(n: Int) =
    s"list_distinct(list_transform(generate_series(1, greatest(len($ToksSql)-${n - 1}, 0)), " +
      s"i -> array_to_string(($ToksSql)[i:i+${n - 1}], ' ')))"
  private val Ngrams3Sql = NgramsSql(3)

  private val StopEn = TextFunctions.StopwordsByLang("en").map(w => s"'$w'").mkString("[", ", ", "]")

  /** Bench-only queries: timed by [[Bench]] (so bench_full.json tracks
    * them round over round) but NOT part of the driver's correctness
    * surface — no Verify dump, no oracle row. Used for production-path
    * variants whose oracle twin runs a deliberately pricier family:
    * the xxhash MinHash pipeline is the scale default for library
    * callers (string-free signatures), while `l2b_minhash_pairs`
    * times the md5 oracle-replayable family only — without this entry
    * a regression in the xx path would go unseen (round-6 verdict #2). */
  def benchOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l2b_minhash_pairs_xx" -> ((s, d) =>
      Dedup.minHashNearDups(Tables.spread(Tables.documents(s, d)), threshold = 0.5,
          md5Family = false)
        .orderBy("a_id", "b_id")))

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 6) AS avg_qty,
        | round(avg(l_discount), 6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "p6_range_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
        |WHERE l_quantity <= 5 AND l_discount >= 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "j1_broadcast_join" ->
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "j2_self_join" ->
      """WITH e AS (SELECT user_id, event_id, date_trunc('hour', ts) AS hb FROM events)
        |SELECT a.user_id, count(*) AS n_pairs
        |FROM e a JOIN e b ON a.user_id = b.user_id AND a.hb = b.hb AND a.event_id < b.event_id
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,

    "j3_semi_join" ->
      """SELECT event_id, user_id FROM events e
        |WHERE EXISTS (SELECT 1 FROM events w WHERE w.user_id = e.user_id
        |              AND w.event_type = 'purchase' AND w.value >= 300)
        |ORDER BY event_id""".stripMargin,

    "j4_anti_join" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey AND l_quantity >= 45)
        |ORDER BY p_partkey""".stripMargin,

    "j5_interval_join" ->
      """WITH p AS (SELECT event_id AS pid, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.pid, count(e.event_id) AS n_prior
        |FROM p LEFT JOIN events e ON e.user_id = p.user_id
        |  AND e.ts >= p.ts - INTERVAL 1 MINUTE AND e.ts <= p.ts AND e.event_id <> p.pid
        |GROUP BY p.pid ORDER BY p.pid""".stripMargin,

    "j5b_binned_interval" ->
      """WITH p AS (SELECT event_id AS pid, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.pid, count(e.event_id) AS n_win
        |FROM p LEFT JOIN events e
        |  ON e.ts >= p.ts - INTERVAL 1 MINUTE AND e.ts <= p.ts AND e.event_id <> p.pid
        |GROUP BY p.pid ORDER BY p.pid""".stripMargin,

    "j7_asof_join" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, ts FROM events
        |           WHERE event_type = 'click'),
        |p AS (SELECT user_id AS r_user, ts AS pts, max(event_id) AS purchase_id
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.click_id, p.purchase_id,
        |  epoch_ms(c.ts) - epoch_ms(p.pts) AS gap_ms
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.r_user AND c.ts >= p.pts
        |ORDER BY c.click_id""".stripMargin,

    "j7b_asof_forward" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, ts FROM events
        |           WHERE event_type = 'click'),
        |p AS (SELECT user_id AS r_user, ts AS pts, max(event_id) AS purchase_id
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.click_id, p.purchase_id,
        |  epoch_ms(p.pts) - epoch_ms(c.ts) AS gap_ms
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.r_user AND c.ts <= p.pts
        |ORDER BY c.click_id""".stripMargin,

    "j6_left_outer" ->
      """SELECT n_name, count(c_custkey) AS n_customers
        |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "j6_full_outer" ->
      """WITH c AS (SELECT user_id, count(*) AS n_clicks FROM events WHERE event_type = 'click' GROUP BY user_id),
        |     p AS (SELECT user_id, count(*) AS n_purchases FROM events WHERE event_type = 'purchase' GROUP BY user_id)
        |SELECT coalesce(c.user_id, p.user_id) AS user_id,
        |  coalesce(n_clicks, 0) AS n_clicks, coalesce(n_purchases, 0) AS n_purchases
        |FROM c FULL OUTER JOIN p ON c.user_id = p.user_id ORDER BY user_id""".stripMargin,

    "j8_subqueries" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_partkey = p_partkey AND l_quantity >= 48)
        |  AND p_retailprice > (SELECT avg(p_retailprice) FROM part)
        |ORDER BY p_partkey""".stripMargin,

    "a1_count_by_key" ->
      "SELECT user_id, count(*) AS n FROM events GROUP BY user_id ORDER BY user_id",

    "a2_distinct_sets" ->
      """SELECT user_id, count(DISTINCT event_type) AS n_types,
        | array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "a3_stats" ->
      """SELECT l_returnflag, l_linestatus, min(l_quantity) AS min_qty,
        | max(l_extendedprice) AS max_price, round(avg(l_discount), 6) AS avg_disc,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "a4_ts_lists" ->
      """SELECT user_id, array_to_string(list_sort(list(strftime(ts, '%Y-%m-%d %H:%M:%S.%g'))), ',') AS ts_csv
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "a5_active_hours" ->
      """SELECT hour(ts) AS hr, event_type, count(*) AS n FROM events
        |GROUP BY hr, event_type ORDER BY hr, event_type""".stripMargin,

    "a6_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag, coalesce(l_linestatus, 'ALL') AS lstatus,
        | count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rflag, lstatus""".stripMargin,

    "a6b_cube" ->
      """SELECT coalesce(event_type, 'ALL') AS etype,
        | coalesce(dayofweek(ts) + 1, -1)::BIGINT AS dow,
        | count(*) AS n, round(sum(value), 2) AS sum_v
        |FROM events GROUP BY CUBE(event_type, dayofweek(ts))
        |ORDER BY etype, dow""".stripMargin,

    "a7_trilateration" ->
      """WITH obs AS (
        |  SELECT l_orderkey % 50 AS mac,
        |         (l_suppkey % 10)::DOUBLE AS x,
        |         floor((l_suppkey % 100) / 10)::DOUBLE AS y,
        |         l_suppkey % 100 AS sensor,
        |         sqrt(pow((l_suppkey % 10)::DOUBLE - ((l_orderkey % 50) % 10)::DOUBLE, 2)
        |            + pow(floor((l_suppkey % 100) / 10)::DOUBLE - (((l_orderkey % 50) * 7) % 10)::DOUBLE, 2)) AS d
        |  FROM lineitem),
        |a AS (
        |  SELECT mac, count(DISTINCT (x, y)) AS n_sensors,
        |    sum((x * -2.0) * (x * -2.0)) AS m11, sum((x * -2.0) * (y * -2.0)) AS m12,
        |    sum(x * -2.0) AS m13, sum((y * -2.0) * (y * -2.0)) AS m22,
        |    sum(y * -2.0) AS m23, count(*)::DOUBLE AS m33,
        |    sum((x * -2.0) * (d*d - x*x - y*y)) AS v1,
        |    sum((y * -2.0) * (d*d - x*x - y*y)) AS v2,
        |    sum(d*d - x*x - y*y) AS v3
        |  FROM obs GROUP BY mac)
        |SELECT mac, n_sensors,
        |  round((v1 * (m22*m33 - m23*m23) - m12 * (v2*m33 - m23*v3) + m13 * (v2*m23 - m22*v3))
        |    / (m11 * (m22*m33 - m23*m23) - m12 * (m12*m33 - m23*m13) + m13 * (m12*m23 - m22*m13)), 3) + 0.0 AS est_x,
        |  round((m11 * (v2*m33 - m23*v3) - v1 * (m12*m33 - m23*m13) + m13 * (m12*v3 - v2*m13))
        |    / (m11 * (m22*m33 - m23*m23) - m12 * (m12*m33 - m23*m13) + m13 * (m12*m23 - m22*m13)), 3) + 0.0 AS est_y
        |FROM a
        |WHERE n_sensors >= 3 AND abs(m11 * (m22*m33 - m23*m23) - m12 * (m12*m33 - m23*m13) + m13 * (m12*m23 - m22*m13)) > 1e-9 * pow(greatest(abs(m11), abs(m12), abs(m13), abs(m22), abs(m23), abs(m33)), 3)
        |ORDER BY mac""".stripMargin,

    // Evolution: head = base winner-per-key CDC apply (tag NULL via
    // null-backfill), overridden by the write-NEW layer (tag = mac)
    // then the write-OLD layer (later ver wins; full-row replace puts
    // tag back to NULL).
    "capstone_store_evolution" ->
      """WITH src AS (SELECT * FROM events WHERE event_id % 9 = 0),
        |cdc AS (SELECT printf('%012X', user_id) AS mac,
        |  event_id AS ver,
        |  CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
        |  event_type AS ssid,
        |  (165 + event_id % 30 - 255)::BIGINT AS rssi,
        |  (2412 + (event_id % 13) * 5)::BIGINT AS freq
        |FROM src),
        |w AS (SELECT *, row_number() OVER (PARTITION BY mac ORDER BY ver DESC) AS rn
        |      FROM cdc),
        |base AS (SELECT mac, ssid, rssi, freq FROM w WHERE rn = 1 AND op = 'upsert'),
        |e AS (SELECT DISTINCT printf('%012X', user_id) AS mac FROM src
        |      WHERE user_id % 2 = 0),
        |o AS (SELECT DISTINCT printf('%012X', user_id) AS mac FROM src
        |      WHERE user_id % 5 = 0),
        |allm AS (SELECT mac FROM base UNION SELECT mac FROM e UNION SELECT mac FROM o)
        |SELECT a.mac,
        |  CASE WHEN o.mac IS NOT NULL THEN 'old-writer'
        |       WHEN e.mac IS NOT NULL THEN 'evolved' ELSE b.ssid END AS ssid,
        |  (CASE WHEN o.mac IS NOT NULL THEN -2
        |        WHEN e.mac IS NOT NULL THEN -1 ELSE b.rssi END)::BIGINT AS rssi,
        |  (CASE WHEN o.mac IS NOT NULL THEN 0
        |        WHEN e.mac IS NOT NULL THEN 0 ELSE b.freq END)::BIGINT AS freq,
        |  (CASE WHEN o.mac IS NOT NULL THEN NULL
        |        WHEN e.mac IS NOT NULL THEN e.mac ELSE NULL END)::VARCHAR AS tag
        |FROM allm a LEFT JOIN base b ON a.mac = b.mac
        |  LEFT JOIN e ON a.mac = e.mac LEFT JOIN o ON a.mac = o.mac
        |ORDER BY a.mac""".stripMargin,

    // MERGE evolution: base winner-per-key CDC apply; every merge key
    // gains note = 'm:'||mac (matched via UPDATE, unmatched — CDC
    // winner was a delete — via the INSERT arm, which also stamps
    // ssid/rssi/freq); everything else carries with note NULL (the
    // evolution null-backfill).
    "capstone_store_merge_evolve" ->
      """WITH src AS (SELECT * FROM events WHERE event_id % 17 = 0),
        |cdc AS (SELECT printf('%012X', user_id) AS mac,
        |  event_id AS ver,
        |  CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
        |  event_type AS ssid,
        |  (165 + event_id % 30 - 255)::BIGINT AS rssi,
        |  (2412 + (event_id % 13) * 5)::BIGINT AS freq
        |FROM src),
        |w AS (SELECT *, row_number() OVER (PARTITION BY mac ORDER BY ver DESC) AS rn
        |      FROM cdc),
        |base AS (SELECT mac, ssid, rssi, freq FROM w WHERE rn = 1 AND op = 'upsert'),
        |m AS (SELECT DISTINCT printf('%012X', user_id) AS mac FROM src
        |      WHERE user_id % 4 = 0),
        |allm AS (SELECT mac FROM base UNION SELECT mac FROM m)
        |SELECT a.mac,
        |  CASE WHEN b.mac IS NULL THEN 'ins' ELSE b.ssid END AS ssid,
        |  (CASE WHEN b.mac IS NULL THEN -7 ELSE b.rssi END)::BIGINT AS rssi,
        |  (CASE WHEN b.mac IS NULL THEN 0 ELSE b.freq END)::BIGINT AS freq,
        |  (CASE WHEN m.mac IS NOT NULL THEN 'm:' || a.mac
        |        ELSE NULL END)::VARCHAR AS note
        |FROM allm a LEFT JOIN base b ON a.mac = b.mac
        |  LEFT JOIN m ON a.mac = m.mac
        |ORDER BY a.mac""".stripMargin,

    // SQL-door delete: base winner-per-key CDC apply minus the
    // predicate's matches (the head retraction).
    "capstone_store_sql_delete" ->
      """WITH src AS (SELECT * FROM events WHERE event_id % 13 = 0),
        |cdc AS (SELECT printf('%012X', user_id) AS mac,
        |  event_id AS ver,
        |  CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
        |  event_type AS ssid,
        |  (165 + event_id % 30 - 255)::BIGINT AS rssi,
        |  (2412 + (event_id % 13) * 5)::BIGINT AS freq
        |FROM src),
        |w AS (SELECT *, row_number() OVER (PARTITION BY mac ORDER BY ver DESC) AS rn
        |      FROM cdc)
        |SELECT mac, ssid, rssi, freq FROM w
        |WHERE rn = 1 AND op = 'upsert' AND NOT (rssi < -120)
        |ORDER BY mac""".stripMargin,

    // SQL-door write: base winner-per-key CDC apply, overridden by the
    // INSERT layer (each inserted key's row fully replaced).
    // Compound key (mac, ssid): the head = the per-pair aggregate,
    // overridden by the UPDATE layer, minus the DELETE predicate
    // (which committed as a deletion vector on the Spark side).
    "capstone_store_compound" ->
      """WITH src AS (SELECT * FROM events WHERE event_id % 19 = 0),
        |l1 AS (SELECT printf('%012X', user_id) AS mac, event_type AS ssid,
        |  max((165 + event_id % 30 - 255)::BIGINT) AS rssi,
        |  min((2412 + (event_id % 13) * 5)::BIGINT) AS freq
        | FROM src GROUP BY 1, 2)
        |SELECT mac, ssid,
        |  CASE WHEN ssid = 'click' THEN rssi - 1000 ELSE rssi END AS rssi,
        |  freq
        |FROM l1 WHERE NOT (freq >= 2467)
        |ORDER BY mac, ssid""".stripMargin,

    "capstone_store_sql_write" ->
      """WITH src AS (SELECT * FROM events WHERE event_id % 11 = 0),
        |cdc AS (SELECT printf('%012X', user_id) AS mac,
        |  event_id AS ver,
        |  CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
        |  event_type AS ssid,
        |  (165 + event_id % 30 - 255)::BIGINT AS rssi,
        |  (2412 + (event_id % 13) * 5)::BIGINT AS freq
        |FROM src),
        |w AS (SELECT *, row_number() OVER (PARTITION BY mac ORDER BY ver DESC) AS rn
        |      FROM cdc),
        |base AS (SELECT mac, ssid, rssi, freq FROM w WHERE rn = 1 AND op = 'upsert'),
        |ins AS (SELECT DISTINCT printf('%012X', user_id) AS mac FROM src
        |        WHERE user_id % 3 = 0),
        |allm AS (SELECT mac FROM base UNION SELECT mac FROM ins)
        |SELECT a.mac,
        |  CASE WHEN i.mac IS NOT NULL THEN 'sql' ELSE b.ssid END AS ssid,
        |  (CASE WHEN i.mac IS NOT NULL THEN -9 ELSE b.rssi END)::BIGINT AS rssi,
        |  (CASE WHEN i.mac IS NOT NULL THEN 1 ELSE b.freq END)::BIGINT AS freq
        |FROM allm a LEFT JOIN base b ON a.mac = b.mac
        |  LEFT JOIN ins i ON a.mac = i.mac
        |ORDER BY a.mac""".stripMargin,

    "living_area" ->
      s"""$LivingAreaCteSql
         |SELECT mac, cx AS home_x, cy AS home_y, n_buckets FROM r WHERE rn = 1 ORDER BY mac""".stripMargin,

    "geo_hotspots" ->
      s"""WITH hh AS (SELECT CAST(floor(c_acctbal / 1000) AS BIGINT) AS cx,
         |                   c_nationkey::BIGINT AS cy
         |            FROM customer),
         |cel AS (SELECT cx, cy, count(*) AS n FROM hh GROUP BY 1, 2),
         |nb AS (SELECT a.cx, a.cy, sum(b.n)::BIGINT AS nbr_sum,
         |         count(*) AS nbr_cells
         |       FROM cel a JOIN cel b
         |         ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
         |        AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
         |       GROUP BY 1, 2),
         |tt AS (SELECT sum(n)::BIGINT AS total, count(*) AS ncells FROM cel)
         |SELECT cel.cx, cel.cy, cel.n, nb.nbr_sum, nb.nbr_cells,
         |  CASE WHEN nb.nbr_sum * (SELECT ncells FROM tt)
         |    >= nb.nbr_cells * (SELECT total FROM tt)
         |    THEN 1 ELSE 0 END::BIGINT AS hot
         |FROM cel JOIN nb USING (cx, cy) ORDER BY cx, cy""".stripMargin,

    "geo_cell_census" ->
      s"""$LivingAreaCteSql,
         |h AS (SELECT mac, cx AS home_x, cy AS home_y FROM r WHERE rn = 1)
         |SELECT zcell, count(*) AS n_devices FROM (
         |  SELECT list_aggregate(list_transform(generate_series(0, 3), i ->
         |    (((((CAST(home_x AS BIGINT) % 16) + 16) % 16 >> i) & 1) << (2*i))
         |    + (((((CAST(home_y AS BIGINT) % 16) + 16) % 16 >> i) & 1) << (2*i+1))),
         |   'sum')::BIGINT AS zcell FROM h)
         |GROUP BY zcell ORDER BY zcell""".stripMargin,

    "s2_frame_parse" ->
      """SELECT event_id,
        | printf('%012X', user_id) AS mac,
        | event_type AS ssid,
        | (165 + event_id % 30 - 255)::BIGINT AS rssi,
        | (2412 + (event_id % 13) * 5)::BIGINT AS freq,
        | round(pow(10.0, (27.55 - 20.0 * log10((2412 + (event_id % 13) * 5)::DOUBLE)
        |   + abs(165 + event_id % 30 - 255)) / 20.0), 2) AS dist,
        | TRUE AS valid
        |FROM events ORDER BY event_id""".stripMargin,

    // The ingest→store→query capstone replay: the upload log derives
    // from events exactly as s2_frame_parse's oracle does (same synth
    // round-trip), and because the engine's micro-batches cover
    // ascending disjoint ver ranges, the bucketed MERGE store's
    // last-batch-winner semantics reduce to ONE winner-per-key pass —
    // the T8 CDC-apply shape: argmax(ver) per mac, deletes dropping
    // the key.
    "capstone_ingest_store" ->
      """WITH cdc AS (SELECT printf('%012X', user_id) AS mac,
        |  event_id AS ver,
        |  CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
        |  event_type AS ssid,
        |  (165 + event_id % 30 - 255)::BIGINT AS rssi,
        |  (2412 + (event_id % 13) * 5)::BIGINT AS freq
        |FROM events),
        |w AS (SELECT *, row_number() OVER (PARTITION BY mac ORDER BY ver DESC) AS rn
        |      FROM cdc)
        |SELECT mac, ssid, rssi, freq FROM w
        |WHERE rn = 1 AND op = 'upsert'
        |ORDER BY mac""".stripMargin,

    // Time travel: the 3-of-4-batch read point is exactly the CDC
    // apply over the upload-log PREFIX ver < (max+1)·3/4 (the builder
    // splits the sliced ver range into integer quarters — `//` is the
    // same floor division as the Scala side's Long arithmetic).
    "capstone_store_timetravel" ->
      """WITH src AS (SELECT * FROM events WHERE event_id % 3 = 0),
        |cut AS (SELECT ((max(event_id) + 1) * 3) // 4 AS hi FROM src),
        |cdc AS (SELECT printf('%012X', user_id) AS mac,
        |  event_id AS ver,
        |  CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
        |  event_type AS ssid,
        |  (165 + event_id % 30 - 255)::BIGINT AS rssi,
        |  (2412 + (event_id % 13) * 5)::BIGINT AS freq
        |FROM src WHERE event_id < (SELECT hi FROM cut)),
        |w AS (SELECT *, row_number() OVER (PARTITION BY mac ORDER BY ver DESC) AS rn
        |      FROM cdc)
        |SELECT mac, ssid, rssi, freq FROM w
        |WHERE rn = 1 AND op = 'upsert'
        |ORDER BY mac""".stripMargin,

    // The SQL front door is a transparent window onto the store: the
    // head read through format("graft") replays EXACTLY as
    // capstone_ingest_store (oracle copied verbatim), and versionAsOf
    // exactly as capstone_store_timetravel.
    "capstone_store_sql_door" ->
      """WITH cdc AS (SELECT printf('%012X', user_id) AS mac,
        |  event_id AS ver,
        |  CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
        |  event_type AS ssid,
        |  (165 + event_id % 30 - 255)::BIGINT AS rssi,
        |  (2412 + (event_id % 13) * 5)::BIGINT AS freq
        |FROM events),
        |w AS (SELECT *, row_number() OVER (PARTITION BY mac ORDER BY ver DESC) AS rn
        |      FROM cdc)
        |SELECT mac, ssid, rssi, freq FROM w
        |WHERE rn = 1 AND op = 'upsert'
        |ORDER BY mac""".stripMargin,

    // Data skipping must never change answers: the head replay with
    // the same non-key range predicate — a file wrongly pruned by the
    // `_stats` sidecars would drop rows and hash-mismatch here.
    "capstone_store_range_scan" ->
      """WITH cdc AS (SELECT printf('%012X', user_id) AS mac,
        |  event_id AS ver,
        |  CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
        |  event_type AS ssid,
        |  (165 + event_id % 30 - 255)::BIGINT AS rssi,
        |  (2412 + (event_id % 13) * 5)::BIGINT AS freq
        |FROM events),
        |w AS (SELECT *, row_number() OVER (PARTITION BY mac ORDER BY ver DESC) AS rn
        |      FROM cdc)
        |SELECT mac, ssid, rssi, freq FROM w
        |WHERE rn = 1 AND op = 'upsert' AND rssi >= -70 AND freq <= 2437
        |ORDER BY mac""".stripMargin,

    "capstone_store_sql_asof" ->
      """WITH src AS (SELECT * FROM events WHERE event_id % 3 = 0),
        |cut AS (SELECT ((max(event_id) + 1) * 3) // 4 AS hi FROM src),
        |cdc AS (SELECT printf('%012X', user_id) AS mac,
        |  event_id AS ver,
        |  CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
        |  event_type AS ssid,
        |  (165 + event_id % 30 - 255)::BIGINT AS rssi,
        |  (2412 + (event_id % 13) * 5)::BIGINT AS freq
        |FROM src WHERE event_id < (SELECT hi FROM cut)),
        |w AS (SELECT *, row_number() OVER (PARTITION BY mac ORDER BY ver DESC) AS rn
        |      FROM cdc)
        |SELECT mac, ssid, rssi, freq FROM w
        |WHERE rn = 1 AND op = 'upsert'
        |ORDER BY mac""".stripMargin,

    // Change data feed: version v of the 4-batch build is the CDC
    // apply over prefix ver < (max+1)·(v+1)/4, so the v1→v3 feed is
    // the full-outer diff of the two prefix states — insert where the
    // old state lacks the key, delete where the new one does, update
    // where any value differs (null-safe), no-op rows dropped.
    "capstone_store_cdf" ->
      """WITH src AS (SELECT * FROM events WHERE event_id % 5 = 0),
        |cut AS (SELECT ((max(event_id) + 1) * 2) // 4 AS hi FROM src),
        |cdc AS (SELECT printf('%012X', user_id) AS mac,
        |  event_id AS ver,
        |  CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
        |  event_type AS ssid,
        |  (165 + event_id % 30 - 255)::BIGINT AS rssi,
        |  (2412 + (event_id % 13) * 5)::BIGINT AS freq
        |FROM src),
        |s1 AS (SELECT mac, ssid, rssi, freq FROM (
        |  SELECT *, row_number() OVER (PARTITION BY mac ORDER BY ver DESC) AS rn
        |  FROM cdc WHERE ver < (SELECT hi FROM cut))
        |  WHERE rn = 1 AND op = 'upsert'),
        |s2 AS (SELECT mac, ssid, rssi, freq FROM (
        |  SELECT *, row_number() OVER (PARTITION BY mac ORDER BY ver DESC) AS rn
        |  FROM cdc)
        |  WHERE rn = 1 AND op = 'upsert')
        |SELECT coalesce(s1.mac, s2.mac) AS mac,
        |  CASE WHEN s1.mac IS NULL THEN 'insert'
        |       WHEN s2.mac IS NULL THEN 'delete' ELSE 'update' END AS change,
        |  s1.ssid AS ssid_old, s2.ssid AS ssid_new,
        |  s1.rssi AS rssi_old, s2.rssi AS rssi_new,
        |  s1.freq AS freq_old, s2.freq AS freq_new
        |FROM s1 FULL OUTER JOIN s2 ON s1.mac = s2.mac
        |WHERE s1.mac IS NULL OR s2.mac IS NULL
        |   OR s1.ssid IS DISTINCT FROM s2.ssid
        |   OR s1.rssi IS DISTINCT FROM s2.rssi
        |   OR s1.freq IS DISTINCT FROM s2.freq
        |ORDER BY mac""".stripMargin,

    // IVM: the engine maintains the v1 view with feed deltas; the
    // oracle recomputes the v3 view directly from the end state of
    // the CDC apply — recompute equivalence IS the check.
    "capstone_store_ivm" ->
      """WITH cdc AS (SELECT printf('%012X', user_id) AS mac,
        |  event_id AS ver,
        |  CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
        |  event_type AS ssid,
        |  (165 + event_id % 30 - 255)::BIGINT AS rssi
        |FROM events WHERE event_id % 7 = 0),
        |w AS (SELECT *, row_number() OVER (PARTITION BY mac ORDER BY ver DESC) AS rn
        |      FROM cdc),
        |st AS (SELECT mac, ssid, rssi FROM w WHERE rn = 1 AND op = 'upsert')
        |SELECT ssid, count(*)::BIGINT AS n, sum(rssi)::BIGINT AS vsum
        |FROM st GROUP BY 1 ORDER BY ssid""".stripMargin,

    // Erasure: the CDC apply minus the erased subjects (user_id ≡ 0
    // mod 7) — erasure of a key never in the store is a no-op, so the
    // victim set needs no slice restriction.
    "capstone_store_erasure" ->
      """WITH cdc AS (SELECT printf('%012X', user_id) AS mac,
        |  event_id AS ver,
        |  CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
        |  event_type AS ssid,
        |  (165 + event_id % 30 - 255)::BIGINT AS rssi,
        |  (2412 + (event_id % 13) * 5)::BIGINT AS freq
        |FROM events WHERE event_id % 2 = 0),
        |w AS (SELECT *, row_number() OVER (PARTITION BY mac ORDER BY ver DESC) AS rn
        |      FROM cdc)
        |SELECT mac, ssid, rssi, freq FROM w
        |WHERE rn = 1 AND op = 'upsert'
        |  AND mac NOT IN (SELECT printf('%012X', user_id)
        |                  FROM events WHERE user_id % 7 = 0)
        |ORDER BY mac""".stripMargin,

    "w1_latest_per_key" ->
      """SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "w2_lag_gaps" ->
      """SELECT user_id, event_id, gap_ms FROM (
        |  SELECT user_id, event_id,
        |    epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
        |  FROM events) WHERE gap_ms IS NOT NULL ORDER BY user_id, event_id""".stripMargin,

    "w3_rolling_avg" ->
      """SELECT user_id, event_id,
        | round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN 5 PRECEDING AND CURRENT ROW), 4) AS roll_avg
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "w4_global_seq" ->
      """SELECT row_number() OVER (ORDER BY ts, event_id) AS seq, event_id
        |FROM events ORDER BY seq""".stripMargin,

    "o1_sort" ->
      """SELECT l_orderkey, l_linenumber, strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        |FROM lineitem ORDER BY ship_date, l_orderkey, l_linenumber LIMIT 1000""".stripMargin,

    "o2_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "o3_group_topk" ->
      """SELECT user_id, event_type, n FROM (
        |  SELECT user_id, event_type, count(*) AS n,
        |    row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, event_type) AS rn
        |  FROM events GROUP BY user_id, event_type) WHERE rn <= 3
        |ORDER BY user_id, n DESC, event_type""".stripMargin,

    "t1_union" ->
      """SELECT event_type, count(*) AS n FROM (
        |  SELECT event_type FROM events WHERE value > 450
        |  UNION ALL SELECT event_type FROM events WHERE value < 5)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "t2_intersect" ->
      """SELECT user_id, hour(ts) AS hr FROM events WHERE event_type = 'click'
        |INTERSECT SELECT user_id, hour(ts) FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, hr""".stripMargin,

    "t3_except" ->
      """SELECT user_id, hour(ts) AS hr FROM events WHERE event_type = 'click'
        |EXCEPT SELECT user_id, hour(ts) FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, hr""".stripMargin,

    "t2b_intersect_all" ->
      """SELECT user_id, count(*) AS multiplicity FROM (
        |  SELECT user_id FROM events WHERE event_type = 'view'
        |  INTERSECT ALL
        |  SELECT user_id FROM events WHERE event_type = 'click')
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "t3b_except_all" ->
      """SELECT user_id, count(*) AS multiplicity FROM (
        |  SELECT user_id FROM events WHERE event_type = 'view'
        |  EXCEPT ALL
        |  SELECT user_id FROM events WHERE event_type = 'click')
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "t4_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    "f4_mac_format" ->
      """SELECT o_orderkey, printf('%012X', o_orderkey) AS mac FROM orders
        |ORDER BY o_orderkey LIMIT 1000""".stripMargin,

    "f5_printable" ->
      """SELECT doc_id, regexp_matches(text, '^[ -~]*$') AS is_printable,
        | (length(text) - length(regexp_replace(text, '[ -~]', '', 'g')))::BIGINT AS n_printable
        |FROM documents ORDER BY doc_id""".stripMargin,

    "f6_ts_render" ->
      """SELECT event_id, strftime(ts, '%m/%d/%y - %I:%M%p') AS ts_fmt
        |FROM events ORDER BY event_id LIMIT 2000""".stripMargin,

    "f8_fspl" ->
      """SELECT event_id, -(event_id % 60 + 30) AS rssi,
        | 2412 + (event_id % 13) * 5 AS freq,
        | round(pow(10.0, (27.55 - 20.0 * log10((2412 + (event_id % 13) * 5)::DOUBLE)
        |   + abs(-(event_id % 60 + 30))) / 20.0), 2) AS dist_m
        |FROM events ORDER BY event_id""".stripMargin,

    "f13_pseudonymize" ->
      """SELECT event_id, substr(md5('pepper:' || user_id), 1, 16) AS pseudo_user
        |FROM events ORDER BY event_id""".stripMargin,

    "f10_render" -> (
      "SELECT event_id, printf('%s  %s  \"%s\"\t%ddBm %dmHz  Dist: %.2fm', " +
        "strftime(ts, '%m/%d/%y - %I:%M%p'), printf('%012X', user_id), event_type, " +
        "(-(event_id % 60 + 30))::INT, (2412 + (event_id % 13) * 5)::INT, " +
        "pow(10.0, (27.55 - 20.0 * log10((2412 + (event_id % 13) * 5)::DOUBLE) " +
        "+ abs(-(event_id % 60 + 30))) / 20.0)) AS line " +
        "FROM events ORDER BY event_id LIMIT 2000"),

    "f11_json" ->
      """SELECT event_type, sum(json_extract_string(props, '$.k')::INT)::BIGINT AS sum_k,
        | count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "f12_array_ops" ->
      """SELECT vec_id, len(embedding)::BIGINT AS dim,
        | round(sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x), 'sum')), 4) AS l2,
        | round(list_aggregate(embedding::DOUBLE[], 'sum'), 4) AS sum_e
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "st2_tumbling_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        | event_type, count(*) AS n
        |FROM events GROUP BY window_start, event_type ORDER BY window_start, event_type""".stripMargin,

    "st3_sliding_window" ->
      """WITH e AS (
        |  SELECT event_type,
        |    make_timestamp(((epoch_us(ts) // 300000000) - i.i) * 300000000) AS ws
        |  FROM events CROSS JOIN (SELECT unnest(range(2)) AS i) i)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
        |  count(*) AS n
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "st4_session_window" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w > INTERVAL 15 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S.%g') AS session_start, count(*) AS n
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    "st5_late_drop" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        | event_type, count(*) AS n
        |FROM events
        |WHERE ts >= (SELECT max(ts) - INTERVAL 24 HOUR FROM events)
        |GROUP BY window_start, event_type ORDER BY window_start, event_type""".stripMargin,

    "st6_dedup_first" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        | user_id, event_type, min(event_id) AS first_event_id, count(*) AS n_heard
        |FROM events GROUP BY window_start, user_id, event_type
        |ORDER BY window_start, user_id, event_type""".stripMargin,

    // lag-gap replay of ArrivalAlerts.transition: sightings per key in
    // ts order; ms arithmetic matches java.sql.Timestamp#getTime
    // truncation, strict > matches the transition's gap test
    "st7_arrival_alerts" ->
      """WITH s AS (
        |  SELECT user_id::VARCHAR AS mac, ts, epoch_ms(ts) AS ms,
        |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ms
        |  FROM events)
        |SELECT mac,
        |  CASE WHEN prev_ms IS NULL THEN 'first_seen' ELSE 'reappeared' END AS kind,
        |  epoch_us(ts) AS ts_us,
        |  (CASE WHEN prev_ms IS NULL THEN -1 ELSE (ms - prev_ms) // 1000 END)::BIGINT AS gap_sec
        |FROM s WHERE prev_ms IS NULL OR ms - prev_ms > 3600000
        |ORDER BY mac, ts_us""".stripMargin,

    // the engine's per-(mac, 60s-bin) density cap (maxPerBucket = 32)
    // is mirrored here (the l2 banding precedent); the binned probe
    // mechanics need no mirroring — on capped inputs the binned join
    // equals the plain tolerance join (adjacent-bin argument in
    // PresenceAnalytics.boundedCoObservations)
    "st9_co_observation" ->
      """WITH o0 AS (SELECT user_id AS mac, ts, (event_id % 5)::BIGINT AS sensor,
        |             epoch_us(ts) // 60000000 AS bin
        |           FROM events),
        |o AS (SELECT mac, ts, sensor FROM (
        |  SELECT mac, ts, sensor,
        |    row_number() OVER (PARTITION BY mac, bin ORDER BY ts, sensor) AS rn
        |  FROM o0) WHERE rn <= 32)
        |SELECT a.mac, epoch_us(a.ts) AS l_us, a.sensor AS l_sensor,
        |  epoch_us(b.ts) AS r_us, b.sensor AS r_sensor
        |FROM o a JOIN o b ON a.mac = b.mac
        |  AND b.ts >= a.ts - INTERVAL 60 SECOND
        |  AND b.ts <= a.ts + INTERVAL 60 SECOND
        |  AND a.sensor < b.sensor
        |ORDER BY a.mac, l_us, l_sensor, r_us, r_sensor""".stripMargin,

    "net_tree_edges" ->
      """SELECT user_id AS mac, event_type AS ssid, count(*) AS weight
        |FROM events GROUP BY mac, ssid ORDER BY mac, ssid""".stripMargin,

    "net_tree_triangles" ->
      """WITH e AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS w
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |tri AS (
        |  SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
        |  FROM e e1 JOIN e e2 ON e1.pb = e2.pa
        |  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb)
        |SELECT v, count(*) AS n_triangles FROM (
        |  SELECT a AS v FROM tri UNION ALL
        |  SELECT b FROM tri UNION ALL
        |  SELECT c FROM tri)
        |GROUP BY v ORDER BY v""".stripMargin,

    "g7_clustering" ->
      """WITH e AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS w
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (SELECT v, count(*) AS degree FROM (
        |  SELECT pa AS v FROM e UNION ALL SELECT pb FROM e) GROUP BY v),
        |tri AS (
        |  SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
        |  FROM e e1 JOIN e e2 ON e1.pb = e2.pa
        |  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
        |tc AS (SELECT v, count(*) AS n_triangles FROM (
        |  SELECT a AS v FROM tri UNION ALL
        |  SELECT b FROM tri UNION ALL
        |  SELECT c FROM tri) GROUP BY v)
        |SELECT deg.v, deg.degree, coalesce(tc.n_triangles, 0) AS n_triangles,
        |  CASE WHEN deg.degree >= 2 THEN
        |    floor(2000000 * coalesce(tc.n_triangles, 0)
        |          / (deg.degree * (deg.degree - 1)))::BIGINT
        |  ELSE NULL END AS coeff_ppm
        |FROM deg LEFT JOIN tc ON deg.v = tc.v
        |ORDER BY deg.v""".stripMargin,

    // identical enumeration to net_tree_triangles: the degree-ordered
    // variant must produce the SAME per-vertex counts (orientation only
    // changes the join plan, never the triangle set)
    "net_tree_triangles_deg" ->
      """WITH e AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS w
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |tri AS (
        |  SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
        |  FROM e e1 JOIN e e2 ON e1.pb = e2.pa
        |  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb)
        |SELECT v, count(*) AS n_triangles FROM (
        |  SELECT a AS v FROM tri UNION ALL
        |  SELECT b FROM tri UNION ALL
        |  SELECT c FROM tri)
        |GROUP BY v ORDER BY v""".stripMargin,

    "net_tree_adjacency" ->
      """WITH e AS (SELECT user_id AS mac, event_type AS ssid, count(*) AS weight
        |           FROM events GROUP BY 1, 2),
        |r AS (SELECT mac, ssid,
        |        row_number() OVER (PARTITION BY mac ORDER BY weight DESC, ssid) AS rn,
        |        count(*) OVER (PARTITION BY mac) AS deg
        |      FROM e)
        |SELECT mac, deg::BIGINT AS degree,
        |  array_to_string(list(ssid ORDER BY rn), ',') AS ssids_csv
        |FROM r WHERE rn <= 32 GROUP BY mac, deg ORDER BY mac""".stripMargin,

    "l1_exact_dedup" ->
      s"""SELECT fp, count(*) AS n_dups, min(doc_id) AS keep_id FROM (
         |  SELECT doc_id, sha256(array_to_string($ToksSql, ' ')) AS fp FROM documents)
         |GROUP BY fp ORDER BY fp""".stripMargin,

    "l2_minhash_sig" -> {
      val sigs = (0 until 8).map(i =>
        s"list_min(list_transform(sh, x -> ${h60(s"'$i'", "x")})) AS s$i").mkString(",\n  ")
      s"""WITH s AS (SELECT doc_id, $Shingles5Sql AS sh FROM documents)
         |SELECT doc_id,
         |  $sigs
         |FROM s ORDER BY doc_id""".stripMargin
    },

    "l2c_ngram_jaccard" ->
      s"""WITH g AS (SELECT doc_id, source, $Ngrams3Sql AS ng FROM documents)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  round(CASE WHEN len(list_distinct(list_concat(a.ng, b.ng))) = 0 THEN 0.0
         |        ELSE len(list_intersect(a.ng, b.ng))::DOUBLE / len(list_distinct(list_concat(a.ng, b.ng)))::DOUBLE END, 4) AS jaccard
         |FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
         |WHERE CASE WHEN len(list_distinct(list_concat(a.ng, b.ng))) = 0 THEN 0.0
         |      ELSE len(list_intersect(a.ng, b.ng))::DOUBLE / len(list_distinct(list_concat(a.ng, b.ng)))::DOUBLE END >= 0.2
         |ORDER BY a_id, b_id""".stripMargin,

    // both directional containments from ONE intersect; filter on the
    // unrounded max, exactly as the engine does
    "l2t_containment" ->
      s"""WITH g AS (SELECT doc_id, source, $Ngrams3Sql AS ng FROM documents)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  len(a.ng)::BIGINT AS n_a, len(b.ng)::BIGINT AS n_b,
         |  round(CASE WHEN len(a.ng) = 0 THEN 0.0 ELSE len(list_intersect(a.ng, b.ng))::DOUBLE / len(a.ng)::DOUBLE END, 4) AS c_ab,
         |  round(CASE WHEN len(b.ng) = 0 THEN 0.0 ELSE len(list_intersect(a.ng, b.ng))::DOUBLE / len(b.ng)::DOUBLE END, 4) AS c_ba
         |FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
         |WHERE greatest(
         |  CASE WHEN len(a.ng) = 0 THEN 0.0 ELSE len(list_intersect(a.ng, b.ng))::DOUBLE / len(a.ng)::DOUBLE END,
         |  CASE WHEN len(b.ng) = 0 THEN 0.0 ELSE len(list_intersect(a.ng, b.ng))::DOUBLE / len(b.ng)::DOUBLE END) >= 0.5
         |ORDER BY a_id, b_id""".stripMargin,

    // per-doc artifact CTE (fp, len, simhash, grams) then ONE blocked
    // pair join — replaying the single-pass shape, not five pipelines
    "l2w_pair_features" ->
      s"""WITH base AS (SELECT doc_id, source, sha256(text) AS fp,
         |  length(text)::BIGINT AS len, $Ngrams3Sql AS ng,
         |  list_transform($ToksSql, w -> ${h60("'0'", "w")}) AS th
         |  FROM documents),
         |s AS (SELECT doc_id, source, fp, len, ng,
         |  ($SimhashAccSql) AS sh FROM base)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  round(CASE WHEN len(list_distinct(list_concat(a.ng, b.ng))) = 0 THEN 0.0
         |    ELSE len(list_intersect(a.ng, b.ng))::DOUBLE
         |      / len(list_distinct(list_concat(a.ng, b.ng)))::DOUBLE END, 4) AS jaccard,
         |  round(CASE WHEN len(a.ng) = 0 THEN 0.0
         |    ELSE len(list_intersect(a.ng, b.ng))::DOUBLE / len(a.ng)::DOUBLE END, 4) AS c_ab,
         |  round(CASE WHEN len(b.ng) = 0 THEN 0.0
         |    ELSE len(list_intersect(a.ng, b.ng))::DOUBLE / len(b.ng)::DOUBLE END, 4) AS c_ba,
         |  (CASE WHEN greatest(a.len, b.len) = 0 THEN 1000
         |    ELSE floor(least(a.len, b.len)::DOUBLE * 1000.0
         |      / greatest(a.len, b.len)::DOUBLE) END)::BIGINT AS len_ratio_milli,
         |  bit_count(xor(a.sh, b.sh))::BIGINT AS sh_hamming,
         |  (a.fp = b.fp) AS exact_dup
         |FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
         |ORDER BY a_id, b_id""".stripMargin,

    "l2v_jaccard_hist" ->
      s"""WITH g AS (SELECT doc_id, source, $Ngrams3Sql AS ng FROM documents),
         |p AS (SELECT
         |  round(CASE WHEN len(list_distinct(list_concat(a.ng, b.ng))) = 0 THEN 0.0
         |        ELSE len(list_intersect(a.ng, b.ng))::DOUBLE / len(list_distinct(list_concat(a.ng, b.ng)))::DOUBLE END, 4) AS jaccard
         |  FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id)
         |SELECT floor(jaccard * 20)::BIGINT AS band, count(*)::BIGINT AS n_pairs
         |FROM p GROUP BY 1 ORDER BY band""".stripMargin,

    // pure parameter math — pow() agrees bit-for-bit with Math.pow
    // across the whole grid (verified point-by-point before adopting
    // micro-unit floors)
    "l2u_lsh_plan" ->
      """SELECT (32 // f.r)::BIGINT AS bands, f.r::BIGINT AS rows_per_band,
        |  s.sp::BIGINT AS s_permille,
        |  floor((1.0 - pow(1.0 - pow(s.sp / 1000.0, f.r), 32 // f.r))
        |    * 1000000.0)::BIGINT AS p_candidate_micro,
        |  floor(pow(1.0 / (32 // f.r), 1.0 / f.r) * 1000000.0)::BIGINT
        |    AS threshold_micro
        |FROM (SELECT r FROM (SELECT unnest(generate_series(1, 32)) AS r)
        |      WHERE 32 % r = 0) f,
        |     (SELECT unnest(generate_series(50, 950, 50)) AS sp) s
        |ORDER BY rows_per_band, s_permille""".stripMargin,

    "l2h_decontaminate" ->
      s"""WITH ev AS (SELECT DISTINCT unnest($Ngrams3Sql) AS ng
         |            FROM documents WHERE doc_id % 20 = 0),
         |dg AS (SELECT doc_id, unnest($Ngrams3Sql) AS ng FROM documents),
         |hits AS (SELECT dg.doc_id, count(*) AS n_overlap
         |         FROM dg JOIN ev USING (ng) GROUP BY 1)
         |SELECT d.doc_id, coalesce(h.n_overlap, 0)::BIGINT AS n_overlap,
         |  coalesce(h.n_overlap, 0) >= 5 AS contaminated
         |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // the (hash,pos) argmin rides as a fixed-width hex string so the
    // window min is a plain varchar MIN in both engines; full windows
    // only (short docs: the one all-gram window)
    "l2n_winnowing" ->
      s"""WITH $WinnowCte
         |SELECT doc_id, substr(sel, 17, 7)::BIGINT AS fp_pos,
         |  ('0x' || substr(sel, 1, 15))::BIGINT AS fp_hash
         |FROM sels ORDER BY doc_id, fp_pos""".stripMargin,

    "l1b_incremental_dedup" ->
      s"""WITH fp AS (SELECT doc_id, sha256(array_to_string($ToksSql, ' ')) AS fp
         |           FROM documents),
         |batch AS (SELECT * FROM fp WHERE doc_id % 10 < 3),
         |corpus AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 10 >= 3)
         |SELECT min(doc_id) AS doc_id, fp, count(*) AS n_in_batch
         |FROM batch WHERE fp NOT IN (SELECT fp FROM corpus)
         |GROUP BY fp ORDER BY doc_id""".stripMargin,

    // cell = sign pattern vs the SAME literal hyperplanes (left-to-right
    // double chains are bit-identical, so signs and cells agree exactly);
    // cosine uses the l2f guard-band idiom around the round boundary
    "l2p_embedding_neardup_lsh" -> {
      val cellSql = graft.operators.Dedup.SemanticHyperplanes.zipWithIndex
        .map { case (h, i) =>
          val dot = h.zipWithIndex
            .map { case (c, j) => s"embedding[${j + 1}]::DOUBLE * ($c)" }
            .mkString(" + ")
          s"(CASE WHEN $dot >= 0 THEN ${1L << i} ELSE 0 END)"
        }.mkString(" + ")
      s"""WITH c AS (SELECT vec_id, embedding, ($cellSql)::BIGINT AS cell FROM embeddings)
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.cell,
         | round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
         |FROM c a JOIN c b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3999
         |  AND round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.4
         |ORDER BY a_id, b_id""".stripMargin
    },

    // the oracle enumerates pairs as a plain self-join (the engine side
    // uses the bucketed explode for scale; the answer is the same set)
    "l2o_winnow_matches" ->
      s"""WITH $WinnowCte,
         |fp AS (SELECT DISTINCT doc_id, ('0x' || substr(sel, 1, 15))::BIGINT AS h FROM sels),
         |buck AS (SELECT h FROM fp GROUP BY h HAVING count(*) BETWEEN 2 AND 50),
         |pr AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |       FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
         |       WHERE a.h IN (SELECT h FROM buck))
         |SELECT a_id, b_id, count(*)::BIGINT AS n_shared
         |FROM pr GROUP BY a_id, b_id HAVING count(*) >= 2
         |ORDER BY a_id, b_id""".stripMargin,

    // the oracle enumerates ALL gram-sharing pairs (exact intersection
    // counts) — the engine's prefix filter is a pruning theorem, not an
    // approximation, so the answer sets are identical
    "l2q_setsim_join" ->
      s"""WITH dg AS (SELECT DISTINCT doc_id, ng
         |            FROM (SELECT doc_id, unnest($Ngrams3Sql) AS ng FROM documents)),
         |sz AS (SELECT doc_id, count(*) AS sz FROM dg GROUP BY 1),
         |i AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
         |      FROM dg a JOIN dg b ON a.ng = b.ng AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2),
         |j AS (SELECT a_id, b_id, inter, sa.sz + sb.sz - inter AS uni
         |      FROM i JOIN sz sa ON sa.doc_id = a_id
         |             JOIN sz sb ON sb.doc_id = b_id)
         |SELECT a_id, b_id, inter, uni,
         |  round(inter::DOUBLE / uni, 4) AS jacc
         |FROM j WHERE inter * 2 >= 1 * uni
         |ORDER BY a_id, b_id""".stripMargin,

    // bloom is a pure pre-filter (zero false negatives + exact verify),
    // so the oracle is the same exact n-gram-overlap replay as l2h —
    // the bloom changes WHERE the work happens, never the answer
    "l2m_bloom_decontaminate" ->
      s"""WITH ev AS (SELECT DISTINCT unnest(${NgramsSql(2)}) AS ng
         |            FROM documents WHERE doc_id % 17 = 0),
         |dg AS (SELECT doc_id, unnest(${NgramsSql(2)}) AS ng FROM documents),
         |hits AS (SELECT dg.doc_id, count(*) AS n_overlap
         |         FROM dg JOIN ev USING (ng) GROUP BY 1)
         |SELECT d.doc_id, coalesce(h.n_overlap, 0)::BIGINT AS n_overlap,
         |  coalesce(h.n_overlap, 0) >= 3 AS contaminated
         |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // connected components in SQL: transitive closure via recursive CTE
    // (min reachable label per node == hash-min propagation's fixpoint)
    "l2g_dedup_clusters" ->
      s"""WITH RECURSIVE $ClustersCteSql
         |SELECT doc_id, cluster_id,
         |  count(*) OVER (PARTITION BY cluster_id)::BIGINT AS cluster_size
         |FROM cc ORDER BY doc_id""".stripMargin,

    // same truth as l2g_dedup_clusters: components are
    // kernel-independent, so the star-contraction query replays
    // against the identical recursive-CTE closure
    "l2g_star_clusters" ->
      s"""WITH RECURSIVE $ClustersCteSql
         |SELECT doc_id, cluster_id,
         |  count(*) OVER (PARTITION BY cluster_id)::BIGINT AS cluster_size
         |FROM cc ORDER BY doc_id""".stripMargin,

    // split gate keyed on the CLUSTER id — same components CTE as l2g,
    // same md5 gate arithmetic as samp_splits
    "mix_split_guard" ->
      s"""WITH RECURSIVE $ClustersCteSql
         |SELECT doc_id, cluster_id,
         |  CASE WHEN ('0x' || substr(md5(concat_ws('', cluster_id::VARCHAR, 'leak')), 1, 8))::BIGINT < ${SampThr(0.8)} THEN 'train'
         |       WHEN ('0x' || substr(md5(concat_ws('', cluster_id::VARCHAR, 'leak')), 1, 8))::BIGINT < ${SampThr(0.9)} THEN 'val'
         |       ELSE 'test' END AS split
         |FROM cc ORDER BY doc_id""".stripMargin,

    // representative = longest doc per cluster, ties toward min doc_id
    "l2g_cluster_reps" ->
      s"""WITH RECURSIVE $ClustersCteSql
         |SELECT cluster_id, rep_doc_id, rep_quality, n_members FROM (
         |  SELECT cc.cluster_id, d.doc_id AS rep_doc_id,
         |    d.n_chars::BIGINT AS rep_quality,
         |    count(*) OVER (PARTITION BY cc.cluster_id)::BIGINT AS n_members,
         |    row_number() OVER (PARTITION BY cc.cluster_id
         |      ORDER BY d.n_chars DESC, d.doc_id) AS rn
         |  FROM cc JOIN documents d USING (doc_id))
         |WHERE rn = 1 ORDER BY cluster_id""".stripMargin,

    // w9-style island merge over flagged span positions; all-integer
    "l2l_dup_spans" -> {
      val k = 8
      s"""WITH t AS (SELECT doc_id, $ToksSql AS toks,
         |    CASE WHEN length(trim(text)) = 0 THEN 0::BIGINT ELSE len($ToksSql)::BIGINT END AS n_tokens
         |  FROM documents),
         |sp AS (
         |  SELECT doc_id, i AS pos,
         |    ${h60("'0'", s"array_to_string(toks[i:i+${k - 1}], ' ')")} AS h
         |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - ${k - 1})) AS i
         |        FROM t WHERE n_tokens >= $k)),
         |dup AS (SELECT h FROM sp GROUP BY h HAVING count(*) >= 2),
         |fl AS (SELECT doc_id, pos FROM sp JOIN dup USING (h)),
         |mk AS (SELECT doc_id, pos AS s, pos + ${k - 1} AS e,
         |    CASE WHEN max(pos + ${k - 1}) OVER w IS NULL OR pos > max(pos + ${k - 1}) OVER w
         |         THEN 1 ELSE 0 END AS brk
         |  FROM fl WINDOW w AS (PARTITION BY doc_id ORDER BY pos
         |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         |iv AS (SELECT doc_id, s, e,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY s ROWS UNBOUNDED PRECEDING) AS iid
         |  FROM mk),
         |reg AS (SELECT doc_id, min(s) AS ms, max(e) AS me FROM iv GROUP BY doc_id, iid),
         |p1 AS (SELECT doc_id, count(*)::BIGINT AS n_dup_spans FROM fl GROUP BY doc_id),
         |p2 AS (SELECT doc_id, count(*)::BIGINT AS n_dup_regions,
         |         sum(me - ms + 1)::BIGINT AS dup_tokens FROM reg GROUP BY doc_id)
         |SELECT t.doc_id, t.n_tokens,
         |  coalesce(p1.n_dup_spans, 0)::BIGINT AS n_dup_spans,
         |  coalesce(p2.n_dup_regions, 0)::BIGINT AS n_dup_regions,
         |  coalesce(p2.dup_tokens, 0)::BIGINT AS dup_tokens
         |FROM t LEFT JOIN p1 USING (doc_id) LEFT JOIN p2 USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin
    },

    "l2d_simhash" ->
      s"""WITH t AS (SELECT doc_id, list_transform($ToksSql, w -> ${h60("'0'", "w")}) AS th FROM documents)
         |SELECT doc_id, ($SimhashAccSql) AS simhash FROM t ORDER BY doc_id""".stripMargin,

    // Banded simhash near-dups, replayed end to end: sketch (as l2d) →
    // pigeonhole banding into four 15-bit chunks compared BY VALUE →
    // exact hamming verify. Spark bands the same chunk values, so band
    // membership — not just the verified output — is oracle-checked.
    "l2e_simhash_pairs" ->
      s"""WITH t AS (SELECT doc_id, list_transform($ToksSql, w -> ${h60("'0'", "w")}) AS th FROM documents),
         |sk AS (SELECT doc_id, ($SimhashAccSql) AS simhash FROM t),
         |banded AS (
         |  SELECT doc_id, simhash, i, (simhash >> (15 * i)) & 32767 AS bits
         |  FROM sk CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i))
         |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         |  bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
         |FROM banded a JOIN banded b
         |  ON a.i = b.i AND a.bits = b.bits AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY a_id, b_id""".stripMargin,

    // Banded MinHash near-dups, replayed end to end: 32 paired-digest
    // md5 min-signatures (hash 2d / 2d+1 = hex 1-15 / 16-30 of
    // md5(d':'shingle)) → 8 bands of 4 compared BY VALUE (Spark's
    // xxhash64 band key preserves tuple equality modulo ~2^-64
    // collisions) → exact shingle-set jaccard on the candidates (same
    // string-set formulation the l2c oracle proves value-equal to the
    // engine's hashed sets).
    "l2b_minhash_pairs" ->
      s"""$MinhashBandCteSql,
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM banded a JOIN banded b
         |    ON a.i = b.i AND a.bk = b.bk AND a.doc_id < b.doc_id),
         |jac AS (
         |  SELECT a_id, b_id,
         |    CASE WHEN len(list_distinct(list_concat(sa.sh, sb.sh))) = 0 THEN 0.0
         |         ELSE len(list_intersect(sa.sh, sb.sh))::DOUBLE
         |              / len(list_distinct(list_concat(sa.sh, sb.sh)))::DOUBLE END AS j
         |  FROM cand JOIN s sa ON sa.doc_id = cand.a_id JOIN s sb ON sb.doc_id = cand.b_id)
         |SELECT a_id, b_id, round(j, 4) AS jaccard FROM jac
         |WHERE round(j, 4) >= 0.5 ORDER BY a_id, b_id""".stripMargin,

    // Capstone replay: the same banded CTE feeds the near-dup stages;
    // exact stages replay the l1 fingerprint; the decision chain is
    // the same priority order as the engine's when-cascade.
    "corpus_refresh" ->
      s"""$MinhashBandCteSql,
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM banded a JOIN banded b
         |    ON a.i = b.i AND a.bk = b.bk AND a.doc_id < b.doc_id
         |  WHERE (a.doc_id % 10 = 0) OR (b.doc_id % 10 = 0)),
         |np AS (
         |  SELECT a_id, b_id,
         |    CASE WHEN a_id % 10 = 0 AND b_id % 10 = 0 THEN 'new_new'
         |         ELSE 'new_old' END AS pair_kind
         |  FROM (
         |    SELECT a_id, b_id,
         |      CASE WHEN len(list_distinct(list_concat(sa.sh, sb.sh))) = 0 THEN 0.0
         |           ELSE len(list_intersect(sa.sh, sb.sh))::DOUBLE
         |                / len(list_distinct(list_concat(sa.sh, sb.sh)))::DOUBLE END AS j
         |    FROM cand JOIN s sa ON sa.doc_id = cand.a_id
         |              JOIN s sb ON sb.doc_id = cand.b_id)
         |  WHERE round(j, 4) >= 0.5),
         |bf AS (SELECT doc_id, sha256(array_to_string($ToksSql, ' ')) AS fp
         |       FROM documents WHERE doc_id % 10 = 0),
         |cfp AS (SELECT DISTINCT sha256(array_to_string($ToksSql, ' ')) AS fp
         |        FROM documents WHERE doc_id % 10 <> 0),
         |e1 AS (SELECT DISTINCT bf.doc_id FROM bf JOIN cfp USING (fp)),
         |e2 AS (SELECT doc_id FROM (
         |  SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS keep FROM bf)
         |  WHERE doc_id <> keep),
         |n1 AS (SELECT DISTINCT
         |    CASE WHEN a_id % 10 = 0 THEN a_id ELSE b_id END AS doc_id
         |  FROM np WHERE pair_kind = 'new_old'),
         |n2 AS (SELECT DISTINCT b_id AS doc_id FROM np WHERE pair_kind = 'new_new')
         |SELECT b.doc_id,
         |  CASE WHEN e1.doc_id IS NOT NULL THEN 'dup_exact_corpus'
         |       WHEN e2.doc_id IS NOT NULL THEN 'dup_exact_batch'
         |       WHEN n1.doc_id IS NOT NULL THEN 'dup_near_corpus'
         |       WHEN n2.doc_id IS NOT NULL THEN 'dup_near_batch'
         |       ELSE 'admitted' END AS decision
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) b
         |LEFT JOIN e1 ON b.doc_id = e1.doc_id
         |LEFT JOIN e2 ON b.doc_id = e2.doc_id
         |LEFT JOIN n1 ON b.doc_id = n1.doc_id
         |LEFT JOIN n2 ON b.doc_id = n2.doc_id
         |ORDER BY b.doc_id""".stripMargin,

    // Incremental twin: identical banding; candidates restricted to
    // pairs with a NEW side (doc_id%10=0 simulates the day's batch).
    "l2r_incremental_neardup" ->
      s"""$MinhashBandCteSql,
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM banded a JOIN banded b
         |    ON a.i = b.i AND a.bk = b.bk AND a.doc_id < b.doc_id
         |  WHERE (a.doc_id % 10 = 0) OR (b.doc_id % 10 = 0)),
         |jac AS (
         |  SELECT a_id, b_id,
         |    CASE WHEN len(list_distinct(list_concat(sa.sh, sb.sh))) = 0 THEN 0.0
         |         ELSE len(list_intersect(sa.sh, sb.sh))::DOUBLE
         |              / len(list_distinct(list_concat(sa.sh, sb.sh)))::DOUBLE END AS j
         |  FROM cand JOIN s sa ON sa.doc_id = cand.a_id JOIN s sb ON sb.doc_id = cand.b_id)
         |SELECT a_id, b_id, round(j, 4) AS jaccard,
         |  CASE WHEN a_id % 10 = 0 AND b_id % 10 = 0 THEN 'new_new'
         |       ELSE 'new_old' END AS pair_kind
         |FROM jac WHERE round(j, 4) >= 0.5 ORDER BY a_id, b_id""".stripMargin,

    "l2f_embedding_neardup" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        | round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3999
        |  AND round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.4
        |ORDER BY a_id, b_id""".stripMargin,

    // within-label cosine edges -> recursive min-label closure (the
    // l2g pattern over the embedding table); keeper = min vec_id
    "l2s_semdedup" ->
      """WITH RECURSIVE p AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.4),
        |e AS (SELECT a_id AS s, b_id AS d FROM p
        |      UNION ALL SELECT b_id, a_id FROM p),
        |reach(node, lab) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT e.d, r.lab FROM e JOIN reach r ON r.node = e.s),
        |cc AS (SELECT node AS vec_id, min(lab) AS sem_group FROM reach GROUP BY node)
        |SELECT emb.vec_id, emb.label::BIGINT AS cluster, cc.sem_group,
        |  emb.vec_id = cc.sem_group AS is_kept
        |FROM embeddings emb JOIN cc USING (vec_id)
        |ORDER BY emb.vec_id""".stripMargin,

    "l3_cosine_topk" ->
      """SELECT qid, cid, sim FROM (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid,
        |    round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) AS sim,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) DESC, c.vec_id) AS rn
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND c.vec_id >= 5)
        |WHERE rn <= 3 ORDER BY qid, sim DESC, cid""".stripMargin,

    // the ANN ladder's pinned twins: full search-path replay on the
    // frozen literal quantizers (argument in AnnPinnedOracle's scaladoc).
    // r12: the LSH rung needs no twin — its hyperplane mix is already
    // deterministic, so l3b itself gains the generated-literal oracle
    // (rows-only set shrinks by one).
    "l3b_ann_lsh" -> AnnPinnedOracle.LshPinnedSql,
    "l3c_ivf_pinned" -> AnnPinnedOracle.IvfPinnedSql,
    "l3e_pq_pinned" -> AnnPinnedOracle.PqPinnedSql,
    "l3f_ivfadc_pinned" -> AnnPinnedOracle.IvfAdcPinnedSql,

    "l3h_dim_ablation" -> DimAblationSql(Seq(8, 16, 32, 64), k = 10),

    "l3g_rank_metrics" ->
      """WITH q AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id >= 5),
        |cs AS (SELECT qid, cid,
        |  round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) AS s
        |  FROM q CROSS JOIN c),
        |ds AS (SELECT qid, cid,
        |  round(list_inner_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) AS s
        |  FROM q CROSS JOIN c),
        |t AS (SELECT qid, cid, rank FROM (SELECT qid, cid,
        |  row_number() OVER (PARTITION BY qid ORDER BY s DESC, cid) AS rank FROM cs)
        |  WHERE rank <= 10),
        |d AS (SELECT qid, cid, rank FROM (SELECT qid, cid,
        |  row_number() OVER (PARTITION BY qid ORDER BY s DESC, cid) AS rank FROM ds)
        |  WHERE rank <= 10),
        |hits AS (SELECT t.qid, count(*) AS n_hits, min(d.rank) AS first_hit_rank
        |  FROM t JOIN d ON t.qid = d.qid AND t.cid = d.cid GROUP BY 1),
        |tt AS (SELECT qid, count(*) AS n_truth FROM t GROUP BY 1)
        |SELECT tt.qid, tt.n_truth, coalesce(hits.n_hits, 0) AS n_hits,
        |  round(coalesce(hits.n_hits, 0) / tt.n_truth, 4) + 0.0 AS recall,
        |  hits.first_hit_rank,
        |  round(1.0::DOUBLE / hits.first_hit_rank, 4) + 0.0 AS rr
        |FROM tt LEFT JOIN hits USING (qid) ORDER BY tt.qid""".stripMargin,

    "l4_token_stats" ->
      s"""SELECT doc_id,
         | CASE WHEN length(trim(text)) = 0 THEN 0::BIGINT ELSE len($ToksSql)::BIGINT END AS n_tokens,
         | round(CASE WHEN len($ToksSql) = 0 THEN 0.0
         |   ELSE list_aggregate(list_transform($ToksSql, t -> length(t)::BIGINT), 'sum')::DOUBLE / len($ToksSql)::DOUBLE END, 4) AS mean_tok_len,
         | round(CASE WHEN length(text) = 0 THEN 0.0
         |   ELSE (length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')))::DOUBLE / length(text)::DOUBLE END, 4) AS punct_ratio
         |FROM documents ORDER BY doc_id""".stripMargin,

    "l4b_term_freq" ->
      s"""SELECT tok, count(*) AS n FROM (SELECT unnest($ToksSql) AS tok FROM documents)
         |GROUP BY tok ORDER BY n DESC, tok LIMIT 50""".stripMargin,

    "l4f_pii_scrub" ->
      """WITH es AS (SELECT doc_id, text,
        |  regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS email_scrubbed
        |  FROM documents)
        |SELECT doc_id,
        | len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
        | len(regexp_extract_all(email_scrubbed, '[0-9]{9,}'))::BIGINT AS n_long_numbers,
        | regexp_replace(email_scrubbed, '[0-9]{9,}', '<NUM>', 'g') AS scrubbed
        |FROM es ORDER BY doc_id""".stripMargin,

    "l4e_bpe_tokens" ->
      s"""WITH RECURSIVE $BpeCountsCte
         |SELECT d.doc_id,
         | CASE WHEN length(trim(text)) = 0 THEN 0::BIGINT ELSE len($ToksSql)::BIGINT END AS n_ws_tokens,
         | len(regexp_extract_all(text, '$BpePatSql'))::BIGINT AS n_bpe_tokens,
         | bpe.n_bpe_merged
         |FROM documents d JOIN bpe USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // integer features × integer micro-weights → BIGINT margin: the
    // decision boundary replays bit-identically (no floats, no libm)
    "l4p_quality_model" ->
      s"""WITH q AS (SELECT doc_id, upper(text[1:20]) || ' 12345!!! ' || text AS text FROM documents),
         |f AS (SELECT doc_id,
         |  least(length(text), 500)::BIGINT AS f_chars,
         |  len(list_filter($ToksSql, t -> list_contains($StopEn, t)))::BIGINT AS f_stop,
         |  (length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')))::BIGINT AS f_punct,
         |  (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::BIGINT AS f_digit,
         |  (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))::BIGINT AS f_upper
         | FROM q)
         |SELECT doc_id, f_chars, f_stop, f_punct, f_digit, f_upper,
         | (-520000 + 2000*f_chars + 40000*f_stop - 30000*f_punct - 15000*f_digit - 8000*f_upper)::BIGINT AS margin_micro,
         | (-520000 + 2000*f_chars + 40000*f_stop - 30000*f_punct - 15000*f_digit - 8000*f_upper) >= 0 AS pass
         |FROM f ORDER BY doc_id""".stripMargin,

    // Band-bucket pair generation + hamming verify replayed by value:
    // the same md5-derived hash family on both engines, 4 sixteen-bit
    // chunks, DISTINCT candidates, popcount ≤ 3 — the l2e pattern
    "mm_phash_band_pairs" ->
      """WITH h AS (SELECT doc_id,
        |  xor(('0x' || substr(md5('ph:' || (doc_id % 250)::VARCHAR), 1, 15))::BIGINT,
        |      CASE WHEN doc_id % 4 <> 0
        |           THEN (1::BIGINT << ((doc_id * 7) % 60)::INT)
        |           ELSE 0::BIGINT END) AS phash
        |  FROM documents),
        |bd AS (SELECT doc_id, phash, i, (phash >> (16 * i)) & 65535 AS cv
        |       FROM h CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i))
        |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        |  bit_count(xor(a.phash, b.phash))::BIGINT AS hamming
        |FROM bd a JOIN bd b
        |  ON a.i = b.i AND a.cv = b.cv AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.phash, b.phash)) <= 3
        |ORDER BY a_id, b_id""".stripMargin,

    // The gear walk replayed character-by-character (recursive CTE)
    // with the PRE-MASKED gear table interpolated as a literal — see
    // CdcChunksSql for why low-bit masking makes this exact without
    // 64-bit wrapping arithmetic. Chunk reassembly (substr between
    // boundary edges) proves concat(chunks) == text implicitly.
    "l5d_cdc_chunks" -> CdcChunksSql(maskBits = 6, minLen = 16, maxLen = 256),

    // n_bpe_merged re-derived from the REPLAYED sequence itself (token
    // count = sequence length), so the count column cross-checks the
    // two Spark expressions against one independent oracle value
    "l4o_bpe_encode" ->
      s"""WITH RECURSIVE $BpeEncodeCte
         |SELECT doc_id, bpe_text,
         | CASE WHEN bpe_text = '' THEN 0::BIGINT
         |      ELSE len(string_split(bpe_text, ' '))::BIGINT END AS n_bpe_merged
         |FROM bpetext ORDER BY doc_id""".stripMargin,

    "pack_bins_bpe" ->
      s"""WITH RECURSIVE $BpeCountsCte,
         |c AS (SELECT d.doc_id, d.lang, bpe.n_bpe_merged AS n_tokens,
         |    sum(bpe.n_bpe_merged) OVER
         |    (PARTITION BY d.lang ORDER BY d.doc_id ROWS UNBOUNDED PRECEDING) - bpe.n_bpe_merged AS strt
         |  FROM documents d JOIN bpe USING (doc_id))
         |SELECT doc_id, lang, n_tokens,
         | (strt // 2048)::BIGINT AS bin, (strt % 2048)::BIGINT AS bin_offset
         |FROM c ORDER BY lang, doc_id""".stripMargin,

    "l4d_repetition" ->
      s"""WITH t AS (SELECT doc_id,
         |  list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> x <> '') AS lines,
         |  $ToksSql AS toks FROM documents),
         |base AS (SELECT doc_id, len(lines)::BIGINT AS n_lines,
         |  (len(lines) - len(list_distinct(lines)))::BIGINT AS n_dup_lines,
         |  list_transform(generate_series(1, greatest(len(toks)-1, 0)), i -> toks[i] || ' ' || toks[i+1]) AS bgs
         |  FROM t),
         |c AS (SELECT doc_id, bg, count(*) AS c
         |      FROM (SELECT doc_id, unnest(bgs) AS bg FROM base) GROUP BY 1, 2),
         |m AS (SELECT doc_id, sum(c)::BIGINT AS n_bigrams, max(c)::BIGINT AS top_bigram_n
         |      FROM c GROUP BY 1)
         |SELECT b.doc_id, b.n_lines, b.n_dup_lines,
         |  coalesce(m.n_bigrams, 0)::BIGINT AS n_bigrams,
         |  coalesce(m.top_bigram_n, 0)::BIGINT AS top_bigram_n
         |FROM base b LEFT JOIN m ON b.doc_id = m.doc_id
         |ORDER BY b.doc_id""".stripMargin,

    "lang_id" -> (LangIdCoreSql +
      "\nSELECT doc_id, guess, labeled FROM g ORDER BY doc_id"),

    // the classifier-eval view of the same prediction: confusion counts
    "lang_confusion" -> (LangIdCoreSql +
      """
        |SELECT labeled, guess, count(*) AS n FROM g
        |GROUP BY 1, 2 ORDER BY labeled, guess""".stripMargin),

    // Mann-Whitney replay: same distinct-(group,score) histogram, same
    // doubled-pair integer, same nano floor-division
    "eval_auc" ->
      """WITH h AS (SELECT source, (n_chars % 97)::BIGINT AS s,
        |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS np,
        |  sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS nn
        |  FROM documents GROUP BY 1, 2),
        |c AS (SELECT source, np, nn,
        |  coalesce(sum(nn) OVER (PARTITION BY source ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cnb
        |  FROM h),
        |u AS (SELECT source, sum(np)::BIGINT AS n_pos, sum(nn)::BIGINT AS n_neg,
        |  sum(np * (2 * cnb + nn))::BIGINT AS u2 FROM c GROUP BY 1)
        |SELECT source, n_pos, n_neg,
        |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |    floor((u2 * 1000000000)::DOUBLE / (2 * n_pos * n_neg)::DOUBLE)::BIGINT
        |  END AS auc_nano
        |FROM u ORDER BY source""".stripMargin,

    // milli-unit probabilities keep every per-bin sum integral; the
    // ALL row (bin = -1) carries the ECE in conf_nano
    "eval_ece" ->
      """WITH p AS (SELECT
        |  least(((doc_id * 37) % 1001) * 10 // 1000, 9)::BIGINT AS bin,
        |  (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS y,
        |  ((doc_id * 37) % 1001)::BIGINT AS pm FROM documents),
        |b AS (SELECT bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
        |  sum(pm)::BIGINT AS psum FROM p GROUP BY 1)
        |SELECT bin, n, n_pos,
        |  floor((psum * 1000000)::DOUBLE / n::DOUBLE)::BIGINT AS conf_nano,
        |  floor((n_pos * 1000000000)::DOUBLE / n::DOUBLE)::BIGINT AS acc_nano
        |FROM b
        |UNION ALL
        |SELECT -1::BIGINT, sum(n)::BIGINT, sum(n_pos)::BIGINT,
        |  floor((sum(abs(1000 * n_pos - psum)) * 1000000)::DOUBLE
        |    / sum(n)::DOUBLE)::BIGINT,
        |  NULL::BIGINT
        |FROM b
        |ORDER BY bin""".stripMargin,

    // kappa from the same g CTE as lang_id/lang_confusion: contingency
    // counts -> marginals -> one nano floor-division per statistic
    "eval_kappa" -> (LangIdCoreSql +
      """,
        |ct AS (SELECT labeled AS a, guess AS b, count(*)::BIGINT AS n
        |  FROM g GROUP BY 1, 2),
        |rt AS (SELECT a, sum(n)::BIGINT AS rt FROM ct GROUP BY 1),
        |cl AS (SELECT b, sum(n)::BIGINT AS ct FROM ct GROUP BY 1),
        |pe AS (SELECT coalesce(sum(rt.rt * cl.ct), 0)::BIGINT AS pe_num
        |  FROM rt JOIN cl ON rt.a IS NOT DISTINCT FROM cl.b),
        |t AS (SELECT coalesce(sum(n), 0)::BIGINT AS n,
        |  coalesce(sum(CASE WHEN a IS NOT DISTINCT FROM b THEN n END), 0)::BIGINT AS diag
        |  FROM ct)
        |SELECT t.n AS n,
        |  CASE WHEN t.n > 0 THEN
        |    floor((diag * 1000000000)::DOUBLE / t.n::DOUBLE)::BIGINT END AS po_nano,
        |  CASE WHEN t.n > 0 THEN
        |    floor((pe_num * 1000000000)::DOUBLE / (t.n * t.n)::DOUBLE)::BIGINT END AS pe_nano,
        |  CASE WHEN t.n * t.n - pe_num <> 0 THEN
        |    floor(((diag * t.n - pe_num) * 1000000000)::DOUBLE
        |      / (t.n * t.n - pe_num)::DOUBLE)::BIGINT END AS kappa_nano
        |FROM t CROSS JOIN pe""".stripMargin),

    "quality_score" ->
      s"""WITH q AS (SELECT doc_id, n_chars, text, $ToksSql AS toks FROM documents)
         |SELECT doc_id, round(
         |  least(1.0, n_chars::DOUBLE / 500.0) * 0.4
         |  + (1.0 - least(1.0, (CASE WHEN length(text) = 0 THEN 0.0
         |      ELSE (length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')))::DOUBLE / length(text)::DOUBLE END) * 5.0)) * 0.3
         |  + least(1.0, (CASE WHEN len(toks) = 0 THEN 0.0
         |      ELSE len(list_filter(toks, t -> list_contains($StopEn, t)))::DOUBLE / len(toks)::DOUBLE END) * 4.0) * 0.3,
         |  4) AS quality
         |FROM q ORDER BY doc_id""".stripMargin,

    "fingerprints" ->
      s"""SELECT doc_id,
         | list_reduce(list_prepend(0::BIGINT, list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
         |   (acc, c) -> (acc * 31 + c) % 1000000007) AS rolling_fp,
         | sha256(array_to_string($ToksSql, ' ')) AS content_fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    "a8_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.25), 4) AS p25,
        | round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        | round(quantile_cont(l_quantity, 0.75), 4) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a10_mode_per_key" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS n
        |           FROM events GROUP BY 1, 2),
        |r AS (SELECT user_id, event_type, n, row_number() OVER
        |        (PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
        |      FROM c)
        |SELECT user_id, event_type AS top_type, n FROM r WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    // DuckDB has no width_bucket; [0,50) in 10 buckets over integer-
    // valued quantities reduces to exact integer arithmetic
    // Histogram state + estimator replayed end to end; q literals cast
    // to DOUBLE (DuckDB parses 0.99 as DECIMAL by default, which would
    // change the ceil(q*N) arithmetic and the output schema).
    "a8c_hist_quantiles" ->
      """WITH p AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
        |           FROM events),
        |st AS (SELECT event_type,
        |         least(63, greatest(0, floor(v / 1000)::BIGINT)) AS bin,
        |         count(*) AS n
        |       FROM p GROUP BY 1, 2),
        |c AS (SELECT event_type, bin, n,
        |        sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum
        |      FROM st),
        |t AS (SELECT event_type, sum(n)::BIGINT AS n_total FROM st GROUP BY 1),
        |q AS (SELECT event_type, n_total,
        |        unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q FROM t),
        |r AS (SELECT event_type, n_total, q,
        |        greatest(1, ceil(q * n_total)::BIGINT) AS r FROM q)
        |SELECT r.event_type, CAST(round(r.q * 1000) AS BIGINT) AS q, r.n_total,
        |  (c.bin * 1000 + floor((r.r - (c.cum - c.n)) * 1000 / c.n)::BIGINT)
        |    AS est
        |FROM r JOIN c ON r.event_type = c.event_type
        |  AND (c.cum - c.n) < r.r AND r.r <= c.cum
        |ORDER BY r.event_type, r.q""".stripMargin,

    "a8d_hist_merge" ->
      """SELECT event_type,
        |  least(63, greatest(0,
        |    floor(CAST(round(value * 100) AS BIGINT) / 1000)::BIGINT)) AS bin,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY event_type, bin""".stripMargin,

    "a9_histogram" ->
      """SELECT CASE WHEN l_quantity < 0 THEN 0::BIGINT
        |            WHEN l_quantity >= 50 THEN 11::BIGINT
        |            ELSE floor(l_quantity / 5)::BIGINT + 1 END AS bucket,
        | count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin,

    "a26_fd_binwidth" ->
      """WITH a AS (SELECT event_type, count(*)::BIGINT AS n,
        |  round(quantile_cont(value, 0.25), 4) AS q1,
        |  round(quantile_cont(value, 0.75), 4) AS q3,
        |  round(min(value), 4) AS vmin, round(max(value), 4) AS vmax
        |  FROM events GROUP BY 1)
        |SELECT event_type, n, q1, q3, vmin, vmax,
        |  floor((q3 - q1) * 2.0 / pow(n::DOUBLE, 1.0 / 3.0) * 1000.0)::BIGINT
        |    AS width_milli,
        |  CASE WHEN floor((q3 - q1) * 2.0 / pow(n::DOUBLE, 1.0 / 3.0) * 1000.0) > 0
        |    THEN ceil((vmax - vmin) * 1000.0
        |      / floor((q3 - q1) * 2.0 / pow(n::DOUBLE, 1.0 / 3.0) * 1000.0))::BIGINT
        |  END AS n_bins
        |FROM a ORDER BY event_type""".stripMargin,

    "a24_weighted_median" ->
      """WITH c AS (
        |  SELECT event_type, value AS v, (user_id % 5 + 1)::BIGINT AS w,
        |    sum((user_id % 5 + 1)::BIGINT) OVER
        |      (PARTITION BY event_type ORDER BY value
        |       ROWS UNBOUNDED PRECEDING) AS cumw,
        |    sum((user_id % 5 + 1)::BIGINT) OVER (PARTITION BY event_type) AS totw
        |  FROM events)
        |SELECT event_type, min(v) AS weighted_median,
        |  min(totw)::BIGINT AS total_weight
        |FROM c WHERE cumw * 2 >= totw
        |GROUP BY 1 ORDER BY event_type""".stripMargin,

    "a25_benford" ->
      """WITH d AS (SELECT regexp_extract(value::VARCHAR, '[1-9]') AS digit
        |  FROM events),
        |c AS (SELECT digit, count(*)::BIGINT AS n_observed FROM d
        |  WHERE digit <> '' GROUP BY 1),
        |t AS (SELECT sum(n_observed)::BIGINT AS n FROM c)
        |SELECT digit, n_observed,
        |  floor(t.n::DOUBLE * (ln(1.0 + 1.0 / digit::DOUBLE) / ln(10.0))
        |    * 1000000.0)::BIGINT AS n_expected_micro,
        |  (n_observed * 1000000 - floor(t.n::DOUBLE *
        |    (ln(1.0 + 1.0 / digit::DOUBLE) / ln(10.0)) * 1000000.0)::BIGINT)::BIGINT
        |    AS deviation_micro
        |FROM c CROSS JOIN t ORDER BY digit""".stripMargin,

    "w5_rank_family" ->
      """SELECT user_id, event_id,
        | ntile(4) OVER w::BIGINT AS quartile,
        | round(percent_rank() OVER w, 6) AS pr,
        | round(cume_dist() OVER w, 6) AS cd
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "w6_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM g)
        |SELECT user_id, session_id::BIGINT AS session_id, count(*) AS n_events,
        | strftime(min(ts), '%Y-%m-%d %H:%M:%S.%g') AS session_start,
        | ((epoch_ms(max(ts)) - epoch_ms(min(ts))) // 1000)::BIGINT AS duration_s
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,

    "o4_zorder_curve" ->
      """SELECT l_orderkey, l_linenumber,
        | list_aggregate(list_transform(generate_series(0, 9), i ->
        |   ((((l_partkey % 1024) >> i) & 1) << (2*i)) + ((((l_suppkey % 1024) >> i) & 1) << (2*i+1))),
        |   'sum')::BIGINT AS z
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "o4c_zonemap" ->
      """WITH e AS (SELECT event_id, user_id,
        |  (hour(ts) + day(ts) * 24)::BIGINT AS hr FROM events),
        |z AS (SELECT e.*, list_aggregate(list_transform(generate_series(0, 9), i ->
        |   ((((user_id % 1024) >> i) & 1) << (2*i)) + ((((hr % 1024) >> i) & 1) << (2*i+1))),
        |   'sum')::BIGINT AS zv FROM e),
        |n AS (SELECT count(*)::BIGINT AS n FROM e),
        |pa AS (SELECT 'a_natural' AS layout, user_id,
        |  row_number() OVER (ORDER BY event_id) AS pos FROM e),
        |pb AS (SELECT 'b_zorder', user_id,
        |  row_number() OVER (ORDER BY zv, event_id) FROM z),
        |pc AS (SELECT 'c_clustered', user_id,
        |  row_number() OVER (ORDER BY user_id, event_id) FROM e),
        |u AS (SELECT * FROM pa UNION ALL SELECT * FROM pb UNION ALL SELECT * FROM pc),
        |f AS (SELECT layout, ((pos - 1) * 32) // n.n AS file_id, user_id
        |      FROM u CROSS JOIN n)
        |SELECT layout, file_id::BIGINT AS file_id, count(*)::BIGINT AS n_rows,
        |  min(user_id)::BIGINT AS min_probe, max(user_id)::BIGINT AS max_probe,
        |  (max(user_id) < 100 OR min(user_id) > 120) AS can_skip
        |FROM f GROUP BY 1, 2 ORDER BY layout, file_id""".stripMargin,

    // the identical 8-step rotate-and-accumulate walk, one CTE per bit
    "o4b_hilbert" -> HilbertSql(8),

    "w7_cumulative_distinct" ->
      """WITH f AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
        |           ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS first_seen
        |  FROM events)
        |SELECT user_id, event_id,
        |  sum(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING)::BIGINT AS n_types_so_far
        |FROM f ORDER BY user_id, event_id""".stripMargin,

    "w8_first_last" ->
      """SELECT event_id,
        | first_value(event_id) OVER w AS first_ev,
        | last_value(event_id) OVER w AS last_ev,
        | nth_value(event_id, 2) OVER w AS second_ev
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,

    "w3b_time_range" ->
      """SELECT user_id, event_id,
        | count(*) OVER w AS n_5m, round(sum(value) OVER w, 2) AS val_5m
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "a21_winsorize" ->
      """WITH p AS (SELECT event_type, event_id,
        |             CAST(round(value * 100) AS BIGINT) AS y FROM events),
        |b AS (SELECT event_type, quantile_cont(y, 0.02) AS lo,
        |        quantile_cont(y, 0.98) AS hi
        |      FROM p GROUP BY 1)
        |SELECT p.event_type, p.event_id, p.y,
        |  round(least(greatest(p.y::DOUBLE, b.lo), b.hi), 4) + 0.0 AS y_w
        |FROM p JOIN b USING (event_type)
        |ORDER BY event_type, event_id""".stripMargin,

    "a20_skew_report" ->
      """WITH c AS (SELECT event_type, user_id AS k, count(*) AS n
        |           FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, n,
        |        row_number() OVER (PARTITION BY event_type ORDER BY n, k)::BIGINT AS i
        |      FROM c),
        |g AS (SELECT event_type, count(*) AS n_keys, sum(n)::BIGINT AS n_rows,
        |        max(n) AS max_key_rows, sum(i * n)::BIGINT AS sin
        |      FROM r GROUP BY 1)
        |SELECT event_type, n_keys, n_rows, max_key_rows,
        |  ((1000000 * max_key_rows) // n_rows)::BIGINT AS top_share_ppm,
        |  ((1000000 * (2 * sin - (n_keys + 1) * n_rows)) // (n_keys * n_rows))::BIGINT
        |    AS gini_ppm
        |FROM g ORDER BY event_type""".stripMargin,

    "a19_eqfreq_bins" ->
      """WITH p AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS y
        |           FROM events),
        |b AS (SELECT event_type, quantile_cont(y, 0.25) AS q1,
        |        quantile_cont(y, 0.5) AS q2, quantile_cont(y, 0.75) AS q3
        |      FROM p GROUP BY 1),
        |a AS (SELECT p.event_type, p.y,
        |        1 + (CASE WHEN y > q1 THEN 1 ELSE 0 END)
        |          + (CASE WHEN y > q2 THEN 1 ELSE 0 END)
        |          + (CASE WHEN y > q3 THEN 1 ELSE 0 END) AS bin
        |      FROM p JOIN b USING (event_type))
        |SELECT event_type, bin, count(*) AS n, min(y) AS y_min, max(y) AS y_max
        |FROM a GROUP BY 1, 2 ORDER BY event_type, bin""".stripMargin,

    "entity_resolution" -> (ErCteSql +
      """
        |SELECT lv.variant, lv.n, lv.entity_id, canon.canonical,
        |  ent.n_variants, ent.entity_n
        |FROM lv JOIN ent USING (entity_id) JOIN canon USING (entity_id)
        |ORDER BY variant""".stripMargin),

    // Survivorship downstream of the same ER clusters: the recursive
    // CTE replays the link+components step, then each field's election
    // re-derives independently (arg-max window / grouped-count mode).
    "er_golden_record" -> (ErCteSql +
      """,
        |pr AS (SELECT cc.entity_id, p.* FROM part p JOIN cc ON p.p_name = cc.variant),
        |base AS (SELECT entity_id, count(*) AS n_records,
        |         round(max(p_retailprice), 2) AS price_max FROM pr GROUP BY 1),
        |lt AS (SELECT entity_id, p_brand AS brand_latest FROM (
        |  SELECT entity_id, p_brand,
        |    row_number() OVER (PARTITION BY entity_id ORDER BY p_partkey DESC) AS rn
        |  FROM pr) WHERE rn = 1),
        |szm AS (SELECT entity_id, p_size::BIGINT AS size_mode FROM (
        |  SELECT entity_id, p_size,
        |    row_number() OVER (PARTITION BY entity_id ORDER BY count(*) DESC, p_size) AS rn
        |  FROM pr GROUP BY entity_id, p_size) WHERE rn = 1),
        |tpm AS (SELECT entity_id, p_type AS type_mode FROM (
        |  SELECT entity_id, p_type,
        |    row_number() OVER (PARTITION BY entity_id ORDER BY count(*) DESC, p_type) AS rn
        |  FROM pr GROUP BY entity_id, p_type) WHERE rn = 1)
        |SELECT base.entity_id, canon.canonical, base.n_records, base.price_max,
        |  lt.brand_latest, szm.size_mode, tpm.type_mode
        |FROM base JOIN canon USING (entity_id) JOIN lt USING (entity_id)
        |  JOIN szm USING (entity_id) JOIN tpm USING (entity_id)
        |ORDER BY entity_id""".stripMargin),

    // FS calibration replay: the same combinatorial-count shape the
    // engine runs (Σ C(n,2) over group sizes — no pair join), truth
    // from the shared recursive-CTE ER clusters, weights floor(ln·1e6)
    // with every factor cast DOUBLE before the product in the SAME
    // order as the engine expression (IEEE-identical doubles).
    "er_fs_weights" -> (ErCteSql + FsRecsSql +
      FsCountsSql +
      """
        |SELECT ag.field, mt.nm AS n_match, (bt.np - mt.nm)::BIGINT AS n_nonmatch,
        |  am.nam AS n_agree_match, (ag.na - am.nam)::BIGINT AS n_agree_nonmatch,
        |  CAST(floor(ln((am.nam + 1)::DOUBLE * (bt.np - mt.nm + 2)::DOUBLE
        |    / ((mt.nm + 2)::DOUBLE * (ag.na - am.nam + 1)::DOUBLE)) * 1000000) AS BIGINT)
        |    AS w_agree_micro,
        |  CAST(floor(ln((mt.nm + 1 - am.nam)::DOUBLE * (bt.np - mt.nm + 2)::DOUBLE
        |    / ((mt.nm + 2)::DOUBLE * (bt.np - mt.nm + 1 - (ag.na - am.nam))::DOUBLE)) * 1000000) AS BIGINT)
        |    AS w_disagree_micro
        |FROM ag JOIN am USING (field) CROSS JOIN bt CROSS JOIN mt
        |ORDER BY field""".stripMargin),

    // Value-specific weight replay: the same Σ C(n,2) group counts kept
    // at (field, value) grain, identical add-1/add-2 smoothing against
    // the shared match/non-match totals, ln argument in the engine's
    // exact product-then-divide order.
    "er_fs_value_weights" -> (ErCteSql + FsRecsSql +
      """,
        |bt AS (SELECT sum(n * (n - 1) // 2)::BIGINT AS np FROM (
        |  SELECT count(*) AS n FROM recs GROUP BY blk)),
        |mt AS (SELECT sum(n * (n - 1) // 2)::BIGINT AS nm FROM (
        |  SELECT count(*) AS n FROM recs GROUP BY blk, ent)),
        |lfv AS (SELECT 'suf3_eq' AS field, blk, ent, f_suf3 AS v FROM recs
        |  UNION ALL SELECT 'size_eq', blk, ent, f_size FROM recs),
        |agv AS (SELECT field, v, sum(n * (n - 1) // 2)::BIGINT AS na FROM (
        |  SELECT field, blk, v, count(*) AS n FROM lfv GROUP BY 1, 2, 3) GROUP BY 1, 2
        |  HAVING sum(n * (n - 1) // 2) > 0),
        |amv AS (SELECT field, v, sum(n * (n - 1) // 2)::BIGINT AS nam FROM (
        |  SELECT field, blk, ent, v, count(*) AS n FROM lfv GROUP BY 1, 2, 3, 4) GROUP BY 1, 2)
        |SELECT agv.field, agv.v AS value, amv.nam AS n_agree_match,
        |  (agv.na - amv.nam)::BIGINT AS n_agree_nonmatch,
        |  CAST(floor(ln((amv.nam + 1)::DOUBLE * (bt.np - mt.nm + 2)::DOUBLE
        |    / ((mt.nm + 2)::DOUBLE * (agv.na - amv.nam + 1)::DOUBLE)) * 1000000) AS BIGINT)
        |    AS w_agree_micro
        |FROM agv JOIN amv USING (field, v) CROSS JOIN bt CROSS JOIN mt
        |ORDER BY field, value""".stripMargin),

    "er_fs_em" -> FsEmSql(iters = 15),

    "er_fs_link" -> FsLinkSql(iters = 15),

    // FS apply replay: blocked pair self-join + per-field CASE on the
    // calibrated weight scalars; the separation histogram groups on
    // (truth, whole log-odds unit) — floor over IEEE double division
    // on both engines.
    "er_fs_scores" -> (ErCteSql + FsRecsSql +
      FsCountsSql +
      """,
        |wt AS (SELECT ag.field,
        |  CAST(floor(ln((am.nam + 1)::DOUBLE * (bt.np - mt.nm + 2)::DOUBLE
        |    / ((mt.nm + 2)::DOUBLE * (ag.na - am.nam + 1)::DOUBLE)) * 1000000) AS BIGINT) AS wa,
        |  CAST(floor(ln((mt.nm + 1 - am.nam)::DOUBLE * (bt.np - mt.nm + 2)::DOUBLE
        |    / ((mt.nm + 2)::DOUBLE * (bt.np - mt.nm + 1 - (ag.na - am.nam))::DOUBLE)) * 1000000) AS BIGINT) AS wd
        |  FROM ag JOIN am USING (field) CROSS JOIN bt CROSS JOIN mt),
        |kb AS (SELECT blk FROM recs GROUP BY blk HAVING count(*) BETWEEN 2 AND 8192),
        |krecs AS (SELECT recs.* FROM recs JOIN kb USING (blk))
        |SELECT is_match, CAST(floor(score_micro / 1000000) AS BIGINT) AS score_unit,
        |  count(*)::BIGINT AS n
        |FROM (
        |  SELECT CASE WHEN a.ent IS NOT DISTINCT FROM b.ent THEN 1 ELSE 0 END::BIGINT AS is_match,
        |    ((CASE WHEN a.f_len IS NOT DISTINCT FROM b.f_len THEN (SELECT wa FROM wt WHERE field = 'len_eq')
        |           ELSE (SELECT wd FROM wt WHERE field = 'len_eq') END)
        |   + (CASE WHEN a.f_suf3 IS NOT DISTINCT FROM b.f_suf3 THEN (SELECT wa FROM wt WHERE field = 'suf3_eq')
        |           ELSE (SELECT wd FROM wt WHERE field = 'suf3_eq') END)
        |   + (CASE WHEN a.f_tok2 IS NOT DISTINCT FROM b.f_tok2 THEN (SELECT wa FROM wt WHERE field = 'tok2_eq')
        |           ELSE (SELECT wd FROM wt WHERE field = 'tok2_eq') END)
        |   + (CASE WHEN a.f_size IS NOT DISTINCT FROM b.f_size THEN (SELECT wa FROM wt WHERE field = 'size_eq')
        |           ELSE (SELECT wd FROM wt WHERE field = 'size_eq') END)) AS score_micro
        |  FROM krecs a JOIN krecs b ON a.blk = b.blk AND a.pk < b.pk)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // Value-weighted link replay: field weights (wt) + the per-(field,
    // value) frequency weights (wtv, over the SAME lf unpivot as the
    // field counts), then the blocked pair join scores agreement with
    // the shared value's weight — joined via the a-side, legitimate
    // because agreement means both sides hold that value — and
    // disagreement with the field-level wd. coalesce covers the
    // (here unreachable) value-absent case exactly like the engine.
    "er_fs_value_link" -> (ErCteSql + FsRecsSql +
      FsCountsSql +
      """,
        |wt AS (SELECT ag.field,
        |  CAST(floor(ln((am.nam + 1)::DOUBLE * (bt.np - mt.nm + 2)::DOUBLE
        |    / ((mt.nm + 2)::DOUBLE * (ag.na - am.nam + 1)::DOUBLE)) * 1000000) AS BIGINT) AS wa,
        |  CAST(floor(ln((mt.nm + 1 - am.nam)::DOUBLE * (bt.np - mt.nm + 2)::DOUBLE
        |    / ((mt.nm + 2)::DOUBLE * (bt.np - mt.nm + 1 - (ag.na - am.nam))::DOUBLE)) * 1000000) AS BIGINT) AS wd
        |  FROM ag JOIN am USING (field) CROSS JOIN bt CROSS JOIN mt),
        |agv AS (SELECT field, v, sum(n * (n - 1) // 2)::BIGINT AS na FROM (
        |  SELECT field, blk, v, count(*) AS n FROM lf GROUP BY 1, 2, 3) GROUP BY 1, 2
        |  HAVING sum(n * (n - 1) // 2) > 0),
        |amv AS (SELECT field, v, sum(n * (n - 1) // 2)::BIGINT AS nam FROM (
        |  SELECT field, blk, ent, v, count(*) AS n FROM lf GROUP BY 1, 2, 3, 4) GROUP BY 1, 2),
        |wtv AS (SELECT agv.field, agv.v,
        |  CAST(floor(ln((amv.nam + 1)::DOUBLE * (bt.np - mt.nm + 2)::DOUBLE
        |    / ((mt.nm + 2)::DOUBLE * (agv.na - amv.nam + 1)::DOUBLE)) * 1000000) AS BIGINT) AS wav
        |  FROM agv JOIN amv USING (field, v) CROSS JOIN bt CROSS JOIN mt),
        |kb AS (SELECT blk FROM recs GROUP BY blk HAVING count(*) BETWEEN 2 AND 8192),
        |krecs AS (SELECT recs.* FROM recs JOIN kb USING (blk))
        |SELECT a_id, b_id, is_match, score_micro FROM (
        |  SELECT a.pk AS a_id, b.pk AS b_id,
        |    CASE WHEN a.ent IS NOT DISTINCT FROM b.ent THEN 1 ELSE 0 END::BIGINT AS is_match,
        |    ((CASE WHEN a.f_len IS NOT DISTINCT FROM b.f_len
        |        THEN coalesce(v1.wav, (SELECT wa FROM wt WHERE field = 'len_eq'))
        |        ELSE (SELECT wd FROM wt WHERE field = 'len_eq') END)
        |   + (CASE WHEN a.f_suf3 IS NOT DISTINCT FROM b.f_suf3
        |        THEN coalesce(v2.wav, (SELECT wa FROM wt WHERE field = 'suf3_eq'))
        |        ELSE (SELECT wd FROM wt WHERE field = 'suf3_eq') END)
        |   + (CASE WHEN a.f_tok2 IS NOT DISTINCT FROM b.f_tok2
        |        THEN coalesce(v3.wav, (SELECT wa FROM wt WHERE field = 'tok2_eq'))
        |        ELSE (SELECT wd FROM wt WHERE field = 'tok2_eq') END)
        |   + (CASE WHEN a.f_size IS NOT DISTINCT FROM b.f_size
        |        THEN coalesce(v4.wav, (SELECT wa FROM wt WHERE field = 'size_eq'))
        |        ELSE (SELECT wd FROM wt WHERE field = 'size_eq') END)) AS score_micro
        |  FROM krecs a JOIN krecs b ON a.blk = b.blk AND a.pk < b.pk
        |  LEFT JOIN wtv v1 ON v1.field = 'len_eq'
        |    AND v1.v IS NOT DISTINCT FROM a.f_len AND a.f_len IS NOT DISTINCT FROM b.f_len
        |  LEFT JOIN wtv v2 ON v2.field = 'suf3_eq'
        |    AND v2.v IS NOT DISTINCT FROM a.f_suf3 AND a.f_suf3 IS NOT DISTINCT FROM b.f_suf3
        |  LEFT JOIN wtv v3 ON v3.field = 'tok2_eq'
        |    AND v3.v IS NOT DISTINCT FROM a.f_tok2 AND a.f_tok2 IS NOT DISTINCT FROM b.f_tok2
        |  LEFT JOIN wtv v4 ON v4.field = 'size_eq'
        |    AND v4.v IS NOT DISTINCT FROM a.f_size AND a.f_size IS NOT DISTINCT FROM b.f_size)
        |WHERE score_micro >= 0
        |ORDER BY a_id, b_id""".stripMargin),

    "l2i_editdist" ->
      """WITH v AS (SELECT p_name AS val, count(*) AS n,
        |           split_part(p_name, ' ', 1) AS blk FROM part GROUP BY 1, 3)
        |SELECT a.val AS a_val, b.val AS b_val,
        |  levenshtein(a.val, b.val) AS d, a.n AS a_n, b.n AS b_n
        |FROM v a JOIN v b ON a.blk = b.blk AND a.val < b.val
        |  AND abs(length(a.val) - length(b.val)) <= 3
        |  AND levenshtein(a.val, b.val) <= 3
        |ORDER BY a_val, b_val""".stripMargin,

    "t5_pivot" ->
      """SELECT user_id,
        | count(*) FILTER (WHERE event_type = 'click') AS click,
        | count(*) FILTER (WHERE event_type = 'error') AS error,
        | count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        | count(*) FILTER (WHERE event_type = 'signup') AS signup,
        | count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "a6c_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        | coalesce(l_linestatus, 'ALL') AS lstatus,
        | GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid,
        | count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rflag, lstatus, gid""".stripMargin,

    "l4c_tfidf" ->
      s"""WITH dt AS (SELECT doc_id, unnest($ToksSql) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM dt GROUP BY 1, 2),
         |df AS (SELECT tok, count(*) AS df
         |       FROM (SELECT DISTINCT doc_id, tok FROM dt) GROUP BY tok),
         |n AS (SELECT count(*) AS n FROM documents),
         |sc AS (SELECT tf.doc_id, tf.tok, tf.tf, df.df,
         |       round((tf.tf * n.n)::DOUBLE / df.df, 4) AS score
         |       FROM tf JOIN df USING (tok) CROSS JOIN n),
         |r AS (SELECT *, row_number() OVER
         |        (PARTITION BY doc_id ORDER BY score DESC, tok) AS rnk FROM sc)
         |SELECT doc_id, tok, tf, df, score, rnk FROM r WHERE rnk <= 3
         |ORDER BY doc_id, rnk""".stripMargin,

    "t5b_unpivot" ->
      """SELECT l_orderkey, l_linenumber, measure, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,

    "l3d_centroids" -> {
      def dim(i: Int) =
        s"round(sum(floor(embedding[${i + 1}]::DOUBLE * 1000.0)::BIGINT)::DOUBLE / (count(*) * 1000.0), 4) + 0.0"
      s"""SELECT label::BIGINT AS label, count(*) AS n_vecs,
         | ${dim(0)} AS c0, ${dim(1)} AS c1, ${dim(2)} AS c2, ${dim(3)} AS c3
         |FROM embeddings GROUP BY label ORDER BY label""".stripMargin
    },

    "samp_splits" ->
      s"""SELECT doc_id,
         |  CASE WHEN ${SampGate("'sp'")} < ${SampThr(0.9)} THEN 'train'
         |       WHEN ${SampGate("'sp'")} < ${SampThr(0.95)} THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,

    "samp_hash" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${SampGate("'s1'")} < ${SampThr(0.25)} ORDER BY doc_id""".stripMargin,

    "samp_stratified" ->
      s"""SELECT lang, count(*) AS n_sampled FROM documents
         |WHERE ${SampGate("'mix'")} <
         |  CASE lang WHEN 'en' THEN ${SampThr(0.5)} WHEN 'de' THEN ${SampThr(0.25)}
         |            WHEN 'fr' THEN ${SampThr(0.1)} ELSE ${SampThr(0.05)} END
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "mix_temperature" ->
      s"""WITH c AS (SELECT lang, count(*) AS n,
         |  CAST(floor(sqrt(count(*)) * 1000000) AS BIGINT) AS w
         |  FROM documents GROUP BY lang),
         |r AS (SELECT lang, least(1.0,
         |        (200.0 * w) / (n::DOUBLE * (SELECT sum(w) FROM c)::DOUBLE)) AS rate
         |      FROM c)
         |SELECT d.lang, count(*) AS n_sampled
         |FROM documents d JOIN r ON d.lang IS NOT DISTINCT FROM r.lang
         |WHERE ${SampGate("'mixT'")} < CAST(floor(rate * 4294967296) AS BIGINT)
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    "mix_shuffle" ->
      """SELECT doc_id, row_number() OVER (
        |  ORDER BY md5(concat_ws('', doc_id::VARCHAR, 'ep0')), doc_id) AS pos
        |FROM documents ORDER BY pos""".stripMargin,

    "mix_curriculum" ->
      """SELECT doc_id, floor(n_chars / 500.0)::BIGINT AS band,
        |  row_number() OVER (ORDER BY floor(n_chars / 500.0),
        |    md5(concat_ws('', doc_id::VARCHAR, 'cur0')), doc_id) AS pos
        |FROM documents ORDER BY pos""".stripMargin,

    // the oracle's global window IS the partitionless formulation the
    // engine avoids (withRunningTotal) — fine for DuckDB, fatal in Spark
    "pack_sequences" ->
      s"""WITH t AS (SELECT doc_id,
         |  (CASE WHEN length(trim(text)) = 0 THEN 0::BIGINT
         |        ELSE len($ToksSql)::BIGINT END) AS n FROM documents),
         |c AS (SELECT doc_id, n, sum(n) OVER (ORDER BY doc_id)::BIGINT AS cend FROM t),
         |s AS (SELECT doc_id, n, cend, (cend - n)::BIGINT AS cstart FROM c WHERE n > 0),
         |x AS (SELECT doc_id, n, cstart, cend,
         |  unnest(generate_series(cstart // 512, (cend - 1) // 512)) AS seq_id FROM s)
         |SELECT doc_id, seq_id::BIGINT AS seq_id,
         |  (least(cend, (seq_id + 1) * 512) - greatest(cstart, seq_id * 512))::BIGINT AS n_from_doc,
         |  (greatest(cstart, seq_id * 512) - cstart)::BIGINT AS doc_tok_start,
         |  (greatest(cstart, seq_id * 512) - seq_id * 512)::BIGINT AS seq_tok_start,
         |  (cstart >= seq_id * 512) AS is_doc_head,
         |  (cend <= (seq_id + 1) * 512) AS is_doc_tail
         |FROM x ORDER BY seq_id, doc_id""".stripMargin,

    // full DSIR replay: same md5 bucketing, same add-1 smoothed
    // micro-quantized log-ratios, same per-doc integer sum
    "mix_dsir" ->
      """WITH tk AS (SELECT doc_id, lang,
        |  string_split_regex(trim(lower(text)), '\s+') AS t FROM documents),
        |bg AS (SELECT doc_id, lang,
        |  list_transform(
        |    list_transform(generate_series(2, len(t)), i -> t[i-1] || ' ' || t[i]),
        |    g -> ('0x' || substr(md5(g), 1, 8))::BIGINT % 64) AS bks FROM tk),
        |tgt AS (SELECT b, count(*)::BIGINT AS n
        |  FROM (SELECT unnest(bks) AS b FROM bg WHERE lang = 'en') GROUP BY 1),
        |raw AS (SELECT b, count(*)::BIGINT AS n
        |  FROM (SELECT unnest(bks) AS b FROM bg) GROUP BY 1),
        |tot AS (SELECT (SELECT coalesce(sum(n), 0) FROM tgt)::BIGINT AS tt,
        |  (SELECT coalesce(sum(n), 0) FROM raw)::BIGINT AS rt),
        |lam AS (SELECT d.b,
        |  floor(ln(((coalesce(tgt.n, 0) + 1)::DOUBLE * (tot.rt + 64)::DOUBLE) /
        |    ((coalesce(raw.n, 0) + 1)::DOUBLE * (tot.tt + 64)::DOUBLE))
        |    * 1000000.0)::BIGINT AS l
        |  FROM (SELECT unnest(generate_series(0, 63))::BIGINT AS b) d
        |  LEFT JOIN tgt ON d.b = tgt.b LEFT JOIN raw ON d.b = raw.b
        |  CROSS JOIN tot),
        |db AS (SELECT doc_id, unnest(bks) AS b FROM bg),
        |sc AS (SELECT db.doc_id, sum(lam.l)::BIGINT AS s
        |  FROM db JOIN lam ON db.b = lam.b GROUP BY 1)
        |SELECT bg.doc_id, bg.lang, len(bks)::BIGINT AS n_bigrams,
        |  coalesce(sc.s, 0)::BIGINT AS score_micro,
        |  coalesce(sc.s, 0) >= 0 AS keep
        |FROM bg LEFT JOIN sc USING (doc_id) ORDER BY doc_id""".stripMargin,

    // the upsample gate replays Sampling.hashGate; copies then fan out
    // via generate_series (empty when n_copies = 0 — those rows drop,
    // matching Spark's guarded sequence + explode)
    "mix_upsample" ->
      """WITH base AS (SELECT doc_id, lang,
        |  CASE WHEN lang = 'en' THEN 0.4 WHEN lang = 'fr' THEN 1.5
        |       WHEN lang = 'de' THEN 2.25 ELSE 1.0 END AS rate
        |  FROM documents),
        |c AS (SELECT doc_id, lang,
        |  (floor(rate)::BIGINT + CASE WHEN
        |     ('0x' || substr(md5(concat_ws('', doc_id::VARCHAR, 'ep1')), 1, 8))::BIGINT
        |     < floor((rate - floor(rate)) * 4294967296.0)::BIGINT
        |   THEN 1 ELSE 0 END)::BIGINT AS n_copies
        |  FROM base)
        |SELECT doc_id, lang, n_copies, copy_idx,
        |  md5(doc_id::VARCHAR || '#' || copy_idx::VARCHAR) AS replica_id
        |FROM (SELECT doc_id, lang, n_copies,
        |        unnest(generate_series(1, n_copies)) AS copy_idx
        |      FROM c WHERE n_copies > 0)
        |ORDER BY doc_id, copy_idx""".stripMargin,

    "l5b_chunking" ->
      """SELECT doc_id, off, substring(text, off::INT + 1, 200) AS chunk FROM (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0, greatest(length(text) - 1, 0), 150)) AS off
        |  FROM documents)
        |ORDER BY doc_id, off""".stripMargin,

    // window enumeration is integer index arithmetic; DuckDB list
    // slices are INCLUSIVE so [first:last] is exactly the window
    "l5f_sentence_chunks" ->
      """WITH q AS (SELECT doc_id,
        |  replace(replace(replace(text, ' value ', '. '), ' table ', '! '), ' query ', '? ') AS text
        |  FROM documents),
        |s AS (SELECT doc_id,
        |  list_filter(list_transform(regexp_extract_all(text, '[^.!?]*[.!?]+|[^.!?]+$'), x -> trim(x)), x -> x <> '') AS sents
        |  FROM q),
        |n AS (SELECT doc_id, sents, len(sents)::BIGINT AS n_sents FROM s WHERE len(sents) > 0),
        |c AS (SELECT doc_id, sents, n_sents,
        |  unnest(generate_series(0, (greatest(n_sents - 4, 0) + 2) // 3)) AS chunk_id FROM n)
        |SELECT doc_id, chunk_id::BIGINT AS chunk_id,
        |  (chunk_id * 3 + 1)::BIGINT AS first_sent,
        |  least(chunk_id * 3 + 4, n_sents)::BIGINT AS last_sent,
        |  array_to_string(sents[(chunk_id*3+1)::INT:least(chunk_id*3+4, n_sents)::INT], ' ') AS chunk
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "l4g_normalize" ->
      s"""SELECT doc_id, ${NormSql(
        "'  \tÉL Ñiño — ' || upper(substring(text, 1, 40)) || '\t\t' || text || '  '")} AS norm_text
         |FROM documents ORDER BY doc_id""".stripMargin,

    "l4h_postings" ->
      s"""SELECT tok, count(*) AS df,
         |  array_to_string(list_sort(list(doc_id)), ',') AS posting_csv
         |FROM (SELECT DISTINCT doc_id, tok FROM
         |  (SELECT doc_id, unnest($ToksSql) AS tok FROM documents))
         |GROUP BY tok HAVING count(*) >= 2 ORDER BY tok""".stripMargin,

    // PMI replay: presence counts + the pair join DuckDB-side (the
    // engine's in-array explode is equivalent on distinct sorted
    // tokens); ln factors cast DOUBLE before multiplying, same order
    // as the engine expression.
    "l4u_pmi" ->
      s"""WITH dt AS (SELECT DISTINCT doc_id, tok FROM
         |  (SELECT doc_id, unnest($ToksSql) AS tok FROM documents)),
         |vocab AS (SELECT tok, count(*) AS n_t FROM dt GROUP BY 1
         |  ORDER BY n_t DESC, tok LIMIT 24),
         |kd AS (SELECT dt.doc_id, dt.tok FROM dt JOIN vocab USING (tok)),
         |pr AS (SELECT a.tok AS a_tok, b.tok AS b_tok, count(*) AS n_ab
         |  FROM kd a JOIN kd b ON a.doc_id = b.doc_id AND a.tok < b.tok
         |  GROUP BY 1, 2 HAVING count(*) >= 5),
         |nd AS (SELECT count(*) AS n_docs FROM documents)
         |SELECT pr.a_tok, pr.b_tok, va.n_t AS n_a, vb.n_t AS n_b, pr.n_ab,
         |  CAST(floor(ln(nd.n_docs::DOUBLE * pr.n_ab::DOUBLE
         |    / (va.n_t::DOUBLE * vb.n_t::DOUBLE)) * 1000000) AS BIGINT) AS pmi_micro
         |FROM pr JOIN vocab va ON pr.a_tok = va.tok
         |  JOIN vocab vb ON pr.b_tok = vb.tok CROSS JOIN nd
         |ORDER BY a_tok, b_tok""".stripMargin,

    "device_profile" ->
      """WITH g AS (SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sid AS (SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM g),
        |sess0 AS (SELECT user_id, session_id,
        |    ((epoch_ms(max(ts)) - epoch_ms(min(ts))) // 1000)::BIGINT AS dur
        |  FROM sid GROUP BY 1, 2),
        |sess AS (SELECT user_id, count(*) AS n_sessions,
        |    round(sum(dur)::DOUBLE / count(*), 2) AS avg_session_s
        |  FROM sess0 GROUP BY user_id),
        |census AS (SELECT user_id, count(*) AS n_events,
        |    count(DISTINCT event_type) AS n_types FROM events GROUP BY user_id),
        |mh AS (SELECT user_id, hr::BIGINT AS modal_hour FROM (
        |    SELECT user_id, hour(ts) AS hr, count(*) AS n,
        |      row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, hour(ts)) AS rn
        |    FROM events GROUP BY user_id, hour(ts)) WHERE rn = 1),
        |tt AS (SELECT user_id, event_type AS top_type FROM (
        |    SELECT user_id, event_type, count(*) AS n,
        |      row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, event_type) AS rn
        |    FROM events GROUP BY user_id, event_type) WHERE rn = 1)
        |SELECT census.user_id, n_events, n_types, modal_hour, top_type,
        |  n_sessions, avg_session_s
        |FROM census JOIN mh USING (user_id) JOIN tt USING (user_id)
        |  JOIN sess USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "pack_bins" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |    CASE WHEN length(trim(text)) = 0 THEN 0::BIGINT ELSE len($ToksSql)::BIGINT END AS n_tokens
         |  FROM documents),
         |c AS (SELECT *, sum(n_tokens) OVER
         |    (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS strt
         |  FROM t)
         |SELECT doc_id, lang, n_tokens,
         | (strt // 2048)::BIGINT AS bin, (strt % 2048)::BIGINT AS bin_offset
         |FROM c ORDER BY lang, doc_id""".stripMargin,

    "curated_corpus" ->
      s"""WITH keep AS (SELECT min(doc_id) AS doc_id FROM (
         |    SELECT doc_id, sha256(array_to_string($ToksSql, ' ')) AS fp FROM documents)
         |  GROUP BY fp),
         |f AS (SELECT d.doc_id,
         |    CASE WHEN length(trim(text)) = 0 THEN 0::BIGINT ELSE len($ToksSql)::BIGINT END AS n_tokens,
         |    round(CASE WHEN length(text) = 0 THEN 0.0
         |      ELSE (length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')))::DOUBLE / length(text)::DOUBLE END, 4) AS punct_ratio
         |  FROM documents d JOIN keep USING (doc_id) WHERE lang = 'en')
         |SELECT doc_id, n_tokens, punct_ratio FROM f
         |WHERE n_tokens >= 50 AND punct_ratio <= 0.10
         |  AND ${SampGate("'cur'")} < ${SampThr(0.5)}
         |ORDER BY doc_id""".stripMargin,

    "l4i_vocab" ->
      s"""WITH t AS (SELECT unnest($ToksSql) AS tok FROM documents),
         |v AS (SELECT tok, count(*) AS n FROM t GROUP BY tok)
         |SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok) AS id
         |FROM v ORDER BY id""".stripMargin,

    "l4i_encode" ->
      s"""WITH base AS (SELECT doc_id, $ToksSql AS ts FROM documents),
         |p AS (SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i FROM base),
         |toks AS (SELECT doc_id, i, ts[i] AS tok FROM p),
         |v AS (SELECT tok, count(*) AS n
         |      FROM (SELECT unnest($ToksSql) AS tok FROM documents) GROUP BY tok),
         |vid AS (SELECT tok, row_number() OVER (ORDER BY n DESC, tok) AS id FROM v)
         |SELECT doc_id, array_to_string(list(id ORDER BY i), ',') AS ids_csv
         |FROM toks JOIN vid USING (tok)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "quality_outliers" ->
      """WITH m AS (
        |  SELECT source, median(n_chars) AS med
        |  FROM documents GROUP BY source),
        |d2 AS (
        |  SELECT d.doc_id, d.source, d.n_chars, m.med
        |  FROM documents d JOIN m USING (source)),
        |md AS (
        |  SELECT source, median(abs(n_chars - med)) AS mad
        |  FROM d2 GROUP BY source)
        |SELECT doc_id, d2.source, n_chars, med, mad,
        |  (abs(n_chars - med) > 3.0 * mad) AS is_outlier
        |FROM d2 JOIN md USING (source)
        |ORDER BY doc_id""".stripMargin,

    // NOTE: only `k` is independently re-derived by DuckDB here.
    // `missing_path` (a nonexistent JSON path → NULL for every row) and
    // `sch` (Spark's schema_of_json render, which DuckDB has no
    // counterpart for) are EXPECTATION LITERALS asserted into the
    // oracle, not an independent replay — they pin the contract that
    // the path truly misses and the inferred schema string is stable.
    "f14_variant" ->
      """SELECT event_id, event_type,
        |  json_extract(props, '$.k')::BIGINT AS k,
        |  NULL::BIGINT AS missing_path,
        |  'OBJECT<k: BIGINT>' AS sch
        |FROM events ORDER BY event_id""".stripMargin,

    "w9_interval_merge" ->
      """WITH iv AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS s_ms,
        |         epoch_ms(ts) + 120000 AS e_ms
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, s_ms, e_ms,
        |    CASE WHEN max(e_ms) OVER w IS NULL OR s_ms > max(e_ms) OVER w
        |         THEN 1 ELSE 0 END AS brk
        |  FROM iv
        |  WINDOW w AS (PARTITION BY user_id ORDER BY s_ms, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |i AS (
        |  SELECT user_id, s_ms, e_ms,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY s_ms, event_id
        |                   ROWS UNBOUNDED PRECEDING)::BIGINT AS interval_id
        |  FROM m)
        |SELECT user_id, interval_id,
        |  min(s_ms) AS merged_start, max(e_ms) AS merged_end,
        |  count(*) AS n_rows
        |FROM i GROUP BY user_id, interval_id
        |ORDER BY user_id, interval_id""".stripMargin,

    "l2j_segment_dedup" ->
      """WITH segs AS (
        |  SELECT doc_id, u.pos, u.seg FROM (
        |      SELECT doc_id, string_split(text, ' value ') AS parts
        |      FROM documents),
        |    LATERAL (SELECT unnest(parts) AS seg,
        |             generate_subscripts(parts, 1) AS pos) u
        |  WHERE length(trim(u.seg)) > 0),
        |keep AS (
        |  SELECT doc_id, pos, seg FROM (
        |    SELECT *, row_number() OVER (PARTITION BY seg
        |      ORDER BY doc_id, pos) AS rn FROM segs)
        |  WHERE rn = 1),
        |agg AS (
        |  SELECT doc_id, string_agg(seg, ' | ' ORDER BY pos) AS text_kept
        |  FROM keep GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.text_kept, '') AS text_kept
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "mm_header_parse" ->
      """SELECT doc_id,
        |  (doc_id % 17 <> 0) AS png_valid,
        |  CASE WHEN doc_id % 17 <> 0
        |       THEN (16 + (doc_id * 37) % 4080)::BIGINT END AS width,
        |  CASE WHEN doc_id % 17 <> 0
        |       THEN (16 + (doc_id * 101) % 2160)::BIGINT END AS height,
        |  CASE WHEN doc_id % 17 <> 0 THEN 8::BIGINT END AS bit_depth
        |FROM documents ORDER BY doc_id""".stripMargin,

    // The decoded-feature predictions: amp = 500 + doc_id % 7000,
    // n = 40 + n_chars % 100; a full-swing square wave has
    // peak = rms = amp and sumsq = n·amp² — no byte replay needed.
    "mm_wav_features" ->
      """SELECT doc_id, true AS wav_ok,
        |  (40 + n_chars % 100)::BIGINT AS n_samples,
        |  (500 + doc_id % 7000)::BIGINT AS peak_abs,
        |  ((40 + n_chars % 100) * (500 + doc_id % 7000) * (500 + doc_id % 7000))::BIGINT AS sumsq,
        |  (500 + doc_id % 7000)::BIGINT AS rms
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_wav_header" ->
      """WITH f AS (SELECT doc_id,
        |  (doc_id % 17 <> 0) AS v,
        |  (1 + doc_id % 2)::BIGINT AS ch,
        |  (8000 + (doc_id * 13) % 32000)::BIGINT AS sr,
        |  (8 * (1 + doc_id % 3))::BIGINT AS bits
        |  FROM documents),
        |g AS (SELECT doc_id, v, ch, sr, bits,
        |  ch * (bits // 8) AS ba FROM f)
        |SELECT doc_id, v AS wav_valid,
        |  CASE WHEN v THEN 1::BIGINT END AS audio_format,
        |  CASE WHEN v THEN ch END AS channels,
        |  CASE WHEN v THEN sr END AS sample_rate,
        |  CASE WHEN v THEN sr * ba END AS byte_rate,
        |  CASE WHEN v THEN ba END AS block_align,
        |  CASE WHEN v THEN bits END AS bits_per_sample,
        |  CASE WHEN v THEN (100 + doc_id % 900) * ba END AS data_size,
        |  CASE WHEN v THEN true END AS rate_consistent
        |FROM g ORDER BY doc_id""".stripMargin,

    "mm_frame_schedule" ->
      """SELECT doc_id, n_frames, frame_idx, frame_idx * 2000 AS ts_ms FROM (
        |  SELECT doc_id, n_frames,
        |    unnest(generate_series(0, n_frames - 1)) AS frame_idx FROM (
        |    SELECT doc_id, least((n_chars * 100 + 1999) // 2000, 8) AS n_frames
        |    FROM documents)
        |  WHERE n_frames > 0)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // one replay of the full admission decision: fingerprint anti join,
    // integer quality margin on raw text, n-gram decontamination, and
    // the md5 split gate — all established per-stage idioms composed
    "corpus_admission" ->
      s"""WITH fp AS (SELECT doc_id, sha256(array_to_string($ToksSql, ' ')) AS fp FROM documents),
         |corpus AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 10 >= 3),
         |adm AS (SELECT min(doc_id) AS doc_id, fp, count(*) AS n_in_batch
         |        FROM fp WHERE doc_id % 10 < 3 AND fp NOT IN (SELECT fp FROM corpus)
         |        GROUP BY fp),
         |q AS (SELECT doc_id,
         |  (-520000 + 2000 * least(length(text), 500)
         |   + 40000 * len(list_filter($ToksSql, t -> list_contains($StopEn, t)))
         |   - 30000 * (length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')))
         |   - 15000 * (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
         |   - 8000 * (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))))::BIGINT AS margin_micro
         |  FROM documents WHERE doc_id % 10 < 3),
         |ev AS (SELECT DISTINCT unnest($Ngrams3Sql) AS ng FROM documents WHERE doc_id % 20 = 0),
         |dg AS (SELECT doc_id, unnest($Ngrams3Sql) AS ng FROM documents WHERE doc_id % 10 < 3),
         |hits AS (SELECT dg.doc_id, count(*) AS n_overlap FROM dg JOIN ev USING (ng) GROUP BY 1),
         |clean AS (SELECT d.doc_id FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
         |          WHERE d.doc_id % 10 < 3 AND coalesce(h.n_overlap, 0) < 5)
         |SELECT a.doc_id, a.fp, a.n_in_batch, q.margin_micro,
         |  CASE WHEN ${SampGate("'adm'")} < ${SampThr(0.9)} THEN 'train'
         |       WHEN ${SampGate("'adm'")} < ${SampThr(0.95)} THEN 'val'
         |       ELSE 'test' END AS split
         |FROM adm a JOIN q USING (doc_id) JOIN clean USING (doc_id)
         |WHERE q.margin_micro >= 0
         |ORDER BY a.doc_id""".stripMargin,

    // the full MIX5 → MIX6 → PACK2 chain replayed in one statement:
    // gate + generate_series replication, the curriculum window, the
    // global token cumsum, and the sequence explode
    "epoch_manifest" ->
      s"""WITH base AS (SELECT doc_id, lang, text, n_chars,
         |  CASE WHEN lang = 'en' THEN 0.4 WHEN lang = 'fr' THEN 1.5
         |       WHEN lang = 'de' THEN 2.25 ELSE 1.0 END AS rate
         |  FROM documents),
         |cc AS (SELECT doc_id, text, n_chars,
         |  (floor(rate)::BIGINT + CASE WHEN
         |     ('0x' || substr(md5(concat_ws('', doc_id::VARCHAR, 'em')), 1, 8))::BIGINT
         |     < floor((rate - floor(rate)) * 4294967296.0)::BIGINT
         |   THEN 1 ELSE 0 END)::BIGINT AS n_copies
         |  FROM base),
         |r AS (SELECT doc_id, text, n_chars, copy_idx,
         |    md5(doc_id::VARCHAR || '#' || copy_idx::VARCHAR) AS replica_id
         |  FROM (SELECT doc_id, text, n_chars,
         |          unnest(generate_series(1, n_copies)) AS copy_idx
         |        FROM cc WHERE n_copies > 0)),
         |o AS (SELECT *, floor(n_chars / 500.0)::BIGINT AS band,
         |    row_number() OVER (ORDER BY floor(n_chars / 500.0),
         |      md5(concat_ws('', replica_id, 'em-order')), replica_id) AS pos
         |  FROM r),
         |t AS (SELECT *, (CASE WHEN length(trim(text)) = 0 THEN 0::BIGINT
         |    ELSE len($ToksSql)::BIGINT END) AS toks FROM o),
         |cum AS (SELECT *, sum(toks) OVER (ORDER BY pos)::BIGINT AS cend FROM t),
         |st AS (SELECT *, (cend - toks)::BIGINT AS cstart FROM cum WHERE toks > 0),
         |x AS (SELECT *, unnest(generate_series(cstart // 512, (cend - 1) // 512)) AS seq_id
         |  FROM st)
         |SELECT seq_id::BIGINT AS seq_id, doc_id, copy_idx, band, pos,
         |  (least(cend, (seq_id + 1) * 512) - greatest(cstart, seq_id * 512))::BIGINT AS n_from_doc,
         |  (greatest(cstart, seq_id * 512) - seq_id * 512)::BIGINT AS seq_tok_start,
         |  (cstart >= seq_id * 512) AS is_doc_head,
         |  (cend <= (seq_id + 1) * 512) AS is_doc_tail
         |FROM x ORDER BY seq_id, pos""".stripMargin,

    "training_manifest" ->
      s"""WITH norm AS (
         |  SELECT doc_id, lang, ${NormSql("text")} AS norm_text FROM documents),
         |tok AS (
         |  SELECT doc_id, lang, norm_text,
         |    CASE WHEN length(norm_text) = 0 THEN 0::BIGINT
         |         ELSE len(string_split(norm_text, ' '))::BIGINT END AS toks
         |  FROM norm),
         |dedup AS (
         |  SELECT doc_id, lang, toks FROM (
         |    SELECT *, row_number() OVER (PARTITION BY md5(norm_text) ORDER BY doc_id) AS rn
         |    FROM tok)
         |  WHERE rn = 1 AND toks >= 20),
         |c AS (SELECT lang, count(*) AS n,
         |        CAST(floor(sqrt(count(*)) * 1000000) AS BIGINT) AS w
         |      FROM dedup GROUP BY lang),
         |r AS (SELECT lang, least(1.0,
         |        (150.0 * w) / (n::DOUBLE * (SELECT sum(w) FROM c)::DOUBLE)) AS rate
         |      FROM c),
         |mixed AS (
         |  SELECT d.* FROM dedup d JOIN r ON d.lang IS NOT DISTINCT FROM r.lang
         |  WHERE ${SampGate("'tm'")} < CAST(floor(rate * 4294967296) AS BIGINT)),
         |shuffled AS (
         |  SELECT doc_id, lang, toks, row_number() OVER (
         |    ORDER BY md5(concat_ws('', doc_id::VARCHAR, 'tm-order')), doc_id) AS pos
         |  FROM mixed),
         |packed AS (
         |  SELECT *, sum(toks) OVER (PARTITION BY lang ORDER BY pos
         |    ROWS UNBOUNDED PRECEDING) - toks AS strt
         |  FROM shuffled)
         |SELECT doc_id, lang, pos, toks AS n_tokens,
         |  (strt // 256)::BIGINT AS bin, (strt % 256)::BIGINT AS bin_offset
         |FROM packed ORDER BY pos""".stripMargin,

    "samp_weighted" ->
      s"""SELECT doc_id, n_chars FROM (
         |  SELECT doc_id, n_chars FROM documents WHERE n_chars > 0
         |  ORDER BY power((${SampGate("'w1'")} + 1)::DOUBLE / 4294967296.0,
         |                 1.0 / n_chars::DOUBLE) DESC, doc_id
         |  LIMIT 40)
         |ORDER BY doc_id""".stripMargin,

    "samp_weighted_group" ->
      s"""SELECT lang, doc_id, n_chars FROM (
         |  SELECT lang, doc_id, n_chars, row_number() OVER (
         |    PARTITION BY lang
         |    ORDER BY power((${SampGate("'w2'")} + 1)::DOUBLE / 4294967296.0,
         |                   1.0 / n_chars::DOUBLE) DESC, doc_id) AS rn
         |  FROM documents WHERE n_chars > 0)
         |WHERE rn <= 5 ORDER BY lang, doc_id""".stripMargin,

    "l4g_bm25" -> Bm25Sql(Seq("hash", "join", "filter"), k = 10, k1 = 1.2, b = 0.75),

    "g4_pagerank" -> PageRankSql(iters = 3, damping = 0.85),
    "g5_ppr" -> PprSql(Seq("t:purchase", "t:signup"), iters = 3, damping = 0.85),
    "g8_lpa" -> LpaSql(iters = 3),

    // Modularity replay: the SAME unrolled-LPA label chain as g8, then
    // the exact integer decomposition Q = Σ_c q_num_c / (4W²) with
    // q_num_c = 4·W·w_in_c − d_c² — all sums cast back to BIGINT
    // (DuckDB sums promote to HUGEINT, whose hash rendering differs).
    "g10_modularity" ->
      s"""${LpaCoreSql(3)},
         |lw AS (SELECT ls.lab, sum(e.w) AS w_in
         |       FROM e JOIN l3 ls ON e.src = ls.node
         |              JOIN l3 ld ON e.dst = ld.node
         |       WHERE ls.lab = ld.lab GROUP BY 1),
         |dg AS (SELECT l.lab, sum(ed.w) AS degw
         |       FROM ed JOIN l3 l ON ed.src = l.node GROUP BY 1),
         |sz AS (SELECT lab, count(*)::BIGINT AS n_nodes FROM l3 GROUP BY 1),
         |tw AS (SELECT sum(w)::BIGINT AS w_total FROM e)
         |SELECT sz.lab, sz.n_nodes,
         |  coalesce(dg.degw, 0)::BIGINT AS degw,
         |  coalesce(lw.w_in, 0)::BIGINT AS w_in,
         |  (4 * tw.w_total * coalesce(lw.w_in, 0)
         |     - coalesce(dg.degw, 0) * coalesce(dg.degw, 0))::BIGINT AS q_num,
         |  tw.w_total
         |FROM sz LEFT JOIN dg USING (lab) LEFT JOIN lw USING (lab) CROSS JOIN tw
         |ORDER BY sz.lab""".stripMargin,
    "g9_kcore" -> KCoreSql(k = 2, rounds = 4),

    // Bounded-depth BFS as a recursive CTE: UNION dedups (node, d)
    // pairs and d < 3 bounds the recursion; min(d) per node = hops.
    "g6_bfs_hops" ->
      """WITH RECURSIVE e AS (
        |  SELECT 'u:' || user_id::VARCHAR AS src, 't:' || event_type AS dst
        |  FROM events GROUP BY 1, 2),
        |ed AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
        |sd AS (SELECT unnest(['t:purchase', 't:signup']) AS node),
        |walk(node, d) AS (
        |  SELECT node, 0 FROM sd
        |  UNION
        |  SELECT ed.dst, walk.d + 1 FROM ed JOIN walk ON ed.src = walk.node
        |  WHERE walk.d < 3)
        |SELECT node, min(d)::BIGINT AS hops FROM walk
        |GROUP BY node ORDER BY node""".stripMargin,

    // the SAME case ladder as the engine, arm for arm
    "j11_allen_relations" ->
      """WITH iv AS (SELECT user_id, event_type, min(ts) AS s, max(ts) AS e
        |  FROM events GROUP BY 1, 2)
        |SELECT a.user_id, a.event_type AS a_id, b.event_type AS b_id,
        |  CASE WHEN a.s = b.s AND a.e = b.e THEN 'equals'
        |       WHEN a.e < b.s THEN 'precedes'
        |       WHEN a.e = b.s THEN 'meets'
        |       WHEN b.e < a.s THEN 'preceded_by'
        |       WHEN b.e = a.s THEN 'met_by'
        |       WHEN a.s = b.s AND a.e < b.e THEN 'starts'
        |       WHEN a.s = b.s THEN 'started_by'
        |       WHEN a.e = b.e AND a.s > b.s THEN 'finishes'
        |       WHEN a.e = b.e THEN 'finished_by'
        |       WHEN a.s > b.s AND a.e < b.e THEN 'during'
        |       WHEN a.s < b.s AND a.e > b.e THEN 'contains'
        |       WHEN a.s < b.s THEN 'overlaps'
        |       ELSE 'overlapped_by' END AS relation
        |FROM iv a JOIN iv b
        |  ON a.user_id = b.user_id AND a.event_type < b.event_type
        |ORDER BY a.user_id, a_id, b_id""".stripMargin,

    // the Bloom is transparent to semantics: the oracle is the PLAIN join
    "j10_bloom_join" ->
      """SELECT l.l_orderkey AS o_orderkey, l.l_linenumber, l.l_quantity,
        |  o.o_totalprice
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey, l_linenumber""".stripMargin,

    "j9_radius_join" ->
      """WITH p AS (
        |  SELECT s_suppkey AS pid, ((s_suppkey * 13) % 97)::BIGINT AS x,
        |         ((s_suppkey * 29) % 89)::BIGINT AS y
        |  FROM supplier)
        |SELECT a.pid AS id_a, b.pid AS id_b,
        |  (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
        |FROM p a JOIN p b
        |  ON a.pid < b.pid
        | AND b.x BETWEEN a.x - 6 AND a.x + 6
        | AND b.y BETWEEN a.y - 6 AND a.y + 6
        |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 36
        |ORDER BY id_a, id_b""".stripMargin,

    "a12_cms_heavy" -> {
      def bkt(iExpr: String) =
        s"('0x' || substr(md5(concat_ws('', user_id::VARCHAR, 'cm', $iExpr)), 1, 8))::BIGINT % 1024"
      s"""WITH cells AS (
         |  SELECT i AS row, ${bkt("i::VARCHAR")} AS bucket
         |  FROM events, unnest(generate_series(0, 3)) t(i)),
         |cms AS (
         |  SELECT row, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2),
         |probes AS (
         |  SELECT user_id, i AS row, ${bkt("i::VARCHAR")} AS bucket
         |  FROM (SELECT DISTINCT user_id FROM events), unnest(generate_series(0, 3)) t(i)),
         |est AS (
         |  SELECT p.user_id, min(coalesce(c.cnt, 0))::BIGINT AS est
         |  FROM probes p LEFT JOIN cms c USING (row, bucket)
         |  GROUP BY p.user_id),
         |exact AS (SELECT user_id, count(*) AS exact_n FROM events GROUP BY user_id)
         |SELECT e.user_id, x.exact_n, e.est
         |FROM est e JOIN exact x USING (user_id)
         |WHERE e.est >= 60
         |ORDER BY e.user_id""".stripMargin
    },

    "a13_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT s1.user_id, min(s1.t1) AS t1,
        |         min(CASE WHEN e.ts > s1.t1 THEN e.ts END) AS t2
        |  FROM s1 LEFT JOIN events e
        |    ON e.user_id = s1.user_id AND e.event_type = 'click'
        |  GROUP BY s1.user_id),
        |s3 AS (
        |  SELECT s2.user_id, min(s2.t1) AS t1, min(s2.t2) AS t2,
        |         min(CASE WHEN e.ts > s2.t2 THEN e.ts END) AS t3
        |  FROM s2 LEFT JOIN events e
        |    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
        |  GROUP BY s2.user_id)
        |SELECT user_id,
        |  strftime(t1, '%Y-%m-%d %H:%M:%S.%g') AS t1,
        |  strftime(t2, '%Y-%m-%d %H:%M:%S.%g') AS t2,
        |  strftime(t3, '%Y-%m-%d %H:%M:%S.%g') AS t3
        |FROM s3 ORDER BY user_id""".stripMargin,

    "a14_retention" ->
      """WITH fd AS (
        |  SELECT user_id, min(ts::DATE) AS cohort_day FROM events GROUP BY user_id)
        |SELECT strftime(fd.cohort_day, '%Y-%m-%d') AS cohort_day,
        |  date_diff('day', fd.cohort_day, e.ts::DATE)::BIGINT AS day_offset,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN fd ON e.user_id = fd.user_id
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,

    "a15_transitions" ->
      """WITH b AS (
        |  SELECT user_id, event_type AS to_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM b
        |      WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, sum(n)::BIGINT AS row_n FROM c GROUP BY from_type)
        |SELECT c.from_type, c.to_type, c.n,
        |  round(c.n::DOUBLE / t.row_n, 4) + 0.0 AS p
        |FROM c JOIN t USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,

    "a22_seq_patterns" ->
      """WITH g AS (
        |  SELECT user_id, event_type AS e0,
        |    lead(event_type, 1) OVER w AS e1,
        |    lead(event_type, 2) OVER w AS e2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT e0 || '>' || e1 || '>' || e2 AS pattern,
        |  count(*) AS n_occurrences, count(DISTINCT user_id) AS n_users
        |FROM g WHERE e1 IS NOT NULL AND e2 IS NOT NULL
        |GROUP BY 1 ORDER BY n_occurrences DESC, pattern LIMIT 20""".stripMargin,

    // Budget + round count are literals mirroring the engine call
    // (budget=200000, rounds=3); each round's one float step
    // (r·w/wu, two correctly-rounded IEEE ops) replays exactly.
    "mix_budget" -> {
      def round(i: Int): String =
        s"""s$i AS (SELECT 200000 - sum(alloc) AS r,
           |  sum(CASE WHEN alloc < n THEN w ELSE 0 END) AS wu FROM t${i - 1}),
           |t$i AS (SELECT source, n, w,
           |  alloc + CASE WHEN alloc < n AND wu > 0 AND r > 0
           |    THEN least(n - alloc,
           |      CAST(floor(r::DOUBLE * w::DOUBLE / wu::DOUBLE) AS BIGINT))
           |    ELSE 0 END AS alloc
           |  FROM t${i - 1} CROSS JOIN s$i)""".stripMargin
      s"""WITH t0 AS (
         |  SELECT source, sum(n_chars)::BIGINT AS n,
         |    CAST(floor(sqrt(sum(n_chars)::BIGINT) * 1000000.0) AS BIGINT) AS w,
         |    0::BIGINT AS alloc
         |  FROM documents GROUP BY 1 HAVING sum(n_chars) > 0),
         |${(1 to 3).map(round).mkString(",\n")}
         |SELECT source, n AS n_tokens, w AS weight_u, alloc AS alloc_tokens,
         |  CAST(floor(alloc::DOUBLE * 1000000.0 / n::DOUBLE) AS BIGINT) AS rate_ppm,
         |  (alloc >= n) AS saturated
         |FROM t3 ORDER BY source""".stripMargin
    },

    "l2k_url_canon" ->
      s"""WITH u AS (SELECT doc_id, $UrlSynthSql AS url FROM documents),
         |c AS (SELECT doc_id,
         |  lower(regexp_extract(url, '^https://([^/?#]+)', 1)) ||
         |  regexp_replace(regexp_extract(url, '^https://[^/?#]+([^?#]*)', 1), '/+$$', '') AS curl
         |  FROM u)
         |SELECT curl, count(*) AS n_docs, min(doc_id) AS first_doc
         |FROM c GROUP BY curl ORDER BY curl""".stripMargin,

    "l4m_domains" ->
      s"""WITH u AS (SELECT doc_id, $UrlSynthSql AS url FROM documents)
         |SELECT regexp_extract(lower(regexp_extract(url, '^https://([^/?#]+)', 1)),
         |                      '([^.]+\\.[^.]+)$$', 1) AS domain,
         |       count(*) AS n
         |FROM u GROUP BY domain ORDER BY domain""".stripMargin,

    "l4n_oov_rate" -> {
      s"""WITH g AS (SELECT doc_id, unnest(${NgramsSql(2)}) AS g FROM documents),
         |c AS (SELECT g, count(*) AS n FROM g GROUP BY g),
         |lm AS (SELECT g, 1 AS _in FROM c ORDER BY n DESC, g LIMIT 1000),
         |r AS (
         |  SELECT g.doc_id, count(*) AS n_bigrams,
         |    sum(CASE WHEN lm._in IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov
         |  FROM g LEFT JOIN lm USING (g) GROUP BY g.doc_id)
         |SELECT doc_id, n_bigrams, n_oov,
         |  round(n_oov::DOUBLE / n_bigrams, 4) + 0.0 AS oov_rate
         |FROM r ORDER BY doc_id""".stripMargin
    },

    "l4w_readability" ->
      s"""SELECT doc_id,
         |  (CASE WHEN length(trim(text)) = 0 THEN 0::BIGINT
         |        ELSE len($ToksSql)::BIGINT END) AS n_words,
         |  greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT AS n_sentences,
         |  len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT AS n_syllables,
         |  CASE WHEN (CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len($ToksSql) END) > 0
         |    THEN floor((206.835
         |      - 1.015 * ((CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len($ToksSql) END)::DOUBLE
         |          / greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::DOUBLE)
         |      - 84.6 * (len(regexp_extract_all(lower(text), '[aeiouy]+'))::DOUBLE
         |          / (CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len($ToksSql) END)::DOUBLE))
         |      * 1000.0)::BIGINT END AS flesch_milli
         |FROM documents ORDER BY doc_id""".stripMargin,

    "l4t_unigram_kl" ->
      s"""WITH tok AS (SELECT source AS src, unnest($ToksSql) AS t FROM documents),
         |st AS (SELECT src, t, count(*)::BIGINT AS c_st FROM tok GROUP BY 1, 2),
         |ct AS (SELECT t, count(*)::BIGINT AS c_ct FROM tok GROUP BY 1),
         |ns AS (SELECT src, sum(c_st)::BIGINT AS n_s,
         |  count(*)::BIGINT AS n_distinct_toks FROM st GROUP BY 1),
         |sc AS (SELECT sum(c_ct)::BIGINT AS n_c, count(*)::BIGINT AS v FROM ct),
         |k AS (SELECT st.src, ns.n_s, ns.n_distinct_toks,
         |  sum(st.c_st * floor(ln(
         |    ((st.c_st + 1) * (sc.n_c + sc.v))::DOUBLE /
         |    ((ct.c_ct + 1) * (ns.n_s + sc.v))::DOUBLE) * 1000000.0)::BIGINT
         |  )::BIGINT AS kl_scaled_micro
         |  FROM st JOIN ct USING (t) JOIN ns USING (src) CROSS JOIN sc
         |  GROUP BY 1, 2, 3)
         |SELECT src AS source, n_s AS n_tokens, n_distinct_toks,
         |  kl_scaled_micro,
         |  floor(kl_scaled_micro::DOUBLE / n_s::DOUBLE)::BIGINT AS kl_micro
         |FROM k ORDER BY source""".stripMargin,

    // add-one bigram LM replay: NON-distinct grams (an LM needs
    // multiplicity — deliberately not NgramsSql, which dedups);
    // ln() micro-floors replay bit-for-bit (the mix_dsir precedent)
    "l4s_lm_score" ->
      s"""WITH tk AS (SELECT doc_id, lang, $ToksSql AS t FROM documents),
         |g AS (SELECT doc_id, lang,
         |  list_transform(generate_series(2, len(t)), i -> t[i-1] || ' ' || t[i]) AS gs
         |  FROM tk),
         |refg AS (SELECT unnest(gs) AS g FROM g WHERE lang = 'en'),
         |big AS (SELECT g, count(*)::BIGINT AS cb FROM refg GROUP BY 1),
         |uni AS (SELECT split_part(g, ' ', 1) AS w1, count(*)::BIGINT AS cu
         |  FROM refg GROUP BY 1),
         |voc AS (SELECT (count(DISTINCT tt) + 1)::BIGINT AS v
         |  FROM (SELECT unnest(t) AS tt FROM tk WHERE lang = 'en')),
         |dg AS (SELECT doc_id, g, count(*)::BIGINT AS k
         |  FROM (SELECT doc_id, unnest(gs) AS g FROM g) GROUP BY 1, 2),
         |sc AS (SELECT dg.doc_id, sum(dg.k)::BIGINT AS n_bigrams,
         |  (-sum(floor(ln((coalesce(big.cb, 0) + 1)::DOUBLE
         |     / (coalesce(uni.cu, 0) + voc.v)::DOUBLE) * 1000000.0)::BIGINT
         |     * dg.k))::BIGINT AS nll_micro
         |  FROM dg LEFT JOIN big USING (g)
         |  LEFT JOIN uni ON split_part(dg.g, ' ', 1) = uni.w1
         |  CROSS JOIN voc GROUP BY 1)
         |SELECT g.doc_id, g.lang,
         |  coalesce(sc.n_bigrams, 0)::BIGINT AS n_bigrams,
         |  coalesce(sc.nll_micro, 0)::BIGINT AS nll_micro,
         |  CASE WHEN sc.n_bigrams > 0
         |    THEN floor(sc.nll_micro::DOUBLE / sc.n_bigrams)::BIGINT END
         |    AS avg_nll_micro
         |FROM g LEFT JOIN sc USING (doc_id) ORDER BY doc_id""".stripMargin,

    "contrastive_manifest" ->
      s"""WITH dg AS (SELECT DISTINCT doc_id, ng
         |            FROM (SELECT doc_id, unnest($Ngrams3Sql) AS ng FROM documents)),
         |sz AS (SELECT doc_id, count(*) AS sz FROM dg GROUP BY 1),
         |i AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
         |      FROM dg a JOIN dg b ON a.ng = b.ng AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2),
         |pos AS (SELECT a_id, b_id
         |        FROM (SELECT a_id, b_id, inter, sa.sz + sb.sz - inter AS uni
         |              FROM i JOIN sz sa ON sa.doc_id = a_id
         |                     JOIN sz sb ON sb.doc_id = b_id)
         |        WHERE inter * 2 >= uni),
         |p AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id)::BIGINT AS pos
         |      FROM (SELECT DISTINCT doc_id FROM documents)),
         |nn AS (SELECT count(*)::BIGINT AS n FROM p),
         |o AS (SELECT doc_id, pos,
         |        1 + (${h60("'0'", "'cm' || ':' || doc_id || ':1'")}
         |             % ((SELECT n FROM nn) - 1)) AS off
         |      FROM p WHERE (SELECT n FROM nn) > 1),
         |g AS (SELECT doc_id, ((pos - 1 + off) % (SELECT n FROM nn)) + 1 AS negpos
         |      FROM o),
         |negs AS (SELECT DISTINCT least(g.doc_id, p2.doc_id) AS a_id,
         |                greatest(g.doc_id, p2.doc_id) AS b_id
         |         FROM g JOIN p p2 ON p2.pos = g.negpos),
         |pairs AS (SELECT a_id, b_id, 1 AS label FROM pos
         |          UNION ALL
         |          SELECT n.a_id, n.b_id, 0 FROM negs n
         |          WHERE NOT EXISTS (SELECT 1 FROM pos
         |                            WHERE pos.a_id = n.a_id AND pos.b_id = n.b_id))
         |SELECT a_id, b_id, label,
         |  CASE WHEN ('0x' || substr(md5(a_id::VARCHAR || ':' || b_id::VARCHAR
         |                || 'cm'), 1, 8))::BIGINT < ${SampThr(0.9)} THEN 'train'
         |       WHEN ('0x' || substr(md5(a_id::VARCHAR || ':' || b_id::VARCHAR
         |                || 'cm'), 1, 8))::BIGINT < ${SampThr(0.95)} THEN 'val'
         |       ELSE 'test' END AS split
         |FROM pairs ORDER BY a_id, b_id""".stripMargin,

    "t7_table_digest" ->
      """WITH h AS (SELECT source,
        |  ('0x' || substr(md5(
        |     coalesce(doc_id::VARCHAR, chr(0)) || chr(31) ||
        |     coalesce(text, chr(0)) || chr(31) ||
        |     coalesce(lang, chr(0)) || chr(31) ||
        |     coalesce(n_chars::VARCHAR, chr(0))), 1, 15))::BIGINT AS h
        |  FROM documents)
        |SELECT coalesce(source, 'ALL') AS source, count(*) AS n_rows,
        |  (sum(h)::HUGEINT % 1152921504606846976)::BIGINT AS digest
        |FROM h GROUP BY ROLLUP(source) ORDER BY source""".stripMargin,

    "mix_negatives" ->
      s"""WITH p AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id)::BIGINT AS pos
         |           FROM (SELECT DISTINCT doc_id FROM documents)),
         |nn AS (SELECT count(*)::BIGINT AS n FROM p),
         |a AS (SELECT doc_id, pos, unnest([1, 2, 3]) AS j
         |      FROM p WHERE (SELECT n FROM nn) > 1),
         |o AS (SELECT doc_id, pos, j,
         |        1 + (${h60("'0'", "'r6' || ':' || doc_id || ':' || j")}
         |             % ((SELECT n FROM nn) - 1)) AS off
         |      FROM a),
         |g AS (SELECT doc_id, j,
         |        ((pos - 1 + off) % (SELECT n FROM nn)) + 1 AS negpos
         |      FROM o)
         |SELECT g.doc_id, g.j, p.doc_id AS negative_id
         |FROM g JOIN p ON p.pos = g.negpos
         |ORDER BY g.doc_id, g.j""".stripMargin,

    "l4r_bpe_pairs" ->
      s"""WITH un AS (SELECT unnest(regexp_extract_all(text, '$BpePatSql')) AS u
         |            FROM documents),
         |v AS (SELECT u, count(*) AS nu FROM un GROUP BY 1),
         |p AS (SELECT u[i:i+1] AS pair, nu
         |      FROM (SELECT u, nu, unnest(generate_series(1, length(u) - 1)) AS i
         |            FROM v WHERE length(u) >= 2))
         |SELECT pair, sum(nu)::BIGINT AS n FROM p GROUP BY 1
         |ORDER BY n DESC, pair LIMIT 20""".stripMargin,

    "q4_ref_integrity" -> {
      val edges = Seq(
        ("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
        ("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("nation.regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
        ("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("orders.custkey->event_users", "orders", "o_custkey", "events", "user_id"),
        ("supplier.nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"))
      edges.map { case (name, c, ck, p, pk) =>
        s"""SELECT '$name' AS fk, count(*) AS n_rows,
           |  count(CASE WHEN $ck IS NULL THEN 1 END) AS n_null_keys,
           |  count(CASE WHEN $ck IS NOT NULL AND NOT EXISTS
           |    (SELECT 1 FROM $p WHERE $pk = $c.$ck) THEN 1 END) AS n_orphans,
           |  count(CASE WHEN $ck IS NOT NULL AND NOT EXISTS
           |    (SELECT 1 FROM $p WHERE $pk = $c.$ck) THEN 1 END) = 0 AS pass
           |FROM $c""".stripMargin
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY fk")
    },

    "q3_profile" ->
      """WITH t AS (SELECT count(*) AS total FROM events)
        |SELECT * FROM (
        |  SELECT 'event_id' AS col_name, (SELECT total FROM t) AS n_rows,
        |    (SELECT total FROM t) - count(event_id) AS n_null,
        |    count(DISTINCT event_id) AS n_distinct,
        |    min(event_id)::VARCHAR AS min_val, max(event_id)::VARCHAR AS max_val
        |  FROM events
        |  UNION ALL
        |  SELECT 'ts', (SELECT total FROM t), (SELECT total FROM t) - count(ts),
        |    count(DISTINCT ts),
        |    strftime(min(ts), '%Y-%m-%d %H:%M:%S.%g'),
        |    strftime(max(ts), '%Y-%m-%d %H:%M:%S.%g')
        |  FROM events
        |  UNION ALL
        |  SELECT 'user_id', (SELECT total FROM t), (SELECT total FROM t) - count(user_id),
        |    count(DISTINCT user_id), min(user_id)::VARCHAR, max(user_id)::VARCHAR
        |  FROM events
        |  UNION ALL
        |  SELECT 'event_type', (SELECT total FROM t), (SELECT total FROM t) - count(event_type),
        |    count(DISTINCT event_type), min(event_type), max(event_type)
        |  FROM events
        |  UNION ALL
        |  SELECT 'value', (SELECT total FROM t), (SELECT total FROM t) - count(value),
        |    count(DISTINCT value), min(value)::VARCHAR, max(value)::VARCHAR
        |  FROM events
        |  UNION ALL
        |  SELECT 'props', (SELECT total FROM t), (SELECT total FROM t) - count(props),
        |    count(DISTINCT props), min(props), max(props)
        |  FROM events)
        |ORDER BY col_name""".stripMargin,

    "q7_auto_expectations" ->
      """WITH er AS (SELECT event_type, value, user_id FROM events WHERE event_id % 2 = 0),
        |et AS (SELECT CASE WHEN user_id % 10 = 0 THEN NULL ELSE event_type END AS event_type,
        |              value, user_id FROM events WHERE event_id % 2 = 1),
        |pr AS (
        |  SELECT 'event_type' AS col_name, count(*)::BIGINT AS n_rows,
        |    (count(*) - count(event_type))::BIGINT AS n_null,
        |    count(DISTINCT event_type)::BIGINT AS n_distinct FROM er
        |  UNION ALL SELECT 'value', count(*), count(*) - count(value),
        |    count(DISTINCT value) FROM er
        |  UNION ALL SELECT 'user_id', count(*), count(*) - count(user_id),
        |    count(DISTINCT user_id) FROM er),
        |pt AS (
        |  SELECT 'event_type' AS col_name, count(*)::BIGINT AS n_rows,
        |    (count(*) - count(event_type))::BIGINT AS n_null,
        |    count(DISTINCT event_type)::BIGINT AS n_distinct FROM et
        |  UNION ALL SELECT 'value', count(*), count(*) - count(value),
        |    count(DISTINCT value) FROM et
        |  UNION ALL SELECT 'user_id', count(*), count(*) - count(user_id),
        |    count(DISTINCT user_id) FROM et),
        |j AS (SELECT pr.col_name,
        |  CASE WHEN pr.n_rows > 0
        |    THEN floor(pr.n_null::DOUBLE * 1000000.0 / pr.n_rows::DOUBLE)::BIGINT
        |    ELSE 0 END AS null_ppm_ref,
        |  CASE WHEN pt.n_rows > 0
        |    THEN floor(pt.n_null::DOUBLE * 1000000.0 / pt.n_rows::DOUBLE)::BIGINT
        |    ELSE 0 END AS null_ppm_tgt,
        |  pr.n_distinct AS n_distinct_ref, pt.n_distinct AS n_distinct_tgt,
        |  pt.n_rows AS t_rows
        |  FROM pr JOIN pt USING (col_name))
        |SELECT col_name, null_ppm_ref, null_ppm_tgt, n_distinct_ref, n_distinct_tgt,
        |  (null_ppm_tgt <= null_ppm_ref + 10000) AS null_ok,
        |  (n_distinct_tgt * 2 >= n_distinct_ref
        |    AND n_distinct_tgt <= n_distinct_ref * 2) AS distinct_ok,
        |  (t_rows > 0) AS rows_ok,
        |  ((null_ppm_tgt <= null_ppm_ref + 10000)
        |    AND (n_distinct_tgt * 2 >= n_distinct_ref
        |         AND n_distinct_tgt <= n_distinct_ref * 2)
        |    AND t_rows > 0) AS pass
        |FROM j ORDER BY col_name""".stripMargin,

    // The partition probe replays on the shared md5 gate (SampGate
    // family): bucket = uint32(md5(key ‖ 'p0')) % 32, then per-bucket
    // rows/keys and the deterministic heaviest key (max count, min key).
    "q8_partition_skew" ->
      """WITH c AS (
        |  SELECT (('0x' || substr(md5(concat_ws('', user_id::VARCHAR, 'p0')), 1, 8))::BIGINT) % 32 AS bucket,
        |         user_id::VARCHAR AS k, count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT bucket, k, n,
        |        row_number() OVER (PARTITION BY bucket ORDER BY n DESC, k) AS rn
        |      FROM c)
        |SELECT bucket, sum(n)::BIGINT AS n_rows, count(*)::BIGINT AS n_keys,
        |  max(CASE WHEN rn = 1 THEN k END) AS top_key,
        |  max(CASE WHEN rn = 1 THEN n END)::BIGINT AS top_key_rows,
        |  ((max(CASE WHEN rn = 1 THEN n END)::HUGEINT * 1000000) // sum(n))::BIGINT AS top_share_ppm
        |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q9_join_explosion" ->
      """WITH lc AS (SELECT user_id::VARCHAR AS key, count(*)::BIGINT AS n_left
        |            FROM events GROUP BY 1),
        |rc AS (SELECT o_custkey::VARCHAR AS key, count(*)::BIGINT AS n_right
        |       FROM orders GROUP BY 1),
        |c AS (SELECT key, n_left, n_right, (n_left * n_right)::BIGINT AS out_rows
        |      FROM lc JOIN rc USING (key)),
        |t AS (SELECT sum(out_rows)::BIGINT AS total FROM c)
        |SELECT key, n_left, n_right, out_rows,
        |  ((out_rows::HUGEINT * 1000000) // t.total)::BIGINT AS share_ppm,
        |  t.total AS total_out_rows
        |FROM c, t ORDER BY out_rows DESC, key LIMIT 20""".stripMargin,

    "q3b_profile_drift" ->
      """WITH ea AS (SELECT event_type, value, user_id FROM events WHERE event_id % 2 = 0),
        |eb AS (SELECT CASE WHEN user_id % 10 = 0 THEN NULL ELSE event_type END AS event_type,
        |              value, user_id FROM events WHERE event_id % 2 = 1),
        |pa AS (
        |  SELECT 'event_type' AS col_name, count(*)::BIGINT AS n_rows,
        |    (count(*) - count(event_type))::BIGINT AS n_null,
        |    count(DISTINCT event_type)::BIGINT AS n_distinct,
        |    min(event_type) AS min_val, max(event_type) AS max_val FROM ea
        |  UNION ALL
        |  SELECT 'value', count(*), count(*) - count(value), count(DISTINCT value),
        |    min(value)::VARCHAR, max(value)::VARCHAR FROM ea
        |  UNION ALL
        |  SELECT 'user_id', count(*), count(*) - count(user_id), count(DISTINCT user_id),
        |    min(user_id)::VARCHAR, max(user_id)::VARCHAR FROM ea),
        |pb AS (
        |  SELECT 'event_type' AS col_name, count(*)::BIGINT AS n_rows,
        |    (count(*) - count(event_type))::BIGINT AS n_null,
        |    count(DISTINCT event_type)::BIGINT AS n_distinct,
        |    min(event_type) AS min_val, max(event_type) AS max_val FROM eb
        |  UNION ALL
        |  SELECT 'value', count(*), count(*) - count(value), count(DISTINCT value),
        |    min(value)::VARCHAR, max(value)::VARCHAR FROM eb
        |  UNION ALL
        |  SELECT 'user_id', count(*), count(*) - count(user_id), count(DISTINCT user_id),
        |    min(user_id)::VARCHAR, max(user_id)::VARCHAR FROM eb)
        |SELECT pa.col_name,
        |  pa.n_rows AS n_rows_before, pb.n_rows AS n_rows_after,
        |  CASE WHEN pa.n_rows > 0
        |    THEN floor(pa.n_null::DOUBLE * 1000000.0 / pa.n_rows::DOUBLE)::BIGINT END
        |    AS null_ppm_before,
        |  CASE WHEN pb.n_rows > 0
        |    THEN floor(pb.n_null::DOUBLE * 1000000.0 / pb.n_rows::DOUBLE)::BIGINT END
        |    AS null_ppm_after,
        |  pa.n_distinct AS n_distinct_before, pb.n_distinct AS n_distinct_after,
        |  (pa.min_val IS DISTINCT FROM pb.min_val) AS min_changed,
        |  (pa.max_val IS DISTINCT FROM pb.max_val) AS max_changed
        |FROM pa JOIN pb USING (col_name) ORDER BY col_name""".stripMargin,

    "q2_quality_checks" ->
      """WITH a AS (
        |  SELECT count(*) AS n,
        |    sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT AS v_text_null,
        |    sum(CASE WHEN n_chars < 0 THEN 1 ELSE 0 END)::BIGINT AS v_n_chars_negative,
        |    sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)::BIGINT AS v_n_chars_mismatch,
        |    sum(CASE WHEN lang NOT IN ('en', 'de', 'fr', 'ja') THEN 1 ELSE 0 END)::BIGINT AS v_lang_unknown,
        |    sum(CASE WHEN length(text) < 10 THEN 1 ELSE 0 END)::BIGINT AS v_text_too_short
        |  FROM documents)
        |SELECT r.rule, a.n AS n_rows, r.v AS n_violations, r.v = 0 AS pass
        |FROM a, (
        |  SELECT 'text_null' AS rule, v_text_null AS v FROM a UNION ALL
        |  SELECT 'n_chars_negative', v_n_chars_negative FROM a UNION ALL
        |  SELECT 'n_chars_mismatch', v_n_chars_mismatch FROM a UNION ALL
        |  SELECT 'lang_unknown', v_lang_unknown FROM a UNION ALL
        |  SELECT 'text_too_short', v_text_too_short FROM a) r
        |ORDER BY rule""".stripMargin,

    "q5_k_anonymity" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS obs_date,
        |  (user_id % 25)::BIGINT AS cohort, count(*)::BIGINT AS n,
        |  count(*) < 5 AS at_risk
        |FROM events GROUP BY 1, 2, 3
        |ORDER BY event_type, obs_date, cohort""".stripMargin,

    "q5c_l_diversity" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS obs_date,
        |  (user_id % 25)::BIGINT AS cohort,
        |  count(*)::BIGINT AS class_size,
        |  count(DISTINCT floor(value / 10.0)::BIGINT)::BIGINT AS n_sensitive,
        |  count(DISTINCT floor(value / 10.0)::BIGINT) >= 3 AS diverse
        |FROM events GROUP BY 1, 2, 3
        |ORDER BY event_type, obs_date, cohort""".stripMargin,

    // t-closeness: ordered EMD of each class's value-band distribution
    // vs the global one — integer cumulative numerators, ONE double
    // division of exactly-representable integers (identical IEEE
    // rounding in both engines), micro-floored. NULL sensitive rows
    // leave both distributions; the final ×1e6 multiplies AFTER the
    // division on both sides.
    "q5d_t_closeness" ->
      """WITH b AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS obs_date,
        |  (user_id % 25)::BIGINT AS cohort, floor(value / 10.0)::BIGINT AS v
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT v, count(*)::BIGINT AS gn FROM b GROUP BY 1),
        |gc AS (SELECT v, sum(gn) OVER (ORDER BY v)::BIGINT AS gcum FROM g),
        |tot AS (SELECT coalesce(sum(gn), 0)::BIGINT AS n_total,
        |               count(*)::BIGINT AS m FROM g),
        |cls AS (SELECT event_type, obs_date, cohort, count(*)::BIGINT AS class_size
        |        FROM b GROUP BY 1, 2, 3),
        |cv AS (SELECT event_type, obs_date, cohort, v, count(*)::BIGINT AS c
        |       FROM b GROUP BY 1, 2, 3, 4),
        |cells AS (SELECT cls.event_type, cls.obs_date, cls.cohort,
        |    cls.class_size, gc.v, gc.gcum, coalesce(cv.c, 0)::BIGINT AS c
        |  FROM cls CROSS JOIN gc
        |  LEFT JOIN cv ON cv.event_type IS NOT DISTINCT FROM cls.event_type
        |    AND cv.obs_date IS NOT DISTINCT FROM cls.obs_date
        |    AND cv.cohort IS NOT DISTINCT FROM cls.cohort AND cv.v = gc.v),
        |cum AS (SELECT *, sum(c) OVER (PARTITION BY event_type, obs_date, cohort
        |          ORDER BY v)::BIGINT AS ccum FROM cells),
        |s AS (SELECT event_type, obs_date, cohort, class_size,
        |    coalesce(sum(abs(tot.n_total * ccum - class_size * gcum)), 0)::BIGINT AS sn,
        |    max(tot.n_total) AS n_total, max(tot.m) AS m
        |  FROM cum, tot GROUP BY 1, 2, 3, 4),
        |f AS (SELECT event_type, obs_date, cohort, class_size,
        |    CASE WHEN m <= 1 THEN 0
        |         ELSE floor(sn::DOUBLE / (class_size::DOUBLE * n_total::DOUBLE
        |                * (m - 1)::DOUBLE) * 1000000.0)::BIGINT
        |    END AS t_micro
        |  FROM s)
        |SELECT event_type, obs_date, cohort, class_size, t_micro,
        |  t_micro <= 200000 AS close
        |FROM f ORDER BY event_type, obs_date, cohort""".stripMargin,

    "q5b_k_anon_summary" ->
      """WITH c AS (
        |  SELECT count(*)::BIGINT AS n FROM events
        |  GROUP BY event_type, strftime(ts, '%Y-%m-%d'), user_id % 25)
        |SELECT coalesce(min(n), 0)::BIGINT AS achieved_k,
        |  count(*)::BIGINT AS n_classes,
        |  coalesce(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END), 0)::BIGINT AS n_classes_at_risk,
        |  coalesce(sum(CASE WHEN n < 5 THEN n ELSE 0 END), 0)::BIGINT AS n_rows_at_risk
        |FROM c""".stripMargin,

    "q6_erasure" ->
      """WITH req AS (SELECT DISTINCT c_custkey AS k FROM customer
        |  WHERE c_custkey % 97 = 0 AND c_custkey IS NOT NULL)
        |SELECT * FROM (
        |  SELECT 'customer' AS table_name, count(*)::BIGINT AS n_rows,
        |    sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_to_erase,
        |    (count(*) - sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END))::BIGINT AS n_after
        |  FROM customer LEFT JOIN req ON c_custkey = k
        |  UNION ALL
        |  SELECT 'orders', count(*)::BIGINT,
        |    sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END)::BIGINT,
        |    (count(*) - sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END))::BIGINT
        |  FROM orders LEFT JOIN req ON o_custkey = k
        |  UNION ALL
        |  SELECT 'events', count(*)::BIGINT,
        |    sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END)::BIGINT,
        |    (count(*) - sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END))::BIGINT
        |  FROM events LEFT JOIN req ON user_id = k)
        |ORDER BY table_name""".stripMargin,

    // INDEPENDENT derivation — the engine counts via word bitmaps, the
    // oracle via plain DISTINCT; equality proves the bitmap path exact
    "a17_bitmap_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_distinct
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // the two halves partition the log (every ts on exactly one side of
    // the cut), so merged bitmaps must equal DISTINCT over the whole log
    "a17b_bitmap_merge" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_distinct
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "t8_cdc_apply" ->
      """WITH base AS (SELECT p_partkey, round(p_retailprice, 2) AS price
        |              FROM part WHERE p_partkey % 7 <> 0),
        |ch AS (
        |  SELECT p_partkey, 'upsert' AS op, 1::BIGINT AS ver,
        |         round(p_retailprice + 100, 2) AS price
        |  FROM part WHERE p_partkey % 4 = 0
        |  UNION ALL
        |  SELECT p_partkey, 'delete', 2::BIGINT, NULL::DOUBLE
        |  FROM part WHERE p_partkey % 6 = 0),
        |w AS (SELECT p_partkey, op, price FROM (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY p_partkey ORDER BY ver DESC, op DESC) AS rn FROM ch)
        |  WHERE rn = 1)
        |SELECT coalesce(b.p_partkey, w.p_partkey) AS p_partkey,
        |  CASE WHEN w.op = 'upsert' THEN w.price ELSE b.price END AS price
        |FROM base b FULL OUTER JOIN w ON b.p_partkey = w.p_partkey
        |WHERE w.op IS NULL OR w.op = 'upsert'
        |ORDER BY p_partkey""".stripMargin,

    "a23_corr_matrix" ->
      """WITH p AS (SELECT l_quantity::BIGINT AS quantity,
        |             CAST(round(l_discount * 100) AS BIGINT) AS discount_c,
        |             CAST(round(l_tax * 100) AS BIGINT) AS tax_c
        |           FROM lineitem),
        |m AS (SELECT count(*) AS n,
        |  sum(quantity) AS s_q, sum(quantity * quantity) AS q_q,
        |  sum(discount_c) AS s_d, sum(discount_c * discount_c) AS q_d,
        |  sum(tax_c) AS s_t, sum(tax_c * tax_c) AS q_t,
        |  sum(quantity * discount_c) AS p_qd,
        |  sum(quantity * tax_c) AS p_qt,
        |  sum(discount_c * tax_c) AS p_dt
        |  FROM p)
        |SELECT x_name, y_name, n,
        |  round((n * pxy - sx * sy)::DOUBLE
        |        / sqrt((n * qx - sx * sx)::DOUBLE * (n * qy - sy * sy)::DOUBLE),
        |        6) + 0.0 AS corr
        |FROM (
        |  SELECT 'quantity' AS x_name, 'discount_c' AS y_name, n,
        |    s_q AS sx, q_q AS qx, s_d AS sy, q_d AS qy, p_qd AS pxy FROM m
        |  UNION ALL
        |  SELECT 'quantity', 'tax_c', n, s_q, q_q, s_t, q_t, p_qt FROM m
        |  UNION ALL
        |  SELECT 'discount_c', 'tax_c', n, s_d, q_d, s_t, q_t, p_dt FROM m)
        |ORDER BY x_name, y_name""".stripMargin,

    "a18_regression" ->
      """WITH pts AS (SELECT event_type, hour(ts)::BIGINT AS x,
        |                    CAST(round(value * 100) AS BIGINT) AS y
        |             FROM events),
        |m AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        |      FROM pts GROUP BY 1)
        |SELECT event_type, n,
        |  round((n * sxy - sx * sy)::DOUBLE
        |        / ((n * sxx - sx * sx) * 100)::DOUBLE, 6) + 0.0 AS slope,
        |  round((sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx)::DOUBLE
        |        / (n * (n * sxx - sx * sx) * 100)::DOUBLE, 6) + 0.0 AS intercept,
        |  round((n * sxy - sx * sy)::DOUBLE * (n * sxy - sx * sy)::DOUBLE
        |        / ((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)::DOUBLE), 6)
        |    + 0.0 AS r2
        |FROM m ORDER BY event_type""".stripMargin,

    // INDEPENDENT derivation: the oracle recomputes from the effective
    // row set (base minus retractions plus inserts) — equality proves
    // the O(changeset) merge path exact
    "t9_delta_agg" ->
      """WITH eff AS (
        |  SELECT event_type, floor(value * 1000)::BIGINT AS v FROM events
        |  WHERE ts < TIMESTAMP '2024-01-16 00:00:00' AND event_id % 13 <> 0
        |  UNION ALL
        |  SELECT event_type, floor(value * 1000)::BIGINT FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00')
        |SELECT event_type, count(*)::BIGINT AS n, sum(v)::BIGINT AS vsum
        |FROM eff GROUP BY 1 ORDER BY event_type""".stripMargin,

    "a16_drift_tvd" ->
      """WITH o AS (SELECT event_type AS cat, count(*) AS n_old FROM events
        |           WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1),
        |nw AS (SELECT event_type AS cat, count(*) AS n_new FROM events
        |       WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1),
        |j AS (
        |  SELECT coalesce(o.cat, nw.cat) AS cat,
        |    coalesce(o.n_old, 0)::BIGINT AS n_old,
        |    coalesce(nw.n_new, 0)::BIGINT AS n_new
        |  FROM o FULL OUTER JOIN nw ON o.cat IS NOT DISTINCT FROM nw.cat),
        |t AS (SELECT sum(n_old)::BIGINT AS v_to, sum(n_new)::BIGINT AS v_tn FROM j),
        |p AS (
        |  SELECT j.cat, j.n_old, j.n_new,
        |    CAST(floor(abs(j.n_old::DOUBLE / t.v_to - j.n_new::DOUBLE / t.v_tn)
        |      * 1000000000.0) AS BIGINT) AS absdiff_u
        |  FROM j CROSS JOIN t)
        |SELECT cat, n_old, n_new, absdiff_u FROM p
        |UNION ALL
        |SELECT 'ALL', sum(n_old)::BIGINT, sum(n_new)::BIGINT,
        |  CAST(floor(sum(absdiff_u)::DOUBLE / 2.0) AS BIGINT) FROM p
        |ORDER BY cat""".stripMargin,

    "t6_snapshot_diff" ->
      """WITH o AS (
        |  SELECT user_id, md5(concat_ws(chr(31), coalesce(count(*)::VARCHAR, chr(0)),
        |    coalesce(count(DISTINCT event_type)::VARCHAR, chr(0)))) AS oh
        |  FROM events WHERE ts < TIMESTAMP '2024-01-25 00:00:00'
        |  GROUP BY user_id HAVING user_id % 13 <> 0),
        |n AS (
        |  SELECT user_id, md5(concat_ws(chr(31), coalesce(count(*)::VARCHAR, chr(0)),
        |    coalesce(count(DISTINCT event_type)::VARCHAR, chr(0)))) AS nh
        |  FROM events
        |  WHERE ts < TIMESTAMP '2024-01-25 00:00:00' OR user_id % 3 = 0
        |  GROUP BY user_id HAVING user_id % 11 <> 0)
        |SELECT coalesce(o.user_id, n.user_id) AS user_id,
        |  CASE WHEN o.oh IS NULL THEN 'added'
        |       WHEN n.nh IS NULL THEN 'removed'
        |       WHEN o.oh <> n.nh THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM o FULL OUTER JOIN n ON o.user_id = n.user_id
        |ORDER BY user_id""".stripMargin,

    "w11_scd2" ->
      """WITH m AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    CASE WHEN lag(event_type) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id)
        |      IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
        |  FROM events),
        |r AS (
        |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS run
        |  FROM m),
        |g AS (
        |  SELECT user_id, run, min(event_type) AS event_type,
        |    min(ts) AS vf, count(*) AS n_events
        |  FROM r GROUP BY 1, 2),
        |f AS (
        |  SELECT user_id, event_type, vf,
        |    lead(vf) OVER (PARTITION BY user_id ORDER BY run) AS vt, n_events
        |  FROM g)
        |SELECT user_id, event_type,
        |  strftime(vf, '%Y-%m-%d %H:%M:%S.%g') AS valid_from,
        |  strftime(vt, '%Y-%m-%d %H:%M:%S.%g') AS valid_to, n_events
        |FROM f ORDER BY user_id, valid_from""".stripMargin,

    "w11b_asof_snapshot" ->
      """WITH m AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    CASE WHEN lag(event_type) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id)
        |      IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
        |  FROM events),
        |r AS (
        |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS run
        |  FROM m),
        |g AS (
        |  SELECT user_id, run, min(event_type) AS event_type,
        |    min(ts) AS vf, count(*) AS n_events
        |  FROM r GROUP BY 1, 2),
        |f AS (
        |  SELECT user_id, event_type, vf,
        |    lead(vf) OVER (PARTITION BY user_id ORDER BY run) AS vt, n_events
        |  FROM g)
        |SELECT user_id, event_type,
        |  strftime(vf, '%Y-%m-%d %H:%M:%S.%g') AS valid_from,
        |  strftime(vt, '%Y-%m-%d %H:%M:%S.%g') AS valid_to, n_events
        |FROM f
        |WHERE vf <= TIMESTAMP '2024-01-15 00:00:00'
        |  AND (vt IS NULL OR TIMESTAMP '2024-01-15 00:00:00' < vt)
        |ORDER BY user_id""".stripMargin,

    "w10_gap_fill" ->
      """WITH h AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hr, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT user_id, min(hr) AS lo, max(hr) AS hi FROM h GROUP BY user_id),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM b),
        |j AS (
        |  SELECT g.user_id, g.hr, h.n
        |  FROM grid g LEFT JOIN h ON g.user_id = h.user_id AND g.hr = h.hr)
        |SELECT user_id, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hr,
        |  coalesce(n, 0)::BIGINT AS n_obs,
        |  (last_value(n IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY hr
        |    ROWS UNBOUNDED PRECEDING))::BIGINT AS n_filled
        |FROM j ORDER BY user_id, hr""".stripMargin,

    "w12_interpolate" ->
      """WITH s AS (SELECT user_id, ts, max(CAST(round(value * 100) AS BIGINT)) AS y
        |           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |q AS (SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'view'),
        |u AS (SELECT user_id, ts, 0 AS is_q, y FROM s
        |      UNION ALL SELECT user_id, ts, 1, NULL FROM q),
        |m AS (SELECT *,
        |  last_value(y IGNORE NULLS) OVER w0 AS y0,
        |  last_value(CASE WHEN is_q = 0 THEN epoch_us(ts) END IGNORE NULLS)
        |    OVER w0 AS t0,
        |  first_value(y IGNORE NULLS) OVER w1 AS y1,
        |  first_value(CASE WHEN is_q = 0 THEN epoch_us(ts) END IGNORE NULLS)
        |    OVER w1 AS t1
        |  FROM u
        |  WINDOW w0 AS (PARTITION BY user_id ORDER BY ts, is_q
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         w1 AS (PARTITION BY user_id ORDER BY ts, is_q
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%g') AS ts,
        |  round(CASE WHEN y0 IS NOT NULL AND y1 IS NOT NULL
        |    THEN y0::DOUBLE + (y1 - y0)::DOUBLE * (epoch_us(ts) - t0)::DOUBLE
        |           / (t1 - t0)::DOUBLE
        |    ELSE coalesce(y0, y1)::DOUBLE END / 100, 4) + 0.0 AS interp
        |FROM m WHERE is_q = 1 ORDER BY user_id, ts""".stripMargin,

    "w13_ewma" ->
      """WITH b AS (
        |  SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS y,
        |    lag(CAST(round(value * 100) AS BIGINT), 1) OVER w AS y1,
        |    lag(CAST(round(value * 100) AS BIGINT), 2) OVER w AS y2,
        |    lag(CAST(round(value * 100) AS BIGINT), 3) OVER w AS y3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id,
        |  round((8 * y + coalesce(4 * y1, 0) + coalesce(2 * y2, 0)
        |         + coalesce(y3, 0))::DOUBLE
        |    / ((8 + CASE WHEN y1 IS NULL THEN 0 ELSE 4 END
        |          + CASE WHEN y2 IS NULL THEN 0 ELSE 2 END
        |          + CASE WHEN y3 IS NULL THEN 0 ELSE 1 END) * 100)::DOUBLE, 4)
        |    + 0.0 AS ewma
        |FROM b ORDER BY user_id, event_id""".stripMargin,

    "w14_anomaly" ->
      """WITH p AS (SELECT user_id, event_id, ts,
        |             CAST(round(value * 100) AS BIGINT) AS y FROM events),
        |b AS (SELECT user_id, event_id, y,
        |  count(y) OVER w AS c, sum(y) OVER w AS s1, sum(y * y) OVER w AS s2
        |  FROM p
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 15 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id,
        |  CASE WHEN c * s2 - s1 * s1 = 0 THEN NULL
        |    ELSE round((c * y - s1)::DOUBLE
        |           / sqrt((c * s2 - s1 * s1)::DOUBLE), 4) + 0.0 END AS zscore,
        |  (c >= 4 AND (c * y - s1) * (c * y - s1) > 4 * (c * s2 - s1 * s1))
        |    AS is_anomaly
        |FROM b ORDER BY user_id, event_id""".stripMargin,

    // Holt replayed as the recursive CTE running the engine fold's
    // EXACT double ops in the exact order (ℓ recomputed inside b's
    // formula, matching holtStep) — bit-identical states, then the
    // same exact integer quantization on both sides.
    "w15_holt" ->
      """WITH RECURSIVE b AS (
        |  SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS y,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |rec AS (
        |  SELECT user_id, event_id, rn, y::DOUBLE AS l, 0.0::DOUBLE AS tr
        |  FROM b WHERE rn = 1
        |  UNION ALL
        |  SELECT b.user_id, b.event_id, b.rn,
        |    0.5 * b.y + 0.5 * (r.l + r.tr),
        |    0.5 * ((0.5 * b.y + 0.5 * (r.l + r.tr)) - r.l) + 0.5 * r.tr
        |  FROM rec r JOIN b ON b.user_id = r.user_id AND b.rn = r.rn + 1)
        |SELECT user_id, event_id,
        |  CAST(round(l) AS BIGINT) AS level_c,
        |  CAST(round(tr) AS BIGINT) AS trend_c,
        |  CAST(round(l + tr) AS BIGINT) AS forecast_c
        |FROM rec ORDER BY user_id, event_id""".stripMargin,

    // Holt-Winters replayed with the seasonal ring as a LIST column in
    // the recursive state (oldest first: ring[1] = the value written
    // `period` steps ago; shift-append per step). ℓ_t recomputed inline
    // inside b_t's and s_t's formulas, matching holtWintersStep — the
    // doubles are bit-identical, then the same integer quantization.
    "w15b_holt_winters" ->
      """WITH RECURSIVE b AS (
        |  SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS y,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |rec AS (
        |  SELECT user_id, event_id, rn, y::DOUBLE AS l, 0.0::DOUBLE AS tr,
        |    0.0::DOUBLE AS s, [0.0, 0.0, 0.0, 0.0]::DOUBLE[] AS ring
        |  FROM b WHERE rn = 1
        |  UNION ALL
        |  SELECT b.user_id, b.event_id, b.rn,
        |    0.5 * (b.y - r.ring[1]) + 0.5 * (r.l + r.tr),
        |    0.5 * ((0.5 * (b.y - r.ring[1]) + 0.5 * (r.l + r.tr)) - r.l)
        |      + 0.5 * r.tr,
        |    0.5 * (b.y - (0.5 * (b.y - r.ring[1]) + 0.5 * (r.l + r.tr)))
        |      + 0.5 * r.ring[1],
        |    r.ring[2:] || [0.5 * (b.y - (0.5 * (b.y - r.ring[1])
        |      + 0.5 * (r.l + r.tr))) + 0.5 * r.ring[1]]
        |  FROM rec r JOIN b ON b.user_id = r.user_id AND b.rn = r.rn + 1)
        |SELECT user_id, event_id,
        |  CAST(round(l) AS BIGINT) AS level_c,
        |  CAST(round(tr) AS BIGINT) AS trend_c,
        |  CAST(round(s) AS BIGINT) AS seasonal_c
        |FROM rec ORDER BY user_id, event_id""".stripMargin,

    "o5_skyline" ->
      """WITH d AS (
        |  SELECT DISTINCT p_retailprice AS x,
        |    (('0x' || substr(md5(p_partkey::VARCHAR), 1, 8))::BIGINT % 100000) AS y
        |  FROM part)
        |SELECT x, y FROM d p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM d q
        |  WHERE q.x <= p.x AND q.y <= p.y AND (q.x <> p.x OR q.y <> p.y))
        |ORDER BY x, y""".stripMargin
  )

  /** DuckDB twin of TextAnalysis.bm25TopDocs: same tokenizer, same
    * log-free idf ratio, same micro-unit quantization. Float constants
    * interpolate from the SAME Scala doubles the engine folds into its
    * plan (Double.toString round-trips, so both engines evaluate with
    * bit-identical constants). */
  private def Bm25Sql(terms: Seq[String], k: Int, k1: Double, b: Double): String = {
    val termList = terms.map(t => s"'$t'").mkString("(", ", ", ")")
    s"""WITH dl AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN 0::BIGINT
       |         ELSE len($ToksSql)::BIGINT END AS dl
       |  FROM documents),
       |stats AS (SELECT count(*) AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
       |hits AS (
       |  SELECT doc_id, tok FROM (
       |    SELECT doc_id, unnest($ToksSql) AS tok FROM documents)
       |  WHERE tok IN $termList),
       |tf AS (SELECT doc_id, tok, count(*) AS tf FROM hits GROUP BY 1, 2),
       |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
       |sc AS (
       |  SELECT tf.doc_id,
       |    CAST(floor(((stats.n - dft.df + 0.5) / (dft.df + 0.5)) *
       |      ((tf.tf * ${k1 + 1.0}) /
       |        (tf.tf + $k1 * (${1.0 - b} + $b * (dl.dl / stats.avgdl)))) *
       |      1000000.0) AS BIGINT) AS contrib_u
       |  FROM tf JOIN dft USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats)
       |SELECT doc_id, sum(contrib_u)::BIGINT AS score_u, count(*)::BIGINT AS n_terms
       |FROM sc GROUP BY doc_id
       |ORDER BY score_u DESC, doc_id
       |LIMIT $k""".stripMargin
  }

  /** DuckDB twin of PageRank.pageRankFixed on the symmetrized
    * device↔SSID graph: `iters` unrolled CTE rounds of the same
    * integer-quantized update. */
  /** Shared DuckDB replay of `Components.resolveEntities` on part
    * p_name: blocked edit-distance link → recursive-CTE components →
    * per-entity stats + canonical election. Consumers append either a
    * final SELECT or further CTEs (the string ends inside the WITH
    * list, after `canon`). */
  /** FS record projection downstream of the ER clusters — the SQL
    * twins of [[FsFields]], pk carried for the pair join. Appends to
    * [[ErCteSql]]'s WITH list (consumes its `cc` truth). */
  private val FsRecsSql: String =
    """,
      |recs AS (SELECT p.p_partkey AS pk, split_part(p.p_name, ' ', 1) AS blk,
      |  cc.entity_id AS ent,
      |  length(p.p_name)::VARCHAR AS f_len, right(p.p_name, 3) AS f_suf3,
      |  split_part(p.p_name, ' ', 2) AS f_tok2, p.p_size::VARCHAR AS f_size
      |  FROM part p JOIN cc ON p.p_name = cc.variant)""".stripMargin

  /** The four FS combinatorial count CTEs: total in-block pairs,
    * same-entity pairs, per-field agreeing pairs, agreeing∧matching
    * pairs — each a Σ C(n,2) over group sizes, no pair join. */
  private val FsCountsSql: String =
    """,
      |bt AS (SELECT sum(n * (n - 1) // 2)::BIGINT AS np FROM (
      |  SELECT count(*) AS n FROM recs GROUP BY blk)),
      |mt AS (SELECT sum(n * (n - 1) // 2)::BIGINT AS nm FROM (
      |  SELECT count(*) AS n FROM recs GROUP BY blk, ent)),
      |lf AS (SELECT 'len_eq' AS field, blk, ent, f_len AS v FROM recs
      |  UNION ALL SELECT 'suf3_eq', blk, ent, f_suf3 FROM recs
      |  UNION ALL SELECT 'tok2_eq', blk, ent, f_tok2 FROM recs
      |  UNION ALL SELECT 'size_eq', blk, ent, f_size FROM recs),
      |ag AS (SELECT field, sum(n * (n - 1) // 2)::BIGINT AS na FROM (
      |  SELECT field, blk, v, count(*) AS n FROM lf GROUP BY 1, 2, 3) GROUP BY 1),
      |am AS (SELECT field, sum(n * (n - 1) // 2)::BIGINT AS nam FROM (
      |  SELECT field, blk, ent, v, count(*) AS n FROM lf GROUP BY 1, 2, 3, 4) GROUP BY 1)""".stripMargin

  /** Unrolled-EM replay of the unsupervised FS calibration
    * (`Linkage.fellegiSunterEmWeights`): DuckDB derives the same
    * agreement-pattern counts from a pair join, then runs the SAME
    * fixed `iters` EM updates operation-for-operation — per-pattern
    * posteriors floor-quantized to micro BIGINTs before every sum
    * (integer sums are order-free, so engine aggregation order cannot
    * drift a bit), products in declared field order, clamps via
    * greatest/least. Field index map: 0=len_eq 1=suf3_eq 2=tok2_eq
    * 3=size_eq (FsFields order). */
  /** One EM round: posterior g per pattern (micro-floored BEFORE the
    * sums), integer sums, clamped parameter updates. */
  private def FsEmIterSql(i: Int): String = {
    val fi = 0 until 4
    def thetas(param: String) = fi.map(j =>
      s"* (CASE WHEN e$j THEN $param$j ELSE 1000000 - $param$j END)::DOUBLE")
      .mkString(" ")
    val prev = s"it${i - 1}"
    s"""g$i AS (SELECT e0, e1, e2, e3, n,
       |    CAST(floor(a * 1000000.0 / (a + b)) AS BIGINT) AS g
       |  FROM (SELECT pat.*,
       |    $prev.p::DOUBLE ${thetas("m")} AS a,
       |    (1000000 - $prev.p)::DOUBLE ${thetas("u")} AS b
       |  FROM pat CROSS JOIN $prev)),
       |s$i AS (SELECT sum(n * g)::BIGINT AS dm,
       |    sum(n * (1000000 - g))::BIGINT AS du,
       |${fi.map(j => s"    sum(CASE WHEN e$j THEN n * g ELSE 0 END)::BIGINT AS nm$j,").mkString("\n")}
       |${fi.map(j => s"    sum(CASE WHEN e$j THEN n * (1000000 - g) ELSE 0 END)::BIGINT AS nu$j").mkString(",\n")}
       |  FROM g$i),
       |it$i AS (SELECT
       |    greatest(1, least(999999, CAST(floor(dm::DOUBLE / n_tot::DOUBLE) AS BIGINT)))::BIGINT AS p,
       |${fi.map(j => s"    greatest(1, least(999999, CAST(floor(nm$j::DOUBLE * 1000000.0 / dm::DOUBLE) AS BIGINT)))::BIGINT AS m$j,").mkString("\n")}
       |${fi.map(j => s"    greatest(1, least(999999, CAST(floor(nu$j::DOUBLE * 1000000.0 / du::DOUBLE) AS BIGINT)))::BIGINT AS u$j").mkString(",\n")}
       |  FROM s$i CROSS JOIN nt)""".stripMargin
  }

  /** Unsupervised end-to-end linkage replay: the unrolled-EM weights
    * score the blocked pair join, positive evidence links, and a
    * recursive CTE closes the link graph (same closure pattern as
    * ErCteSql, over the SCORED graph instead of edit-distance). */
  private def FsLinkSql(iters: Int): String = {
    val fieldIdx = Seq("len_eq" -> 0, "suf3_eq" -> 1,
      "tok2_eq" -> 2, "size_eq" -> 3)
    // per-field contribution guarded by the SAME discriminating-field
    // rule the engine applies: a field with w_agree < w_disagree is
    // excluded from the link decision (contributes 0 either way)
    val score = fieldIdx.map { case (n, j) =>
      s"""(CASE WHEN (SELECT w_agree_micro FROM wt WHERE field = '$n')
         |          >= (SELECT w_disagree_micro FROM wt WHERE field = '$n')
         |     THEN (CASE WHEN a.f$j IS NOT DISTINCT FROM b.f$j THEN (SELECT w_agree_micro FROM wt WHERE field = '$n')
         |           ELSE (SELECT w_disagree_micro FROM wt WHERE field = '$n') END)
         |     ELSE 0 END)""".stripMargin
    }.mkString("\n   + ")
    s"""WITH RECURSIVE ${FsEmCtesSql(iters, FsEmIterSql)},
       |wt AS MATERIALIZED (SELECT * FROM (
       |${fieldIdx.map { case (n, j) => FsEmOutRowSql(n, j, iters) }
        .mkString("\n  UNION ALL\n")})),
       |pw AS MATERIALIZED (SELECT a.pk AS a_pk, b.pk AS b_pk,
       |  ($score) AS score
       |  FROM krecs a JOIN krecs b ON a.blk = b.blk AND a.pk < b.pk),
       |links AS MATERIALIZED (SELECT a_pk AS s, b_pk AS d FROM pw WHERE score > 0
       |          UNION ALL SELECT b_pk, a_pk FROM pw WHERE score > 0),
       |reach(node, lab) AS (
       |  SELECT pk, pk FROM recs
       |  UNION
       |  SELECT links.d, reach.lab FROM links JOIN reach ON reach.node = links.s),
       |cc AS (SELECT node AS pk, min(lab) AS entity_id FROM reach GROUP BY node)
       |SELECT pk, entity_id,
       |  count(*) OVER (PARTITION BY entity_id)::BIGINT AS n_records
       |FROM cc ORDER BY pk""".stripMargin
  }

  private def FsEmSql(iters: Int): String = {
    s"""WITH ${FsEmCtesSql(iters, FsEmIterSql)}
       |SELECT * FROM (
       |${Seq("len_eq" -> 0, "suf3_eq" -> 1, "tok2_eq" -> 2, "size_eq" -> 3)
        .map { case (n, j) => FsEmOutRowSql(n, j, iters) }
        .mkString("\n  UNION ALL\n")})
       |ORDER BY field""".stripMargin
  }

  /** The shared EM CTE chain (recs/pat/nt/it0…it{iters}) — the WITH
    * body both FsEmSql and FsLinkSql build on. `iterSql` renders one
    * EM round (closure over the field arity). */
  private def FsEmCtesSql(iters: Int, iterSql: Int => String): String = {
    val fi = 0 until 4
    // krecs/pat AS MATERIALIZED: every iteration CTE (and, in the link
    // query, 12 scalar weight subqueries) references this chain — left
    // inlined, DuckDB re-ran the blocked PAIR JOIN once per reference,
    // turning a ~10 s oracle into a ~15 MINUTE one (the round-9/10
    // driver-gate heavy tail). Materialization pins it to ONE pass;
    // values are unchanged.
    s"""recs AS (SELECT p.p_partkey AS pk, split_part(p.p_name, ' ', 1) AS blk,
       |  length(p.p_name)::VARCHAR AS f0, right(p.p_name, 3) AS f1,
       |  split_part(p.p_name, ' ', 2) AS f2, p.p_size::VARCHAR AS f3
       |  FROM part p),
       |kb AS (SELECT blk FROM recs GROUP BY blk HAVING count(*) BETWEEN 2 AND 8192),
       |krecs AS MATERIALIZED (SELECT recs.* FROM recs JOIN kb USING (blk)),
       |pat AS MATERIALIZED (SELECT (a.f0 IS NOT DISTINCT FROM b.f0) AS e0, (a.f1 IS NOT DISTINCT FROM b.f1) AS e1,
       |    (a.f2 IS NOT DISTINCT FROM b.f2) AS e2, (a.f3 IS NOT DISTINCT FROM b.f3) AS e3, count(*)::BIGINT AS n
       |  FROM krecs a JOIN krecs b ON a.blk = b.blk AND a.pk < b.pk
       |  GROUP BY 1, 2, 3, 4),
       |nt AS (SELECT sum(n)::BIGINT AS n_tot FROM pat),
       |it0 AS (SELECT 100000::BIGINT AS p,
       |${fi.map(j => s"  900000::BIGINT AS m$j,").mkString("\n")}
       |${fi.map(j => s"  100000::BIGINT AS u$j").mkString(",\n")}),
       |${(1 to iters).map(iterSql).mkString(",\n")}""".stripMargin
  }

  private def FsEmOutRowSql(name: String, j: Int, iters: Int): String =
    s"""  SELECT '$name' AS field, m$j AS m_micro, u$j AS u_micro,
       |    CAST(floor(ln(m$j::DOUBLE / u$j::DOUBLE) * 1000000) AS BIGINT) AS w_agree_micro,
       |    CAST(floor(ln((1000000 - m$j)::DOUBLE / (1000000 - u$j)::DOUBLE) * 1000000) AS BIGINT) AS w_disagree_micro
       |  FROM it$iters""".stripMargin

  /** FS comparison fields shared by er_fs_weights / er_fs_scores:
    * three name-derived evidence fields plus `size_eq`, which is
    * independent of identity by construction — its learned weight
    * lands near 0, demonstrating the calibration. */
  private val FsFields: Seq[(String, org.apache.spark.sql.Column)] = Seq(
    "len_eq" -> length(col("p_name")),
    "suf3_eq" -> substring(col("p_name"), -3, 3),
    "tok2_eq" -> element_at(split(col("p_name"), " "), 2),
    "size_eq" -> col("p_size"))

  private val ErCteSql: String =
    """WITH RECURSIVE
      |v AS (SELECT p_name AS variant, count(*) AS n,
      |      split_part(p_name, ' ', 1) AS blk FROM part GROUP BY 1, 3),
      |e AS (SELECT a.variant AS a_val, b.variant AS b_val
      |      FROM v a JOIN v b ON a.blk = b.blk AND a.variant < b.variant
      |        AND abs(length(a.variant) - length(b.variant)) <= 2
      |        AND levenshtein(a.variant, b.variant) <= 2),
      |edges AS (SELECT a_val AS s, b_val AS d FROM e
      |          UNION ALL SELECT b_val, a_val FROM e),
      |reach(node, lab) AS (
      |  SELECT variant, variant FROM v
      |  UNION
      |  SELECT edges.d, reach.lab FROM edges JOIN reach ON reach.node = edges.s),
      |cc AS (SELECT node AS variant, min(lab) AS entity_id FROM reach GROUP BY node),
      |lv AS (SELECT v.variant, v.n, cc.entity_id FROM v JOIN cc USING (variant)),
      |ent AS (SELECT entity_id, count(*) AS n_variants,
      |        sum(n)::BIGINT AS entity_n
      |        FROM lv GROUP BY 1),
      |canon AS (SELECT entity_id, variant AS canonical FROM (
      |  SELECT entity_id, variant,
      |    row_number() OVER (PARTITION BY entity_id ORDER BY n DESC, variant) AS rn
      |  FROM lv) WHERE rn = 1)""".stripMargin

  private def PageRankSql(iters: Int, damping: Double): String = {
    val baseU = math.floor((1.0 - damping) * 1000000.0).toLong
    def round(i: Int): String = {
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""m$i AS (
         |  SELECT ew.dst AS node,
         |    sum(CAST(floor(p.pr_u::DOUBLE * ew.w / ew.wout) AS BIGINT)) AS m
         |  FROM ew JOIN $prev p ON ew.src = p.node GROUP BY 1),
         |r$i AS (
         |  SELECT n.node,
         |    ($baseU + CAST(floor($damping * coalesce(m$i.m, 0)) AS BIGINT))::BIGINT AS pr_u
         |  FROM nodes n LEFT JOIN m$i ON n.node = m$i.node)""".stripMargin
    }
    s"""WITH e AS (
       |  SELECT 'u:' || user_id::VARCHAR AS src, 't:' || event_type AS dst,
       |         count(*) AS w
       |  FROM events GROUP BY 1, 2),
       |ed AS (SELECT src, dst, w FROM e UNION ALL SELECT dst, src, w FROM e),
       |nodes AS (SELECT DISTINCT src AS node FROM ed
       |          UNION SELECT DISTINCT dst FROM ed),
       |ow AS (SELECT src, sum(w) AS wout FROM ed GROUP BY src),
       |ew AS (SELECT ed.src, ed.dst, ed.w, ow.wout FROM ed JOIN ow USING (src)),
       |r0 AS (SELECT node, 1000000::BIGINT AS pr_u FROM nodes),
       |${(1 to iters).map(round).mkString(",\n")}
       |SELECT node, pr_u FROM r$iters ORDER BY node""".stripMargin
  }

  /** Prefix-truncated re-rank vs full-dim top-k: one ranked CTE per
    * prefix dim (list slicing on the DOUBLE[] cast), integer overlap
    * counts against the full-dim truth. */
  private def DimAblationSql(dims: Seq[Int], k: Int): String = {
    def topk(d: Int) =
      s"""SELECT $d::BIGINT AS dim, qid, cid FROM (
         |  SELECT q.qid, c.cid, row_number() OVER (PARTITION BY q.qid
         |    ORDER BY round(list_cosine_similarity(
         |      (q.embedding::DOUBLE[])[1:$d], (c.embedding::DOUBLE[])[1:$d]), 4)
         |      DESC, c.cid) AS rn
         |  FROM q CROSS JOIN c) WHERE rn <= $k""".stripMargin
    s"""WITH q AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id < 5),
       |c AS (SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id >= 5),
       |ft AS (SELECT qid, cid FROM (
       |  SELECT q.qid, c.cid, row_number() OVER (PARTITION BY q.qid
       |    ORDER BY round(list_cosine_similarity(
       |      q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) DESC, c.cid) AS rn
       |  FROM q CROSS JOIN c) WHERE rn <= $k),
       |tr AS (${dims.map(topk).mkString("\nUNION ALL\n")})
       |SELECT tr.dim, tr.qid,
       |  sum(CASE WHEN ft.cid IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_overlap
       |FROM tr LEFT JOIN ft ON tr.qid = ft.qid AND tr.cid = ft.cid
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** Unrolled k-core peel replay: per round, a degree count and two
    * survivor joins — the same synchronous removal the engine runs. */
  private def KCoreSql(k: Int, rounds: Int): String = {
    def round(i: Int): String = {
      val prev = s"e${i - 1}"
      s"""d$i AS (SELECT src, count(*) AS n FROM $prev GROUP BY 1),
         |k$i AS (SELECT src FROM d$i WHERE n >= $k),
         |e$i AS (SELECT p.src, p.dst FROM $prev p
         |  JOIN k$i a ON p.src = a.src JOIN k$i b ON p.dst = b.src)""".stripMargin
    }
    s"""WITH items AS (SELECT l_orderkey AS ord, l_partkey AS pk FROM lineitem),
       |e AS (SELECT a.pk AS pa, b.pk AS pb
       |  FROM items a JOIN items b ON a.ord = b.ord AND a.pk < b.pk
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |e0 AS (SELECT pa AS src, pb AS dst FROM e UNION ALL SELECT pb, pa FROM e),
       |${(1 to rounds).map(round).mkString(",\n")},
       |deg AS (SELECT src AS node, count(*)::BIGINT AS degree
       |  FROM e$rounds GROUP BY 1),
       |u AS (SELECT coalesce(max(CASE WHEN degree < $k THEN 1 ELSE 0 END), 0) AS u
       |  FROM deg)
       |SELECT deg.node, deg.degree, (u.u = 0) AS stable
       |FROM deg CROSS JOIN u ORDER BY node""".stripMargin
  }

  /** Unrolled synchronous LPA replay: per round, (node, label) weight
    * sums then argmax-with-min-label-tie-break via row_number — the
    * same (−w, lab) ordering the engine's min(struct) computes. */
  /** The WITH-chain of the unrolled synchronous LPA replay, shared by
    * the g8 community listing and the g10 modularity score: CTEs `e`
    * (undirected weighted edges), `ed` (both directions), `nodes`, and
    * `l<iters>` (the final labels). No trailing comma — consumers
    * append their own CTEs. */
  private def LpaCoreSql(iters: Int): String = {
    def round(i: Int): String = {
      val prev = s"l${i - 1}"
      s"""b$i AS (
         |  SELECT ed.dst AS node, p.lab, sum(ed.w) AS lw
         |  FROM ed JOIN $prev p ON ed.src = p.node GROUP BY 1, 2),
         |l$i AS (
         |  SELECT n.node, coalesce(t.lab, p.lab) AS lab
         |  FROM nodes n
         |  LEFT JOIN (SELECT node, lab FROM (
         |      SELECT node, lab,
         |        row_number() OVER (PARTITION BY node ORDER BY lw DESC, lab) AS rn
         |      FROM b$i) WHERE rn = 1) t ON n.node = t.node
         |  JOIN $prev p ON n.node = p.node)""".stripMargin
    }
    s"""WITH e AS (
       |  SELECT 'u:' || user_id::VARCHAR AS src, 't:' || event_type AS dst,
       |         count(*) AS w
       |  FROM events GROUP BY 1, 2),
       |ed AS (SELECT src, dst, w FROM e UNION ALL SELECT dst, src, w FROM e),
       |nodes AS (SELECT DISTINCT src AS node FROM ed
       |          UNION SELECT DISTINCT dst FROM ed),
       |l0 AS (SELECT node, node AS lab FROM nodes),
       |${(1 to iters).map(round).mkString(",\n")}""".stripMargin
  }

  private def LpaSql(iters: Int): String =
    s"""${LpaCoreSql(iters)},
       |sz AS (SELECT lab, count(*)::BIGINT AS n_members FROM l$iters GROUP BY 1)
       |SELECT l.node, l.lab, sz.n_members
       |FROM l$iters l JOIN sz USING (lab) ORDER BY l.node""".stripMargin

  /** Shared DuckDB replay of the stopword-hit language-ID heuristic:
    * CTE `g` = (doc_id, guess, labeled). lang_id reads it per doc;
    * lang_confusion aggregates it into the confusion matrix. */
  private lazy val LangIdCoreSql: String = {
    def hits(lang: String) = {
      val words = TextFunctions.StopwordsByLang(lang).map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_intersect($ToksSql, $words))"
    }
    s"""WITH h AS (SELECT doc_id, lang,
       |  ${hits("de")} AS h_de, ${hits("en")} AS h_en, ${hits("es")} AS h_es, ${hits("fr")} AS h_fr
       |  FROM documents),
       |g AS (SELECT doc_id,
       |  CASE WHEN h_de = 0 AND h_en = 0 AND h_es = 0 AND h_fr = 0 THEN 'und'
       |       WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
       |       WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
       |       WHEN h_es >= h_fr THEN 'es' ELSE 'fr' END AS guess,
       |  lang AS labeled
       |FROM h)""".stripMargin
  }

  /** Shared DuckDB replay of the md5-family MinHash banding (32 hashes
    * / 8 bands, k=5 shingles): CTEs `s` (doc_id, shingle list), `sg`
    * (band lists), `banded` (doc_id, band i, band key). Band-key
    * equality on the raw 4-hash lists ⟺ the engine's seeded-xxhash64
    * band key equality (same slices compared). Consumers append their
    * candidate restriction + verify. */
  /** md5×multiply family (r7): one md5 per shingle gives the 60-bit
    * base (`hb`, hex-slice parse), then hash j = base · Mixers(j) with
    * Java's long wrap — reproduced exactly in DuckDB by doing the
    * product in HUGEINT and re-centering mod 2^64. The SAME mixer
    * literals as MinHashSigMulExpr, interpolated — no drift possible.
    * (Replaced the paired-digest family, which burned 16 md5 digests
    * per shingle to get the same replayability.) */
  private lazy val MinhashBandCteSql: String = {
    val T = "18446744073709551616" // 2^64
    val H = "9223372036854775808"  // 2^63
    val sig = (0 until 32).map { j =>
      val a = org.apache.spark.sql.graft.MinHashSigMulExpr.Mixers(j)
      s"list_min(list_transform(hb, h -> (((h::HUGEINT * (${a}::HUGEINT)) % $T + $T + $H) % $T - $H)::BIGINT))"
    }
    val bandList = (0 until 8).map(b =>
      (4 * b until 4 * b + 4).map(sig).mkString("[", ", ", "]"))
      .mkString("[", ",\n    ", "]")
    s"""WITH s AS (SELECT doc_id, $Shingles5Sql AS sh FROM documents),
       |sh2 AS (SELECT doc_id,
       |          list_transform(sh, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hb
       |        FROM s WHERE len(sh) > 0),
       |sg AS (SELECT doc_id, $bandList AS bands FROM sh2),
       |banded0 AS (
       |  SELECT doc_id, i, bands[i] AS bk
       |  FROM sg CROSS JOIN (SELECT unnest(generate_series(1, 8)) AS i)),
       |banded AS (
       |  SELECT doc_id, i, bk FROM (
       |    SELECT doc_id, i, bk, count(*) OVER (PARTITION BY i, bk) AS bn
       |    FROM banded0)
       |  WHERE bn <= 4096)""".stripMargin
  }

  /** [[PageRankSql]]'s personalized twin: restart mass only on the
    * literal seed nodes; same integer quantization per round. */
  private def PprSql(seeds: Seq[String], iters: Int, damping: Double): String = {
    val baseU = math.floor((1.0 - damping) * 1000000.0).toLong
    val seedList = seeds.map(s => s"'$s'").mkString("[", ", ", "]")
    def round(i: Int): String = {
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""m$i AS (
         |  SELECT ew.dst AS node,
         |    sum(CAST(floor(p.pr_u::DOUBLE * ew.w / ew.wout) AS BIGINT)) AS m
         |  FROM ew JOIN $prev p ON ew.src = p.node GROUP BY 1),
         |r$i AS (
         |  SELECT n.node,
         |    ((CASE WHEN n.is_seed THEN $baseU ELSE 0 END)
         |      + CAST(floor($damping * coalesce(m$i.m, 0)) AS BIGINT))::BIGINT AS pr_u
         |  FROM ns n LEFT JOIN m$i ON n.node = m$i.node)""".stripMargin
    }
    s"""WITH e AS (
       |  SELECT 'u:' || user_id::VARCHAR AS src, 't:' || event_type AS dst,
       |         count(*) AS w
       |  FROM events GROUP BY 1, 2),
       |ed AS (SELECT src, dst, w FROM e UNION ALL SELECT dst, src, w FROM e),
       |nodes AS (SELECT DISTINCT src AS node FROM ed
       |          UNION SELECT DISTINCT dst FROM ed),
       |sd AS (SELECT unnest($seedList) AS node),
       |ns AS (SELECT nodes.node, (sd.node IS NOT NULL) AS is_seed
       |       FROM nodes LEFT JOIN sd ON nodes.node = sd.node),
       |ow AS (SELECT src, sum(w) AS wout FROM ed GROUP BY src),
       |ew AS (SELECT ed.src, ed.dst, ed.w, ow.wout FROM ed JOIN ow USING (src)),
       |r0 AS (SELECT node,
       |       (CASE WHEN is_seed THEN 1000000 ELSE 0 END)::BIGINT AS pr_u FROM ns),
       |${(1 to iters).map(round).mkString(",\n")}
       |SELECT node, pr_u FROM r$iters ORDER BY node""".stripMargin
  }

  /** DuckDB replay of [[synthUrl]] — identical string, same moduli. */
  private val UrlSynthSql: String =
    "'https://' || CASE WHEN doc_id % 7 < 4 THEN 'www.' ELSE 'cdn.' END || " +
    "CASE WHEN doc_id % 5 = 0 THEN upper(source) ELSE source END || " +
    "CASE WHEN doc_id % 11 < 6 THEN '.com' ELSE '.org' END || " +
    "'/docs/' || (doc_id % 97)::VARCHAR || " +
    "CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END || " +
    "CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&ref=' || doc_id::VARCHAR ELSE '' END"

  /** DuckDB replay of Sampling.hashGate: uint32 of md5(key‖salt)[0:8],
    * concat_ws mirroring the engine's null-key handling. */
  /** Unrolled Hilbert xy→d walk as a CTE chain (one step per bit, top
    * bit first) — mirrors [[graft.operators.ZOrder.hilbertIndex]]'s
    * column arithmetic statement for statement: same rotate-flip-swap
    * projection, same s²·(3rx⊕ry) accumulation, all BIGINT. */
  private def HilbertSql(bits: Int): String = {
    val seed = s"""h$bits AS (SELECT l_orderkey, l_linenumber,
                  |  (l_partkey % ${1L << bits})::BIGINT AS x,
                  |  (l_suppkey % ${1L << bits})::BIGINT AS y,
                  |  0::BIGINT AS d FROM lineitem)""".stripMargin
    val steps = ((bits - 1) to 0 by -1).map { i =>
      val s = 1L << i
      val prev = s"h${i + 1}"
      s"""h$i AS (SELECT l_orderkey, l_linenumber,
         |  CASE WHEN (y & $s) = 0 THEN (CASE WHEN (x & $s) > 0 THEN ${s - 1} - y ELSE y END) ELSE x END AS x,
         |  CASE WHEN (y & $s) = 0 THEN (CASE WHEN (x & $s) > 0 THEN ${s - 1} - x ELSE x END) ELSE y END AS y,
         |  (d + ${s * s} * xor(CASE WHEN (x & $s) > 0 THEN 3 ELSE 0 END,
         |                      CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END))::BIGINT AS d
         |  FROM $prev)""".stripMargin
    }
    (seed +: steps).mkString("WITH ", ",\n", "") +
      "\nSELECT l_orderkey, l_linenumber, d AS h FROM h0" +
      "\nORDER BY l_orderkey, l_linenumber"
  }

  /** Replays [[graft.operators.Chunking.cdcChunks]] in DuckDB (the
    * l4e_bpe_tokens literal-table precedent): the boundary test only
    * reads `h & mask`, and the low maskBits bits of the rolling gear
    * fold are carry-free from above — (h<<1)+g mod 2^k depends only on
    * h mod 2^k and g mod 2^k — so the replay needs NO wrapping 64-bit
    * arithmetic: the gear table is interpolated PRE-MASKED and the walk
    * runs in tiny ints. The per-character fold itself is a recursive
    * CTE advancing every document one character per step (≤ max doc
    * length steps, all docs in parallel). ASCII-exact: Spark folds
    * UTF-16 code units & 0xFF, the replay folds code points % 256 —
    * identical below U+0100 (the synth corpus is ASCII; the surrogate
    * deferral never fires there either). */
  private def CdcChunksSql(maskBits: Int, minLen: Int, maxLen: Int): String = {
    val m = 1L << maskBits
    val gearLit = org.apache.spark.sql.graft.CdcExprs.Gear
      .map(g => (g & (m - 1)).toString).mkString("[", ",", "]")
    s"""WITH RECURSIVE
       |gl AS (SELECT $gearLit AS g),
       |d AS (SELECT doc_id, text, length(text)::INT AS n FROM documents),
       |w(doc_id, i, strt, h, bounds) AS (
       |  SELECT doc_id, 0::INT, 0::INT, 0::INT, []::INT[] FROM d
       |  UNION ALL
       |  SELECT doc_id, i,
       |    CASE WHEN cut THEN i ELSE strt END,
       |    CASE WHEN cut THEN 0 ELSE h2 END,
       |    CASE WHEN cut THEN list_append(bounds, i) ELSE bounds END
       |  FROM (
       |    SELECT s.*, (len >= $minLen AND h2 = 0) OR len >= $maxLen AS cut
       |    FROM (
       |      SELECT w.doc_id, w.i + 1 AS i, w.strt, w.bounds,
       |        ((w.h * 2 + gl.g[(unicode(substr(d.text, w.i + 1, 1)) % 256) + 1]) % $m)::INT AS h2,
       |        w.i + 1 - w.strt AS len
       |      FROM w JOIN d USING (doc_id) CROSS JOIN gl
       |      WHERE w.i < d.n) s)),
       |fin AS (SELECT w.doc_id, w.bounds FROM w JOIN d USING (doc_id) WHERE w.i = d.n),
       |e AS (SELECT fin.doc_id, d.text,
       |        CASE WHEN d.n = 0 OR len(bounds) = 0 OR bounds[len(bounds)] < d.n
       |             THEN list_concat(list_concat([0], bounds), [d.n])
       |             ELSE list_concat([0], bounds) END AS edges
       |      FROM fin JOIN d USING (doc_id))
       |SELECT doc_id, (k - 1)::BIGINT AS chunk_idx,
       |  substr(text, edges[k] + 1, edges[k + 1] - edges[k]) AS chunk
       |FROM e, unnest(generate_series(1, len(edges) - 1)) AS t(k)
       |ORDER BY doc_id, chunk_idx""".stripMargin
  }

  /** Cache of built capstone stores, keyed (sfDir, everyNth, erased):
    * the five capstones each need their own event slice (their oracles
    * replay that slice), but within one JVM — a Verify dump, or
    * Bench's repeated passes — each store builds ONCE; later calls are
    * pure reads. Builds serialize under the map's monitor, which also
    * makes the stale-workdir sweep race-free: only tmp dirs owned by
    * no live cache entry are reclaimed. */
  private val capstoneCache =
    scala.collection.mutable.Map[(String, Long, Boolean), String]()

  /** The store-building pipelines the capstone queries read from —
    * exposed so Bench can time CONSTRUCTION separately from the reads
    * (VERDICT r9 #3: ~40 s of fixture building inside the timed query
    * window drowned the plan-drift signal the bench exists to carry).
    * Each entry populates the capstone cache; the corresponding
    * capstone query then costs only its read. */
  def pipelines: Map[String, (SparkSession, String) => Unit] = Map(
    "build_store_full"   -> ((s, d) => { buildCapstoneStore(s, d, 1L); () }),
    "build_store_n3"     -> ((s, d) => { buildCapstoneStore(s, d, 3L); () }),
    "build_store_n5"     -> ((s, d) => { buildCapstoneStore(s, d, 5L); () }),
    "build_store_n7"     -> ((s, d) => { buildCapstoneStore(s, d, 7L); () }),
    "build_store_erased" -> ((s, d) => { erasedCapstoneStore(s, d); () }),
    "build_store_evolved" -> ((s, d) => { evolvedCapstoneStore(s, d); () }),
    "build_store_sqlwrite" -> ((s, d) => { sqlWriteCapstoneStore(s, d); () }),
    "build_store_sqldelete" -> ((s, d) => { sqlDeleteCapstoneStore(s, d); () }),
    "build_store_mergevolve" -> ((s, d) => { mergeEvolveCapstoneStore(s, d); () }),
    "build_store_compound" -> ((s, d) => { compoundCapstoneStore(s, d); () }))

  /** The COMPOUND-KEY capstone's store (r16, VERDICT r15 #3): one row
    * per (mac, ssid) — the fleet-table shape the reference README
    * implies ("which SSIDs has this MAC probed") — written through
    * applyBucketedBatch under the compound key "mac,ssid" (routing
    * hashes the full tuple), then one UPDATE and one DELETE through
    * the SQL door: the UPDATE rewrites its buckets, the DELETE commits
    * as a DELETION VECTOR over the compound key. Cached as pipeline;
    * the capstone query is a pure head read through format("graft"). */
  private def compoundCapstoneStore(s: SparkSession, d: String): String =
    capstoneCache.synchronized {
      capstoneCache.getOrElseUpdate((d, 19L, true), {
        val work = java.nio.file.Files.createTempDirectory("graft_capstone_cmp")
        val store = work.resolve("store").toString
        val slice = ev(s, d).filter(col("event_id") % 19 === 0)
        val l1 = slice.groupBy(
            upper(lpad(hex(col("user_id")), 12, "0")).as("mac"),
            col("event_type").as("ssid"))
          .agg(max((lit(165) + col("event_id") % 30 - 255).cast("long"))
              .as("rssi"),
            min((lit(2412) + (col("event_id") % 13) * 5).cast("long"))
              .as("freq"))
        graft.streaming.MergeSink.applyBucketedBatch(
          l1.select(col("mac"), col("ssid"), lit("upsert").as("op"),
            lit(1L).as("ver"), col("rssi"), col("freq")),
          0L, store, "mac,ssid", "op", "ver", Seq("rssi", "freq"),
          nBuckets = 8)
        s.sql("DROP TABLE IF EXISTS graft_cmp_capstone")
        s.sql(s"CREATE TABLE graft_cmp_capstone USING graft LOCATION '$store'")
        try {
          s.sql("UPDATE graft_cmp_capstone SET rssi = rssi - 1000 " +
            "WHERE ssid = 'click'")
          s.sql("DELETE FROM graft_cmp_capstone WHERE freq >= 2467")
        } finally s.sql("DROP TABLE IF EXISTS graft_cmp_capstone")
        store
      })
    }

  private def buildCapstoneStore(s: SparkSession, d: String,
      everyNth: Long): String = capstoneCache.synchronized {
    capstoneCache.getOrElseUpdate((d, everyNth, false),
      buildCapstoneStoreUncached(s, d, everyNth))
  }

  /** The erasure capstone's store: built on the every-2nd slice, then
    * every user_id ≡ 0 (mod 7) erased from ALL retained history — the
    * erasure is part of the PIPELINE (cached with the store), so the
    * capstone query itself is a pure snapshot read and repeated bench
    * passes don't re-pay the history rewrite. Erasure is idempotent,
    * so a cold-cache re-run converges to the same state regardless. */
  private def erasedCapstoneStore(s: SparkSession, d: String): String =
    capstoneCache.synchronized {
      capstoneCache.getOrElseUpdate((d, 2L, true), {
        val store = buildCapstoneStoreUncached(s, d, 2L)
        val victims = ev(s, d).filter(col("user_id") % 7 === 0)
          .select(upper(lpad(hex(col("user_id")), 12, "0")).as("mac")).distinct()
        graft.streaming.MergeSink.eraseKeys(s, store, victims)
        store
      })
    }

  /** The evolution capstone's store: the every-9th slice store, then
    * [[graft.streaming.MergeSink.addColumns]] (metadata-only `tag`
    * column), then one WRITE-NEW batch (every even-user mac upserted
    * WITH the tag) and one WRITE-OLD batch (every user≡0 (mod 5) mac
    * upserted by a pre-evolution writer without it — full-row replace,
    * tag back to null). All three evolution steps are PIPELINE (cached
    * with the store); the capstone query is a pure head read. */
  private def evolvedCapstoneStore(s: SparkSession, d: String): String =
    capstoneCache.synchronized {
      capstoneCache.getOrElseUpdate((d, 9L, false), {
        val store = buildCapstoneStoreUncached(s, d, 9L)
        val MS = graft.streaming.MergeSink
        MS.addColumns(store, Seq(org.apache.spark.sql.types.StructField(
          "tag", org.apache.spark.sql.types.StringType)))
        val slice = ev(s, d).filter(col("event_id") % 9 === 0)
        val maxVer = slice.agg(max("event_id")).head().getLong(0)
        val macOf = upper(lpad(hex(col("user_id")), 12, "0"))
        val writeNew = slice.filter(col("user_id") % 2 === 0)
          .select(macOf.as("mac")).distinct()
          .select(col("mac"), lit("upsert").as("op"),
            lit(maxVer + 1).as("ver"), lit("evolved").as("ssid"),
            lit(-1L).as("rssi"), lit(0L).as("freq"), col("mac").as("tag"))
        MS.applyBucketedBatch(writeNew, 4L, store, "mac", "op", "ver",
          Seq("ssid", "rssi", "freq", "tag"), nBuckets = 16)
        val writeOld = slice.filter(col("user_id") % 5 === 0)
          .select(macOf.as("mac")).distinct()
          .select(col("mac"), lit("upsert").as("op"),
            lit(maxVer + 2).as("ver"), lit("old-writer").as("ssid"),
            lit(-2L).as("rssi"), lit(0L).as("freq"))
        MS.applyBucketedBatch(writeOld, 5L, store, "mac", "op", "ver",
          Seq("ssid", "rssi", "freq"), nBuckets = 16)
        store
      })
    }

  /** The SQL-write capstone's store: the every-11th slice store, then
    * one `df.write.format("graft").mode("append")` upsert batch landed
    * THROUGH THE SQL DOOR (MergeSink.sqlInsert → OCC commit) — every
    * user≡0 (mod 3) mac replaced with a marker row. Cached as pipeline;
    * the capstone query is a pure SQL-door read, so the oracle checks
    * the full write→commit→read round trip. */
  private def sqlWriteCapstoneStore(s: SparkSession, d: String): String =
    capstoneCache.synchronized {
      capstoneCache.getOrElseUpdate((d, 11L, false), {
        val store = buildCapstoneStoreUncached(s, d, 11L)
        val slice = ev(s, d).filter(col("event_id") % 11 === 0)
        val macOf = upper(lpad(hex(col("user_id")), 12, "0"))
        slice.filter(col("user_id") % 3 === 0)
          .select(macOf.as("mac")).distinct()
          .select(col("mac"), lit("sql").as("ssid"),
            lit(-9L).as("rssi"), lit(1L).as("freq"))
          .write.format("graft").mode("append").save(store)
        store
      })
    }

  /** The SQL-delete capstone's store: the every-13th slice store, then
    * one `DELETE FROM … WHERE rssi < -120` issued through the catalog
    * door — a HEAD retraction in one OCC CDC commit. Cached as
    * pipeline; the capstone query is a pure read, so the oracle checks
    * the predicate→retraction round trip. */
  private def sqlDeleteCapstoneStore(s: SparkSession, d: String): String =
    capstoneCache.synchronized {
      capstoneCache.getOrElseUpdate((d, 13L, false), {
        val store = buildCapstoneStoreUncached(s, d, 13L)
        s.sql("DROP TABLE IF EXISTS graft_del_capstone")
        s.sql(s"CREATE TABLE graft_del_capstone USING graft LOCATION '$store'")
        try s.sql("DELETE FROM graft_del_capstone WHERE rssi < -120")
        finally s.sql("DROP TABLE IF EXISTS graft_del_capstone")
        store
      })
    }

  /** The MERGE-evolution capstone's store (r14): the every-17th slice
    * store, then ONE `MERGE WITH SCHEMA EVOLUTION` statement through a
    * GraftCatalog door — the analyzer routes the source-only `note`
    * column through the catalog's alterTable (= the store's
    * metadata-only addColumns commit) and the CDC batch commits
    * against the widened schema: two commits, one statement. Matched
    * keys (user ≡ 0 mod 4) set the evolved column; keys whose CDC
    * winner was a delete re-enter via the NOT MATCHED arm. Cached as
    * pipeline; the capstone query is a pure head read. */
  private def mergeEvolveCapstoneStore(s: SparkSession, d: String): String =
    capstoneCache.synchronized {
      capstoneCache.getOrElseUpdate((d, 17L, false), {
        val store = buildCapstoneStoreUncached(s, d, 17L)
        val wh = java.nio.file.Paths.get(store).getParent.toString
        val slice = ev(s, d).filter(col("event_id") % 17 === 0)
        val macOf = upper(lpad(hex(col("user_id")), 12, "0"))
        // Spark's auto-evolution only engages when every assignment to
        // a NOT-YET-EXISTING column is the bare `col = s.col` form
        // (MergeIntoTable.canEvaluateSchemaEvolution: an unresolved
        // assignment key needs a name-equal source attribute as its
        // value) — so the evolved value is COMPUTED IN THE SOURCE and
        // both arms assign `note = s.note`; existing-column
        // assignments stay free to use literals
        slice.filter(col("user_id") % 4 === 0)
          .select(macOf.as("mac")).distinct()
          .select(col("mac"), concat(lit("m:"), col("mac")).as("note"))
          .createOrReplaceTempView("graft_mev_src")
        s.conf.set("spark.sql.catalog.graft_mev",
          classOf[graft.sources.GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.graft_mev.warehouse", wh)
        try s.sql("""MERGE WITH SCHEMA EVOLUTION INTO graft_mev.store t
          |USING graft_mev_src s ON t.mac = s.mac
          |WHEN MATCHED THEN UPDATE SET note = s.note
          |WHEN NOT MATCHED THEN INSERT (mac, ssid, rssi, freq, note)
          |  VALUES (s.mac, 'ins', -7, 0, s.note)""".stripMargin)
        finally {
          s.conf.unset("spark.sql.catalog.graft_mev")
          s.conf.unset("spark.sql.catalog.graft_mev.warehouse")
          s.catalog.dropTempView("graft_mev_src")
        }
        store
      })
    }

  /** Shared builder for the ingest→store capstones: synthesizes the s2
    * upload log from `events` (optionally the deterministic
    * `event_id % everyNth == 0` slice, so the extra capstones stay
    * bench-honest), lands it as four ver-range-ordered upload files,
    * and runs the REAL pipeline — file-log streaming source
    * (`IngestPipeline.fromFileLog`, one micro-batch per file) → frame
    * parser → bucketed MERGE sink — to a fresh store. Returns the
    * store dir (4 committed versions, batch i ↦ version i). */
  private def buildCapstoneStoreUncached(s: SparkSession, d: String,
      everyNth: Long): String = {
    import java.nio.file.{Files => JFiles}
    // measurement hook (guide §1): GRAFT_PROBE_PHASES=1 prints the
    // build's phase walls to stderr; zero cost when unset
    val probePhases = sys.env.contains("GRAFT_PROBE_PHASES")
    @inline def phase[T](name: String)(body: => T): T =
      if (!probePhases) body
      else {
        val t0 = System.nanoTime()
        try body
        finally System.err.println(
          f"[phase] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    val e0 = ev(s, d)
    val e = if (everyNth > 1L) e0.filter(col("event_id") % everyNth === 0) else e0
    // the s2 synthetic frame (layout per ssidentity.h:36-42)
    val hexFrame = concat(
      lit("0" * 38),
      lpad(hex(lit(2412) + (col("event_id") % 13) * 5), 4, "0"),
      lit("00"),
      lpad(hex(lit(165) + (col("event_id") % 30)), 2, "0"),
      lit("00" + "0000" + "40" + "000000" + "FFFFFFFFFFFF"),
      lpad(hex(col("user_id")), 12, "0"),
      lit("0" * 38),
      lpad(hex(length(col("event_type"))), 2, "0"),
      upper(hex(encode(col("event_type"), "US-ASCII"))))
    // spread BEFORE the encode: hex/lpad/concat/base64 per row is the
    // map-heavy shape Tables.spread exists for — the events parquet is
    // one row group, so the unspread encode (the persist job below)
    // ran on one core (measured 3.4 s of the build)
    val lines = Tables.spread(e).select(
      concat_ws(":", col("event_id"), unix_millis(col("ts")),
        // Spark's base64 MIME-wraps at 76 chars — a wrapped payload
        // would split one upload line across two text rows; strip
        // the breaks (unbase64 decodes unwrapped input fine)
        regexp_replace(base64(unhex(hexFrame)), "[\\r\\n]", "")).as("value"),
      col("event_id").as("eid"))
    // sweep STALE capstone work dirs first (a previous JVM's leftovers
    // — this JVM's builds are cached and reused, never rebuilt): any
    // graft_capstone* tree owned by no live cache entry is a finished
    // run's garbage; without the sweep repeated bench/verify runs leak
    // ~10 MB × builds into the temp dir. Runs under the cache monitor
    // (the only caller), so a cached store is never swept mid-read.
    locally {
      val live = capstoneCache.values.toSet
      val tmpRoot = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
      val s0 = JFiles.list(tmpRoot)
      try s0.iterator().asScala
        .filter(_.getFileName.toString.startsWith("graft_capstone"))
        .filterNot(p => live.exists(_.startsWith(p.toString + "/")))
        .foreach { p =>
          JFiles.walk(p).iterator().asScala.toList.reverseIterator
            .foreach(q => JFiles.deleteIfExists(q))
        }
      finally s0.close()
    }
    val work = JFiles.createTempDirectory("graft_capstone")
    val landing = work.resolve("landing")
    JFiles.createDirectories(landing)
    // four upload files over DISJOINT ascending event_id (= ver)
    // ranges, mtime-ordered: the file source (oldest first,
    // maxFilesPerTrigger = 1) then feeds version-ordered batches —
    // and ANY consecutive regrouping of them converges to the same
    // store, so batch assignment is not a correctness knob
    // one pass builds the frame encoding; the four quarter writes and
    // the max() read the cache instead of re-encoding the slice each
    // time (5 passes → 1 + 4 cached scans)
    lines.persist()
    // materialize the cache and take max(eid) in ONE single-stage job
    // (r17): the aggregate's exchange + AQE stage round bought nothing
    // for a scalar over ≤32 cached partitions — fold per partition,
    // max on the driver
    val maxId = phase("synth.materialize") {
      val parts = lines.select(col("eid")).rdd
        .mapPartitions { it =>
          var m = Long.MinValue
          it.foreach(r => m = math.max(m, r.getLong(0)))
          Iterator.single(m)
        }.collect()
      require(parts.nonEmpty && parts.max != Long.MinValue,
        "capstone build: empty events slice")
      parts.max
    }
    // the four quarter writes are independent single-file jobs over the
    // persisted cache — submit them concurrently (guide §2.6) so each
    // coalesce(1) writer's single-task tail overlaps the others'
    locally {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val writes = (0 until 4).map { i => Future {
        val lo = (maxId + 1) * i / 4; val hi = (maxId + 1) * (i + 1) / 4
        val stage = work.resolve(s"stage$i")
        lines.filter(col("eid") >= lo && col("eid") < hi)
          .select("value").coalesce(1).write.text(stage.toString)
        val part = {
          val st = JFiles.list(stage)
          try st.iterator().asScala
            .find(_.getFileName.toString.startsWith("part-")).get
          finally st.close()
        }
        val dst = landing.resolve(f"upload_$i%02d.txt")
        JFiles.move(part, dst)
        JFiles.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
      }}
      phase("synth.quarterWrites") { writes.foreach(Await.result(_, Duration.Inf)) }
    }
    lines.unpersist()
    val store = work.resolve("store").toString
    val parsed = graft.operators.FrameParser.parse(
      graft.streaming.IngestPipeline.fromFileLog(s, landing.toString,
        maxFilesPerTrigger = 1))
    val cdc = parsed.filter(col("valid"))
      .select(col("mac"),
        when(col("ssid") === "error", lit("delete"))
          .otherwise(lit("upsert")).as("op"),
        col("sensorId").as("ver"), col("ssid"),
        col("rssi").cast("long").as("rssi"),
        col("freq").cast("long").as("freq"))
    phase("stream.total") {
      val q = cdc.writeStream
        .option("checkpointLocation", work.resolve("ckpt").toString)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          phase(s"batch$batchId.total") {
            graft.streaming.MergeSink.applyBucketedBatch(batch, batchId,
              store, "mac", "op", "ver", Seq("ssid", "rssi", "freq"),
              nBuckets = 16)
          }
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    store
  }

  private def SampGate(saltLit: String) =
    s"('0x' || substr(md5(concat_ws('', doc_id::VARCHAR, $saltLit)), 1, 8))::BIGINT"
  /** Delegates to the engine's own gate arithmetic — no drift possible. */
  private def SampThr(f: Double): Long = graft.operators.Sampling.threshold(f)
}
