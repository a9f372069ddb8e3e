package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Regenerates EXPLAIN.md — annotated formatted physical plans for the
  * headline queries, the plan shapes PlanSpec pins structurally. Run:
  * `sbt "runMain graft.tools.ExplainDump"`. */
object ExplainDump {

  private val annotated: Seq[(String, String)] = Seq(
    "q1_agg" -> ("Flagship TPC-H Q1 shape. The shipdate predicate reaches the "
      + "parquet scan (PushedFilters), unused columns are pruned from ReadSchema, "
      + "and the aggregation runs partial (map-side) + final around one exchange."),
    "j1_broadcast_join" -> ("Small dimensions broadcast (BroadcastHashJoin ×2); "
      + "the fact side never shuffles for the join."),
    "j7_asof_join" -> ("Custom operator ladder rung (c): AsOfJoin LogicalPlan + "
      + "Strategy + sort-merge SparkPlan. Both sides cluster on the key and sort "
      + "by (key, time); the merge is O(n+m) per partition with one buffered row "
      + "— vs O(qualifying pairs) for the compose path (range join + top-1)."),
    "samp_hash" -> ("Deterministic hash-gate sampling: the md5-gate Filter sits "
      + "directly on the scan, below the repartition — sampling is map-side, "
      + "nothing shuffles to be discarded."),
    "w6_sessionize" -> ("Batch sessionization: lag-mark and running-sum share one "
      + "partitioning and ordering, so both window functions run in a single "
      + "Window exec over a single hashpartitioning(user_id) exchange."),
    "t5_pivot" -> ("Pivot over a fixed column set: ONE scan, partial_count then "
      + "partial_pivotfirst — both aggregation phases combine map-side before "
      + "their exchanges."),
    "l2b_minhash_pairs" -> ("MinHash LSH near-dups (paired-digest md5 family — "
      + "oracle-replayable end to end): signatures compute scan-side ONCE; "
      + "candidate pairs enumerate inside band buckets via one groupBy + "
      + "in-bucket explode (a banded self-join would CLONE the plan and hash "
      + "every shingle twice — ReuseExchange does not fire across self-join "
      + "branches, verified on the final adaptive plan); candidates verify by "
      + "a native sorted-merge intersect on hashed shingle sets. No crossJoin "
      + "anywhere."),
    "net_tree_triangles_deg" -> ("Degree-ordered triangle counting: edges point "
      + "at their higher-(degree, id) endpoint, so a hub's in·out path-wedge "
      + "product collapses to zero — O(m^1.5) wedges under any skew. Two equi "
      + "joins (wedge + closing semi), the degree table joined key-side; no "
      + "broadcast of the edge list, no cartesian."),
    "st5_late_drop" -> ("Batch twin of the streaming watermark: the 1-row "
      + "max-event-time aggregate broadcasts onto the event scan (scalar "
      + "cross-join idiom — O(n) work, not a pair blowup), the cutoff filters "
      + "map-side, and the surviving rows run the ST2 tumbling aggregation."),
    "w4_global_seq" -> ("Dense global sequence WITHOUT a partitionless window "
      + "(which would single-task all rows): range-partitioned sort, then "
      + "zipWithIndex assigns contiguous per-partition offsets."),
    "device_profile" -> ("Capstone composed report (census ⋈ modal hour ⋈ top "
      + "interest ⋈ session stats). All four branches aggregate the same "
      + "events scan independently; the final joins run on the user_id key "
      + "with each branch already reduced to one row per device."),
    "j5b_binned_interval" -> ("KEYLESS interval join, binned: quantizing time "
      + "into 60s bins and exploding each interval across its bins turns what "
      + "would be a BroadcastNestedLoopJoin (O(n·m), broadcast-memory-bound) "
      + "into a plain shuffled equi join on the bin id with a residual range "
      + "filter — partition-parallel and AQE-sizable at any scale."),
    "l2g_dedup_clusters" -> ("Near-dup pairs → transitive clusters: hash-min "
      + "label propagation, one O(E) shuffle + min-aggregate per round, no "
      + "driver-side graph state. The plan shown is the final labels join; "
      + "iteration count = cluster diameter (small for near-dup clusters)."),
    "l2h_decontaminate" -> ("Eval-set decontamination: the benchmark's distinct "
      + "gram hashes BROADCAST (benchmark-sized, never the corpus); the corpus "
      + "side is a map-side explode + broadcast-hash probe, so no exchange "
      + "ever carries corpus TEXT on the probe path — the data-sized "
      + "exchanges are the eval-side gram distinct and the (doc_id, "
      + "hit-count) partial aggregates (the repartitions visible below are "
      + "Tables.documents' local[32] single-row-group spread, dropped at "
      + "fleet scale). Tokens materialize before the n-gram HOF and grams "
      + "hash post-explode — both codegen'd, nothing interpreted per element."),
    "l3e_pq_ann" -> ("Product-quantization ANN: the corpus side carries only "
      + "vec_id + the m-code array (the 16×-compressed representation — at "
      + "fleet scale this column is persisted and the raw embedding column "
      + "is never read); queries BROADCAST with their per-query lookup "
      + "tables and every candidate scores with m table reads inside "
      + "whole-stage codegen. The only exchange is the per-query top-k "
      + "window's hashpartitioning(qid)."),
    "mix_temperature" -> ("Temperature-flattened source mixing: per-source "
      + "counts partial-aggregate map-side and the derived (source → rate) "
      + "table BROADCASTS back onto the fact scan, where the md5 gate "
      + "filters map-side — the corpus never shuffles to be sampled."),
    "j9_radius_join" -> ("Grid-bucketed radius self-join: the O(n²) spatial "
      + "cross join rewritten as an EQUI join on ⌈r⌉-grid cells — one side "
      + "fans out to its 3×3 neighborhood (Generate explode), both sides "
      + "co-partition on the cell key, and the exact integer-d² filter "
      + "finishes. No CartesianProduct, no nested loop anywhere."),
    "l4g_bm25" -> ("BM25 keyword retrieval: the corpus-sized token stream "
      + "dies AT the Generate stage (the query-term IN filter sits on the "
      + "explode output before anything shuffles); the |terms|-sized df "
      + "table and the 1-row corpus stats broadcast; per-doc scores "
      + "quantize to BIGINT micro-units before the order-free sum; the "
      + "final top-k is TakeOrderedAndProject — per-partition heaps, no "
      + "global sort."),
    "g4_pagerank" -> ("Fixed-iteration PageRank: the three unrolled rounds "
      + "read the node list and out-weighted edge table from materialized "
      + "RDDs (Scan ExistingRDD — the localCheckpoint), so no iteration "
      + "rescans the source; each round is one equi join plus one "
      + "map-combined sum on the destination key, with integer micro-unit "
      + "ranks end to end."),
    "l2q_setsim_join" -> ("EXACT set-similarity join via prefix filtering: "
      + "candidates come from a self-join on each doc's PREFIX postings "
      + "only — its |s|−⌈t·|s|⌉+1 rarest grams under the global (df, gram) "
      + "order — so hot grams never generate candidates. Verification (r13 "
      + "rewrite): each doc's gram set folds ONCE into a sorted long array; "
      + "candidate pairs equi-join those compact array payloads and the "
      + "overlap comes from the native codegen'd SortedLongIntersectCount — "
      + "a linear two-pointer merge per pair, no per-gram explode on the "
      + "verify side, so no exchange scales with pairs×doc-length. Grams "
      + "travel as xxhash64 longs; every join is a shuffled/broadcast EQUI "
      + "join, no nested loop anywhere, and recall is 100% by theorem. "
      + "r17: the verified pairs materialize (Scan ExistingRDD below the "
      + "sort) before the declared total order — the range partitioner's "
      + "sampling pass otherwise re-executed the fused verify stage."),
    "w12_interpolate" -> ("Linear interpolation at query instants: samples "
      + "and query points UNION into one per-key ordered stream, and ONE "
      + "Window exec (two frames over the same sort) carries both "
      + "bracketing samples past every query row — versus two range joins "
      + "for the as-of-compose formulation. One exchange, one sort."),
    "a17_bitmap_distinct" -> ("Exact distinct via word bitmaps: rows fold "
      + "map-side into (group, key DIV 64) bit_or partials — duplicate "
      + "keys vanish BEFORE the exchange, which carries one long per "
      + "64-key word; the final count is sum(bit_count(bits)). Both "
      + "aggregates partial+final; the bitmap table itself is mergeable "
      + "ingest state."),
    "geo_hotspots" -> ("Grid hotspot census: each occupied cell explodes "
      + "its count to its 9 neighbor keys map-side (Generate over the "
      + "CELL table, not the observation table) and one equi groupBy "
      + "re-aggregates neighborhoods; the 1-row (total, n_cells) stats "
      + "broadcast back (scalar cross-join idiom). No distance join, no "
      + "cell-pair blowup."),
    "l2r_incremental_neardup" -> ("Incremental near-dup probe: the batch "
      + "and the corpus band index union into ONE groupBy on the band "
      + "key — a single exchange of (bk, id, is_new) slivers; old×old "
      + "pairs are filtered INSIDE the bucket-pair lambda and never "
      + "materialize as rows; verification fetches old text BY KEY "
      + "(left-semi on candidate ids), so a daily ingest costs "
      + "O(batch + candidates), independent of corpus row count."),
    "t8_cdc_apply" -> ("CDC apply (MERGE): the changeset reduces to one "
      + "winner per key via a map-combined max-struct BEFORE meeting "
      + "the store, then a single co-partitioned full outer join "
      + "applies upserts/deletes — the base is never windowed, never "
      + "broadcast, and at fleet scale only touched partitions "
      + "rewrite."),
    "mix_dsir" -> ("DSIR importance selection: the fitted 64-bucket "
      + "log-ratio model entered as a LITERAL array (bounded driver "
      + "collect at build time, the IVF-codebook posture), so the "
      + "scoring plan is scan -> project with zero joins and zero "
      + "hash exchanges — a 100 TB corpus is scored in one map-only "
      + "codegen'd pass."),
    "eval_auc" -> ("Exact ROC-AUC: raw rows reduce to the DISTINCT "
      + "(group, score) histogram in the partial+final aggregate "
      + "BELOW the Window — the rank sort touches score-cardinality "
      + "rows, never the corpus; one more group aggregate folds the "
      + "Mann-Whitney sum."),
    "q6_erasure" -> ("Erasure propagation: the deletion batch "
      + "broadcasts once and every subject-keyed table is probed "
      + "map-side (BroadcastHashJoin + conditional count) — no fact "
      + "table shuffles to honor a right-to-be-forgotten sweep."),
    "j10_bloom_join" -> ("Explicit Bloom-pruned join: the build side "
      + "collapses distributively into one serialized bloom "
      + "(ObjectHashAggregate of bloom_filter_agg), which reaches the "
      + "probe side as a scalar-subquery literal; the might_contain "
      + "Filter sits directly on the lineitem scan, BEFORE its "
      + "exchange — non-matching rows never ride the shuffle."),
    "g8_lpa" -> ("Synchronous label propagation, 3 unrolled rounds: "
      + "the static edge side is hash-partitioned and checkpointed "
      + "once (Scan ExistingRDD); each round re-exchanges only the "
      + "|V|-sized label table into the join, then two map-combined "
      + "aggregates — the (dst, lab) partial sum and the min(struct) "
      + "argmin — with no per-node window anywhere."),
    "pack_sequences" -> ("Token-level sequence packing: the global "
      + "cumulative position comes from a range-sorted RDD with "
      + "per-partition offsets (Scan ExistingRDD — no partitionless "
      + "window), and everything after is codegen'd integer "
      + "arithmetic: a bounded sequence-explode into only the "
      + "sequences each doc touches."),
    "o4c_zonemap" -> ("Zone-map effectiveness: three layout sorts "
      + "(each a range partitioning), each followed by the 1-row "
      + "total as a broadcast scalar join and ONE map-combined "
      + "groupBy on file_id — the report costs three sorts, not "
      + "three shuffled joins."),
    "l4s_lm_score" -> ("Bigram-LM scoring: the vocabulary-sized "
      + "model joins on the gram key (AQE picks broadcast locally; "
      + "sort-merge at scale), the doc side pre-aggregates (doc, "
      + "gram) multiplicity BEFORE the model join, and the 1-row "
      + "vocab scalar enters as a broadcast nested loop of one row."),

    "st9_co_observation" -> ("ST9's batch twin, BOUNDED (r9): the "
      + "tolerance join's equi key widens from mac to (mac, 60s bin) "
      + "— each left row probes bins {b−1, b, b+1}, so one chatty mac "
      + "spreads across time instead of concentrating on one shuffle "
      + "key — and a per-(mac, bin) row_number cap (the Dedup "
      + "maxBucket idiom, mirrored in the oracle CTE) bounds the "
      + "worst bin's pair fan-out at C(2·cap, 2). Still a plain "
      + "shuffled equi join with residuals; no BNL shape anywhere."),

    "o5_skyline" -> ("2-D Pareto frontier without the textbook "
      + "partitionless running-min window: level 1 prefix-mins over "
      + "the |buckets|-sized table (the ONE tolerated empty-partition "
      + "window — bounded by bucketWidth, not data), level 2 windows "
      + "PARTITIONED BY bucket, and the bucket bound broadcasts back "
      + "onto the distinct point set."),

    "mm_phash_band_pairs" -> ("L5h banding pinned by oracle (r7): "
      + "the 4x16-bit chunk explode is map-side, candidates come from "
      + "an equi self-join on (chunk idx, chunk value) — never "
      + "all-pairs — and the exact popcount verify runs on candidates "
      + "only. The codec-fed twin (mm_phash_pairs) shares this exact "
      + "plan downstream of the hash column."),

    "er_fs_weights" -> ("Fellegi–Sunter calibration (r7), pair-FREE: "
      + "every m/u cell is a sum of C(n,2) over group sizes, so the "
      + "plan is four map-combinable count aggregates (block, "
      + "block×entity, block×value, block×entity×value — the value "
      + "aggregates share one stack-unpivoted scan) plus two 1-row "
      + "scalar broadcasts. No join ever carries a record pair; the "
      + "only data-sized pass is the scan feeding the counts."),

    "er_fs_scores" -> ("FS score-separation histogram (r7), also "
      + "pair-free: ONE cube over (block, entity, fields…) — the "
      + "Expand node — yields every grouping set's ΣC(n,2) in a "
      + "single exchange; Möbius inversion runs as scalar arithmetic "
      + "on a one-row pivot, and weights/bucketing touch ≤2^(f+1) "
      + "pattern rows. The quadratic candidate space is never "
      + "materialized at any block size."),

    "l4u_pmi" -> ("PMI collocations (r7): vocabulary bounded FIRST "
      + "(top-V by doc frequency via TakeOrderedAndProject) and "
      + "broadcast back as a semi filter; pairs explode inside each "
      + "doc's ≤V-term sorted array (map-side), partial-aggregating "
      + "into ≤C(V,2) keys before the one exchange. Co-occurrence is "
      + "quadratic in vocabulary, never in corpus."),

    "l3f_ivfadc_pinned" -> ("Pinned IVFADC (r8, for the whole pinned "
      + "trio l3c/l3e/l3f): the 8-row FROZEN literal codebook enters "
      + "as a BroadcastNestedLoopJoin — a bounded-model join (8 rows "
      + "per probe), not a pair blowup — cells assign scan-side, each "
      + "query's m·k LUT materializes once, and ADC scores only pairs "
      + "surviving nprobe pruning. Every arithmetic step replays "
      + "bit-exactly in DuckDB against the same dyadic literals."),

    "er_fs_value_weights" -> ("Frequency-based FS weights (r8): the "
      + "same pair-free ΣC(n,2) group counts as the field calibration "
      + "kept one level deeper at (field, value) grain — one stack "
      + "unpivot, two map-combined exchanges, and the 1-row totals "
      + "broadcast (scalar-join idiom). Output is O(distinct values), "
      + "computed without materializing a single pair."),

    "er_fs_value_link" -> ("Value-weighted link decisions (r9): the "
      + "O(values) weight table joins the O(records) side BEFORE "
      + "pairing (null-safe equi joins — an agreeing pair shares its "
      + "value, so either side's carried weight is the pair's), and "
      + "the salted in-block pair stream scores with map-only "
      + "arithmetic: per-field CASE over struct fields plus the 1-row "
      + "field-weight broadcast. No O(pairs) join anywhere; the "
      + "pair-free star-link path deliberately keeps field-level "
      + "weights (monotonicity argument in Linkage.scoreValuePairs). "
      + "r17: the scored pairs materialize (Scan ExistingRDD below the "
      + "sort) before the declared total order — the range partitioner's "
      + "sampling pass otherwise re-executed the 6.6M-pair scoring."),

    "capstone_store_sql_door" -> ("SQL front door (r12): the same "
      + "store state read through spark.read.format(\"graft\") — a DSv2 "
      + "table whose scan is a V1Scan wrapping the manifest-pruned "
      + "snapshot plan, so the node below the RowDataSourceScan is the "
      + "SAME vectorized parquet union every Scala-API read runs; "
      + "registered as a temp view and queried as ad-hoc SQL "
      + "(ssidentity.c:17-18's declared interface). Pushed key-equality "
      + "filters prune driver-side to owning buckets (GraftTableSpec "
      + "proves it physically); versionAsOf/timestampAsOf map to time "
      + "travel; INSERT INTO upserts through the OCC commit."),

    "capstone_store_range_scan" -> ("Manifest data skipping (r15): a "
      + "NON-KEY range predicate through the door. The plan shows the "
      + "opaque GraftRelation scan; the structure that matters runs at "
      + "its buildScan: the pushed rssi/freq range filters prune FILES "
      + "against the commit-time `_stats/<version>` sidecars before any "
      + "parquet footer is fetched (FileSkippingSpec proves the skip "
      + "physically with corrupted excluded files), and the survivors' "
      + "scan re-applies the same predicates for row-group pushdown. "
      + "At 100 TB this turns a time/measure-window query from millions "
      + "of footer GETs into one driver-side sidecar read per live "
      + "version."),

    "capstone_ingest_store" -> ("Ingest→store→query capstone (r9): "
      + "the plan shown is the final read — a partition-discovered "
      + "scan of the bucketed MERGE store's current version dirs. The "
      + "interesting structure runs BEFORE it: the file-log streaming "
      + "source consumes four ver-ordered upload files exactly-once "
      + "(offsets checkpointed), the frame parser decodes them "
      + "scan-side, and applyBucketedBatch rewrites only touched "
      + "buckets per micro-batch under the CAS commit protocol. The "
      + "DuckDB oracle replays the whole log as one winner-per-key "
      + "CDC apply."),

    "capstone_store_timetravel" -> ("Time travel (r9): the store AS OF "
      + "the 3-of-4-batch version. The plan is the v2 manifest resolved "
      + "to partition-pruned scans of exactly the version dirs owning "
      + "each bucket at that commit — history reads cost the same as "
      + "the current snapshot, never a log replay. DuckDB replays the "
      + "read point as the CDC apply over the matching upload-log "
      + "prefix (quarter-range integer arithmetic mirrored)."),

    "g10_modularity" -> ("Modularity of the G8 LPA partition (r9): the "
      + "iterative label table is checkpointed ONCE and feeds all four "
      + "consumers (two endpoint joins, degree, sizes) as equi joins; "
      + "per-community aggregates are map-combined, output is "
      + "O(communities), and the exact integer numerators mean the "
      + "score replays bit-identically in DuckDB on the same unrolled "
      + "LPA chain as g8."),

    "q8_partition_skew" -> ("Physical partition-skew probe (r9): the "
      + "md5-gate bucket evaluates scan-side into a map-combined "
      + "(bucket, key) count — strictly cheaper than the exchange it "
      + "predicts — then one bucket-partitioned window picks each "
      + "partition's heaviest key and a bucket-sized aggregate emits "
      + "the 32-row report."),

    "q9_join_explosion" -> ("Pre-join cardinality probe (r9): two "
      + "map-combined per-key counts (each HashAggregate pair shows "
      + "the partial_count before its exchange), one KEY-table equi "
      + "join — key-cardinality rows, never data rows — and a "
      + "TakeOrderedAndProject for the top-k contributors. The exact "
      + "total rides in from a separate 1-row bounded aggregate (the "
      + "DSIR-λ idiom), so no plan node ever sees O(join output)."),

    "capstone_store_cdf" -> ("Change data feed v1→v3 (r9): the plan "
      + "reads ONLY the buckets whose manifest owner changed — the "
      + "parquet scans under each side of the full-outer key join "
      + "carry _bucket IN (...) partition filters resolved from the "
      + "manifest diff, so unchanged buckets never reach an operator. "
      + "The no-op filter (null-safe per-column equality) runs on the "
      + "join output, which is changed-buckets-sized, not store-sized."),

    "w15_holt" -> ("Holt double-exponential smoothing (r11): a 2-state "
      + "COUPLED recursion has no bounded-lag unroll, so the plan is the "
      + "irreducible shape of a per-key sequential fold — ONE exchange on "
      + "the key into groupBy + sort_array(collect_list), the native "
      + "graft_holt_states fold over each packed series, and a map-side "
      + "explode back to rows. No Window exec, no per-row join; per-key "
      + "state is O(series), the bound any stateful recursion carries."),

    "capstone_store_ivm" -> ("IVM over the feed (r9): the "
      + "changed-rows-sized feed is checkpointed once (plan truncates "
      + "at the scan of its materialization), the two signed delta "
      + "branches union map-side, collapse in ONE map-combined "
      + "groupBy, and a single full-outer merge joins them into the "
      + "v1 state — no operator rescans the store; the raise_error "
      + "negative-count guard sits inside the final filter predicate "
      + "where the optimizer cannot prune it."))

  /** Per-query measured cost pulled from the committed bench artifact
    * (VERDICT r9 #6: a plan's SHAPE and its measured COST should sit
    * together, so a plan whose bytes moved round-over-round is visible
    * right where the plan is read). Returns the cost header line, or
    * None when the artifact lacks the query. */
  private def costHeader(name: String): Option[String] = {
    val p = Paths.get("bench_full.json")
    if (!Files.exists(p)) return None
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val j = JsonMethods.parse(new String(Files.readAllBytes(p), "UTF-8"))
      def num(v: JValue): Option[Double] = v match {
        case JDouble(d) => Some(d)
        case JInt(i) => Some(i.toDouble)
        case JLong(l) => Some(l.toDouble)
        case _ => None
      }
      def arr(section: String): Option[List[Double]] =
        (j \ section \ name) match {
          case JArray(xs) => Some(xs.flatMap(num))
          case _ => None
        }
      val sf = (j \ "sf") match { case JString(s) => s; case _ => "?" }
      val wall = num(j \ "queries" \ name)
      def mb(b: Double) = f"${b / 1048576.0}%.1f MiB"
      (wall, arr("bytes"), arr("cpu")) match {
        case (Some(w), Some(List(sr, sw, sd, sm)), Some(List(cpuMs, runMs))) =>
          val spill = if (sd + sm == 0) "no spill" else s"spill ${mb(sd + sm)}"
          Some(f"Measured ($sf, bench_full.json): wall $w%.2f s, task-CPU " +
            f"${cpuMs / 1000.0}%.1f s / task-run ${runMs / 1000.0}%.1f s, " +
            s"shuffle ${mb(sr)} read / ${mb(sw)} written, $spill.")
        case _ => None
      }
    } catch { case _: Throwable => None }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val sb = new StringBuilder
    sb.append("# EXPLAIN — headline physical plans\n\n")
    sb.append("Formatted plans for the plan shapes `PlanSpec` pins structurally\n")
    sb.append("(regenerate: `sbt \"runMain graft.tools.ExplainDump\"`; sf0.001,\n")
    sb.append("local[4] — shapes, not sizes, are the point). Each plan\n")
    sb.append("carries its measured cost from the committed bench artifact\n")
    sb.append("(sf0.1): shape and price side by side — compare the shuffle\n")
    sb.append("bytes against the previous round's EXPLAIN.md to spot plan\n")
    sb.append("drift (`scripts/bench_drift.py` automates the diff).\n")
    for ((name, note) <- annotated) {
      val p = graft.SparkEntry.queries(name)(spark, sf)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      val cost = costHeader(name).map(c => s"\n_${c}_\n").getOrElse("")
      sb.append(s"\n## $name\n\n$note\n$cost\n```\n${p.trim}\n```\n")
    }
    Files.write(Paths.get("EXPLAIN.md"), sb.toString.getBytes("UTF-8"))
    println(s"[explain] wrote EXPLAIN.md (${annotated.size} plans)")
    spark.stop()
  }
}
