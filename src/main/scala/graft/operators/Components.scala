package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a candidate-pair graph — the step that
  * turns near-dup PAIRS (L2: MinHash/SimHash/Jaccard edges) into dedup
  * CLUSTERS a curation pipeline can act on ("keep the min-id doc per
  * cluster"). Pairs alone under-delete: near-duplication is transitive
  * in practice (A≈B, B≈C ⇒ one cluster {A,B,C} even when A-C misses
  * the threshold), so production dedup (e.g. the C4/Gopher/RefinedWeb
  * pipelines) clusters candidates before choosing survivors.
  *
  * Algorithm: hash-min label propagation. Every node starts labeled
  * with itself; each round every node takes the min label among itself
  * and its neighbors; converged when no label changes. Each round is
  * ONE shuffle of O(E) messages + a min-aggregate — no driver-side
  * graph state, nothing collected. Round count is the graph diameter,
  * which for near-dup clusters is small (tight clusters, not long
  * chains). For adversarially long chains the large-star/small-star
  * variant (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SOCC'14) halves path lengths per round; not needed for the
  * dedup-cluster shape this serves.
  *
  * Lineage: each round's result is materialized via [[Checkpoint]] — iterative
  * DataFrame loops otherwise stack O(rounds) plan nodes and re-run
  * every prior shuffle on each action. Strategy is session-selected
  * (graft.checkpoint.reliable): executor-local blocks by default,
  * HDFS-backed reliable checkpoint at fleet scale so a lost executor
  * cannot drop a round's blocks.
  */
object Components {

  /** (node, component) for every node, component = min node id
    * reachable. `nodes`: one column; `edges`: two columns (src, dst),
    * undirected, self-loops/duplicates fine. Edge endpoints absent
    * from `nodes` still propagate labels but only `nodes` rows are
    * returned. Throws if not converged within `maxRounds` (honest
    * failure beats silently-wrong clusters). */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    require(nodes.columns.length == 1, "nodes must have exactly one column")
    require(edges.columns.length == 2, "edges must have exactly (src, dst)")
    val Seq(srcC, dstC) = edges.columns.toSeq
    // checkpoint the symmetrized edges too: they are re-joined EVERY
    // round, and their lineage (e.g. dedupClusters' blocked O(n²)
    // Jaccard self-join) is usually the most expensive stage of all —
    // without this the pair generation re-executes once per round
    // lazily: the round-1 join materializes these inside its own job —
    // an eager checkpoint here would spend two extra sequential jobs on
    // block writes nothing reads until that join anyway
    // NOT pre-partitioned by `_n` (r17, measured): hash-partitioning
    // sym once up front would let every SMJ round reuse the exchange
    // (guide §2.4) — but in the broadcast regime (labels ≪ edges, the
    // common dedup-cluster shape at every scale until the vocabulary
    // itself is huge) the rounds never shuffle sym at all, and the
    // up-front exchange is a pure add: min-of-3 A/B read er_fs_link
    // 1.94→2.36 s, l2g_dedup_clusters 1.72→1.85 s, all four probes
    // worse. A deployment whose labels outgrow broadcast should
    // repartition the EDGE input by src before calling.
    val sym = edges.select(col(srcC).as("_n"), col(dstC).as("_m"))
      .union(edges.select(col(dstC).as("_n"), col(srcC).as("_m")))
      .transform(Checkpoint.lazily)
    val nodeC = nodes.columns.head
    var labels = nodes.select(col(nodeC).as("_n"), col(nodeC).as("_lab"))
      .union(sym.select(col("_n"), col("_n").as("_lab"))).distinct()
      .transform(Checkpoint.lazily)
    val labType = labels.schema("_lab").dataType
    // Convergence = a round in which no label changed. The change count
    // is FOLDED INTO the round's own aggregate (r16): each node's
    // previous label rides along as `_old` (labels rows carry it, the
    // O(E) message rows carry null — max() recovers the unique non-null
    // per node), so one scalar action per round both materializes the
    // round's checkpointed blocks AND decides convergence. This drops
    // the separate round-0 checksum job the previous stable-checksum
    // scheme needed as its reference point, and the per-row xxhash64
    // with it; equality of rounds is exactly "zero labels changed"
    // because labels only ever decrease.
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val msgs = sym.join(labels, "_n").select(col("_m").as("_n"),
        col("_lab"), lit(null).cast(labType).as("_old"))
      val next = labels.withColumn("_old", col("_lab")).union(msgs)
        .groupBy("_n").agg(min("_lab").as("_lab"), max("_old").as("_old"))
        .transform(Checkpoint.lazily)
      val changed = next
        .agg(coalesce(sum(when(!(col("_lab") <=> col("_old")), 1L)
          .otherwise(0L)), lit(0L)))
        .head.getLong(0)
      converged = changed == 0L
      labels = next.select("_n", "_lab")
      round += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxRounds rounds — " +
        "graph diameter exceeds the bound; raise maxRounds or switch to " +
        "large-star/small-star")
    nodes.join(labels, nodes(nodeC) === labels("_n"))
      .select(col(nodeC), col("_lab").as("component"))
  }

  /** G6 — bounded-hop BFS from a seed set: (node, hops) where hops is
    * the length of the shortest DIRECTED path from any seed (0 for the
    * seeds themselves), for every node within `maxHops`. Unreachable
    * nodes are ABSENT from the result — the set complement of
    * [[PageRank.personalizedPageRankFixed]]'s seeded-zero ranks, and
    * the graph form of a watchlist blast-radius audit ("everything
    * within 3 hops of these devices", README.md:16-18). Symmetrize the
    * edge list first for undirected reach.
    *
    * Shape: `maxHops` unrolled rounds; each is ONE equi join of the
    * FRONTIER (nodes first reached last round — the BFS wavefront, not
    * |V|) against the static edge table, hash-partitioned on src once
    * and checkpointed, plus an anti join against the settled set so a
    * node's hop count is min-distance by construction. No collect, no
    * driver-side graph state; per-round state is (node, hops) rows. */
  def bfsHops(edges: DataFrame, src: String, dst: String,
      seeds: DataFrame, maxHops: Int = 3): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0 (got $maxHops)")
    require(seeds.columns.contains("node"),
      "seeds must have a 'node' column (hop-0 set)")
    // eager checkpoints here, deliberately (measured r16): each hop's
    // `reached` feeds BOTH the accumulating union and the next hop's
    // join/anti-join — a fully lazy unroll let parallel stages race to
    // compute the same un-cached blocks twice (min-of-5 0.89 → 1.19 s)
    val e = edges.select(col(src).as("_s"), col(dst).as("_d")).distinct()
      .repartition(col("_s")).transform(Checkpoint.apply)
    var dist = seeds.select(col("node")).distinct()
      .withColumn("hops", lit(0L)).transform(Checkpoint.apply)
    var frontier = dist
    for (h <- 1 to maxHops) {
      val reached = e
        .join(frontier.withColumnRenamed("node", "_s").select("_s"), "_s")
        .select(col("_d").as("node")).distinct()
        .join(dist.select("node"), Seq("node"), "left_anti")
        .withColumn("hops", lit(h.toLong))
        .transform(Checkpoint.apply)
      dist = dist.union(reached)
      frontier = reached
    }
    dist
  }

  /** Large-star/small-star connected components (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SOCC'14) — the
    * adversarial-diameter path [[connectedComponents]]'s docstring
    * points at. Hash-min needs DIAMETER rounds (a 10⁶-node chain — a
    * crawl frontier, a reply thread — needs 10⁶ shuffles); star
    * contraction doubles the pointer-jump per round and converges in
    * O(log n) rounds on ANY shape. Same per-round primitive cost — one
    * min-aggregate + one join over O(E) rows, no collect_list (a hub's
    * neighborhood never materializes as one array) — so it's strictly
    * the safer default when the graph shape is unknown.
    *
    * Each round: large-star points every neighbor v > u at
    * m = min(Γ(u) ∪ {u}); small-star re-points each node's
    * smaller-or-equal neighbors (and itself) at m. Both preserve
    * connectivity exactly (proof in the paper); the fixpoint is a
    * forest of stars rooted at component minima. Edges stay in
    * canonical (min, max) orientation; the bit_xor checksum over the
    * canonical edge set detects the fixpoint in one scalar agg. */
  def starContractionComponents(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    require(nodes.columns.length == 1, "nodes must have exactly one column")
    require(edges.columns.length == 2, "edges must have exactly (src, dst)")
    val Seq(srcC, dstC) = edges.columns.toSeq
    def canon(df: DataFrame): DataFrame = df
      .select(least(col("_a"), col("_b")).as("_a"),
        greatest(col("_a"), col("_b")).as("_b"))
      .filter(col("_a") =!= col("_b")).distinct()

    var e = canon(edges.select(col(srcC).as("_a"), col(dstC).as("_b")))
      .transform(Checkpoint.lazily) // materialized by the first checksum

    def checksum(df: DataFrame): Long =
      df.agg(coalesce(expr("bit_xor(xxhash64(_a, _b))"), lit(0L)))
        .head.getLong(0)

    def largeStar(e: DataFrame): DataFrame = {
      val nbr = e.select(col("_a").as("_u"), col("_b").as("_v"))
        .union(e.select(col("_b").as("_u"), col("_a").as("_v")))
      val m = nbr.groupBy("_u")
        .agg(min("_v").as("_mv"))
        .select(col("_u"), least(col("_mv"), col("_u")).as("_m"))
      canon(nbr.join(m, "_u").filter(col("_v") > col("_u"))
        .select(col("_v").as("_a"), col("_m").as("_b")))
    }

    def smallStar(e: DataFrame): DataFrame = {
      // canonical _a < _b ⇒ every edge is already (smaller, larger):
      // direct it larger→smaller and re-point each node's small side
      val dir = e.select(col("_b").as("_u"), col("_a").as("_v"))
      val m = dir.groupBy("_u").agg(min("_v").as("_m")) // _m < _u always
      canon(dir.join(m, "_u")
        .select(col("_v").as("_a"), col("_m").as("_b"))
        .union(m.select(col("_u").as("_a"), col("_m").as("_b"))))
    }

    var prev = checksum(e)
    var converged = prev == 0L // empty edge set: nothing to contract
    var round = 0
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(e)).transform(Checkpoint.lazily)
      val cur = checksum(next)
      converged = cur == prev
      prev = cur
      e = next
      round += 1
    }
    if (!converged) throw new IllegalStateException(
      s"starContractionComponents did not converge in $maxRounds rounds " +
        "— O(log n) expected; the edge set is likely growing from a bug " +
        "upstream (non-integral ids? self-loop storm?)")
    // fixpoint = stars: every non-root appears as _b exactly once with
    // _a = its component root; roots and singletons label themselves
    val lab = e.select(col("_b").as("_n"), col("_a").as("_lab"))
      .groupBy("_n").agg(min("_lab").as("_lab"))
    val nodeC = nodes.columns.head
    nodes.join(lab, nodes(nodeC) === lab("_n"), "left")
      .select(col(nodeC), coalesce(col("_lab"), col(nodeC)).as("component"))
  }

  /** L2g — documents clustered by transitive n-gram-Jaccard near-dup
    * candidacy: edges from `Dedup.ngramJaccardPairs` (blocked on
    * `blockCol`), components over ALL docs (singletons keep their own
    * id), plus the cluster size — the "what would dedup delete" report.
    * Scale note: the edge stage inherits ngramJaccardPairs'
    * block-quadratic semantics (11-17x at 10x data, r16 sf1) — at
    * corpus scale generate edges from `Dedup.minHashNearDups` (banded
    * candidates + exact verify) and cluster those instead.
    */
  def dedupClusters(docs: DataFrame, blockCol: String, n: Int = 3,
      threshold: Double = 0.2, star: Boolean = false): DataFrame = {
    val edges = Dedup.ngramJaccardPairs(docs, blockCol, n, threshold)
      .select(col("a_id"), col("b_id"))
    // `star` swaps the label-propagation kernel for the O(log n)-round
    // star contraction — value-identical (ComponentsSpec equivalence),
    // preferred when cluster chains can be long
    val ccFn: (DataFrame, DataFrame) => DataFrame =
      if (star) starContractionComponents(_, _, 50)
      else connectedComponents(_, _, 50)
    val cc = ccFn(docs.select(col("doc_id")), edges)
      .withColumnRenamed("component", "cluster_id")
    cc.withColumn("cluster_size",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster_id"))).cast("long"))
  }

  /** Capstone — ENTITY RESOLUTION over a free-text name column: the
    * classic record-linkage pipeline composed from this library's own
    * parts. Variants of one real-world entity (typo'd SSIDs, vendor
    * name spellings) are linked by blocked edit distance
    * ([[Dedup.editDistancePairs]]: first-token block + length band +
    * thresholded DP — never all-pairs), made transitive by
    * [[connectedComponents]] over the VOCABULARY graph (nodes =
    * distinct strings, corpus-size-independent), and each entity gets
    * a deterministic canonical form — its most frequent variant, ties
    * toward the lexicographic minimum — via one map-combinable
    * min-struct aggregate.
    *
    * Shape at 100 TB: everything after the first groupBy is
    * vocabulary-sized. The corpus contributes one exchange (variant →
    * count); linking, clustering, and canonical election never touch
    * corpus rows again, and applying the resolution back IS a
    * broadcast join of the (variant → canonical) table. Returns one
    * row per variant: (variant, n, entity_id, canonical, n_variants,
    * entity_n). */
  def resolveEntities(df: DataFrame, valueCol: String,
      maxDist: Int = 2): DataFrame = {
    val vocab = df.groupBy(col(valueCol).as("variant"))
      .agg(count(lit(1)).as("n"))
    val pairs = Dedup.editDistancePairs(df, valueCol, maxDist)
      .select(col("a_val"), col("b_val"))
    val cc = connectedComponents(vocab.select("variant"), pairs)
      .withColumnRenamed("component", "entity_id")
    val labeled = vocab.join(cc, "variant")
    val entities = labeled.groupBy("entity_id")
      .agg(count(lit(1)).as("n_variants"), sum("n").as("entity_n"),
        min(struct((-col("n")).as("_neg"), col("variant").as("_v"))).as("_c"))
      .select(col("entity_id"), col("_c._v").as("canonical"),
        col("n_variants"), col("entity_n"))
    labeled.join(entities, "entity_id")
      .select(col("variant"), col("n"), col("entity_id"), col("canonical"),
        col("n_variants"), col("entity_n"))
  }

  /** The APPLY step of near-dup dedup: one representative per cluster —
    * highest `quality` (caller-supplied, higher is better: length,
    * quality score, recency…), ties broken toward the smallest doc_id
    * so the choice is deterministic. One map-combinable max-struct
    * aggregate per cluster (never a window over the corpus): the
    * shuffle carries (cluster_id, quality, doc_id) triples only.
    * Returns (cluster_id, rep_doc_id, rep_quality, n_members); join
    * the corpus on rep_doc_id (left-semi) to materialize the deduped
    * corpus itself. */
  def clusterRepresentatives(docs: DataFrame, blockCol: String,
      quality: org.apache.spark.sql.Column, n: Int = 3,
      threshold: Double = 0.2): DataFrame = {
    val clusters = dedupClusters(docs, blockCol, n, threshold)
      .select("doc_id", "cluster_id")
    clusters
      .join(docs.select(col("doc_id"), quality.cast("long").as("_q")), "doc_id")
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("_q"), (-col("doc_id")).as("_nid"))).as("_m"))
      .select(col("cluster_id"), (-col("_m._nid")).as("rep_doc_id"),
        col("_m._q").as("rep_quality"), col("n_members"))
  }
}
