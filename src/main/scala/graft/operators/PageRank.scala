package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** G4 — PageRank over the device↔SSID "Network Tree" graph
  * (ssidentity.c:36, README.md:16-18): stationary importance of nodes
  * in the probe co-occurrence structure — which APs anchor the
  * neighborhood, which devices bridge networks. Implemented as a
  * FIXED-ITERATION, integer-quantized power iteration so the result is
  * an exact BIGINT both here and in the DuckDB oracle:
  *
  *   pr₀(v)   = 10⁶                              [micro-units]
  *   c(u→v)   = floor(prᵢ(u) · w(u,v) / W(u))    [weighted split]
  *   prᵢ₊₁(v) = floor((1−d)·10⁶) + floor(d · Σᵤ c(u→v))
  *
  * Per-edge contributions quantize to BIGINT BEFORE the per-node sum,
  * so the sum is associative-exact — distributed partial-agg order
  * cannot perturb it (a double-summed PageRank differs run to run).
  * The remaining float ops (one division, one multiply-by-d, both on
  * integers < 2⁵³) are single correctly-rounded IEEE steps, identical
  * across engines. Mass lost to floor()s and dangling nodes sinks —
  * the standard non-redistributing variant; ranks are comparative, not
  * a probability simplex.
  *
  * Scale shape (SURVEY §4): the loop is UNROLLED into one lazy plan —
  * each iteration is one equi join (edges ⋈ ranks on src — both sides
  * hash-partitioned on the same key, so AQE reuses the exchange) and
  * one map-combined sum on dst. No collect, no driver round-trips, no
  * per-node arrays: state per iteration is one (node, rank) row per
  * node. At 100 TB the edge table is the static side — pre-bucket it
  * by src once and every iteration's join is shuffle-free on that
  * side; rank tables are |V|-sized, ≪ |E|.
  */
object PageRank {

  /** `iters` weighted power-iteration steps over a directed weighted
    * edge list. Returns (node, pr_u: BIGINT micro-units). Nodes appear
    * if they occur as src or dst of any edge.
    *
    * The static sides — node list and out-weighted edges — are
    * materialized ONCE via [[Checkpoint]] before the loop unrolls:
    * without it every iteration's plan re-derives them from the raw
    * input (an iters-deep DAG rescans the source ~3·iters times; the
    * iterative-algorithm discipline GraphX/ALS apply). The strategy is
    * session-selected: localCheckpoint locally, reliable checkpoint at
    * fleet scale (set graft.checkpoint.reliable=true + a checkpoint
    * dir) so executor loss cannot forfeit the materialized rounds. */
  def pageRankFixed(edges: DataFrame, src: String, dst: String,
      weight: String, iters: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1 (got $iters)")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1) (got $damping)")
    val e = edges.select(col(src).as("src"), col(dst).as("dst"),
      col(weight).cast("long").as("w"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .transform(Checkpoint.lazily)
    // out-weight per source, attached to the edge once (reused verbatim
    // by every unrolled iteration)
    val outW = e.groupBy("src").agg(sum("w").as("wout"))
    // hash-partition the static side on the join key BEFORE the
    // checkpoint (localCheckpoint preserves partitioning metadata):
    // every unrolled iteration then shuffles only the |V|-sized rank
    // table into place — the big side never re-exchanges
    val ew = e.join(outW, "src").repartition(col("src")).transform(Checkpoint.lazily)
    val baseU = math.floor((1.0 - damping) * 1000000.0).toLong

    var ranks = nodes.withColumn("pr_u", lit(1000000L))
    for (_ <- 1 to iters) {
      val inMass = ew
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          floor(col("pr_u").cast("double") * col("w") / col("wout"))
            .cast("long").as("c"))
        .groupBy("node").agg(sum("c").as("m"))
      ranks = nodes.join(inMass, Seq("node"), "left_outer")
        .select(col("node"),
          (lit(baseU) + floor(lit(damping) * coalesce(col("m"), lit(0L)))
            .cast("long")).as("pr_u"))
    }
    ranks
  }

  /** Personalized PageRank: identical integer-quantized power iteration,
    * but the restart mass lands ONLY on the `seeds` node set —
    *
    *   pr₀(v)   = 10⁶ · [v ∈ S]
    *   prᵢ₊₁(v) = [v ∈ S]·floor((1−d)·10⁶) + floor(d · Σᵤ c(u→v))
    *
    * so ranks measure proximity to the seeds (the "devices like these" /
    * "networks around this watchlist" query — README.md:16-19's
    * interest correlation, seeded). Nodes a seed's mass never reaches
    * in `iters` hops rank exactly 0 — a reachability proof, not an
    * artifact. Ranks are comparative (floors and dangling nodes sink
    * mass), as in [[pageRankFixed]].
    *
    * Scale shape: `seeds` is a node subset (watchlist-sized) —
    * broadcast into the flag join; everything else is the same
    * unrolled equi-join/aggregate plan with the static edge side
    * hash-partitioned once. */
  def personalizedPageRankFixed(edges: DataFrame, src: String, dst: String,
      weight: String, seeds: DataFrame, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1 (got $iters)")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1) (got $damping)")
    require(seeds.columns.contains("node"),
      "seeds must have a 'node' column (the restart set)")
    val e = edges.select(col(src).as("src"), col(dst).as("dst"),
      col(weight).cast("long").as("w"))
    val sd = seeds.select(col("node")).distinct()
      .withColumn("_seed", lit(true))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(broadcast(sd), Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("_seed"), lit(false)).as("is_seed"))
      .transform(Checkpoint.lazily)
    val outW = e.groupBy("src").agg(sum("w").as("wout"))
    val ew = e.join(outW, "src").repartition(col("src")).transform(Checkpoint.lazily)
    val baseU = math.floor((1.0 - damping) * 1000000.0).toLong

    var ranks = nodes.select(col("node"),
      when(col("is_seed"), lit(1000000L)).otherwise(lit(0L)).as("pr_u"))
    for (_ <- 1 to iters) {
      val inMass = ew
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          floor(col("pr_u").cast("double") * col("w") / col("wout"))
            .cast("long").as("c"))
        .groupBy("node").agg(sum("c").as("m"))
      ranks = nodes.join(inMass, Seq("node"), "left_outer")
        .select(col("node"),
          (when(col("is_seed"), lit(baseU)).otherwise(lit(0L))
            + floor(lit(damping) * coalesce(col("m"), lit(0L)))
              .cast("long")).as("pr_u"))
    }
    ranks
  }
}
