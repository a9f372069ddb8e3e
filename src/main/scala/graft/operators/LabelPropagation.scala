package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** G8 — label-propagation community detection (Raghavan et al. 2007)
  * over the co-observation graph (`README.md:16-19` declares interest/
  * habit correlation; communities of devices and networks that keep
  * appearing together are its graph-native form).
  *
  * SYNCHRONOUS schedule with a deterministic tie-break, so the result
  * is a pure function of the graph — async LPA (the paper's default)
  * is visit-order-dependent, which an oracle-checked engine cannot
  * ship. Each round every node adopts the label with the greatest
  * summed incident edge weight among its neighbors, ties broken by the
  * smallest label:
  *
  *   lab₀(v)   = v
  *   labᵢ₊₁(v) = lab of min over neighbor labels of (−Σw, lab)
  *
  * Fixed `iters` rounds — convergence detection would be a per-round
  * driver-side action; a fixed unroll is one lazy plan, replayable and
  * bounded (the pageRankFixed posture; oscillation on bipartite graphs
  * makes "run to convergence" ill-defined for sync LPA anyway).
  *
  * 100 TB shape: per round, one edges⋈labels equi join plus two
  * map-combined aggregates keyed on the node. The (node, label)
  * partial aggregate collapses parallel edges and label multiplicity
  * BEFORE the node-level argmin — shuffle volume is bounded by label
  * diversity per node, not edge count. The static edge side is
  * hash-partitioned on src once and materialized via [[Checkpoint]]
  * (local blocks here; reliable dir at fleet scale): every unrolled
  * round re-exchanges only the |V|-sized label table.
  */
object LabelPropagation {

  /** `edges` must already contain both directions for an undirected
    * graph (the caller symmetrizes, as with [[PageRank]]). Returns
    * (node, lab) after `iters` synchronous rounds. */
  def labelPropagationFixed(edges: DataFrame, src: String, dst: String,
      weight: String, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1 (got $iters)")
    val e = edges.select(col(src).as("src"), col(dst).as("dst"),
        col(weight).cast("long").as("w"))
      .repartition(col("src")).transform(Checkpoint.lazily)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .transform(Checkpoint.lazily)
    var labels = nodes.withColumn("lab", col("node"))
    for (_ <- 1 to iters) {
      val best = e
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"), col("lab"))
        .agg(sum("w").as("lw"))
        // argmin of (−weight, label): max weight, then smallest label —
        // a single aggregate, no per-node window
        .groupBy(col("dst"))
        .agg(min(struct((-col("lw")).as("nw"), col("lab"))).as("top"))
        .select(col("dst").as("node"), col("top.lab").as("_nl"))
      // isolated nodes (none, once symmetrized — but stay honest for
      // directed inputs) keep their previous label
      labels = labels.join(best, Seq("node"), "left_outer")
        .select(col("node"), coalesce(col("_nl"), col("lab")).as("lab"))
    }
    labels
  }

  /** G10 — Newman modularity of a node partition (Newman & Girvan
    * 2004): the standard quality score for the communities
    * [[labelPropagationFixed]] emits — "how much denser inside the
    * communities than a degree-preserving random rewiring". Per
    * community c over the UNDIRECTED weighted graph (W = Σw total
    * weight, d_c = summed weighted degree, w_in = internal weight):
    *
    *   Q = Σ_c [ w_in_c/W − (d_c/2W)² ] = Σ_c q_num_c / (4W²),
    *   q_num_c = 4·W·w_in_c − d_c²
    *
    * The EXACT integer numerator `q_num` ships next to its root
    * `w_total` instead of the float ratio, so the score replays
    * bit-exact in any engine (Q itself is one division away;
    * overflow-safe while 4W² fits a long — beyond that, pre-scale
    * the weights).
    *
    * `und` carries each undirected edge ONCE (src, dst, weight);
    * `labels` is (node, lab) covering both endpoints. Cost: one
    * labels⋈edges equi join per endpoint + three map-combined
    * aggregates keyed on community — output is O(communities). The
    * label table is checkpointed once (it is usually an iterative
    * LPA plan; four consumers must not replay it). */
  def modularity(und: DataFrame, src: String, dst: String, weight: String,
      labels: DataFrame): DataFrame = {
    val e = und.select(col(src).as("src"), col(dst).as("dst"),
      col(weight).cast("long").as("w"))
    val lab = labels.select(col("node"), col("lab")).transform(Checkpoint.lazily)
    // 1-row bounded model collect (the DSIR-λ idiom): the total weight
    val totalW = e.agg(coalesce(sum("w"), lit(0L)).as("tw")).head().getLong(0)
    val win = e
      .join(lab.select(col("node").as("src"), col("lab").as("sl")), "src")
      .join(lab.select(col("node").as("dst"), col("lab").as("dl")), "dst")
      .filter(col("sl") === col("dl"))
      .groupBy(col("sl").as("lab")).agg(sum("w").as("w_in"))
    val deg = e.select(col("src").as("node"), col("w"))
      .union(e.select(col("dst").as("node"), col("w")))
      .join(lab, "node").groupBy("lab").agg(sum("w").as("degw"))
    val sizes = lab.groupBy("lab").agg(count(lit(1)).as("n_nodes"))
    sizes.join(deg, Seq("lab"), "left_outer")
      .join(win, Seq("lab"), "left_outer")
      .select(col("lab"), col("n_nodes"),
        coalesce(col("degw"), lit(0L)).as("degw"),
        coalesce(col("w_in"), lit(0L)).as("w_in"))
      .withColumn("q_num",
        lit(4L) * lit(totalW) * col("w_in") - col("degw") * col("degw"))
      .withColumn("w_total", lit(totalW))
  }
}
