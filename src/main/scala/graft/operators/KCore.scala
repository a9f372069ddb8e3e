package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** G9 — k-core decomposition by synchronous peeling (Seidman 1983; the
  * co-occurrence-graph "dense habitual cluster" extractor the
  * reference's correlation analytics imply, `README.md:16-19`): repeat
  * "drop every node with degree < k, and its edges" until fixpoint —
  * what remains is the k-core, the maximal subgraph where every member
  * keeps ≥ k neighbors INSIDE the subgraph. Degree alone over-counts
  * (a hub of leaves is not a community); the peeling is what makes the
  * density claim transitive.
  *
  * Fixed `rounds` unrolled peels — one lazy plan, replayable (the
  * pageRankFixed posture). Peeling only REMOVES nodes, so the result
  * after R rounds is a superset of the true k-core that shrinks
  * monotonically; `stable` in the output marks whether the last round
  * changed nothing (fixpoint reached — the report says so instead of
  * silently truncating, the no-silent-caps rule).
  *
  * 100 TB shape: per round, one map-combined degree aggregate plus two
  * semi joins keyed on the node — survivor sets are node-sized, edges
  * re-filter in place; each round's edge set goes through
  * [[Checkpoint]] so the unrolled lineage doesn't re-execute prior
  * rounds' joins. `edges` must contain both directions (the caller
  * symmetrizes, as with [[PageRank]]/[[LabelPropagation]]).
  */
object KCore {

  def kCoreFixed(edges: DataFrame, src: String, dst: String, k: Int,
      rounds: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    require(rounds >= 1, s"rounds must be >= 1 (got $rounds)")
    // EAGER checkpoints, deliberately (measured r16): each round's edge
    // set feeds THREE consumers (the degree aggregate and both semi-join
    // probe sides), and a lazy unroll let those stages race to compute
    // the same un-cached blocks repeatedly inside the one final job —
    // min-of-4 6.68 s lazy vs 2.74 s eager. The bfsHops lesson applies
    // wherever a lazily-checkpointed frame has >1 consumer in the same
    // action.
    var e = edges.select(col(src).as("src"), col(dst).as("dst"))
      .repartition(col("src")).transform(Checkpoint.apply)
    for (_ <- 1 to rounds) {
      val keep = e.groupBy("src").agg(count(lit(1)).as("_deg"))
        .filter(col("_deg") >= k).select("src")
      e = e.join(keep, Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
        .transform(Checkpoint.apply)
      ()
    }
    // one more degree pass decides stability: a node below k after the
    // final round means the peel had not converged
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))
    val anyUnstable = deg.agg(
      max(when(col("degree") < k, 1L).otherwise(0L)).as("_u"))
    deg.crossJoin(broadcast(anyUnstable))
      .select(col("node"), col("degree"), (col("_u") === 0L).as("stable"))
  }
}
