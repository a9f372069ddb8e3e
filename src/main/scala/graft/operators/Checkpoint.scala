package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared lineage-cut strategy for iterative operators (PageRank,
  * Components): every round must materialize its result, or the unrolled
  * plan re-derives round k from round 0 and grows without bound.
  *
  * Two postures, selected per session by `graft.checkpoint.reliable`:
  *   - false (default): `localCheckpoint` — blocks live on executors,
  *     no external storage needed, fastest. A lost executor forfeits
  *     the blocks (the job retries from the source): the right trade
  *     on a single node / local[n], and for short jobs where re-running
  *     beats provisioning a checkpoint dir.
  *   - true: reliable `checkpoint` — blocks persist to the configured
  *     `sparkContext.setCheckpointDir` (HDFS/object store at fleet
  *     scale), so a 40-round components job on 1000 executors cannot
  *     lose round 39 to one preemption. Callers opt in once per
  *     session; the operators never need to know.
  */
object Checkpoint {
  val ReliableConfKey = "graft.checkpoint.reliable"

  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.getOption(ReliableConfKey).exists(_.toBoolean)) {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableConfKey=true needs sparkContext.setCheckpointDir " +
          "(an HDFS/object-store path the whole cluster can reach)")
      df.checkpoint()
    } else df.localCheckpoint()
  }

  /** Non-eager variant (r16, guide §1/§2: fewer actions = fewer
    * sequential job barriers). Same lineage cut — the plan downstream
    * of this call is a shallow scan-of-blocks either way — but the
    * materialization happens inside the CALLER'S next action instead of
    * an extra job here. Use when an action immediately follows (a
    * convergence checksum, a final aggregate): an iterative loop then
    * costs ONE job per round instead of two, and a fixed unroll
    * (kCoreFixed, bfsHops) collapses to a single job whose stages
    * materialize each round's blocks exactly once. Semantics are
    * identical; only job-boundary placement changes. */
  def lazily(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.getOption(ReliableConfKey).exists(_.toBoolean)) {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableConfKey=true needs sparkContext.setCheckpointDir " +
          "(an HDFS/object-store path the whole cluster can reach)")
      df.checkpoint(eager = false)
    } else df.localCheckpoint(eager = false)
  }
}
