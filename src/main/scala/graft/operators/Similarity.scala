package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** L3 — similarity search over an embedding column (SURVEY.md §2.10).
  *
  * Baseline: exact brute-force top-k — broadcast the (small) query set
  * against the (huge) corpus, so the corpus is scanned ONCE and its
  * embedding column never shuffles; the only exchange carries slim
  * (query_id, cand_id, sim) triples into the per-query rank.
  *
  * Scale path: random-hyperplane LSH bucketing — corpus bucketed once at
  * write time, queries probe only their own bucket (equi-join on bucket
  * id), turning O(|Q|·|C|) into O(|Q|·|C|/2^bits) with recall traded by
  * `bits`. IVF-style coarse quantization is the same plan shape with a
  * learned centroid argmin as the bucket function.
  */
object Similarity {

  /** Exact brute-force cosine top-k: every query vs every candidate.
    * `queries` must be broadcast-small (the usual ANN-serving shape). */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = candidates.select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val scored = c.join(broadcast(q))
      .select(col("qid"), col("cid"),
        round(graft.functions.expressions.VectorExpressions.cosineSim(col("qv"), col("cv")), 4).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** L3g — retrieval evaluation: score a CANDIDATE ranking against a
    * TRUTH ranking (both (qid, cid, rank), ranks 1..k; deeper rows are
    * ignored). Per query: n_truth, n_hits, recall@k, the candidate
    * rank of the first relevant item, and its reciprocal (MRR's
    * per-query term; NULL when nothing relevant surfaced — unknowable,
    * not zero). The offline-eval harness for every ANN/ranking ladder:
    * exact-vs-approximate recall, metric-choice drift (dot vs cosine),
    * index-regression gates. Deliberately rational-only (counts and
    * single divisions — no nDCG log-sums whose float accumulation
    * order differs across engines), so the whole report is
    * engine-replayable.
    *
    * Shape: one equi join on (qid, cid) + two key-sized aggregates —
    * the eval costs less than either ranking did. */
  def rankingMetrics(truth: DataFrame, candidate: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val t = truth.filter(col("rank") <= k).select(col("qid"), col("cid"))
    val c = candidate.filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank").as("_crank"))
    val hits = t.join(c, Seq("qid", "cid"))
      .groupBy("qid")
      .agg(count(lit(1)).as("n_hits"), min("_crank").as("first_hit_rank"))
    t.groupBy("qid").agg(count(lit(1)).as("n_truth"))
      .join(hits, Seq("qid"), "left_outer")
      .select(col("qid"), col("n_truth"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (round(coalesce(col("n_hits"), lit(0L)).cast("double")
          / col("n_truth"), 4) + 0.0).as("recall"),
        col("first_hit_rank"),
        (round(try_divide(lit(1.0), col("first_hit_rank").cast("double")), 4)
          + 0.0).as("rr"))
  }

  /** Approximate top-k via random-hyperplane LSH with multiprobe:
    * candidates bucketed by `bits`-bit signature; each query probes its
    * own bucket plus all 1-bit-flip neighbors (recall boost without
    * touching the corpus layout). Only bucket-matched pairs are scored. */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      bits: Int = 8, dim: Int = 64): DataFrame = {
    val c = candidates.select(col("vec_id").as("cid"), col("embedding").as("cv"),
      rhpBucket(col("embedding"), bits, dim).as("bucket"))
    val qb = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"),
      rhpBucket(col("embedding"), bits, dim).as("b0"))
    // multiprobe: home bucket + 1-bit flips. The probe values of one
    // query are all DISTINCT and each candidate has exactly one bucket,
    // so a (qid,cid) pair can match at most once — no dedup aggregate
    // needed (an agg here would add a full wide shuffle for nothing).
    // broadcast(probes): the query side is small; without the hint the
    // planner may shuffle the corpus WITH its embedding column.
    val probes = qb.select(col("qid"), col("qv"), explode(array(
      (col("b0") +: (0 until bits).map(i =>
        col("b0").bitwiseXOR(lit(1 << i)))): _*)).as("bucket"))
    val scored = c.join(broadcast(probes), "bucket")
      .select(col("qid"), col("cid"),
        round(graft.functions.expressions.VectorExpressions.cosineSim(col("qv"), col("cv")), 4).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** L3h — dimensionality-ablation report (the matryoshka-embedding
    * eval, Kusupati et al. 2022): re-rank with PREFIX-truncated vectors
    * and count, per (prefix dim, query), how many of the full-dimension
    * top-k survive. The table that decides how many dimensions a 100 TB
    * index actually needs — truncating the stored vectors is a 1/(d/D)
    * storage and bandwidth cut, and this report prices its recall cost
    * exactly. Overlap counts are integers (engine-replayable; no
    * float-mean drift); the full-dim row (d = D) reports k by
    * construction — a built-in sanity check. Plan shape: one
    * broadcast-scored ranking per dim (the [[bruteForceTopK]] shape —
    * corpus scanned once per dim, embeddings never shuffle), then one
    * slim (dim, qid, cid) join against the full-dim truth. */
  def dimAblation(queries: DataFrame, candidates: DataFrame,
      dims: Seq[Int], k: Int): DataFrame = {
    require(dims.nonEmpty, "dimAblation needs at least one prefix dim")
    require(dims.forall(_ >= 1), s"dims must be >= 1 (got $dims)")
    val full = bruteForceTopK(queries, candidates, k)
      .select(col("qid"), col("cid")).withColumn("_hit", lit(1))
    dims.map { d =>
      val qd = queries.withColumn("embedding", slice(col("embedding"), 1, d))
      val cd = candidates.withColumn("embedding", slice(col("embedding"), 1, d))
      bruteForceTopK(qd, cd, k)
        .select(lit(d).cast("long").as("dim"), col("qid"), col("cid"))
    }.reduce(_ unionByName _)
      .join(full, Seq("qid", "cid"), "left")
      .groupBy("dim", "qid")
      .agg(sum(coalesce(col("_hit"), lit(0))).cast("long").as("n_overlap"))
  }
}
