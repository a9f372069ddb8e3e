package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic (hash-gate) sampling — the reproducible alternative to
  * `df.sample()` for training-data pipelines. Bernoulli `rand()`
  * sampling changes row sets across retries, partitionings, and
  * engines; a content-addressed gate — keep a row iff
  * `uint32(md5(key || salt)[0:8]) < fraction · 2³²` — selects the SAME
  * rows everywhere, so a 100 TB curation run can be resumed, sharded,
  * or re-verified without drift, and downstream joins against a sample
  * stay consistent. md5 (not xxhash64) so any engine can replay the
  * gate (the DuckDB oracle does). Map-only: the gate evaluates inside
  * the scan stage (codegen'd filter, no shuffle, no state).
  */
object Sampling {

  /** The gate value in [0, 2³²): first 8 hex chars of md5(key‖salt).
    * concat_ws (not concat) so a NULL key hashes as the empty string
    * rather than poisoning the gate to NULL — null-keyed rows form one
    * deterministic group (all kept or all dropped together, since they
    * share a gate value) instead of being silently dropped at every
    * fraction. */
  def hashGate(key: Column, salt: String): Column =
    conv(substring(md5(concat_ws("", key.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long")

  /** The gate threshold `fraction · 2³²` — public so the DuckDB oracle
    * builder reuses THIS arithmetic instead of re-implementing it. */
  def threshold(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0, 1] (got $fraction)")
    (fraction * 4294967296L).toLong
  }

  /** Keep ~`fraction` of rows, deterministically by `key`. Different
    * `salt` values draw independent samples from the same corpus. */
  def hashSample(df: DataFrame, key: Column, fraction: Double,
      salt: String = ""): DataFrame =
    df.filter(hashGate(key, salt) < lit(threshold(fraction)))

  /** Deterministic disjoint SPLIT assignment (train/val/test): one gate
    * draw partitions the key space by cumulative fraction — every row
    * gets exactly one label, splits are disjoint and exhaustive BY
    * CONSTRUCTION (half-open gate intervals), and membership is a pure
    * function of (key, salt): stable across runs, retries,
    * partitionings, and engines, so a 100 TB corpus can be re-split
    * identically forever. Fractions must sum to 1 (±1e-9); the last
    * split absorbs the 2³² rounding remainder. Map-only — a codegen'd
    * CASE over the scan, no shuffle. */
  def assignSplits(df: DataFrame, key: Column,
      fractions: Seq[(String, Double)], salt: String = "",
      outCol: String = "split"): DataFrame = {
    require(fractions.nonEmpty, "assignSplits needs at least one split")
    require(fractions.map(_._1).distinct.size == fractions.size,
      "split names must be unique")
    require(fractions.forall(_._2 >= 0.0), "fractions must be >= 0")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1 (got ${fractions.map(_._2).sum})")
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column")
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    val gate = hashGate(key, salt)
    // upper bounds in gate units; the final bound is 2³² exactly so the
    // otherwise() is unreachable (gate < 2³² always) — label every row
    val label = fractions.init.zip(cum.init).foldRight(
      lit(fractions.last._1)) { case (((name, _), ub), elseCol) =>
      when(gate < lit(threshold(ub)), lit(name)).otherwise(elseCol)
    }
    // nested when() evaluates in order, so each row takes the FIRST
    // bound it clears — the half-open interval of its split
    df.withColumn(outCol, label)
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-Res,
    * IPL 2006), deterministic: each row draws a reproducible uniform
    * u ∈ (0, 1] from the md5 gate and scores `u^(1/w)`; the k largest
    * scores are the sample. P(row selected) is proportional to its
    * weight — the length/token-proportional draw a training-data
    * pipeline needs ("sample 1B tokens", not "1M documents", from a
    * 100 TB corpus). Content-addressed like [[hashSample]], so the
    * sample is identical across retries, partitionings, and engines.
    *
    * Scale shape: the score is map-only (no shuffle, no state) and the
    * global top-k compiles to TakeOrderedAndProject — per-partition
    * heaps of k rows + one k-sized driver merge, never a full sort.
    * Rows with weight ≤ 0 or NULL carry zero selection mass and are
    * dropped, matching A-Res's w > 0 domain.
    *
    * Cross-engine note: pow() may differ by ulps across libm
    * implementations, which could only flip the selection if two
    * scores were within ~1 ulp — adjacent order statistics of 2³²
    * distinct gate draws are ~2⁻ⁿ · rows apart, astronomically wider.
    * Exact ties (identical key+weight) break on the key ordering. */
  def aresScore(key: Column, weight: Column, salt: String): Column =
    pow((hashGate(key, salt) + lit(1L)).cast("double") / lit(4294967296.0),
      lit(1.0) / weight.cast("double"))

  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int,
      salt: String = ""): DataFrame = {
    require(k > 0, s"sample size k must be positive (got $k)")
    require(!df.columns.contains("_ares"),
      "input already has an '_ares' column — it would be overwritten and dropped")
    df.filter(weight > lit(0))
      .withColumn("_ares", aresScore(key, weight, salt))
      .orderBy(col("_ares").desc, key)
      .limit(k)
      .drop("_ares")
  }

  /** Per-stratum A-Res: k rows per group, weight-proportional within
    * the group (balanced per-source draws). One hash exchange on the
    * group key, then a per-partition window — no global ordering. */
  def weightedSamplePerGroup(df: DataFrame, group: Column, key: Column,
      weight: Column, k: Int, salt: String = ""): DataFrame = {
    require(k > 0, s"sample size k must be positive (got $k)")
    Seq("_ares", "_rn").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column — it would be overwritten and dropped"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(col("_ares").desc, key)
    df.filter(weight > lit(0))
      .withColumn("_ares", aresScore(key, weight, salt))
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_ares", "_rn")
  }

  /** Stratified hash sample: per-stratum fractions (e.g. per-language
    * mixture weights for a training corpus), applied via a BROADCAST
    * join of the (stratum → threshold) table — no when-chain to
    * recompile per rate change, no shuffle of the fact side. Strata
    * absent from `rates` keep `defaultFraction`. */
  def stratifiedHashSample(df: DataFrame, stratum: Column, key: Column,
      rates: Map[String, Double], defaultFraction: Double = 0.0,
      salt: String = ""): DataFrame = {
    Seq("_stratum", "_thresh").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column — it would collide with the rate join"))
    val spark = df.sparkSession
    import spark.implicits._
    val rateDf = rates.toSeq.map { case (s, f) => (s, threshold(f)) }
      .toDF("_stratum", "_thresh")
    df.join(broadcast(rateDf), stratum === col("_stratum"), "left_outer")
      .filter(hashGate(key, salt) <
        coalesce(col("_thresh"), lit(threshold(defaultFraction))))
      .drop("_stratum", "_thresh")
  }
}
