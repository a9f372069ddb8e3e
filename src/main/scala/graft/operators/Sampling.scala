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
