package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §4 / 100 TB posture). Probe-request data is
  * power-law by nature — a mall sensor hears 1000× the devices of a
  * lamppost, one chatty MAC floods its key — so the wide shuffles behind
  * A1/A2/J1-style operators need a plan for hot keys. AQE's skew-join
  * handling covers sort-merge joins at runtime; these utilities cover
  * the aggregation side and broadcast-averse joins deterministically.
  */
object Skew {

  /** Deterministic row-content salt. spark_partition_id/
    * monotonically_increasing_id would be cheaper but are NOT stable
    * under recomputation: a fetch-failure retry (SPARK-23207 class)
    * could re-salt rows some reducers already consumed, double-counting
    * or dropping them. Hashing the row's own columns re-derives the
    * identical salt on every replay. Fully duplicate rows share a salt
    * — still correct, just slightly less spread on degenerate data.
    * Map-typed columns are excluded (xxhash64 rejects MapType at
    * analysis); a schema with ONLY map columns degrades to one salt —
    * correct, just unspread. */
  private def rowSalt(df: DataFrame, buckets: Int): Column = {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case a: ArrayType => hasMap(a.elementType)
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case _ => false
    }
    val cols = df.schema.fields.filterNot(f => hasMap(f.dataType)).map(f => col(f.name))
    if (cols.isEmpty) lit(0L) else pmod(xxhash64(cols.toIndexedSeq: _*), lit(buckets))
  }

  /** Two-phase (salted) aggregation: count per key without any single
    * reducer owning a hot key. Phase 1 groups on (key, salt) — the hot
    * key's rows spread over `buckets` reducers and partial-aggregate
    * map-side; phase 2 sums the per-salt partials. Result is exactly
    * groupBy(key).count(). */
  def saltedCount(df: DataFrame, key: String, buckets: Int = 16): DataFrame =
    df.withColumn("_salt", rowSalt(df, buckets))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum("_partial").as("n"))

  /** Salted distinct-count: exact countDistinct(valueCol) per key under
    * skew. Phase 1 dedups (key, value) pairs spread by value hash —
    * a hot KEY no longer serializes on one reducer because the shuffle
    * key is (key, value-hash-salt); phase 2 counts survivors. */
  def saltedCountDistinct(df: DataFrame, key: String, valueCol: String,
      buckets: Int = 16): DataFrame =
    df.select(col(key), col(valueCol))
      .withColumn("_salt", pmod(xxhash64(col(valueCol)), lit(buckets)))
      .groupBy(col(key), col("_salt"))
      .agg(collect_set(col(valueCol)).as("_vals"))
      .groupBy(col(key))
      .agg(sum(size(col("_vals"))).cast("long").as("n_distinct"))

  /** Salted join for a skewed LEFT side against a small-ish right side
    * that is still too big (or unwanted) to broadcast: left rows get a
    * deterministic row-content salt in [0, buckets), the right side is
    * replicated once per salt value, and the join key becomes
    * (key, salt) — a hot left key now spreads across `buckets`
    * reducers. Row-for-row identical to the unsalted inner join. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn("_salt", rowSalt(left, buckets))
    val replicatedRight = right.crossJoin(
      spark_range(right.sparkSession, buckets).toDF("_salt"))
    saltedLeft.join(replicatedRight,
        saltedLeft(key) === replicatedRight(key) &&
          saltedLeft("_salt") === replicatedRight("_salt"))
      .drop(replicatedRight(key))
      .drop(saltedLeft("_salt")).drop(replicatedRight("_salt"))
  }

  private def spark_range(spark: org.apache.spark.sql.SparkSession, n: Int) =
    spark.range(n)

  /** A20 — the skew DIAGNOSIS next to the mitigations above: per group,
    * how concentrated is the key distribution that a join or groupBy on
    * `key` would shuffle? Reports exact integer ppm figures — top-key
    * share and the Gini coefficient via the sorted-rank closed form
    *   G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx),   i = ascending rank —
    * which is tie-order-invariant (equal x contribute the same Σ i·x
    * under any rank order), so the result is deterministic and
    * engine-replayable with no floats until nothing is left to round.
    *
    * Cost: one map-combined (group, key) count — the same exchange the
    * diagnosed operation would pay — then a rank window over the KEY
    * table (key-cardinality rows, not data rows) and a final
    * group-sized aggregate. Run it BEFORE the 100 TB join; read
    * gini_ppm ≳ 600k or top_share_ppm ≳ 10k as "salt this key"
    * (see saltedJoin/saltedCount above). */
  def skewReport(df: DataFrame, group: Seq[String], key: Column): DataFrame = {
    val counts = df.groupBy(group.map(col) :+ key.as("_k"): _*)
      .agg(count(lit(1)).as("_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group.map(col): _*).orderBy(col("_n"), col("_k"))
    counts
      .withColumn("_i", row_number().over(w).cast("long"))
      .groupBy(group.map(col): _*)
      .agg(count(lit(1)).as("n_keys"), sum("_n").as("n_rows"),
        max("_n").as("max_key_rows"),
        sum(col("_i") * col("_n")).as("_sin"))
      .select(group.map(col) :+ col("n_keys") :+ col("n_rows") :+
        col("max_key_rows") :+
        expr("(1000000 * max_key_rows) DIV n_rows").as("top_share_ppm") :+
        expr("(1000000 * (2 * _sin - (n_keys + 1) * n_rows)) DIV (n_keys * n_rows)")
          .as("gini_ppm"): _*)
  }

  /** Q8 — the PHYSICAL complement of [[skewReport]]: what each reducer
    * partition of an `Exchange hashpartitioning(key, nParts)` would
    * actually carry — rows, distinct keys, and the heaviest key with
    * its share — so "will any one partition blow executor memory at
    * 100 TB" is answered by a report, not an OOM. Reading it: ragged
    * `n_rows` across buckets with `n_keys ≫ 1` means raise
    * `spark.sql.shuffle.partitions`; a bucket whose `top_share_ppm`
    * approaches 10⁶ is one hot KEY (no partition count fixes that —
    * salt it, see [[saltedCount]]/[[saltedJoin]]).
    *
    * The partitioner proxy is the engine-replayable md5 gate
    * ([[Sampling.hashGate]]) — same balance properties as the real
    * Murmur3 exchange for a uniform family, but bit-replayable by any
    * engine (Murmur3/xxhash64 are not portable oracle material).
    * Cost: one map-combined (bucket, key) count — strictly cheaper
    * than the exchange it predicts — then a window over the key table
    * and a bucket-sized aggregate. Output is nParts rows. */
  /** Q9 — pre-join cardinality probe: the EXACT output size an inner
    * equi join would produce, decomposed by key — Σ_k n_left(k)·n_right(k)
    * — plus each key's share, BEFORE paying for the join. The advisor
    * for the two failure modes a 100 TB join hits: a few keys owning
    * most of the output (salt them / AQE skew join) and an output
    * orders of magnitude above either input (re-think the join).
    * Cost: one map-combined count per side, then an equi join of the
    * two KEY tables (key-cardinality rows, not data rows) and a rank —
    * strictly cheaper than the join it predicts. Returns the top
    * `topK` contributing keys (share in ppm of the exact total, which
    * every row carries in `total_out_rows`); keys absent from either
    * side contribute nothing and are omitted. */
  def joinCardinality(left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column, topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1 (got $topK)")
    val lc = left.groupBy(leftKey.cast("string").as("key"))
      .agg(count(lit(1)).as("n_left"))
    val rc = right.groupBy(rightKey.cast("string").as("key"))
      .agg(count(lit(1)).as("n_right"))
    val contrib = lc.join(rc, "key")
      .select(col("key"), col("n_left"), col("n_right"),
        (col("n_left") * col("n_right")).as("out_rows"))
    // the exact total: a 1-row bounded aggregate (the DSIR-λ idiom)
    val total = contrib.agg(coalesce(sum("out_rows"), lit(0L)).as("t"))
      .head().getLong(0)
    contrib
      .orderBy(col("out_rows").desc, col("key"))
      .limit(topK)
      .withColumn("share_ppm",
        // through DECIMAL(38,0): out_rows can approach Long.MaxValue
        // (this probe EXISTS to catch output explosions), and
        // 1000000 * out_rows in long arithmetic silently wraps for
        // exactly the hottest keys — 128-bit intermediate, then the
        // exact integral divide back to a ≤10⁶ long
        if (total == 0L) lit(0L)
        else expr("CAST((CAST(out_rows AS DECIMAL(38,0)) * 1000000) DIV " +
          s"CAST(${total}L AS DECIMAL(38,0)) AS BIGINT)"))
      .withColumn("total_out_rows", lit(total))
  }

  def partitionProbe(df: DataFrame, key: Column, nParts: Int = 32,
      salt: String = "p0"): DataFrame = {
    require(nParts >= 1, s"nParts must be >= 1 (got $nParts)")
    val counts = df.groupBy(
        pmod(Sampling.hashGate(key, salt), lit(nParts.toLong)).as("bucket"),
        key.cast("string").as("_k"))
      .agg(count(lit(1)).as("_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("_n").desc, col("_k"))
    counts.withColumn("_rn", row_number().over(w))
      .groupBy("bucket")
      .agg(sum("_n").as("n_rows"), count(lit(1)).as("n_keys"),
        max(when(col("_rn") === 1, col("_k"))).as("top_key"),
        max(when(col("_rn") === 1, col("_n"))).as("top_key_rows"))
      .withColumn("top_share_ppm",
        // same 128-bit widening as joinCardinality's share_ppm: a
        // single partition of a 100 TB exchange can carry >9.2e12 rows
        expr("CAST((CAST(top_key_rows AS DECIMAL(38,0)) * 1000000) DIV " +
          "CAST(n_rows AS DECIMAL(38,0)) AS BIGINT)"))
  }
}
