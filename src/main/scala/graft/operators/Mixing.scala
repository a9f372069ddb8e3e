package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-corpus mixing (SURVEY §2.10 EXT) — composing a multi-source
  * corpus into one training stream with controlled proportions and a
  * reproducible global order. Both operators are deterministic by
  * construction (content-addressed hashes, no RNG state), so a 100 TB
  * mixing run can be resumed, sharded, or re-verified without drift —
  * the same posture as [[Sampling]].
  */
object Mixing {

  /** Temperature-flattened source mixing (the multilingual-corpus
    * recipe: sample source s with probability ∝ n_s^T, T<1 upweighting
    * rare sources so the head doesn't drown the tail). Emits ~`targetRows`
    * rows with per-source keep rates
    *
    *   rate_s = min(1, targetRows · w_s / (n_s · Σ_t w_t)),  w_s = n_s^T
    *
    * applied through the deterministic md5 gate of [[Sampling.hashGate]].
    *
    * Fully distributed: source counts partial-aggregate map-side (the
    * source dimension is small by definition), the (source → rate) table
    * BROADCASTS back onto the fact side, and the gate filters inside the
    * scan stage — the corpus itself never shuffles.
    *
    * Cross-engine replay: weights are floored to integer micro-units
    * (`floor(n^T · 10⁶)`) so the normalizing sum is EXACT integer
    * arithmetic — a float Σ would depend on engine summation order. At
    * T = 0.5 the weight itself is also bit-exact everywhere (IEEE sqrt
    * is correctly rounded; pow is not), which is why the oracle-checked
    * query pins T = 0.5.
    */
  def temperatureMix(df: DataFrame, sourceCol: Column, key: Column,
      targetRows: Long, temperature: Double = 0.5, salt: String = ""): DataFrame = {
    require(targetRows >= 0, s"targetRows must be >= 0 (got $targetRows)")
    require(temperature > 0.0 && temperature <= 1.0,
      s"temperature must be in (0, 1] (got $temperature)")
    Seq("_mix_source", "_mix_rate").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column — it would collide with the rate join"))
    val w = if (temperature == 0.5) sqrt(col("_n")) else pow(col("_n"), temperature)
    val counts = df.groupBy(sourceCol.as("_mix_source"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_w", floor(w * lit(1000000.0)).cast("long"))
    val total = counts.agg(sum("_w").as("_w_total"))
    // n·Σw as a LONG product overflows exactly at the fleet scale this
    // targets (2e9 rows at T=0.5 → 9e19 > 2^63: ANSI abort, or a wrapped
    // negative rate that silently drops the stratum) — multiply as
    // doubles, like the numerator; the DuckDB twin does the same
    val rates = counts.crossJoin(broadcast(total))
      .select(col("_mix_source"),
        least(lit(1.0), (lit(targetRows.toDouble) * col("_w")) /
          (col("_n").cast("double") * col("_w_total").cast("double"))).as("_mix_rate"))
    // null-safe equality: a NULL source is a legitimate stratum (it was
    // counted above); plain === would silently drop those rows at the
    // join instead of sampling them at their computed rate
    df.join(broadcast(rates), sourceCol <=> col("_mix_source"), "inner")
      .filter(Sampling.hashGate(key, salt) <
        floor(col("_mix_rate") * lit(4294967296.0)).cast("long"))
      .drop("_mix_source", "_mix_rate")
  }

  /** Reproducible global shuffle — the training-order pass: every epoch
    * reads examples in a pseudo-random order that is a pure function of
    * (key, salt), so two runs (or a resumed run) see the identical
    * sequence; a new epoch is just a new salt. Built on the scale-safe
    * dense sequence ([[DenseSequence]]: range-partitioned sort +
    * per-partition offsets) — NOT a partitionless `row_number()` window,
    * which would single-task the corpus. Ties (md5 collisions) break on
    * the key itself, keeping the order total.
    */
  /** MIX — deterministic negative sampling for contrastive training:
    * k pseudo-random OTHER rows per anchor ("for every query, pick
    * negatives that are not its positive"). The naive draw is a
    * cross join + per-anchor random filter; this is the scale shape:
    * anchors get a dense position ([[DenseSequence]] — no partitionless
    * window), each (anchor, j) derives a content-addressed offset
    * off ∈ [1, N−1] from md5(salt:id:j), and the negative is the row
    * at (pos − 1 + off) mod N + 1 — ONE equi join on the position key.
    * off never hits 0 mod N, so an anchor can never draw itself; the
    * pairing is a pure function of (ids, salt, k): resumable, sharded,
    * re-verifiable, engine-replayable — no RNG state anywhere.
    *
    * Draws are uniform over the other N−1 rows (60-bit hash mod N−1;
    * bias ≤ 2⁻⁴⁰ for any corpus below a trillion rows) and sampled
    * WITH replacement across j — dedup downstream if k approaches N.
    * Needs N ≥ 2 (a 1-row corpus has no negatives — emits nothing). */
  def negativePairs(df: DataFrame, idCol: String, k: Int = 3,
      salt: String = ""): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    // the position table feeds both the anchor side and the join-back:
    // checkpoint so zipWithIndex's sort doesn't re-run per consumer
    val pos = Checkpoint(DenseSequence.withSeq(
      df.select(col(idCol)).distinct(), Seq(col(idCol)), "_pos"))
    val n = pos.agg(count(lit(1)).as("_n"))
    val anchors = pos.crossJoin(broadcast(n))
      .filter(col("_n") > 1L)
      .select(col(idCol), col("_pos"), col("_n"),
        explode(array((1 to k).map(lit): _*)).as("j"))
      .withColumn("_off", lit(1L) + pmod(
        graft.functions.TextFunctions.md5Hash60(
          concat_ws(":", lit(salt), col(idCol), col("j")), 0),
        col("_n") - 1L))
      .withColumn("_negpos",
        pmod(col("_pos") - 1L + col("_off"), col("_n")) + 1L)
    anchors.join(pos.select(col(idCol).as("negative_id"),
        col("_pos").as("_negpos")), Seq("_negpos"))
      .select(col(idCol), col("j"), col("negative_id"))
  }

  def deterministicShuffle(df: DataFrame, key: Column, salt: String = "",
      seqCol: String = "pos"): DataFrame =
    DenseSequence.withSeq(df,
      Seq(md5(concat_ws("", key.cast("string"), lit(salt))), key), seqCol)

  /** MIX6 — curriculum ordering (Bengio et al. 2009 applied to corpus
    * scheduling): a global training order that consumes difficulty
    * bands easiest-first while the order WITHIN each band stays a
    * deterministic shuffle — ramp without monotone-difficulty
    * pathologies (each band is still i.i.d.-looking). Same
    * [[DenseSequence]] machinery as [[deterministicShuffle]] with the
    * band prepended to the sort key: range-partition sort + per-
    * partition offsets, no partitionless window, position a pure
    * function of (band, key, salt) — resumable and shardable at
    * 100 TB. */
  def curriculumOrder(df: DataFrame, band: Column, key: Column,
      salt: String = "", seqCol: String = "pos"): DataFrame =
    DenseSequence.withSeq(df,
      Seq(band, md5(concat_ws("", key.cast("string"), lit(salt))), key), seqCol)

  /** MIX — token-budget allocation by water-filling: split a global
    * token budget across sources proportionally to temperature-
    * flattened weights (w_s = ⌊√n_s·10⁶⌋, the T=0.5 recipe — bit-exact
    * in every IEEE engine, unlike pow), with the surplus of sources too
    * SMALL to absorb their share redistributed among the rest. Each of
    * the `rounds` unrolled rounds gives every unsaturated source
    * min(capacity left, ⌊R·w_s/W_unsat⌋) of the remaining budget R —
    * after a few rounds the allocation is within floor-loss of the
    * fixed point (the leftover stays unallocated, never over-granted:
    * Σ alloc ≤ budget ALWAYS, and alloc_s ≤ n_s always).
    *
    * This is the planning half of [[temperatureMix]]: temperatureMix
    * decides keep-rates by ROW COUNT and caps at rate 1 without
    * redistributing the surplus; budgetAllocation plans by TOKENS and
    * re-grants what saturated sources can't take — the difference is
    * exactly what a "fill a 10 T-token training budget from 40
    * sources" pipeline needs. Feed `rate_ppm` into a
    * [[Sampling.hashGate]]-style per-source gate to materialize the
    * sampled corpus.
    *
    * Shape at 100 TB: one map-combined token sum per source (the only
    * pass over data), then all rounds run on the |sources|-row table
    * with two broadcast scalars (R, W) per round — the corpus is never
    * touched again. Zero-token sources are dropped (nothing to
    * allocate). All state is integer; the one float step per round
    * (R·w/W, two correctly-rounded IEEE ops) replays exactly in DuckDB. */
  def budgetAllocation(df: DataFrame, sourceCol: Column, tokenCol: Column,
      budget: Long, rounds: Int = 3): DataFrame = {
    require(budget >= 0, s"budget must be >= 0 (got $budget)")
    require(rounds >= 1, s"rounds must be >= 1 (got $rounds)")
    var t = df.groupBy(sourceCol.as("source"))
      .agg(sum(tokenCol).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("_w", floor(sqrt(col("n_tokens")) * lit(1000000.0)).cast("long"))
      .withColumn("alloc", lit(0L))
    for (_ <- 1 to rounds) {
      val scalars = t.agg(
        (lit(budget) - sum("alloc")).as("_r"),
        sum(when(col("alloc") < col("n_tokens"), col("_w")).otherwise(lit(0L)))
          .as("_wu"))
      t = t.crossJoin(broadcast(scalars))
        .withColumn("_give",
          when(col("alloc") < col("n_tokens") && col("_wu") > 0L && col("_r") > 0L,
            least(col("n_tokens") - col("alloc"),
              floor(col("_r").cast("double") * col("_w").cast("double")
                / col("_wu").cast("double")).cast("long")))
            .otherwise(lit(0L)))
        .withColumn("alloc", col("alloc") + col("_give"))
        .drop("_r", "_wu", "_give")
    }
    t.select(col("source"), col("n_tokens"), col("_w").as("weight_u"),
      col("alloc").as("alloc_tokens"),
      floor(col("alloc").cast("double") * lit(1000000.0)
        / col("n_tokens").cast("double")).cast("long").as("rate_ppm"),
      (col("alloc") >= col("n_tokens")).as("saturated"))
  }

  /** Hashed-bigram buckets of a text column: lowercase whitespace
    * tokens → adjacent bigrams → md5-bucketed into [0, nBuckets).
    * md5 (not xxhash64) so the DuckDB oracle replays the bucketing
    * bit-for-bit — the [[Sampling.hashGate]] posture. */
  def dsirBuckets(textCol: Column, nBuckets: Int): Column = {
    val toks = split(trim(lower(textCol)), "\\s+")
    val n1 = greatest(size(toks) - 1, lit(0))
    val grams = zip_with(
      slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
    transform(grams, g =>
      conv(substring(md5(g), 1, 8), 16, 10).cast("long") % nBuckets)
  }

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score each corpus
    * document by how much more likely its hashed-bigram bag is under
    * the TARGET domain's bucket distribution than under the raw
    * corpus's, with add-1 smoothing:
    *
    *   score(d) = Σ_g∈d  ln p_target(bucket(g)) − ln p_raw(bucket(g))
    *
    * Per-bucket log-ratios quantize to integer MICRO-units before the
    * per-doc sum (the BM25 pre-sum idiom), so document scores are exact
    * integers — order-free and engine-replayable.
    *
    * 100 TB shape: the two bucket histograms are nBuckets-sized
    * map-combined aggregates; the fitted model (≤`nBuckets` ≤ 4096
    * longs) is collected ONCE driver-side — the bounded-model-collect
    * posture of [[SimilarityIvf]]'s codebook, not a data collect — and
    * re-enters as a LITERAL array, so the scoring pass is map-only:
    * codegen'd expressions inside the scan, zero shuffles, zero joins.
    * Selection (`keep` = score ≥ minScoreMicro) composes with
    * [[Sampling.hashGate]] for rate control downstream. */
  def dsirSelect(corpus: DataFrame, target: DataFrame, textCol: String,
      nBuckets: Int = 64, minScoreMicro: Long = 0L): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 4096,
      s"nBuckets must be in [2, 4096] (got $nBuckets)")
    def histogram(df: DataFrame): Map[Long, Long] = df
      .select(explode(dsirBuckets(col(textCol), nBuckets)).as("_b"))
      .groupBy("_b").agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the two model collects are independent jobs — submit them from
    // two threads so one's straggler tail backfills with the other's
    // tasks (guide §2.6 overlap) instead of running strictly serially
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val tgtF = Future(histogram(target))
    val raw = histogram(corpus)
    val tgt = Await.result(tgtF, Duration.Inf)
    val tTot = tgt.values.sum
    val rTot = raw.values.sum
    // λ_b in micro-units; the double products stay exact below 2^53
    // for corpora under ~9e15 bigrams per side
    val lams = (0 until nBuckets).map { b =>
      val ct = tgt.getOrElse(b.toLong, 0L)
      val cr = raw.getOrElse(b.toLong, 0L)
      math.floor(math.log(((ct + 1L).toDouble * (rTot + nBuckets).toDouble) /
        ((cr + 1L).toDouble * (tTot + nBuckets).toDouble)) * 1000000.0).toLong
    }
    val lamArr = array(lams.map(lit): _*)
    val buckets = dsirBuckets(col(textCol), nBuckets)
    corpus.withColumn("n_bigrams", size(buckets).cast("long"))
      .withColumn("score_micro",
        aggregate(buckets, lit(0L),
          (acc, b) => acc + element_at(lamArr, (b + 1).cast("int"))))
      .withColumn("keep", col("score_micro") >= minScoreMicro)
  }

  /** MIX5 — deterministic multinomial UP-sampling (with replacement):
    * epoch construction where a source is repeated fractionally —
    * "2.3 epochs of high-quality, 0.4 of the rest". Every row emits
    * floor(rate) copies plus one more iff its [[Sampling.hashGate]]
    * draw lands under frac(rate)·2³², so realized copies have mean
    * `rate` and are a pure function of (key, salt): stable across runs,
    * retries, partitionings, and engines — a resumable 100 TB epoch
    * plan. Rows whose copy count is 0 drop (rate < 1 downsamples with
    * the same gate). Each replica gets `copy_idx` and a stable
    * `replica_id` (md5 of key#idx) for downstream keying. Map-only:
    * a codegen'd explode of a bounded per-row sequence — no shuffle, no
    * state; compose with [[deterministicShuffle]] to interleave
    * replicas. */
  def upsample(df: DataFrame, key: Column, rate: Column,
      salt: String = ""): DataFrame = {
    Seq("n_copies", "copy_idx", "replica_id").foreach(c =>
      require(!df.columns.contains(c), s"upsample emits $c — rename the input column"))
    df.withColumn("n_copies",
        floor(rate).cast("long") +
          when(Sampling.hashGate(key, salt) <
            floor((rate - floor(rate)) * lit(4294967296.0)).cast("long"),
            lit(1L)).otherwise(lit(0L)))
      // sequence(1,0) would COUNT DOWN in Spark — guard the empty case
      .withColumn("copy_idx",
        explode(when(col("n_copies") > 0,
          sequence(lit(1L), col("n_copies")))
          .otherwise(array().cast("array<long>"))))
      .withColumn("replica_id",
        md5(concat_ws("#", key.cast("string"), col("copy_idx"))))
  }
}
