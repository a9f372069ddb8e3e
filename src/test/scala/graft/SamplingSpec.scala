package graft

import org.apache.spark.sql.functions._

import graft.operators.{Mixing, Sampling}

/** Deterministic hash-gate sampling: reproducibility, rate accuracy,
  * salt independence, stratified mixture weights. */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val pop = (0L until 4000L).map(i => (i, s"lang${i % 4}"))
    .toDF("id", "lang")

  test("same key+salt selects the same rows on every run") {
    val a = Sampling.hashSample(pop, col("id"), 0.3, "x")
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(pop, col("id"), 0.3, "x")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(math.abs(a.size - 1200) < 150, s"rate off: ${a.size}/4000 vs 0.3")
  }

  test("different salts draw (nearly) independent samples") {
    val a = Sampling.hashSample(pop, col("id"), 0.3, "x")
      .select("id").collect().map(_.getLong(0)).toSet
    val c = Sampling.hashSample(pop, col("id"), 0.3, "y")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a != c)
    // independence: |A∩C| ≈ 0.09 * 4000 = 360
    val inter = a.intersect(c).size
    assert(inter > 180 && inter < 560, s"overlap $inter not ~360")
  }

  test("nested samples: a smaller fraction with the same salt is a subset") {
    // gate < t1 implies gate < t2 for t1 < t2 — shrinking a sample
    // keeps it nested (critical for reproducible train/val splits)
    val small = Sampling.hashSample(pop, col("id"), 0.1, "x")
      .select("id").collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(pop, col("id"), 0.4, "x")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
  }

  test("stratified rates hold per stratum; default applies to absent strata") {
    val got = Sampling.stratifiedHashSample(pop, col("lang"), col("id"),
        Map("lang0" -> 0.5, "lang1" -> 0.1), defaultFraction = 0.02, salt = "m")
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(got("lang0") - 500) < 80, got.toString)   // 1000 * 0.5
    assert(math.abs(got("lang1") - 100) < 50, got.toString)   // 1000 * 0.1
    val rest = got.getOrElse("lang2", 0L) + got.getOrElse("lang3", 0L)
    assert(rest < 90, s"default-rate strata too big: $rest")  // 2000 * 0.02
  }

  test("packing: bins and offsets follow the cumulative token layout") {
    val docs = Seq(
      (1L, "g", 1000L), (2L, "g", 1000L), (3L, "g", 100L), (4L, "g", 3000L),
      (5L, "h", 2048L), (6L, "h", 1L))
      .toDF("doc_id", "lang", "n")
    val got = graft.operators.Packing
      .packBins(docs, "lang", Seq(col("doc_id")), col("n"), 2048L)
      .orderBy("lang", "doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("bin"), r.getAs[Long]("bin_offset")))
    assert(got.toSeq == Seq(
      (1L, 0L, 0L),     // starts at 0
      (2L, 0L, 1000L),  // starts at 1000, spans into bin 1
      (3L, 0L, 2000L),  // starts at 2000
      (4L, 1L, 52L),    // starts at 2100 → bin 1, offset 52
      (5L, 0L, 0L),     // group h restarts
      (6L, 1L, 0L)))    // starts exactly at the budget boundary
    intercept[IllegalArgumentException](
      graft.operators.Packing.packBins(docs, "lang", Seq(col("doc_id")), col("n"), 0L))
  }

  test("packSequences: boundary-crossing docs split with exact token ranges; conservation holds") {
    val docs = Seq(
      (1L, 100L), (2L, 500L),  // doc 2 crosses the 512 boundary (100..600)
      (3L, 0L),                // empty doc: no sequence rows
      (4L, 1200L))             // spans sequences 1..3 (600..1800)
      .toDF("doc_id", "n")
    val got = graft.operators.Packing
      .packSequences(docs, Seq(col("doc_id")), col("n"), seqLen = 512L,
        idCols = Seq("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5), r.getBoolean(6))))
      .toMap
    // hand layout: d1 [0,100) seq0; d2 [100,600) seq0+seq1; d4 [600,1800) seq1..3
    assert(got((1L, 0L)) == ((100L, 0L, 0L, true, true)))
    assert(got((2L, 0L)) == ((412L, 0L, 100L, true, false)))
    assert(got((2L, 1L)) == ((88L, 412L, 0L, false, true)))
    assert(got((4L, 1L)) == ((424L, 0L, 88L, true, false)))
    assert(got((4L, 2L)) == ((512L, 424L, 0L, false, false)))
    assert(got((4L, 3L)) == ((264L, 936L, 0L, false, true)))
    assert(!got.keySet.exists(_._1 == 3L), "empty docs emit no rows")
    // token conservation: per-doc splits sum to the doc's token count
    val sums = got.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2._1).sum).toMap
    assert(sums == Map(1L -> 100L, 2L -> 500L, 4L -> 1200L))
  }

  test("withRunningTotal matches a sequential fold at every row") {
    val df = pop.toDF("id", "lang").withColumn("v", (col("id") % 7L) + 1L)
    val got = graft.operators.DenseSequence
      .withRunningTotal(df, Seq(col("id")), col("v"), "rt")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rt")).toMap
    var acc = 0L
    (0L until 4000L).foreach { i =>
      acc += (i % 7L) + 1L
      assert(got(i) == acc, s"running total diverged at id=$i")
    }
  }

  test("edge fractions: 0.0 keeps nothing, 1.0 keeps everything") {
    assert(Sampling.hashSample(pop, col("id"), 0.0).count() == 0L)
    assert(Sampling.hashSample(pop, col("id"), 1.0).count() == 4000L)
    intercept[IllegalArgumentException](Sampling.hashSample(pop, col("id"), 1.5))
  }

  test("temperature mix: T=1 reproduces proportional rates; T=0.5 flattens") {
    // skewed population: 3200 'big', 400 'mid', 400 'tiny'
    val skew = ((0L until 3200L).map(i => (i, "big")) ++
      (3200L until 3600L).map(i => (i, "mid")) ++
      (3600L until 4000L).map(i => (i, "tiny"))).toDF("id", "src")
    val prop = graft.operators.Mixing
      .temperatureMix(skew, col("src"), col("id"), targetRows = 1000L,
        temperature = 1.0, salt = "t1")
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // T=1 → every source keeps the same rate (1000/4000 = 0.25)
    assert(math.abs(prop("big") - 800) < 110, prop.toString)
    assert(math.abs(prop("mid") - 100) < 50, prop.toString)
    val flat = graft.operators.Mixing
      .temperatureMix(skew, col("src"), col("id"), targetRows = 1000L,
        temperature = 0.5, salt = "t1")
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // T=0.5: w_big = √3200 vs w_mid = √400 → big:mid rate ratio is
    // (√3200/3200)/(√400/400) = √(400/3200) ≈ 0.354 — the tail rises
    val bigShare = flat("big").toDouble / (flat("big") + flat("mid") + flat("tiny"))
    assert(bigShare < 0.65, s"T=0.5 should flatten the head: $flat")
    assert(flat("mid") > prop("mid") && flat("tiny") > prop("tiny"),
      s"tail sources must gain under T<1: $flat vs $prop")
    // expected totals stay ~targetRows under both temperatures
    assert(math.abs(flat.values.sum - 1000L) < 150, flat.toString)
  }

  test("temperature mix is deterministic and rejects bad parameters") {
    val a = graft.operators.Mixing.temperatureMix(pop, col("lang"), col("id"),
      500L, 0.5, "s").select("id").collect().map(_.getLong(0)).toSet
    val b = graft.operators.Mixing.temperatureMix(pop, col("lang"), col("id"),
      500L, 0.5, "s").select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    intercept[IllegalArgumentException](graft.operators.Mixing
      .temperatureMix(pop, col("lang"), col("id"), -1L))
    intercept[IllegalArgumentException](graft.operators.Mixing
      .temperatureMix(pop, col("lang"), col("id"), 10L, temperature = 0.0))
  }

  test("temperature mix: a NULL stratum is sampled at its rate, not dropped") {
    val withNull = ((0L until 1000L).map(i => (i, Some("a"))) ++
      (1000L until 2000L).map(i => (i, Option.empty[String])))
      .toDF("id", "src")
    val got = graft.operators.Mixing
      .temperatureMix(withNull, col("src"), col("id"), targetRows = 1000L,
        temperature = 1.0, salt = "n")
    val nullKept = got.filter(col("src").isNull).count()
    assert(math.abs(nullKept - 500L) < 80,
      s"null-stratum rows must sample at their rate (~500): $nullKept")
  }

  test("budget water-filling: caps, conservation, and surplus redistribution") {
    // tiny (100 tokens) saturates immediately; its unused share must
    // flow to big/mid across rounds
    val toks = Seq(("big", 100000L), ("mid", 25000L), ("tiny", 100L))
      .flatMap { case (s, n) => Seq((s, n / 2), (s, n - n / 2)) }
      .toDF("src", "n_tok")
    val got = graft.operators.Mixing
      .budgetAllocation(toks, col("src"), col("n_tok"), budget = 50000L, rounds = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getBoolean(5))).toMap
    val allocs = got.view.mapValues(_._2)
    assert(allocs.values.sum <= 50000L, s"over-granted: $got")
    got.foreach { case (s, (n, a, sat)) =>
      assert(a <= n, s"$s allocated past capacity")
      assert(sat == (a >= n), s"$s saturation flag wrong")
    }
    assert(got("tiny")._3, "the 100-token source must saturate")
    // weights: w_big = 2·w_mid (√100000/√25000) → unsaturated allocs ~2:1
    val ratio = allocs("big").toDouble / allocs("mid")
    assert(math.abs(ratio - 2.0) < 0.01, s"√-weight proportionality: $allocs")
    // redistribution actually happened: 3 rounds allocate more than 1
    val oneRound = graft.operators.Mixing
      .budgetAllocation(toks, col("src"), col("n_tok"), budget = 50000L, rounds = 1)
      .collect().map(_.getLong(3)).sum
    assert(allocs.values.sum > oneRound,
      s"rounds must re-grant the saturated surplus ($oneRound -> ${allocs.values.sum})")
    // within floor-loss of the full budget once nobody else saturates
    assert(50000L - allocs.values.sum < 10L, s"residual too large: $allocs")
  }

  test("budget water-filling invariants hold on seeded random inputs") {
    var s = 23L
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); s }
    def rnd(n: Long): Long = math.floorMod(next(), n)
    for (trial <- 1 to 4) {
      val nSrc = 3 + rnd(6).toInt
      val toks = (0 until nSrc).map(i => (s"s$i", 1L + rnd(100000L)))
        .toDF("src", "n_tok")
      val budget = 1L + rnd(300000L)
      val got = graft.operators.Mixing
        .budgetAllocation(toks, col("src"), col("n_tok"), budget, rounds = 4)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3),
          r.getLong(4), r.getBoolean(5)))
      val total = got.map(_._3).sum
      assert(total <= budget, s"trial $trial over-granted: $total > $budget")
      got.foreach { case (src, n, alloc, ppm, sat) =>
        assert(alloc >= 0 && alloc <= n, s"trial $trial $src capacity")
        assert(sat == (alloc == n), s"trial $trial $src saturation flag")
        assert(ppm == math.floor(alloc.toDouble * 1e6 / n).toLong,
          s"trial $trial $src rate")
      }
      // the budget is exhausted up to floor losses unless EVERY source
      // saturated (nothing left to give it to)
      val capacity = got.map(_._2).sum
      if (budget <= capacity)
        assert(budget - total <= got.length.toLong * 4,
          s"trial $trial left ${budget - total} unallocated with headroom")
      else assert(got.forall(_._5), s"trial $trial ample budget must saturate all")
    }
  }

  test("budget water-filling: an ample budget saturates everything exactly") {
    val toks = Seq(("a", 100L), ("b", 900L), ("c", 0L)).toDF("src", "n_tok")
    val got = graft.operators.Mixing
      .budgetAllocation(toks, col("src"), col("n_tok"), budget = 10000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(got == Map("a" -> ((100L, 1000000L, true)),
      "b" -> ((900L, 1000000L, true))), s"got $got")
    assert(!got.contains("c"), "zero-token sources have nothing to allocate")
    intercept[IllegalArgumentException](graft.operators.Mixing
      .budgetAllocation(toks, col("src"), col("n_tok"), budget = -1L))
    intercept[IllegalArgumentException](graft.operators.Mixing
      .budgetAllocation(toks, col("src"), col("n_tok"), budget = 1L, rounds = 0))
  }

  test("deterministic shuffle: a total order, stable across runs, salt-varied") {
    val a = graft.operators.Mixing.deterministicShuffle(pop, col("id"), "e0")
      .orderBy("pos").select("id").collect().map(_.getLong(0)).toSeq
    val b = graft.operators.Mixing.deterministicShuffle(pop, col("id"), "e0")
      .orderBy("pos").select("id").collect().map(_.getLong(0)).toSeq
    assert(a == b, "same salt must give the same order")
    assert(a.toSet.size == 4000, "a permutation, nothing lost")
    val c = graft.operators.Mixing.deterministicShuffle(pop, col("id"), "e1")
      .orderBy("pos").select("id").collect().map(_.getLong(0)).toSeq
    assert(a != c, "a new salt is a new epoch order")
    assert(a != (0L until 4000L).toSeq, "order must actually be shuffled")
  }

  test("A-Res weighted sample: deterministic, k-sized, weight-biased") {
    val wpop = ((0L until 500L).map(i => (i, 1L)) ++
      (500L until 1000L).map(i => (i, 20L))).toDF("id", "w")
    val a = Sampling.weightedSample(wpop, col("id"), col("w"), 100, "s1")
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedSample(wpop.repartition(13), col("id"), col("w"), 100, "s1")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b, "same salt + same rows must select the same sample at any partitioning")
    assert(a.size == 100)
    // heavy rows hold 10000/10500 ≈ 95% of the mass; their expected
    // share of a 100-draw WOR sample is ≥ ~90
    val heavy = a.count(_ >= 500L)
    assert(heavy > 80, s"weight-20 rows underrepresented: $heavy/100")
  }

  test("A-Res: non-positive and NULL weights carry no selection mass") {
    val wpop = Seq((1L, Some(5L)), (2L, Some(0L)), (3L, Some(-4L)),
      (4L, Option.empty[Long]), (5L, Some(5L))).toDF("id", "w")
    val got = Sampling.weightedSample(wpop, col("id"), col("w"), 10, "z")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 5L))
  }

  test("A-Res per group: k rows per stratum, fewer when the stratum is smaller") {
    val wpop = ((0L until 90L).map(i => (i, "big", i + 1L)) ++
      (90L until 92L).map(i => (i, "tiny", 1L))).toDF("id", "g", "w")
    val got = Sampling.weightedSamplePerGroup(wpop, col("g"), col("id"), col("w"), 5, "s")
      .groupBy("g").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("big" -> 5L, "tiny" -> 2L))
  }

  test("split assignment: disjoint+exhaustive, deterministic, proportional, guarded") {
    val pop = (0L until 4000L).toDF("id")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.assignSplits(pop, col("id"), fr, "s1")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // exhaustive: every row labeled with a declared split
    assert(a.size == 4000 && a.values.toSet == Set("train", "val", "test"))
    // proportions within a loose binomial band
    val n = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(n("train") - 3200) < 150, n.toString)
    assert(math.abs(n("val") - 400) < 100 && math.abs(n("test") - 400) < 100)
    // deterministic at any partitioning; a new salt is a new split
    val b = Sampling.assignSplits(pop.repartition(13), col("id"), fr, "s1")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    val c = Sampling.assignSplits(pop, col("id"), fr, "s2")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a != c)
    // nested-subset affinity with hashSample: same salt's 10% sample is
    // exactly the rows whose gate is lowest — i.e. a train PREFIX
    val keep = Sampling.hashSample(pop, col("id"), 0.8, "s1")
      .collect().map(_.getLong(0)).toSet
    assert(keep == a.filter(_._2 == "train").keySet,
      "hashSample(f) must equal the first cumulative split at the same salt")
    // guards
    intercept[IllegalArgumentException](
      Sampling.assignSplits(pop, col("id"), Seq("a" -> 0.5, "b" -> 0.4)))
    intercept[IllegalArgumentException](
      Sampling.assignSplits(pop, col("id"), Seq("a" -> 0.5, "a" -> 0.5)))
    intercept[IllegalArgumentException](
      Sampling.assignSplits(pop.withColumn("split", lit("x")), col("id"),
        Seq("a" -> 1.0)))
  }

  test("A-Res rejects inputs whose '_ares'/'_rn' columns would be clobbered") {
    val clash1 = Seq((1L, 2L, 0.5)).toDF("id", "w", "_ares")
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(clash1, col("id"), col("w"), 1, "s")
    }
    val clash2 = Seq((1L, "g", 2L, 7)).toDF("id", "g", "w", "_rn")
    intercept[IllegalArgumentException] {
      Sampling.weightedSamplePerGroup(clash2, col("g"), col("id"), col("w"), 1, "s")
    }
  }

  test("null keys are a deterministic group, not silently dropped") {
    val withNulls = Seq((Some(1L), "a"), (None, "b"), (None, "c"), (Some(2L), "d"))
      .toDF("k", "v")
    // fraction 1.0 must keep the null-keyed rows too
    assert(Sampling.hashSample(withNulls, col("k"), 1.0).count() == 4L)
    assert(Sampling.hashSample(withNulls, col("k"), 0.0).count() == 0L)
    // null keys share one gate value → kept or dropped together
    val kept = Sampling.hashSample(withNulls, col("k"), 0.5, "s")
      .filter(col("k").isNull).count()
    assert(kept == 0L || kept == 2L)
  }

  test("negative sampling: k per anchor, never self, deterministic, degenerate-safe") {
    val docs = (1L to 20L).toDF("id")
    val pairs = Mixing.negativePairs(docs, "id", k = 4, salt = "t")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(pairs.length == 80)                            // 20 anchors x 4
    assert(pairs.forall { case (a, _, n) => a != n })     // never itself
    assert(pairs.map { case (a, j, _) => (a, j) }.distinct.length == 80)
    // pure function of (ids, salt, k): a second run is identical
    val again = Mixing.negativePairs(docs, "id", k = 4, salt = "t")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(pairs.sorted.toSeq == again.sorted.toSeq)
    // different salt draws a different pairing
    val other = Mixing.negativePairs(docs, "id", k = 4, salt = "u")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(pairs.sorted.toSeq != other.sorted.toSeq)
    // a 1-row corpus has no negatives: empty, not an error
    assert(Mixing.negativePairs(Seq(9L).toDF("id"), "id", k = 2).count() == 0L)
  }

  test("mix_split_guard: no near-dup cluster straddles splits") {
    val df = SparkEntry.queries("mix_split_guard")(spark, "/root/testdata/sf0.001")
      .cache()
    val straddling = df.groupBy("cluster_id")
      .agg(countDistinct("split").as("k")).filter(col("k") > 1).count()
    assert(straddling == 0L, "a cluster was assigned to more than one split")
    // the gate actually partitions (not everything in one split)
    assert(df.select("split").distinct().count() >= 2L)
    df.unpersist()
  }

  test("dsirSelect: target-domain docs score higher than off-domain") {
    val target = Seq((1L, "the quick brown fox jumps the lazy dog"),
      (2L, "the quick dog jumps the brown fox")).toDF("doc_id", "text")
    val corpus = target.union(Seq(
      (3L, "zzz qqq www eee rrr ttt yyy uuu"),
      (4L, "the quick brown fox jumps the lazy dog")).toDF("doc_id", "text"))
    val got = Mixing.dsirSelect(corpus, target, "text", nBuckets = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // the in-domain duplicate outscores the gibberish doc
    assert(got(4L) > got(3L))
    // deterministic: a second run is bit-identical
    val again = Mixing.dsirSelect(corpus, target, "text", nBuckets = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == again)
  }

  test("curriculumOrder: bands consume easiest-first, within-band order is shuffled") {
    val df = pop.toDF("id", "lang")
      .withColumn("band", (col("id") / 1000L).cast("long"))
    val got = Mixing.curriculumOrder(df, col("band"), col("id"), salt = "c")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    // positions are a dense 1..N sequence
    assert(got.map(_._3).sorted == (1L to 4000L))
    // band boundaries are strict: every band-0 position < every band-1 position
    val maxPosByBand = got.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    val minPosByBand = got.groupBy(_._2).view.mapValues(_.map(_._3).min).toMap
    for (b <- 0L to 2L) assert(maxPosByBand(b) < minPosByBand(b + 1))
    // within a band the order is NOT id order (it's the salted shuffle)
    val band0 = got.filter(_._2 == 0L).sortBy(_._3).map(_._1)
    assert(band0 != band0.sorted, "within-band order must be shuffled")
    // deterministic
    assert(got.toSet == Mixing.curriculumOrder(df, col("band"), col("id"), salt = "c")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet)
  }

  test("upsample: integer rates exact, fractional rates mean-correct, replicas stable") {
    val df = pop.toDF("id", "lang")
    // integer rate: every row gets exactly 2 copies, idx 1..2
    val twice = Mixing.upsample(df, col("id"), lit(2.0), salt = "s")
    assert(twice.count() == 8000L)
    assert(twice.groupBy("id").count().filter(col("count") =!= 2L).count() == 0L)
    // fractional rate 1.3: every row ≥1 copy, realized mean within 3%
    val frac = Mixing.upsample(df, col("id"), lit(1.3), salt = "s")
    val n = frac.count()
    assert(n >= 4000L && math.abs(n - 5200L) < 160L, s"got $n copies for rate 1.3")
    // rate < 1 downsamples: some rows drop entirely, none get 2 copies
    val down = Mixing.upsample(df, col("id"), lit(0.25), salt = "s")
    assert(down.count() < 4000L * 0.28 && down.count() > 4000L * 0.22)
    assert(down.groupBy("id").count().filter(col("count") > 1L).count() == 0L)
    // determinism + distinct stable replica ids
    assert(frac.collect().toSet ==
      Mixing.upsample(df, col("id"), lit(1.3), salt = "s").collect().toSet)
    assert(frac.select("replica_id").distinct().count() == n)
    // collision guard
    intercept[IllegalArgumentException] {
      Mixing.upsample(df.withColumn("copy_idx", lit(1)), col("id"), lit(1.0))
    }
  }
}
