package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Planted-duplicate corpus tests for the dedup family (L1/L2) and
  * similarity search (L3): LSH candidate recall is checked against the
  * exact brute-force answer on the same data. */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base = Seq(
    "the quick brown fox jumps over the lazy dog near the river bank today",
    "machine learning pipelines shuffle massive corpora across worker nodes",
    "a completely different sentence about cooking pasta with fresh tomatoes",
    "weather report says heavy rain and strong winds expected tomorrow night",
    "financial markets rallied after the announcement of new trade policies")

  /** 5 clusters x 4 near-identical variants + 5 unrelated singletons. */
  private lazy val docs = {
    val dups = base.zipWithIndex.flatMap { case (t, c) =>
      Seq(
        (c * 10L, t),
        (c * 10L + 1, t),                       // exact dup
        (c * 10L + 2, t + " extra"),            // near dup
        (c * 10L + 3, "zz " + t))               // near dup
    }
    val singles = Seq(
      (100L, "solar panels convert sunlight into electricity efficiently"),
      (101L, "ancient rome built aqueducts spanning hundreds of miles"),
      (102L, "deep sea creatures glow with bioluminescent light patterns"),
      (103L, "marathon runners train for months before race day arrives"),
      (104L, "jazz musicians improvise melodies over walking bass lines"))
    (dups ++ singles).toDF("doc_id", "text")
  }

  test("L1 exact dedup groups duplicates by normalized content") {
    val groups = Dedup.exactGroups(docs).collect()
    // 5 pairs of exact dups -> 5 groups of 2; everything else singleton
    assert(groups.count(_.getAs[Long]("n_dups") == 2) == 5)
    assert(groups.map(_.getAs[Long]("n_dups")).sum == 25)
    val kept = Dedup.dropExactDuplicates(docs)
    assert(kept.count() == 20)
  }

  test("L2 minhash near-dups find every planted cluster pair and nothing else") {
    val found = Dedup.minHashNearDups(docs, threshold = 0.3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // within each cluster all 6 pairs have high shingle overlap
    base.indices.foreach { c =>
      val ids = (0 until 4).map(i => c * 10L + i)
      val clusterPairs = for {
        a <- ids; b <- ids if a < b
      } yield (a, b)
      clusterPairs.foreach(p => assert(found.contains(p), s"missing $p"))
    }
    // no cross-cluster or singleton pairs
    found.foreach { case (a, b) => assert(a / 10 == b / 10 && a < 100) }
  }

  test("L2 minhash md5 family (oracle-replayable) matches the xx family on planted clusters") {
    // different hash families band differently, but both verify with the
    // exact jaccard, so on well-separated clusters (within ≥ 0.3,
    // across ≈ 0) the OUTPUT pair sets must coincide
    val md5 = Dedup.minHashNearDups(docs, threshold = 0.3, md5Family = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val xx = Dedup.minHashNearDups(docs, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(md5 == xx, s"families disagree: md5-only=${md5 -- xx}, xx-only=${xx -- md5}")
  }

  test("L2 md5-mul from-text signature equals the over-strings form (and DuckDB's arithmetic)") {
    import graft.functions.TextFunctions
    val t = docs.select(col("doc_id"), lower(col("text")).as("lt"))
    val viaText = t.select(col("doc_id"),
        TextFunctions.mulMinHashSignatureOfText(col("lt"), 5, 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaList = t.select(col("doc_id"),
        TextFunctions.mulMinHashSignature(
          TextFunctions.shinglesOfLowered(col("lt"), 5), 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaText == viaList, "from-text and over-strings signatures must be bit-equal")
    // one hand-computed value pins the md5-hex-parse × wrap-multiply
    // semantics the DuckDB twin replays: shingle "abcde", mixer 0
    val one = Seq(("abcde")).toDF("lt").select(
      TextFunctions.mulMinHashSignatureOfText(col("lt"), 5, 1)).head().getSeq[Long](0)
    val base = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("abcde".getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
        .take(15), 16)
    val expect = base * org.apache.spark.sql.graft.MinHashSigMulExpr.Mixers(0)
    assert(one == Seq(expect), s"got $one, want $expect")
  }

  test("L2 maxBucket guard: an identical-content flood is trimmed, not quadratic") {
    // 10k byte-identical docs violate the L1-before-L2 contract: every
    // doc shares every band, so one bucket would hold all 10k ids and
    // pair enumeration would explode to ~50M rows x 8 bands. The guard
    // trims buckets past maxBucket instead — those pairs are exact
    // duplicates, L1's job — and the pipeline completes with no
    // candidates. A planted honest near-dup cluster alongside the
    // flood must still come through untouched.
    val flood = spark.range(10000).select(
      (col("id") + 1000L).as("doc_id"),
      lit(base.head).as("text"))
    val cluster = Seq(
      (1L, base(1)), (2L, base(1) + " extra"), (3L, "zz " + base(1)))
      .toDF("doc_id", "text")
    val pairs = Dedup.minHashCandidatePairs(flood.union(cluster))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.forall { case (a, b) => a < 1000L && b < 1000L },
      s"flood pairs leaked: ${pairs.filter(_._1 >= 1000L).take(5)}")
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"planted cluster pairs wrong: $pairs")
    // with the guard widened past the flood, the same call WOULD emit
    // flood pairs — proving the trim (not chance banding) is what saved it
    val unguarded = Dedup.minHashCandidatePairs(
        flood.limit(80).union(cluster), maxBucket = 4096)
      .filter(col("a_id") >= 1000L).count()
    assert(unguarded > 0L, "identical docs must collide without the guard")
  }

  test("L2r incremental near-dup: batch-touching pairs only, old x old never emitted") {
    import org.apache.spark.sql.functions.col
    // batch = ids ≡ 0 (mod 10): one doc per cluster + singleton 100
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val inc = Dedup.incrementalNearDups(batch, corpus, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    val full = Dedup.minHashNearDups(docs, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exactly the full-run pairs that touch the batch, no old x old
    val wantIds = full.filter { case (a, b) => a % 10 == 0 || b % 10 == 0 }
    assert(inc.map(p => (p._1, p._2)) == wantIds)
    assert(inc.nonEmpty, "planted clusters must produce batch-touching pairs")
    inc.foreach { case (a, b, kind) =>
      val bothNew = a % 10 == 0 && b % 10 == 0
      assert(kind == (if (bothNew) "new_new" else "new_old"),
        s"pair ($a,$b) kind $kind")
    }
    // a precomputed persisted index gives the identical answer
    val idx = Dedup.minHashBandIndex(corpus)
    val viaIdx = Dedup.incrementalNearDups(batch, corpus, threshold = 0.3,
        corpusIndex = Some(idx))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    assert(viaIdx == inc)
  }

  test("corpus refresh: every decision class fires, priority order respected") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "jazz musicians improvise melodies over walking bass lines nightly"))
      .toDF("doc_id", "text")
    val batch = Seq(
      // exact twin of corpus doc 1 (same normalized tokens)
      (100L, "the quick brown fox jumps over the lazy dog near the river"),
      // near-dup of corpus doc 2
      (101L, "jazz musicians improvise melodies over walking bass lines tonight"),
      // fresh content, admitted — and its exact batch twin at a higher id
      (102L, "ancient rome built aqueducts spanning hundreds of miles easily"),
      (103L, "ancient rome built aqueducts spanning hundreds of miles easily"),
      // near-dup of admitted batch doc 102 (not of the corpus)
      (104L, "zz ancient rome built aqueducts spanning hundreds of miles easily"),
      // unrelated, admitted
      (105L, "deep sea creatures glow with bioluminescent light patterns below"))
      .toDF("doc_id", "text")
    val got = Dedup.corpusRefreshDecisions(batch, corpus, threshold = 0.3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      100L -> "dup_exact_corpus",
      101L -> "dup_near_corpus",
      102L -> "admitted",
      103L -> "dup_exact_batch",   // exact beats its near-batch status
      104L -> "dup_near_batch",
      105L -> "admitted"), got.toString)
    // decisions are insensitive to batch row order/partitioning
    val shuffled = Dedup.corpusRefreshDecisions(
        batch.orderBy(col("text")).repartition(7), corpus, threshold = 0.3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(shuffled == got)
  }

  test("L2l duplicate spans: planted boilerplate flagged, coverage merged, unique docs zero") {
    // docs 1 and 2 share an 8-token license header; doc 3 is unique;
    // doc 4 repeats a sentence INSIDE itself (self-boilerplate counts)
    val header = "this work is licensed under the creative commons"   // 8 tokens
    val d = Seq(
      (1L, header + " attribution license for all uses"),
      (2L, header + " share alike variant with extra words here"),
      (3L, "completely original prose with no repeats against anything else"),
      (4L, "alpha beta gamma delta one two three four padding " * 2)) // self-repeat
      .toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(d, k = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // docs 1/2: exactly the one shared window at position 1 → one
    // region of 8 tokens
    assert(got(1L)._2 == 1L && got(1L)._3 == 1L && got(1L)._4 == 8L, got(1L).toString)
    assert(got(2L)._2 == 1L && got(2L)._3 == 1L && got(2L)._4 == 8L)
    assert(got(3L) == ((9L, 0L, 0L, 0L)))
    // doc 4: 18 tokens, repetition "alpha..padding alpha..padding"
    // (9-token unit ×2) — windows 1..3 match windows 10..(11,12 clipped)
    // → self-duplicated spans exist and merge into regions
    assert(got(4L)._2 > 0L && got(4L)._4 > 0L)
    // coverage never exceeds the doc's token count
    got.values.foreach { case (n, _, _, dup) => assert(dup <= n) }
  }

  test("L2 simhash pairs: exact dups hit hamming 0; unrelated docs don't pair") {
    val pairs = Dedup.simHashNearDups(docs, maxHamming = 3).collect()
    val exactPairs = pairs.filter(_.getAs[Long]("hamming") == 0L)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    base.indices.foreach { c =>
      assert(exactPairs.contains((c * 10L, c * 10L + 1)), s"cluster $c")
    }
    pairs.foreach { r =>
      assert(r.getLong(0) / 10 == r.getLong(1) / 10,
        s"cross-cluster pair ${r.getLong(0)},${r.getLong(1)}")
    }
  }

  test("L2 simhash banding derives bands from maxHamming and rejects the unsound range") {
    // maxHamming=5 → six 10-bit chunks; recall must still be exact:
    // every pair found at the wider radius includes the hamming<=3 set
    val at3 = Dedup.simHashNearDups(docs, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val at5 = Dedup.simHashNearDups(docs, maxHamming = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at3.subsetOf(at5))
    intercept[IllegalArgumentException](Dedup.simHashNearDups(docs, maxHamming = 60))
    intercept[IllegalArgumentException](Dedup.simHashNearDups(docs, maxHamming = -1))
  }

  test("L2 ngram jaccard (blocked) matches unblocked brute force") {
    val blocked = docs.withColumn("blk", lit(1))
    val got = Dedup.ngramJaccardPairs(blocked, "blk", n = 3, threshold = 0.2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // model: exact jaccard over word-3-gram sets
    def ngrams(t: String) =
      t.trim.toLowerCase.split("\\s+").toSeq.sliding(3).map(_.mkString(" ")).toSet
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val want = (for {
      (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
      na = ngrams(ta); nb = ngrams(tb)
      u = na.union(nb).size if u > 0
      j = na.intersect(nb).size.toDouble / u if j >= 0.2
    } yield ((ia, ib), math.round(j * 10000) / 10000.0)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-9, k) }
  }

  test("L3g ranking metrics: hits, recall, first-relevant rank, no-hit NULLs") {
    import org.apache.spark.sql.functions.col
    val truth = Seq((1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L),
      (2L, "a", 1L),
      (1L, "deep", 11L) // beyond k: ignored
    ).toDF("qid", "cid", "rank")
    val cand = Seq((1L, "b", 1L), (1L, "x", 2L), (1L, "a", 3L),
      (2L, "y", 1L),
      (2L, "a", 12L) // relevant but beyond k: doesn't count
    ).toDF("qid", "cid", "rank")
    val got = graft.operators.Similarity.rankingMetrics(truth, cand, k = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    assert(got(1L) == ((3L, 2L, 0.6667, Some(1L), Some(1.0))))
    assert(got(2L) == ((1L, 0L, 0.0, None, None)),
      "zero hits: recall 0, rank/rr NULL (unknowable, not zero)")
    intercept[IllegalArgumentException](
      graft.operators.Similarity.rankingMetrics(truth, cand, k = 0))
  }

  test("L3 LSH top-k recall vs brute force") {
    val emb = (0 until 40).map { i =>
      val angle = (i % 8) * 0.7 + i * 0.001
      (i.toLong, Seq.tabulate(16)(d =>
        (math.cos(angle * (d + 1)) + (if (i == d) 0.5 else 0.0)).toFloat))
    }.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    val brute = Similarity.bruteForceTopK(q, c, 3).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val lsh = Similarity.lshTopK(q, c, 3, bits = 4, dim = 16).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    assert(brute.size == 15)
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"LSH recall $recall too low")
  }

  test("L3 IVF top-k recall vs brute force") {
    val emb = (0 until 60).map { i =>
      val angle = (i % 6) * 1.1 + i * 0.002
      (i.toLong, Seq.tabulate(16)(d => math.cos(angle * (d + 1)).toFloat))
    }.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 6)
    val c = emb.filter(col("vec_id") >= 6)
    val brute = Similarity.bruteForceTopK(q, c, 3).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val ivf = graft.operators.SimilarityIvf.ivfTopK(q, c, 3, nlist = 6, nprobe = 3)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    assert(brute.size == 18)
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall $recall too low")
  }

  test("L1b incremental dedup: corpus content rejected, batch-first kept once") {
    val corpus = Seq((1L, "existing corpus document one"),
      (2L, "existing corpus document two")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "existing corpus document one"),   // already in corpus -> dropped
      (11L, "a genuinely new document"),       // new -> admitted
      (12L, "a genuinely new document"),       // batch dup -> folded into 11
      (13L, "another new one")                 // new -> admitted
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(batch, Dedup.exactGroups(corpus))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == Seq((11L, 2L), (13L, 1L)))
    intercept[IllegalArgumentException] {
      Dedup.incrementalDedup(batch, corpus)  // not an exactGroups table
    }
  }

  test("L2p bucketed embedding near-dup: subset of exact, planted dups co-cell") {
    val rng = new scala.util.Random(7)
    def vec(): Seq[Float] = Seq.fill(64)(rng.nextFloat() * 2f - 1f)
    val base = Seq.fill(20)(vec())
    // planted near-dups: tiny perturbations of base vectors (angle ~0)
    val rows = base.zipWithIndex.flatMap { case (v, i) =>
      Seq((i * 2L, v), (i * 2L + 1, v.map(x => x + 0.001f)))
    }
    val df = rows.toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDups(df, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Dedup.embeddingNearDupsBucketed(df, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // bucketing only ever DROPS pairs (cell split), never invents them
    assert(bucketed.subsetOf(exact))
    // every planted perturbation pair is near-angle-0: all survive
    val planted = (0 until 20).map(i => (i * 2L, i * 2L + 1)).toSet
    assert(planted.subsetOf(bucketed),
      s"missing planted pairs: ${planted.diff(bucketed)}")
  }

  test("L2s semDedup: within-cluster semantic groups, one keeper each, no cross-cluster merge") {
    // cluster 0: ids 0,1 near-identical; id 2 orthogonal-ish
    // cluster 1: ids 3,4 near-identical COPIES of 0,1 — must NOT merge
    //            with cluster 0 (pairing is cluster-scoped)
    val a = Seq(1f, 0f, 0f, 0f)
    val b = Seq(0.999f, 0.01f, 0f, 0f)
    val c = Seq(0f, 1f, 0f, 0f)
    val rows = Seq((0L, 0, a), (1L, 0, b), (2L, 0, c),
      (3L, 1, a), (4L, 1, b))
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = Dedup.semDedup(df, "label", threshold = 0.95)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(0L) == ((0L, true)))
    assert(got(1L) == ((0L, false)))   // pruned: near-dup of 0 in-cluster
    assert(got(2L) == ((2L, true)))    // orthogonal: its own group
    assert(got(3L) == ((3L, true)))    // same content, other cluster: kept
    assert(got(4L) == ((3L, false)))
    // exactly one keeper per semantic group
    val perGroup = got.values.groupBy(_._1).view.mapValues(_.count(_._2))
    assert(perGroup.values.forall(_ == 1))
  }

  test("L2t containment: an excerpt scores ~1 toward its host while jaccard stays low") {
    val long = (1 to 60).map(i => s"w$i").mkString(" ")     // host doc
    val excerpt = (1 to 12).map(i => s"w$i").mkString(" ")  // contained head
    val other = (100 to 160).map(i => s"x$i").mkString(" ")
    val df = Seq((1L, "s", long), (2L, "s", excerpt), (3L, "s", other))
      .toDF("doc_id", "source", "text")
    val got = Dedup.containmentPairs(df, "source", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(4), r.getDouble(5)))).toMap
    // pair (1,2): excerpt's 10 trigrams all inside the host's 58
    val (cab, cba) = got((1L, 2L))
    assert(cba == 1.0, s"excerpt→host containment must be 1.0 (got $cba)")
    assert(cab < 0.2, "host→excerpt containment is small by construction")
    // jaccard for the same pair is tiny — the case this op exists for
    val j = Dedup.ngramJaccardPairs(df, "source", n = 3, threshold = 0.0)
      .filter(col("a_id") === 1L && col("b_id") === 2L)
      .collect().head.getDouble(2)
    assert(j < 0.2, s"jaccard stays low on asymmetric duplication (got $j)")
    // unrelated docs never pair
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)))
  }

  test("L2h decontamination: planted eval overlap flags, fresh text doesn't") {
    val evalSet = Seq((100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // contains 6 of the eval doc's 3-grams verbatim → flagged at minHits=5
      (1L, "prefix words the quick brown fox jumps over the lazy suffix"),
      // shares a single 3-gram ("the quick brown") → counted, not flagged
      (2L, "only the quick brown remains here today friends"),
      (3L, "completely unrelated text with zero overlap whatsoever")
    ).toDF("doc_id", "text")
    val got = Dedup.decontaminate(corpus, evalSet, n = 3, minHits = 5L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == Seq((1L, 6L, true), (2L, 1L, false), (3L, 0L, false)))
  }

  test("L2m bloom decontamination == exact, even with a saturated bloom") {
    val evalSet = Seq((100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words the quick brown fox jumps over the lazy suffix"),
      (2L, "only the quick brown remains here today friends"),
      (3L, "completely unrelated text with zero overlap whatsoever")
    ).toDF("doc_id", "text")
    val exact = Dedup.decontaminate(corpus, evalSet, n = 3, minHits = 5L)
      .orderBy("doc_id").collect().toSeq
    // an 8-bit bloom over ~8 eval grams is saturated: nearly every corpus
    // gram survives as a false positive — the exact verify join must
    // strip them all, so the report is still bit-identical to exact
    val sat = Dedup.decontaminateBloom(corpus, evalSet, n = 3, minHits = 5L,
        expectedItems = 8L, numBits = 8L)
      .orderBy("doc_id").collect().toSeq
    assert(sat == exact)
    // and a well-sized bloom agrees too (the normal operating point)
    val ok = Dedup.decontaminateBloom(corpus, evalSet, n = 3, minHits = 5L,
        expectedItems = 1L << 10, numBits = 1L << 13)
      .orderBy("doc_id").collect().toSeq
    assert(ok == exact)
    // the probe is planned as a bloom might_contain, not an exact join:
    // the pre-filter genuinely runs in the plan
    val plan = Dedup.decontaminateBloom(corpus, evalSet, n = 3, minHits = 5L)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a bloom might_contain probe in the plan:\n$plan")
  }

  test("L2i edit-distance pairs: vocabulary pairing, counts, threshold, block bound") {
    val rows = Seq(
      "linksys home", "linksys home", "linksys hone",   // d=1 typo (dup row too)
      "linksys office",                                 // d>3 from the others
      "netgear 5g", "netgear 5ghz",                     // d=2 suffix variant
      "lynksys home"                                    // first-token typo: other block
    ).zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "ssid")
    val got = Dedup.editDistancePairs(rows, "ssid", maxDist = 3)
      .orderBy("a_val", "b_val")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      ("linksys home", "linksys hone", 1L, 2L, 1L),
      ("netgear 5g", "netgear 5ghz", 2L, 1L, 1L)))
    // documented recall bound: "lynksys home" (d=1 of "linksys home")
    // lands in another first-token block and is NOT paired — same
    // class of miss as simhash banding past its hamming bound
    assert(!got.exists(p => p._1.startsWith("lynksys") || p._2.startsWith("lynksys")))
    // "linksys office" is within the block but beyond maxDist → absent
    assert(!got.exists(p => p._2 == "linksys office"))
  }

  test("L2n winnowing: reference equality, shared-run guarantee, density, short docs") {
    // reference: literal Schleimer et al. — per window of w gram
    // hashes, select the (hash, pos)-lexicographic min; distinct
    def refWinnow(text: String, k: Int, w: Int): Set[(Long, Long)] = {
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.length < k) return Set.empty
      val md = java.security.MessageDigest.getInstance("MD5")
      val hs = (0 to toks.length - k).map { i =>
        val hex = md.digest(s"0:${toks.slice(i, i + k).mkString(" ")}"
          .getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.take(15), 16)
      }
      val full = math.min(w, hs.length)
      (full to hs.length).map { end =>
        val win = ((end - full) until end).map(j => (hs(j), (j + 1).toLong))
        win.min  // (hash, pos) lexicographic — leftmost pos on hash ties
      }.toSet.map((p: (Long, Long)) => (p._2, p._1))
    }
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "short doc here"),                         // < k tokens -> none
      (3L, "one two three four five six"),            // n_grams=2 < w -> 1 window
      (4L, "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp"))
    val df = texts.toDF("doc_id", "text")
    val got = Dedup.winnowingFingerprints(df, k = 5, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    texts.foreach { case (id, t) =>
      assert(got.getOrElse(id, Set.empty) == refWinnow(t, 5, 4),
        s"winnowing mismatch on doc $id")
    }
    // guarantee: docs sharing a w+k-1-token run share a fingerprint HASH
    val shared = "alpha beta gamma delta epsilon zeta eta theta"  // 8 = w+k-1
    val pair = Seq((10L, s"intro words here then $shared"),
      (11L, s"$shared and a completely different tail part")).toDF("doc_id", "text")
    val fps = Dedup.winnowingFingerprints(pair, k = 5, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    assert(fps(10L).map(_._2).toSet.intersect(fps(11L).map(_._2).toSet).nonEmpty,
      "shared w+k-1 run must contribute at least one common fingerprint")
    // density: selections are a strict subset of gram positions
    val n4 = texts.find(_._1 == 4L).get._2.split(" ").length - 4
    assert(got(4L).size < n4, "winnowing must be sparser than the gram stream")
  }

  test("L2o winnowing matches: planted overlap found, posting cap silences boilerplate") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"intro one two three then $shared closing words here now"),
      (2L, s"$shared with a completely different ending part here"),
      (3L, "unrelated content about nothing shared with the others at all")
    ).toDF("doc_id", "text")
    val got = Dedup.winnowingMatches(docs, k = 5, w = 4, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // only the planted pair matches, with >= 2 shared fingerprints
    assert(got.map(t => (t._1, t._2)) == Seq((1L, 2L)))
    assert(got.head._3 >= 2L)
    // a boilerplate fingerprint shared by EVERY doc is capped out of the
    // index: with maxPostings = 2 on a 3-doc corpus where all three share
    // the same long run, no bucket survives and no pairs emit
    val boiler = Seq.tabulate(3)(i => (i.toLong, s"doc $i reads $shared"))
      .toDF("doc_id", "text")
    val capped = Dedup.winnowingMatches(boiler, k = 5, w = 4,
      minShared = 1L, maxPostings = 2)
    assert(capped.count() == 0L,
      "fingerprints above the posting cap must not generate pairs")
  }

  test("L2j segment dedup: first occurrence survives, docs reassemble in order") {
    import spark.implicits._
    // "BOILER" repeats across docs 1/2/3 and within doc 3; doc 4 is
    // ENTIRELY boilerplate (must survive as an empty row); doc 5 has
    // no delimiter at all (whole text = one segment)
    val docs = Seq(
      (1L, "intro\nBOILER\nbody one"),
      (2L, "BOILER\nbody two"),
      (3L, "body three\nBOILER\nBOILER\ntail"),
      (4L, "BOILER"),
      (5L, "standalone text")).toDF("doc_id", "text")
    val got = Dedup.segmentDedup(docs, "\n", "\n")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "intro\nBOILER\nbody one", // first occurrence keeps its line
      2L -> "body two",
      3L -> "body three\ntail",
      4L -> "",                        // fully deduplicated, row kept
      5L -> "standalone text"))
  }

  test("L2j segment dedup drops whitespace segments and keeps row count") {
    import spark.implicits._
    val docs = Seq((1L, "a\n\n  \nb"), (2L, ""), (3L, "a")).toDF("doc_id", "text")
    val got = Dedup.segmentDedup(docs, "\n", " | ")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a | b", 2L -> "", 3L -> ""))
  }

  test("L2i thresholded distance equals the unthresholded builtin within range") {
    val rows = Seq((1L, "alpha beta"), (2L, "alpha bexa"), (3L, "alpha b"))
      .toDF("id", "v")
    val pairs = Dedup.editDistancePairs(rows, "v", maxDist = 3)
      .withColumn("d_full", levenshtein(col("a_val"), col("b_val")).cast("long"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getAs[Long]("d") == r.getAs[Long]("d_full"))
    }
  }

  test("L2q set-similarity join: equality vs all-pairs brute force at awkward thresholds") {
    import graft.functions.TextFunctions
    // brute force: EVERY gram (not just prefixes) generates candidates
    def brute(tn: Int, td: Int, n: Int) = {
      val dg = docs.select(col("doc_id"),
          explode(TextFunctions.ngramsOfTokens(
            TextFunctions.tokens(col("text")), n)).as("g"))
        .distinct()
      val sz = dg.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      dg.as("a").join(dg.as("b"),
          col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("inter"))
        .join(sz.as("sa"), col("sa.doc_id") === col("a_id"))
        .join(sz.as("sb"), col("sb.doc_id") === col("b_id"))
        .select(col("a_id"), col("b_id"), col("inter"),
          (col("sa.sz") + col("sb.sz") - col("inter")).as("uni"))
        .filter(col("inter") * td >= lit(tn) * col("uni"))
    }
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id", "inter", "uni").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    // 3/5 and 9/10 have no exact double representation of t*|s| — the
    // integer ceil-division prefix bound must not lose pairs there
    for ((tn, td) <- Seq((1, 2), (3, 5), (9, 10)))
      assert(key(Dedup.setSimJoin(docs, n = 2, tNum = tn, tDen = td)) ==
        key(brute(tn, td, 2)), s"t=$tn/$td")
  }

  test("L2q set-similarity join: planted dups found, cross-cluster pairs absent") {
    val got = Dedup.setSimJoin(docs, n = 2, tNum = 1, tDen = 2).collect()
    val pairs = got.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    // exact dup pair in every cluster, at jacc exactly 1.0
    for (c <- 0 until 5) assert(pairs.contains((c * 10L, c * 10L + 1)))
    got.filter(r => r.getAs[Long]("a_id") % 10 == 0 &&
        r.getAs[Long]("b_id") == r.getAs[Long]("a_id") + 1)
      .foreach(r => assert(r.getAs[Double]("jacc") == 1.0))
    // no pair spans two clusters or touches a singleton
    pairs.foreach { case (a, b) =>
      assert(a < 100 && b < 100 && a / 10 == b / 10, s"spurious pair ($a,$b)")
    }
  }

  test("L3h dimAblation: full-dim row reports k; misleading prefixes lose recall") {
    import spark.implicits._
    // 4-dim vectors whose FIRST two dims are identical everywhere —
    // a 2-dim prefix ranking is pure tie-break noise, the full ranking
    // lives in dims 3..4
    def v(a: Float, b: Float) = Array(1.0f, 1.0f, a, b)
    val qs = Seq((0L, v(1f, 0f))).toDF("vec_id", "embedding")
    // larger id → SMALLER angle to the query: the true top-5 is ids
    // 16..20, while the constant-prefix tie-break picks ids 1..5
    val cs = (1 to 20).map { i =>
      val t = (21 - i) / 20.0
      (i.toLong, v(math.cos(t).toFloat, math.sin(t).toFloat))
    }.toDF("vec_id", "embedding")
    val got = Similarity.dimAblation(qs, cs, dims = Seq(2, 4), k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(4L) == 5L, "full-dim ablation row must equal k")
    assert(got(2L) < 5L,
      s"constant-prefix ranking cannot recover the full top-k (got ${got(2L)})")
  }

  test("L2w pairFeatures: exact dup, excerpt, and unrelated pairs read correctly") {
    import spark.implicits._
    val big = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    val docs = Seq(
      (1L, "s", big), (2L, "s", big),                        // exact dups
      (3L, "s", "the quick brown fox jumps over the lazy dog"), // excerpt of 1
      (4L, "s", "completely different words entirely here now"),
      (5L, "t", big))                                        // other block: never paired
      .toDF("doc_id", "source", "text")
    val got = Dedup.pairFeatures(docs, "source", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5),
          r.getLong(6), r.getBoolean(7)))).toMap
    // exact dup: every feature at its identity value
    assert(got((1L, 2L)) == ((1.0, 1.0, 1.0, 1000L, 0L, true)), got((1L, 2L)))
    // excerpt: containment 3→1 is 1.0 (all of 3's grams inside 1),
    // jaccard much lower, not an exact dup
    val (j13, cab13, cba13, _, _, ex13) = got((1L, 3L))
    assert(cba13 == 1.0 && j13 < 0.6 && !ex13, got((1L, 3L)))
    assert(cab13 < 1.0)
    // unrelated: zero gram overlap, far simhash
    val (j14, _, _, _, ham14, ex14) = got((1L, 4L))
    assert(j14 == 0.0 && ham14 > 10L && !ex14, got((1L, 4L)))
    // blocking: doc 5 (other source) pairs with nothing
    assert(!got.keySet.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("L2u lshPlan: exact s-curve values, monotone in s, thresholds order by r") {
    val rows = Dedup.lshPlan(spark, numHashes = 32).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    // 6 factorizations × 19 similarity points
    assert(rows.size == 6 * 19)
    // every point matches the closed form computed here (same JVM libm)
    rows.foreach { case ((b, r, sp), (pm, tm)) =>
      val s = sp / 1000.0
      assert(pm == math.floor((1.0 - math.pow(1.0 - math.pow(s, r.toDouble),
        b.toDouble)) * 1e6).toLong, s"p mismatch at b=$b r=$r s=$sp")
      assert(tm == math.floor(math.pow(1.0 / b, 1.0 / r) * 1e6).toLong)
    }
    // s-curve is non-decreasing in s for each scheme
    for (r <- Seq(1L, 2L, 4L, 8L, 16L, 32L)) {
      val curve = (50L to 950L by 50L).map(sp => rows((32L / r, r, sp))._1)
      assert(curve == curve.sorted, s"curve not monotone for r=$r")
    }
    // more rows per band → higher threshold (the tuning knob)
    val thresholds = Seq(1L, 2L, 4L, 8L, 16L, 32L).map(r => rows((32L / r, r, 50L))._2)
    assert(thresholds == thresholds.sorted)
  }
}
