package graft

import org.apache.spark.sql.functions._

import graft.operators.{Components, RangeJoin}

/** Connected components (hash-min propagation) and the binned interval
  * join — round-4 scale operators. Both are checked against brute-force
  * models on randomized inputs, plus plan-shape proofs that the binned
  * join really is an equi join (no nested-loop fallback). */
class ComponentsSpec extends SparkTestBase {
  import spark.implicits._

  // ---------------- connected components ----------------

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(
      nodes.toDF("node"), edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("components: two clusters, a chain, and singletons") {
    // {1,2,3} triangle-ish, {10,11,12,13} a 4-chain, {99} alone
    val got = cc(Seq(1L, 2L, 3L, 10L, 11L, 12L, 13L, 99L),
      Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 13L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 99L -> 99L))
  }

  test("components: duplicate/reversed/self-loop edges don't change the answer") {
    val got = cc(Seq(1L, 2L, 3L),
      Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("components == brute-force union-find on a random graph") {
    val rnd = new scala.util.Random(42)
    val n = 60
    val nodes = (0L until n).toSeq
    val edges = Seq.fill(45)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    // driver-side union-find as the model
    val parent = Array.tabulate(n.toInt)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val model = nodes.map { v =>
      // component label = min member id
      val root = find(v.toInt)
      val minMember = nodes.filter(u => find(u.toInt) == root).min
      v -> minMember
    }.toMap
    assert(cc(nodes, edges) == model)
  }

  test("components == union-find on larger graphs across seeds (multi-round convergence)") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val n = 400
      val nodes = (0L until n).toSeq
      // sparse edges → long chains → several propagation rounds
      val edges = Seq.fill(260)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val parent = Array.tabulate(n.toInt)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val roots = nodes.groupBy(v => find(v.toInt))
      val model = roots.flatMap { case (_, vs) => val m = vs.min; vs.map(_ -> m) }
      assert(cc(nodes, edges) == model, s"seed $seed")
    }
  }

  test("reliable-checkpoint strategy produces identical components (fleet posture)") {
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 99L)
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val local = cc(nodes, edges)
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(graft.operators.Checkpoint.ReliableConfKey, "true")
    try {
      assert(cc(nodes, edges) == local,
        "reliable checkpoint must not change the fixpoint")
    } finally spark.conf.unset(graft.operators.Checkpoint.ReliableConfKey)
  }

  test("cluster representatives: best quality wins, ties to min id, singletons kept") {
    // docs 1/2 near-identical (same source, shared trigrams), 2 longer
    // → rep of the {1,2} cluster; 3 unique → its own rep; 4/5 identical
    // quality → tie breaks to the smaller id
    val docs = Seq(
      (1L, "s1", "alpha beta gamma delta epsilon zeta", 30L),
      (2L, "s1", "alpha beta gamma delta epsilon zeta eta theta", 40L),
      (3L, "s1", "totally different content with no shared trigrams here", 99L),
      (4L, "s2", "one two three four five six seven", 25L),
      (5L, "s2", "one two three four five six seven eight", 25L))
      .toDF("doc_id", "source", "text", "n_chars")
    val got = Components
      .clusterRepresentatives(docs, "source", col("n_chars"), n = 3, threshold = 0.2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((2L, 40L, 2L)), s"cluster 1: ${got.get(1L)}")   // rep = longer doc 2
    assert(got(3L) == ((3L, 99L, 1L)))                                 // singleton keeps itself
    assert(got(4L) == ((4L, 25L, 2L)), s"tie to min id: ${got.get(4L)}")
  }

  test("bfs hops: chain distances, min over multiple paths, bound respected") {
    import org.apache.spark.sql.functions.col
    // chain a→b→c→d→e plus shortcut a→c; x↔y unreachable
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
      ("a", "c"), ("x", "y"), ("y", "x")).toDF("src", "dst")
    val got = graft.operators.Components
      .bfsHops(edges, "src", "dst", Seq("a").toDF("node"), maxHops = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // c is 1 via the shortcut (min distance, not path order), which
    // pulls d to 2 and e to 3; x/y stay unreachable → absent
    assert(got == Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 2L, "e" -> 3L))
    val tight = graft.operators.Components
      .bfsHops(edges, "src", "dst", Seq("a").toDF("node"), maxHops = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tight == Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 2L),
      "maxHops must cut the frontier, not round up")
    // maxHops=0 returns exactly the seed set; isolated seeds still rank 0
    val seedsOnly = graft.operators.Components
      .bfsHops(edges, "src", "dst", Seq("a", "zzz").toDF("node"), maxHops = 0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(seedsOnly == Map("a" -> 0L, "zzz" -> 0L))
    // direction matters: seeding the sink reaches nothing
    val fromSink = graft.operators.Components
      .bfsHops(edges, "src", "dst", Seq("e").toDF("node"), maxHops = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromSink == Map("e" -> 0L))
    intercept[IllegalArgumentException](graft.operators.Components
      .bfsHops(edges, "src", "dst", Seq("a").toDF("wrong"), 2))
  }

  test("bfs hops == single-threaded BFS on a random graph") {
    var s = 7L
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); s }
    val edges = (0 until 300).map(_ =>
      (s"n${math.floorMod(next(), 40L)}", s"n${math.floorMod(next(), 40L)}"))
    val seeds = Seq("n0", "n17")
    def reference(maxHops: Int): Map[String, Long] = {
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      var dist = seeds.map(_ -> 0L).toMap
      var frontier = seeds.toSet
      for (h <- 1 to maxHops) {
        val nxt = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
          .diff(dist.keySet)
        dist = dist ++ nxt.map(_ -> h.toLong)
        frontier = nxt
      }
      dist
    }
    val got = graft.operators.Components
      .bfsHops(edges.toDF("src", "dst"), "src", "dst",
        seeds.toDF("node"), maxHops = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == reference(4))
  }

  test("components: empty graph yields an empty result, not an NPE") {
    val got = Components.connectedComponents(
      Seq.empty[Long].toDF("node"), Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(got.count() == 0)
  }

  test("components: non-convergence within maxRounds throws, not silently wrong") {
    // a 6-chain needs ~5 propagation rounds; cap at 2
    val nodes = (0L to 5L).toDF("node")
    val edges = (0L to 4L).map(i => (i, i + 1)).toDF("src", "dst")
    intercept[IllegalStateException] {
      Components.connectedComponents(nodes, edges, maxRounds = 2).collect()
    }
  }

  // ---------------- large-star / small-star ----------------

  private def ccStar(nodes: Seq[Long], edges: Seq[(Long, Long)],
      maxRounds: Int = 50): Map[Long, Long] =
    Components.starContractionComponents(
      nodes.toDF("node"), edges.toDF("src", "dst"), maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star contraction == hash-min on random graphs across seeds") {
    for (seed <- Seq(1, 5, 9)) {
      val rnd = new scala.util.Random(seed)
      val n = 300
      val nodes = (0L until n).toSeq
      val edges = Seq.fill(200)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      assert(ccStar(nodes, edges) == cc(nodes, edges), s"seed $seed")
    }
  }

  test("star contraction solves a long chain in O(log n) rounds where hash-min cannot") {
    // a 120-node path has diameter 119: hash-min capped at 12 rounds
    // throws; star contraction converges well inside the same cap —
    // the adversarial-diameter scale claim, measured
    val nodes = (0L until 120L).toSeq
    val edges = (0L until 119L).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      Components.connectedComponents(
        nodes.toDF("node"), edges.toDF("src", "dst"), maxRounds = 12).collect()
    }
    val got = ccStar(nodes, edges, maxRounds = 12)
    assert(got == nodes.map(_ -> 0L).toMap)
  }

  test("star contraction: singletons, duplicates, self-loops, empty graph") {
    val got = ccStar(Seq(1L, 2L, 3L, 7L),
      Seq((1L, 2L), (2L, 1L), (3L, 3L), (1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 7L -> 7L))
    val empty = Components.starContractionComponents(
      Seq.empty[Long].toDF("node"), Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(empty.count() == 0)
  }

  // ---------------- binned interval join ----------------

  test("binned interval join == naive range join, including bin-boundary points") {
    val rnd = new scala.util.Random(7)
    // points and intervals on a seconds timeline, many exactly on
    // 60s bin edges to exercise the boundary
    val pts = (1 to 300).map { i =>
      val s = if (i % 3 == 0) (i % 20) * 60L else rnd.nextInt(1200).toLong
      (i.toLong, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s)))
    }.toDF("pid_pt", "pts")
    val ivs = (1 to 80).map { i =>
      val st = if (i % 4 == 0) (i % 15) * 60L else rnd.nextInt(1100).toLong
      val len = rnd.nextInt(200).toLong - 20L // some negative → empty
      (i.toLong,
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(st)),
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(st + len)))
    }.toDF("iid", "ws", "we")
    val binned = RangeJoin.pointInInterval(pts, ivs, "pts", "ws", "we",
        keys = Nil, binSeconds = 60L)
      .select("pid_pt", "iid").as[(Long, Long)].collect().sorted.toSeq
    val naive = pts.join(ivs, col("pts") >= col("ws") && col("pts") <= col("we"))
      .select("pid_pt", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(binned == naive && naive.nonEmpty)
  }

  test("binned interval join == naive across MANY bin widths (width is a perf knob, not a correctness knob)") {
    val rnd = new scala.util.Random(19)
    val pts = (1 to 120).map(i =>
      (i.toLong, ts(rnd.nextInt(3000).toLong))).toDF("pid_pt", "pts")
    val ivs = (1 to 40).map { i =>
      val st = rnd.nextInt(2900).toLong
      (i.toLong, ts(st), ts(st + rnd.nextInt(300).toLong))
    }.toDF("iid", "ws", "we")
    val naive = pts.join(ivs, col("pts") >= col("ws") && col("pts") <= col("we"))
      .select("pid_pt", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(naive.nonEmpty)
    Seq(1L, 7L, 60L, 299L, 3600L).foreach { w =>
      val binned = RangeJoin.pointInInterval(pts, ivs, "pts", "ws", "we",
          keys = Nil, binSeconds = w)
        .select("pid_pt", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(binned == naive, s"width $w")
    }
  }

  test("binned interval join respects equi keys") {
    val pts = Seq(
      (1L, "a", ts(100)), (2L, "b", ts(100)), (3L, "a", ts(500))
    ).toDF("pid_pt", "k", "pts")
    val ivs = Seq((10L, "a", ts(50), ts(150))).toDF("iid", "ik", "ws", "we")
    val got = RangeJoin.pointInInterval(pts, ivs, "pts", "ws", "we",
        keys = Seq("k" -> "ik"), binSeconds = 60L)
      .select("pid_pt", "iid").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L))) // 2 fails the key, 3 fails the range
  }

  test("binned interval join plans an equi join, not a nested loop") {
    val pts = (1 to 50).map(i => (i.toLong, ts(i * 10L))).toDF("pid_pt", "pts")
    val ivs = (1 to 20).map(i => (i.toLong, ts(i * 25L), ts(i * 25L + 30)))
      .toDF("iid", "ws", "we")
    val plan = RangeJoin.pointInInterval(pts, ivs, "pts", "ws", "we")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"))
  }

  test("entity resolution: typo chains collapse, canonical = most frequent variant") {
    import spark.implicits._
    // 'acme corp' appears 5x, one-edit variants 2x/1x; a transitive
    // chain (acme corp -> acme corp. -> acme corpx) must share one
    // entity; 'zenith labs' is an unrelated singleton entity
    val rows = (Seq.fill(5)("acme corp") ++ Seq.fill(2)("acme corp.") ++
      Seq("acme corpx", "zenith labs", "zenith labz"))
      .toDF("name")
    val got = graft.operators.Components.resolveEntities(rows, "name", maxDist = 1)
      .collect()
      .map(r => r.getAs[String]("variant") ->
        ((r.getAs[String]("entity_id"), r.getAs[String]("canonical"),
          r.getAs[Long]("n_variants"), r.getAs[Long]("entity_n"))))
      .toMap
    assert(got.keySet == Set("acme corp", "acme corp.", "acme corpx",
      "zenith labs", "zenith labz"))
    // one entity for the acme chain, labeled by its min variant,
    // canonicalized to the most frequent one
    for (v <- Seq("acme corp", "acme corp.", "acme corpx"))
      assert(got(v) == (("acme corp", "acme corp", 3L, 8L)), v)
    for (v <- Seq("zenith labs", "zenith labz"))
      assert(got(v) == (("zenith labs", "zenith labs", 2L, 2L)), v)
  }

  test("G8 LPA: two cliques with a weak bridge resolve to two communities") {
    import spark.implicits._
    val und = Seq(
      ("a1", "a2", 10L), ("a1", "a3", 10L), ("a2", "a3", 10L),
      ("b1", "b2", 10L), ("b1", "b3", 10L), ("b2", "b3", 10L),
      ("a1", "b1", 1L)).toDF("u", "v", "w")
    val dir = und.select(col("u").as("src"), col("v").as("dst"), col("w"))
      .union(und.select(col("v").as("src"), col("u").as("dst"), col("w")))
    val got = graft.operators.LabelPropagation
      .labelPropagationFixed(dir, "src", "dst", "w", iters = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // hand-traced sync rounds (weight argmax, min-label ties): the
    // cliques converge to their min member; the weak bridge never wins
    assert(Seq("a1", "a2", "a3").forall(got(_) == "a1"), got)
    assert(Seq("b1", "b2", "b3").forall(got(_) == "b1"), got)
    // deterministic: a second run is identical
    val again = graft.operators.LabelPropagation
      .labelPropagationFixed(dir, "src", "dst", "w", iters = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == again)
  }

  test("G10 modularity: hand-computed integer decomposition on cliques + a bridge") {
    import spark.implicits._
    // two 10-weight triangles bridged by a 1-weight edge, plus an
    // isolated 5-weight pair (whose sync-LPA labels oscillate into two
    // singleton communities with ZERO internal weight — exercising the
    // w_in left join)
    val und = Seq(
      ("a1", "a2", 10L), ("a1", "a3", 10L), ("a2", "a3", 10L),
      ("b1", "b2", 10L), ("b1", "b3", 10L), ("b2", "b3", 10L),
      ("a1", "b1", 1L), ("c1", "c2", 5L)).toDF("u", "v", "w")
    val dir = und.select(col("u").as("src"), col("v").as("dst"), col("w"))
      .union(und.select(col("v").as("src"), col("u").as("dst"), col("w")))
    val lab = graft.operators.LabelPropagation
      .labelPropagationFixed(dir, "src", "dst", "w", iters = 3)
    val got = graft.operators.LabelPropagation
      .modularity(und.select(col("u").as("src"), col("v").as("dst"), col("w")),
        "src", "dst", "w", lab)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // W = 66. Cliques: w_in = 30, degw = 21+20+20 = 61,
    //   q_num = 4·66·30 − 61² = 7920 − 3721 = 4199.
    // Oscillated singletons: w_in = 0, degw = 5, q_num = −25.
    assert(got("a1") == ((3L, 61L, 30L, 4199L, 66L)), got)
    assert(got("b1") == ((3L, 61L, 30L, 4199L, 66L)), got)
    assert(got("c1") == ((1L, 5L, 0L, -25L, 66L)), got)
    assert(got("c2") == ((1L, 5L, 0L, -25L, 66L)), got)
    // global Q = Σ q_num / 4W² — positive, as two real cliques must be
    assert(got.values.map(_._4).sum == 2 * 4199L - 50L)
  }

  test("G9 k-core: a clique survives the peel, pendant chains dissolve") {
    import spark.implicits._
    // 4-clique {1,2,3,4} + a chain 4–5–6 hanging off it
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("u", "v")
    val dir = und.select(col("u").as("src"), col("v").as("dst"))
      .union(und.select(col("v").as("src"), col("u").as("dst")))
    val got = graft.operators.KCore.kCoreFixed(dir, "src", "dst", k = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // the chain peels (6 first, then 5); the clique keeps degree 3
    assert(got.keySet == Set(1L, 2L, 3L, 4L), got)
    assert(got.values.forall(_ == ((3L, true))), s"converged 3-core expected: $got")
    // k above the clique degree empties the graph
    assert(graft.operators.KCore.kCoreFixed(dir, "src", "dst", k = 4, rounds = 4)
      .count() == 0L)
  }

  private def ts(s: Long) =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s))
}
