package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

/** Fixed-iteration integer PageRank: exactness against a single-threaded
  * reference of the same quantized update, symmetry/dominance structure,
  * and partitioning-independence. */
class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  /** Single-threaded reference of the EXACT update PageRank.pageRankFixed
    * declares: floor-quantized weighted split, floor-damped sum. */
  private def reference(edges: Seq[(String, String, Long)], iters: Int,
      damping: Double = 0.85): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val baseU = math.floor((1.0 - damping) * 1000000.0).toLong
    var pr = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _, w) =>
          math.floor(pr(s).toDouble * w / outW(s)).toLong
        }.sum
      }
      pr = nodes.map(n =>
        n -> (baseU + math.floor(damping * in.getOrElse(n, 0L)).toLong)).toMap
    }
    pr
  }

  private def run(edges: Seq[(String, String, Long)], iters: Int) =
    PageRank.pageRankFixed(edges.toDF("src", "dst", "w"), "src", "dst", "w", iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("a symmetric 2-cycle keeps both ranks at exactly 10^6") {
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L))
    assert(run(edges, 4) == Map("a" -> 1000000L, "b" -> 1000000L))
  }

  test("matches the single-threaded quantized reference on a star") {
    // symmetrized 3-leaf star: the hub drains the leaves
    val edges = Seq("l1", "l2", "l3").flatMap(l =>
      Seq(("c", l, 1L), (l, "c", 1L)))
    val got = run(edges, 3)
    assert(got == reference(edges, 3))
    assert(got("c") > got("l1"), "hub must outrank leaves")
    assert(got("l1") == got("l2") && got("l2") == got("l3"),
      "symmetric leaves must tie exactly")
  }

  test("matches the reference on a weighted asymmetric graph with a dangling node") {
    // d has in-edges only (dangling: its mass sinks); weights skewed
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L),
      ("c", "a", 1L), ("b", "d", 5L))
    val got = run(edges, 3)
    assert(got == reference(edges, 3))
    assert(got.keySet == Set("a", "b", "c", "d"))
  }

  /** Single-threaded reference of the personalized update: restart mass
    * only on seeds, pr0 = 10^6·[v∈S]. */
  private def referencePpr(edges: Seq[(String, String, Long)],
      seeds: Set[String], iters: Int, damping: Double = 0.85): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val baseU = math.floor((1.0 - damping) * 1000000.0).toLong
    var pr = nodes.map(n => n -> (if (seeds(n)) 1000000L else 0L)).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _, w) =>
          math.floor(pr(s).toDouble * w / outW(s)).toLong
        }.sum
      }
      pr = nodes.map(n =>
        n -> ((if (seeds(n)) baseU else 0L)
          + math.floor(damping * in.getOrElse(n, 0L)).toLong)).toMap
    }
    pr
  }

  private def runPpr(edges: Seq[(String, String, Long)], seeds: Seq[String],
      iters: Int) =
    PageRank.personalizedPageRankFixed(edges.toDF("src", "dst", "w"),
        "src", "dst", "w", seeds.toDF("node"), iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("PPR matches the seeded reference; unreachable nodes rank exactly 0") {
    // two components: a→b→c chain (seeded at a) and an isolated x↔y pair
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L),
      ("x", "y", 1L), ("y", "x", 1L))
    val got = runPpr(edges, Seq("a"), 3)
    assert(got == referencePpr(edges, Set("a"), 3))
    assert(got("x") == 0L && got("y") == 0L,
      "nodes the seed mass cannot reach must rank exactly 0")
    assert(got("a") > got("b") && got("b") > got("c"),
      "proximity to the seed must order the chain")
  }

  test("PPR with every node seeded equals plain PageRank") {
    val edges = Seq(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 3L),
      ("b", "a", 1L))
    val all = (edges.map(_._1) ++ edges.map(_._2)).distinct
    assert(runPpr(edges, all, 3) == run(edges, 3))
  }

  test("PPR rejects a seeds frame without a node column") {
    intercept[IllegalArgumentException] {
      PageRank.personalizedPageRankFixed(
        Seq(("a", "b", 1L)).toDF("src", "dst", "w"),
        "src", "dst", "w", Seq("a").toDF("wrong"), 2)
    }
  }

  test("result is identical at any input partitioning") {
    val edges = (0L until 200L).map(i =>
      (s"n${i % 29}", s"n${(i * 7 + 3) % 29}", i % 5 + 1))
    val df = edges.toDF("src", "dst", "w")
    val a = PageRank.pageRankFixed(df, "src", "dst", "w", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = PageRank.pageRankFixed(df.repartition(17), "src", "dst", "w", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b)
  }
}
