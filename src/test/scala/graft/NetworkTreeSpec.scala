package graft

import org.apache.spark.sql.functions._

import graft.operators.NetworkTree

/** The bipartite device↔SSID graph views over a hand-built topology. */
class NetworkTreeSpec extends SparkTestBase {
  import spark.implicits._

  // household: A,B share "home"; workplace: B,C share "office";
  // "hub" is probed by everyone (captive-portal noise)
  private lazy val obs = Seq(
    ("A", "home"), ("A", "home"), ("A", "hub"),
    ("B", "home"), ("B", "office"), ("B", "hub"),
    ("C", "office"), ("C", "office"), ("C", "office"), ("C", "hub"))
    .toDF("mac", "ssid")

  test("edges carry sighting weights") {
    val e = NetworkTree.edges(obs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(e(("A", "home")) == 2 && e(("C", "office")) == 3 && e(("B", "hub")) == 1)
  }

  test("device adjacency ranks SSIDs by weight, ties lexically, capped") {
    val adj = NetworkTree.deviceAdjacency(obs, maxDegree = 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getSeq[String](2))).toMap
    assert(adj("A") == ((2L, Seq("home", "hub"))))
    assert(adj("B") == ((3L, Seq("home", "hub"))))   // all weight 1 -> lexical, capped at 2
    assert(adj("C") == ((2L, Seq("office", "hub"))))
  }

  test("ssid adjacency is the transposed view") {
    val adj = NetworkTree.ssidAdjacency(obs).collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(adj("home") == Seq("A", "B"))
    assert(adj("hub") == Seq("A", "B", "C"))
  }

  test("bounded adjacency == unbounded collect-then-slice model on random graphs") {
    // the rank-filter-before-collect formulation (bounded aggregation
    // state) must equal the naive collect-everything-then-slice model
    val rng = new scala.util.Random(11L)
    val rand = (0 until 2000).map(_ =>
      (s"m${rng.nextInt(40)}", s"s${rng.nextInt(25)}")).toDF("mac", "ssid")
    val maxDeg = 5
    val got = NetworkTree.deviceAdjacency(rand, maxDeg).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[String](2)))).toMap
    val e = NetworkTree.edges(rand)
    val model = e.groupBy("mac").agg(
        count(lit(1)).cast("long").as("degree"),
        slice(transform(
          array_sort(collect_list(struct(-col("weight") as "nw", col("ssid")))),
          s => s.getField("ssid")), 1, maxDeg).as("ssids"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[String](2)))).toMap
    assert(got == model)
  }

  test("co-probe projection links devices via shared SSIDs, hubs excluded") {
    val pairs = NetworkTree.coProbePairs(obs, maxSsidDegree = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // hub (degree 3) excluded -> A-B via home, B-C via office, no A-C
    assert(pairs == Map(("A", "B") -> 1L, ("B", "C") -> 1L))
  }

  test("triangle counts: K4 minus an edge, square, and isolated edge") {
    // vertices 1-4 fully connected except (3,4); square 5-6-7-8 (no
    // chords → no triangles); isolated edge (9,10). Ordered orientation.
    val e = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),     // K4 \ {3,4}
      (5L, 6L), (6L, 7L), (7L, 8L), (5L, 8L),               // square
      (9L, 10L))                                            // lone edge
      .toDF("pa", "pb")
    val got = NetworkTree.triangleCounts(e, "pa", "pb")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // triangles: (1,2,3) and (1,2,4) — vertices 1,2 in both; 3,4 in one
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("degree-ordered triangles equal id-ordered on fixed and random graphs") {
    val fixed = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (5L, 6L), (6L, 7L), (7L, 8L), (5L, 8L), (9L, 10L)).toDF("pa", "pb")
    def counts(df: org.apache.spark.sql.DataFrame, deg: Boolean) =
      (if (deg) NetworkTree.triangleCountsDegreeOrdered(df, "pa", "pb")
       else NetworkTree.triangleCounts(df, "pa", "pb"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(fixed, deg = true) == counts(fixed, deg = false))
    // deterministic pseudo-random graph on 60 vertices (md5 scatter)
    val rnd = (0 until 600).map { i =>
      val a = math.abs((i * 2654435761L) % 60)
      val b = math.abs((i * 40503L + 17) % 60)
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct.toDF("pa", "pb")
    assert(counts(rnd, deg = true) == counts(rnd, deg = false))
  }

  test("clustering coefficient: clique 1.0, path middle 0, degree<2 NULL") {
    // K4 on 1..4 (coeff 1.0 everywhere), plus a pendant 5 hanging off 4
    // (4's coeff drops: 3 closed pairs of its C(4,2)=6), plus a 6-7
    // isolated edge (degree 1 -> NULL)
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val e = (k4 ++ Seq((4L, 5L), (6L, 7L))).toDF("pa", "pb")
    val got = NetworkTree.clusteringCoefficient(e, "pa", "pb")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got(1L) == ((3L, 3L, Some(1000000L))))
    assert(got(2L) == ((3L, 3L, Some(1000000L))))
    assert(got(3L) == ((3L, 3L, Some(1000000L))))
    // 4: degree 4, still in 3 triangles -> 2*3/(4*3) = 0.5
    assert(got(4L) == ((4L, 3L, Some(500000L))))
    assert(got(5L) == ((1L, 0L, None)), "pendant: no neighbor pairs")
    assert(got(6L) == ((1L, 0L, None)) && got(7L) == ((1L, 0L, None)))
    // path a-b-c: middle vertex has 2 neighbors that are NOT connected
    val path = Seq((10L, 11L), (11L, 12L)).toDF("pa", "pb")
    val mid = NetworkTree.clusteringCoefficient(path, "pa", "pb")
      .filter($"v" === 11L).collect().head
    assert(mid.getLong(1) == 2L && mid.getLong(2) == 0L && mid.getLong(3) == 0L)
  }

  test("degree order bounds hub wedge fan-out where id order is quadratic") {
    // The wedge join enumerates PATHS lo→mid→hi, so the blow-up vertex
    // is a hub in the MIDDLE of the id order: hub 21 with 20 lower-id
    // and 20 higher-id leaves contributes in(21)·out(21) = 400 id-order
    // wedges. Degree order points every edge AT the hub (highest
    // degree), so in·out = 40·0 = 0 there, and only leaf-side wedges
    // remain. Edge (1, 22) closes the single triangle (1, 21, 22).
    val star = ((1L to 20L).map(l => (l, 21L)) ++
      (22L to 41L).map(l => (21L, l)) :+ (1L, 22L)).toDF("pa", "pb")
    def wedges(e: org.apache.spark.sql.DataFrame): Long =
      e.as("e1").join(e.as("e2"), col("e1.hi") === col("e2.lo")).count()
    val idEdges = star.select(col("pa").as("lo"), col("pb").as("hi"))
    val degEdges = NetworkTree.degreeOrientedEdges(star, "pa", "pb")
    val idW = wedges(idEdges)
    val degW = wedges(degEdges)
    assert(idW >= 400L, s"id order must be hub-quadratic here: $idW")
    assert(degW <= 41L, s"degree order must bound hub fan-out: $degW")
    // and the counts still agree: exactly one triangle (1, 21, 22)
    val got = NetworkTree.triangleCountsDegreeOrdered(star, "pa", "pb")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 21L -> 1L, 22L -> 1L))
    assert(got == NetworkTree.triangleCounts(star, "pa", "pb")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }
}
