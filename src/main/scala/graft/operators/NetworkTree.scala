package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The declared "Network Tree (AP - Known clients)" correlation
  * (ssidentity.c:36, README.md:16): the bipartite device↔SSID graph,
  * plain relational — an edge list with weights plus per-node adjacency
  * views. No graph engine; the adjacency arrays are rank-filtered to
  * `maxDegree` BEFORE collect_list, so a hub node (a city-wide captive
  * portal with millions of clients) never materializes its full
  * neighbor set in an aggregation buffer — the cap bounds state, not
  * just the output.
  */
object NetworkTree {

  /** Weighted edge list: one row per (mac, ssid) with sighting count. */
  def edges(obs: DataFrame, mac: String = "mac", ssid: String = "ssid"): DataFrame =
    obs.groupBy(col(mac).as("mac"), col(ssid).as("ssid"))
      .agg(count(lit(1)).as("weight"))

  /** Shared bounded-adjacency shape: total degree per key + the top
    * `maxDegree` neighbors by weight desc (ties lexical). */
  private def adjacency(e: DataFrame, key: String, value: String,
      maxDegree: Int, outCol: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col("weight").desc, col(value))
    val top = e.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= maxDegree)
      .groupBy(key)
      .agg(transform(
        array_sort(collect_list(struct(col("_rn").as("rn"), col(value).as("v")))),
        s => s.getField("v")).as(outCol))
    val totals = e.groupBy(key).agg(count(lit(1)).cast("long").as("degree"))
    totals.join(top, Seq(key)).select(col(key), col("degree"), col(outCol))
  }

  /** Device → probed-SSID adjacency ("Interests", README.md:18): SSIDs
    * sorted by weight desc (ties lexical), capped at `maxDegree`. */
  def deviceAdjacency(obs: DataFrame, maxDegree: Int = 32,
      mac: String = "mac", ssid: String = "ssid"): DataFrame =
    adjacency(edges(obs, mac, ssid), "mac", "ssid", maxDegree, "ssids")

  /** SSID → devices-that-probed-it adjacency (the AP side of the tree). */
  def ssidAdjacency(obs: DataFrame, maxDegree: Int = 32,
      mac: String = "mac", ssid: String = "ssid"): DataFrame =
    adjacency(edges(obs, mac, ssid), "ssid", "mac", maxDegree, "macs")

  /** Per-vertex triangle counts over an undirected edge list given in
    * its ordered orientation (every edge once, `a < b`) — the
    * clustering signal of a co-occurrence graph: households/workplaces
    * close triangles, random co-occurrence doesn't. Pure relational
    * triangle enumeration: a wedge join on the middle vertex
    * (a<b ⋈ b<c) then a semi join closing (a, c). The ordered
    * orientation counts every triangle exactly once AND bounds the
    * wedge fan-out of a vertex by its out-degree in the ordering — the
    * standard skew defense. Id order is the simplest deterministic
    * orientation; [[triangleCountsDegreeOrdered]] is the skew-OPTIMAL
    * variant (hub wedges land only on equal-or-higher-degree
    * neighbors) with identical output. Both joins are equi joins —
    * shuffled hash/SMJ at any scale, no broadcast of the edge list
    * required.
    *
    * Input contract: one row per undirected edge. Rows violating the
    * orientation (a >= b, incl. self-loops) are dropped by an explicit
    * guard rather than silently double-counting; callers with raw
    * symmetric edge lists should canonicalize ((least, greatest) +
    * distinct) first. */
  def triangleCounts(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    // three self-join branches, each keyed differently (b, a, (a,b)) —
    // exchange reuse cannot fire across them, so without a checkpoint
    // the whole upstream pair generation (for the co-probe graph, a
    // self-join + degree filter of its own) executes three times
    val e = Checkpoint(pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .filter(col("a") < col("b")))
    val tri = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("ta"), col("e1.b").as("tb"), col("e2.b").as("tc"))
      .join(e.as("e3"),
        col("ta") === col("e3.a") && col("tc") === col("e3.b"), "left_semi")
    tri.select(explode(array(col("ta"), col("tb"), col("tc"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_triangles"))
  }

  /** Degree-ordered orientation of an undirected edge list (input in
    * the canonical a<b form): each edge points from its lower-(degree,
    * id) endpoint to the higher one, as (lo, hi) structs of (d, v).
    * This is the orientation that makes ordered triangle enumeration
    * optimal under skew: a hub's wedges land only on its FEW
    * neighbors of equal-or-higher degree, so wedge fan-out per vertex
    * is bounded by its out-degree in this order — O(m^{3/2}) total
    * wedges in the worst case, vs a hub of degree k generating C(k,2)
    * wedges under id order. The (degree, id) tuple is a total order
    * (id breaks degree ties), so every triangle still counts exactly
    * once. */
  def degreeOrientedEdges(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    // e0 feeds the degree aggregate AND the twice-joined edge stream —
    // EAGER checkpoint (the kCore lesson, measured r16): three
    // consumers in one materializing action race to compute un-cached
    // lazy blocks, re-running the caller's pair generation
    val e0 = Checkpoint(
      pairs.select(col(aCol).as("a"), col(bCol).as("b"))
        .filter(col("a") < col("b")))
    val deg = e0.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val ra = struct(col("da").as("d"), col("a").as("v"))
    val rb = struct(col("db").as("d"), col("b").as("v"))
    e0
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
      .select(when(ra < rb, struct(ra.as("lo"), rb.as("hi")))
        .otherwise(struct(rb.as("lo"), ra.as("hi"))).as("e"))
      .select(col("e.lo").as("lo"), col("e.hi").as("hi"))
  }

  /** Triangle counts under the DEGREE-ordered orientation — identical
    * output to [[triangleCounts]] (both count each triangle once; the
    * spec asserts equality), but with the skew-optimal wedge bound
    * above: this is the variant to run when the co-occurrence graph
    * has hubs, which at 100 TB it always does. Same two equi joins —
    * no broadcast, no cartesian; the only additions are the degree
    * aggregate and two key-side joins of the (v, deg) table. */
  def triangleCountsDegreeOrdered(pairs: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    // same three-branch shape as triangleCounts — materialize the
    // oriented edges once before the fan-out
    val e = Checkpoint(degreeOrientedEdges(pairs, aCol, bCol))
    val tri = e.as("e1").join(e.as("e2"), col("e1.hi") === col("e2.lo"))
      .select(col("e1.lo").as("ta"), col("e1.hi").as("tb"), col("e2.hi").as("tc"))
      .join(e.as("e3"),
        col("ta") === col("e3.lo") && col("tc") === col("e3.hi"), "left_semi")
    tri.select(explode(array(col("ta.v"), col("tb.v"), col("tc.v"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_triangles"))
  }

  /** G7 — local clustering coefficient: per vertex, the fraction of
    * its neighbor pairs that are themselves connected,
    * 2·T(v) / (deg(v)·(deg(v)−1)), quantized to ppm so the division is
    * one engine-agreed float step. The per-node form of the triangle
    * signal: a device whose neighbors interconnect sits INSIDE a
    * household/workplace; a hub with coefficient ≈ 0 is a thoroughfare
    * (captive portal, transit AP). Vertices of degree < 2 have no
    * neighbor pairs — coefficient NULL, not 0 (unknowable ≠ open).
    *
    * Cost shape: [[triangleCountsDegreeOrdered]] (the skew-optimal
    * enumeration) plus one degree aggregate and a key join — nothing
    * beyond the triangle pass itself. */
  def clusteringCoefficient(pairs: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    // the pair generation feeds this degree aggregate AND the whole
    // triangle pass — one eager materialization, every consumer reads
    // blocks (previously the co-probe self-join executed ~5x here)
    val p = Checkpoint(pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .filter(col("a") < col("b")))
    val e = p
    val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("degree"))
    val tri = triangleCountsDegreeOrdered(p, "a", "b")
    deg.join(tri, Seq("v"), "left_outer")
      .select(col("v"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2,
          floor(lit(2000000L) * coalesce(col("n_triangles"), lit(0L))
            / (col("degree") * (col("degree") - 1))).cast("long"))
          .as("coeff_ppm"))
  }

  /** Co-probe projection: devices linked by a shared SSID — the
    * one-mode projection of the bipartite graph, the "same household /
    * workplace" signal. Hub SSIDs are excluded above `maxSsidDegree`
    * (a city-wide captive portal links everyone to everyone — that's
    * noise AND an O(n²)-per-key blowup). */
  def coProbePairs(obs: DataFrame, maxSsidDegree: Int = 50,
      mac: String = "mac", ssid: String = "ssid"): DataFrame = {
    val e = edges(obs, mac, ssid)
    val small = e.join(
      e.groupBy("ssid").agg(count(lit(1)).as("deg"))
        .filter(col("deg") <= maxSsidDegree)
        .select("ssid"),
      Seq("ssid"), "left_semi")
    small.as("a").join(small.as("b"),
        col("a.ssid") === col("b.ssid") && col("a.mac") < col("b.mac"))
      .groupBy(col("a.mac").as("mac_a"), col("b.mac").as("mac_b"))
      .agg(count(lit(1)).as("n_shared_ssids"))
  }
}
