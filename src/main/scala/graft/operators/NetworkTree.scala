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
    * standard skew defense (with degree ordering instead of id order
    * it is optimal: a hub's wedges land only on its few higher-degree
    * neighbors; id order is the deterministic, oracle-replayable
    * proxy). Both joins are equi joins — shuffled hash/SMJ at any
    * scale, no broadcast of the edge list required.
    *
    * Input contract: one row per undirected edge. Rows violating the
    * orientation (a >= b, incl. self-loops) are dropped by an explicit
    * guard rather than silently double-counting; callers with raw
    * symmetric edge lists should canonicalize ((least, greatest) +
    * distinct) first. */
  def triangleCounts(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .filter(col("a") < col("b"))
    val tri = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("ta"), col("e1.b").as("tb"), col("e2.b").as("tc"))
      .join(e.as("e3"),
        col("ta") === col("e3.a") && col("tc") === col("e3.b"), "left_semi")
    tri.select(explode(array(col("ta"), col("tb"), col("tc"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_triangles"))
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
