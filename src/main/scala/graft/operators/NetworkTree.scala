package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The declared "Network Tree (AP - Known clients)" correlation
  * (ssidentity.c:36, README.md:16): the bipartite device↔SSID graph,
  * plain relational — an edge list with weights plus per-node adjacency
  * views. No graph engine: one hash aggregation each, and the adjacency
  * arrays are bounded by slice() so a hub SSID can't blow up a row.
  */
object NetworkTree {

  /** Weighted edge list: one row per (mac, ssid) with sighting count. */
  def edges(obs: DataFrame, mac: String = "mac", ssid: String = "ssid"): DataFrame =
    obs.groupBy(col(mac).as("mac"), col(ssid).as("ssid"))
      .agg(count(lit(1)).as("weight"))

  /** Device → probed-SSID adjacency ("Interests", README.md:18): SSIDs
    * sorted by weight desc (ties lexical), capped at `maxDegree`. */
  def deviceAdjacency(obs: DataFrame, maxDegree: Int = 32,
      mac: String = "mac", ssid: String = "ssid"): DataFrame =
    edges(obs, mac, ssid)
      .groupBy("mac")
      .agg(
        count(lit(1)).cast("long").as("degree"),
        slice(transform(
          array_sort(collect_list(struct(-col("weight") as "nw", col("ssid")))),
          s => s.getField("ssid")), 1, maxDegree).as("ssids"))

  /** SSID → devices-that-probed-it adjacency (the AP side of the tree). */
  def ssidAdjacency(obs: DataFrame, maxDegree: Int = 32,
      mac: String = "mac", ssid: String = "ssid"): DataFrame =
    edges(obs, mac, ssid)
      .groupBy("ssid")
      .agg(
        count(lit(1)).cast("long").as("degree"),
        slice(transform(
          array_sort(collect_list(struct(-col("weight") as "nw", col("mac")))),
          s => s.getField("mac")), 1, maxDegree).as("macs"))

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
