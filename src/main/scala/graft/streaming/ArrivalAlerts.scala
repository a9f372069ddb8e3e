package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST7 — arrival/reappearance alerting ("Tracking / Arrival alerts",
  * README.md:19) as keyed arbitrary state: per MAC, remember the last
  * sighting; emit an alert on first sight or when a device reappears
  * after an absence gap.
  *
  * flatMapGroupsWithState is the public keyed-state API (SURVEY §4.2 —
  * no SparkStrategy needed): state lives in the state store, scales by
  * key hash-partitioning, and survives restarts via checkpointing. At
  * fleet scale the state is one (long, timestamp) per device — millions
  * of devices fit one executor's store comfortably.
  */
object ArrivalAlerts {

  final case class Sighting(mac: String, ts: Timestamp)
  final case class DeviceState(lastSeen: Long)
  final case class Alert(mac: String, kind: String, ts: Timestamp, gapSec: Long)

  /** Core transition — pure, unit-testable: given sightings of ONE mac
    * (any order within the batch) and prior state, emit alerts + new
    * state. first_seen on no prior state; reappeared on gap > gapSec. */
  def transition(mac: String, sightings: Iterator[Sighting],
      prior: Option[DeviceState], gapSec: Long): (List[Alert], DeviceState) = {
    val sorted = sightings.toList.sortBy(_.ts.getTime)
    var last = prior.map(_.lastSeen)
    val alerts = List.newBuilder[Alert]
    sorted.foreach { s =>
      val t = s.ts.getTime
      last match {
        case None =>
          alerts += Alert(mac, "first_seen", s.ts, -1L)
        case Some(prev) if t - prev > gapSec * 1000L =>
          alerts += Alert(mac, "reappeared", s.ts, (t - prev) / 1000L)
        case _ => ()
      }
      if (last.forall(_ < t)) last = Some(t)
    }
    (alerts.result(), DeviceState(last.getOrElse(0L)))
  }

  /** Wire the transition into flatMapGroupsWithState (append output
    * mode — alerts are emit-once facts, never updated). Works on a
    * streaming Dataset and on a batch Dataset (single "batch" per
    * group, no prior state) — the batch path doubles as the
    * deterministic spec for the streaming one.
    *
    * State-growth caveat: probe-request MACs are randomized by modern
    * devices, so per-MAC state here grows with the number of DISTINCT
    * MACs ever heard (NoTimeout). For unbounded deployments prefer
    * [[ArrivalAlertsTws]], whose state TTL expires silent keys. */
  def alerts(sightings: Dataset[Sighting], gapSec: Long = 3600L)
      (implicit spark: SparkSession): Dataset[Alert] = {
    import spark.implicits._
    sightings
      .groupByKey(_.mac)
      .flatMapGroupsWithState[DeviceState, Alert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (mac: String, it: Iterator[Sighting], state: GroupState[DeviceState]) =>
          val (out, next) = transition(mac, it, state.getOption, gapSec)
          state.update(next)
          out.iterator
      }
  }
}
