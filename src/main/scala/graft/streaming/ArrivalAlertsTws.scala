package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

import ArrivalAlerts.{Alert, DeviceState, Sighting}

/** ST7 on Spark 4's transformWithState API — the successor to
  * flatMapGroupsWithState (typed composite state in the RocksDB state
  * store, timers, state TTL). Same alert semantics as
  * [[ArrivalAlerts]]: the pure `transition` function is shared, so the
  * two engines are provably computing the same thing and the spec
  * cross-checks their outputs.
  *
  * transformWithState requires the RocksDB state store provider
  * (bundled with Spark 4); callers set
  * spark.sql.streaming.stateStore.providerClass =
  * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
  */
object ArrivalAlertsTws {

  class AlertProcessor(gapSec: Long, stateTtl: java.time.Duration)
      extends StatefulProcessor[String, Sighting, Alert] {
    @transient private var state: ValueState[DeviceState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      // TTL bounds the per-MAC state: probe-request MACs are RANDOMIZED
      // by modern devices, so the key space is unbounded-unique and
      // never-expiring state grows monotonically. A device silent past
      // the TTL re-alerts as first_seen — the correct behavior for a
      // tracker anyway.
      val ttl =
        if (stateTtl == null || stateTtl.isZero || stateTtl.isNegative)
          org.apache.spark.sql.streaming.TTLConfig.NONE
        else org.apache.spark.sql.streaming.TTLConfig(stateTtl)
      state = getHandle.getValueState[DeviceState](
        "deviceState", Encoders.product[DeviceState], ttl)
    }

    override def handleInputRows(mac: String, rows: Iterator[Sighting],
        timers: TimerValues): Iterator[Alert] = {
      val prior = Option(state.get())
      val (alerts, next) = ArrivalAlerts.transition(mac, rows, prior, gapSec)
      state.update(next)
      alerts.iterator
    }
  }

  /** `stateTtl` bounds per-MAC state for unbounded deployments
    * (randomized probe MACs make the key space effectively infinite);
    * a device silent past the TTL re-alerts as first_seen. Defaults to
    * ZERO (no expiry, TimeMode.None) so deterministic tests and
    * bounded-key uses are unaffected; production passes e.g.
    * Duration.ofDays(7), which switches the operator to
    * processing-time semantics (TTL requires it). */
  def alerts(sightings: Dataset[Sighting], gapSec: Long = 3600L,
      stateTtl: java.time.Duration = java.time.Duration.ZERO)
      (implicit spark: SparkSession): Dataset[Alert] = {
    import spark.implicits._
    val ttlOn = stateTtl != null && !stateTtl.isZero && !stateTtl.isNegative
    sightings
      .groupByKey(_.mac)
      .transformWithState(new AlertProcessor(gapSec, stateTtl),
        if (ttlOn) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }
}
