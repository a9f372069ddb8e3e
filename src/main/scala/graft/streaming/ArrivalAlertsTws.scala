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

  class AlertProcessor(gapSec: Long)
      extends StatefulProcessor[String, Sighting, Alert] {
    @transient private var state: ValueState[DeviceState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[DeviceState](
        "deviceState", Encoders.product[DeviceState], org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(mac: String, rows: Iterator[Sighting],
        timers: TimerValues): Iterator[Alert] = {
      val prior = Option(state.get())
      val (alerts, next) = ArrivalAlerts.transition(mac, rows, prior, gapSec)
      state.update(next)
      alerts.iterator
    }
  }

  def alerts(sightings: Dataset[Sighting], gapSec: Long = 3600L)
      (implicit spark: SparkSession): Dataset[Alert] = {
    import spark.implicits._
    sightings
      .groupByKey(_.mac)
      .transformWithState(new AlertProcessor(gapSec),
        TimeMode.None(), OutputMode.Append())
  }
}
