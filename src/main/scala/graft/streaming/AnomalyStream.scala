package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues}

import graft.operators.Trend

/** W14's LIVE form — rolling z-score anomaly flags on an event stream
  * via transformWithState (Spark 4 stateful API, RocksDB state store):
  * the monitoring twin of the batch [[Trend.rollingAnomaly]], for
  * "flag the sensor reading that jumped" while the data is arriving.
  *
  * State per key is the trailing n−1 quantized values — O(n) longs in
  * the state store, nothing unbounded — and every decision calls the
  * SAME pure [[Trend.anomalyDecision]] the batch operator evaluates
  * relationally, so batch backfill and live stream provably agree row
  * for row (cross-checked in StreamingSpec). Rows carry an explicit
  * `seq` and are sorted per (key, micro-batch): within-batch arrival
  * order never changes the answer, the same order-insensitivity
  * contract as [[ArrivalAlerts]].
  */
object AnomalyStream {

  case class Obs(key: String, seq: Long, y: Long)
  case class AnomalyFlag(key: String, seq: Long, zscore: Option[Double],
      isAnomaly: Boolean)
  case class Ring(vals: Seq[Long])   // public: Catalyst codegen must reach vals()

  class AnomalyProcessor(n: Int, z: Int, minRows: Int)
      extends StatefulProcessor[String, Obs, AnomalyFlag] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[Ring] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Ring]("ring", Encoders.product[Ring],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Obs],
        timers: TimerValues): Iterator[AnomalyFlag] = {
      var prior = Option(state.get()).map(_.vals.toVector)
        .getOrElse(Vector.empty[Long])
      val out = rows.toSeq.sortBy(_.seq).map { o =>
        val (zs, flag) = Trend.anomalyDecision(prior, o.y, z, minRows)
        prior = (prior :+ o.y).takeRight(n - 1)
        AnomalyFlag(o.key, o.seq, zs, flag)
      }
      state.update(Ring(prior))
      out.iterator
    }
  }

  def flags(obs: Dataset[Obs], n: Int = 16, z: Int = 2, minRows: Int = 4)
      (implicit spark: SparkSession): Dataset[AnomalyFlag] = {
    import spark.implicits._
    require(n >= 2 && z >= 1 && minRows >= 2 && minRows <= n,
      s"need n >= 2, z >= 1, 2 <= minRows <= n (got n=$n z=$z minRows=$minRows)")
    obs.groupByKey(_.key)
      .transformWithState(new AnomalyProcessor(n, z, minRows),
        TimeMode.None(), OutputMode.Append())
  }

  case class EwmaOut(key: String, seq: Long, ewma: Double)

  /** W13's LIVE form — same state/ordering discipline as the anomaly
    * processor, value from the same pure [[Trend.ewmaValue]]. */
  class EwmaProcessor(span: Int, yScale: Long)
      extends StatefulProcessor[String, Obs, EwmaOut] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[Ring] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Ring]("ring", Encoders.product[Ring],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Obs],
        timers: TimerValues): Iterator[EwmaOut] = {
      var prior = Option(state.get()).map(_.vals.toVector)
        .getOrElse(Vector.empty[Long])
      val out = rows.toSeq.sortBy(_.seq).map { o =>
        val v = Trend.ewmaValue(prior, o.y, span, yScale)
        prior = (prior :+ o.y).takeRight(span - 1)
        EwmaOut(o.key, o.seq, v)
      }
      state.update(Ring(prior))
      out.iterator
    }
  }

  def ewma(obs: Dataset[Obs], span: Int = 4, yScale: Long = 1L)
      (implicit spark: SparkSession): Dataset[EwmaOut] = {
    import spark.implicits._
    require(span >= 2 && span <= 62, s"span must be in [2, 62] (got $span)")
    obs.groupByKey(_.key)
      .transformWithState(new EwmaProcessor(span, yScale),
        TimeMode.None(), OutputMode.Append())
  }

  case class HoltOut(key: String, seq: Long, level: Double, trend: Double,
      forecast: Double)
  case class HoltState(l: Double, b: Double, seeded: Boolean, lastSeq: Long)

  /** W15's LIVE form — the Holt fold as keyed streaming state: TWO
    * doubles per key (level + trend; contrast the EWMA ring's O(span)
    * values — a recursion's state is its whole memory, which is
    * exactly why it streams so cheaply), every transition through the
    * SAME pure [[Trend.holtStep]] the batch fold expression applies.
    *
    * ORDERING CONTRACT: a recursion is order-sensitive, and a stream
    * can only sort WITHIN a micro-batch — the "live agrees with the
    * batch fold row for row" claim therefore holds when rows arrive
    * seq-monotone ACROSS micro-batches (per key), which the ingest
    * pipeline's per-sensor upload order provides. A LATE row (seq at
    * or below the last folded seq for its key) cannot be folded at its
    * true position without replaying the suffix, so it is DROPPED
    * explicitly — no output row, state untouched — rather than folded
    * out of order, which would silently diverge the level/trend from
    * [[Trend.holt]]'s globally-ordered backfill for every subsequent
    * row. Late rows needing inclusion are a backfill's job (re-run the
    * batch fold), not a live fold's. */
  class HoltProcessor(alpha: Double, beta: Double)
      extends StatefulProcessor[String, Obs, HoltOut] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[HoltState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[HoltState]("holt",
        Encoders.product[HoltState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Obs],
        timers: TimerValues): Iterator[HoltOut] = {
      var st = Option(state.get())
        .getOrElse(HoltState(0.0, 0.0, seeded = false, lastSeq = Long.MinValue))
      // threshold fixed from the INCOMING state: lateness is relative
      // to what previous micro-batches folded, not to this batch's rows
      val floor = if (st.seeded) st.lastSeq else Long.MinValue
      val out = rows.toSeq.sortBy(_.seq)
        .filter(_.seq > floor)
        .map { o =>
          st =
            if (!st.seeded) HoltState(o.y.toDouble, 0.0, seeded = true, o.seq)
            else {
              val (l2, b2) = Trend.holtStep(st.l, st.b, o.y.toDouble, alpha, beta)
              HoltState(l2, b2, seeded = true, o.seq)
            }
          HoltOut(o.key, o.seq, st.l, st.b, st.l + st.b)
        }
      state.update(st)
      out.iterator
    }
  }

  def holt(obs: Dataset[Obs], alpha: Double = 0.5, beta: Double = 0.5)
      (implicit spark: SparkSession): Dataset[HoltOut] = {
    import spark.implicits._
    require(alpha > 0 && alpha <= 1 && beta > 0 && beta <= 1,
      s"need 0 < alpha, beta <= 1 (got $alpha, $beta)")
    obs.groupByKey(_.key)
      .transformWithState(new HoltProcessor(alpha, beta),
        TimeMode.None(), OutputMode.Append())
  }
}
