package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues}

import graft.operators.QuantileHistogram

/** A8c's LIVE form — a running quantile estimate per key on an event
  * stream via transformWithState: the "live p99 latency panel" twin of
  * the batch [[QuantileHistogram]], with the SAME fixed-domain
  * histogram as state (nBins longs per key in RocksDB — bounded by
  * construction, the property that makes the batch state mergeable
  * makes the live state small) and every emission computed by the SAME
  * pure [[QuantileHistogram.estimate]] the relational estimator
  * mirrors — so a batch backfill over the day's events and the live
  * stream provably agree at every prefix (cross-checked in
  * StreamingSpec). Rows carry an explicit `seq`, sorted per
  * (key, micro-batch): within-batch arrival order never changes the
  * answer — the [[AnomalyStream]] order-insensitivity contract.
  */
object HistogramStream {

  case class Obs(key: String, seq: Long, v: Long)
  case class Estimate(key: String, seq: Long, nTotal: Long, est: Long)
  case class Bins(counts: Seq[Long]) // public: Catalyst codegen reaches counts()

  class QuantileProcessor(q: Double, lo: Long, binWidth: Long, nBins: Int)
      extends StatefulProcessor[String, Obs, Estimate] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[Bins] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Bins]("bins", Encoders.product[Bins],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Obs],
        timers: TimerValues): Iterator[Estimate] = {
      var bins = Option(state.get()).map(_.counts.toVector)
        .getOrElse(Vector.fill(nBins)(0L))
      var n = bins.sum
      val out = rows.toSeq.sortBy(_.seq).map { o =>
        val b = QuantileHistogram.binOf(o.v, lo, binWidth, nBins)
        bins = bins.updated(b, bins(b) + 1L)
        n += 1L
        Estimate(o.key, o.seq, n,
          QuantileHistogram.estimate(bins, q, lo, binWidth).get)
      }
      state.update(Bins(bins))
      out.iterator
    }
  }

  /** One estimate row per input row: the running q-quantile of
    * everything seen so far for that key. Domain contract as in
    * [[QuantileHistogram.histogramState]] (hi−lo divisible by nBins;
    * out-of-domain clamps to edge bins). */
  def quantile(obs: Dataset[Obs], q: Double, lo: Long, hi: Long,
      nBins: Int)(implicit spark: SparkSession): Dataset[Estimate] = {
    import spark.implicits._
    require(q > 0.0 && q <= 1.0, s"q must be in (0, 1] (got $q)")
    require(nBins >= 2 && hi > lo && (hi - lo) % nBins == 0,
      s"domain [$lo, $hi) must be non-empty and divisible by nBins ($nBins)")
    obs.groupByKey(_.key)
      .transformWithState(
        new QuantileProcessor(q, lo, (hi - lo) / nBins, nBins),
        TimeMode.None(), OutputMode.Append())
  }
}
