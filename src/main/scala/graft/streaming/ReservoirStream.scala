package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues}

/** SAMP's LIVE form — a weighted reservoir sample per group on an
  * event stream via transformWithState: the streaming twin of
  * [[graft.operators.Sampling.weightedSamplePerGroup]] (Efraimidis–
  * Spirakis A-Res). The batch form scores every row
  * `u^(1/w)` from the md5 gate and keeps the k largest per group; the
  * live form maintains exactly that top-k incrementally — k
  * (score, id) pairs per group in RocksDB, bounded by construction —
  * so at any prefix the stream's reservoir EQUALS the batch sample
  * over the same prefix (cross-checked in StreamingSpec).
  *
  * Determinism contract: scores are a pure function of (id, salt)
  * computed by [[aresScore]], a bit-exact JVM replica of the column
  * arithmetic in [[graft.operators.Sampling.aresScore]] (same md5
  * gate, same `(gate+1)/2³²` uniform, same `Math.pow`); ties break
  * (score desc, id asc) exactly like the batch window. Rows arrive
  * sorted by `seq` per (group, micro-batch), so within-batch arrival
  * order never changes any emission — the
  * [[HistogramStream]]/[[AnomalyStream]] order-insensitivity contract.
  * Rows with weight ≤ 0 carry no selection mass (the A-Res domain):
  * they emit the unchanged reservoir.
  */
object ReservoirStream {

  case class Item(group: String, seq: Long, id: Long, w: Double)
  /** The reservoir AFTER this row, ids ascending (set semantics). */
  case class Res(group: String, seq: Long, ids: Seq[Long])
  case class Entries(scores: Seq[Double], ids: Seq[Long]) // parallel arrays

  /** JVM replica of the engine's gate + A-Res column arithmetic:
    * first 8 hex chars of md5(id ‖ salt) → uint32 gate;
    * u = (gate+1)/2³² ∈ (0,1]; score = u^(1/w). Both sides run
    * java.lang.Math.pow on identical doubles — bit-equal. */
  def aresScore(id: Long, w: Double, salt: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((id.toString + salt).getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    val gate = java.lang.Long.parseLong(hex, 16)
    math.pow((gate + 1L).toDouble / 4294967296.0, 1.0 / w)
  }

  class ReservoirProcessor(k: Int, salt: String)
      extends StatefulProcessor[String, Item, Res] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[Entries] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Entries]("res",
        Encoders.product[Entries],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(group: String, rows: Iterator[Item],
        timers: TimerValues): Iterator[Res] = {
      var res = Option(state.get())
        .map(e => e.scores.zip(e.ids).toVector).getOrElse(Vector.empty)
      val out = rows.toSeq.sortBy(_.seq).map { it =>
        if (it.w > 0.0) {
          val s = aresScore(it.id, it.w, salt)
          res = ((s, it.id) +: res)
            .sortBy { case (sc, id) => (-sc, id) }.take(k)
        }
        Res(it.group, it.seq, res.map(_._2).sorted)
      }
      state.update(Entries(res.map(_._1), res.map(_._2)))
      out.iterator
    }
  }

  /** One row per input row: the group's reservoir after folding that
    * row in. The final emission per group IS the batch
    * `weightedSamplePerGroup(k, salt)` id set over the same rows. */
  def sample(items: Dataset[Item], k: Int, salt: String = "")(
      implicit spark: SparkSession): Dataset[Res] = {
    import spark.implicits._
    require(k > 0, s"sample size k must be positive (got $k)")
    items.groupByKey(_.group)
      .transformWithState(new ReservoirProcessor(k, salt),
        TimeMode.None(), OutputMode.Append())
  }
}
