package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, greatest, lit, when}
import org.apache.spark.sql.streaming.DataStreamWriter

/** The reference's end consumer, end to end FROM THE STORE: "Tracking /
  * Arrival alerts" (reference README.md:19) consumed live off the
  * central store's change feed (README.md:12-13) instead of the raw
  * sensor stream — the composition ST10s (change-feed subscription) →
  * ST7 (arrival/reappearance semantics).
  *
  * Per delivered range the typed feed yields at most ONE net sighting
  * per key (a range diff collapses intermediate flip-flops), which
  * joins the persisted per-key lastSeen state: no prior row →
  * `first_seen`; gap > `gapSec` → `reappeared`; otherwise silent. A
  * DELETED key (erasure, retention) drops its state, so a later
  * re-registration is a fresh `first_seen` — the same "re-registered
  * subjects are new data" rule the store itself follows.
  *
  * State is a plain versioned MergeSink store (one (key, lastSeen) row
  * per device — the ST7 fleet-scale argument), written through
  * [[MergeSink.applyBatch]] with the delivered `to` version as the
  * batch id: state updates are EXACTLY-ONCE under crash-replay. Alert
  * EMISSION is at-least-once (a crash between `onAlerts` and the
  * offset write redelivers the range); `onAlerts` receives (from, to]
  * so an idempotent sink can dedup on the range. The lastSeen upsert
  * takes greatest(old, new), so a store whose ts column regresses
  * cannot roll state backwards. */
object StoreAlerts {

  /** Process one delivered feed range: emit alerts, then persist the
    * state transition. Public so tests (and non-streaming consumers)
    * can drive ranges deterministically. `tsCol` is a numeric value
    * column of the source store carrying epoch milliseconds. */
  def processRange(spark: SparkSession, stateDir: String, tsCol: String,
      gapSec: Long)(onAlerts: (DataFrame, Long, Long) => Unit)(
      feed0: DataFrame, from: Long, to: Long): Unit = {
    val keyName = feed0.columns.head
    val feed = graft.operators.Checkpoint(feed0) // sightings + deletes branches
    val sights = feed.filter(col("change") =!= "delete")
      .select(col(keyName), col(s"${tsCol}_new").cast("long").as("_ts"))
    val state = MergeSink.currentSnapshot(spark, stateDir, keyName,
        Seq("last_seen"))
      .getOrElse(sights.select(col(keyName), col("_ts").as("last_seen")).limit(0))
      .select(col(keyName), col("last_seen"))
    // one join serves both the alert decision and the state transition
    val joined = graft.operators.Checkpoint(
      sights.join(state, Seq(keyName), "left"))
    val alerts = joined.select(col(keyName),
        when(col("last_seen").isNull, lit("first_seen"))
          .when(col("_ts") - col("last_seen") > gapSec * 1000L,
            lit("reappeared"))
          .otherwise(lit(null: String)).as("kind"),
        col("_ts").as("ts_ms"),
        when(col("last_seen").isNull, lit(-1L))
          .otherwise(((col("_ts") - col("last_seen")) / 1000L).cast("long"))
          .as("gap_sec"))
      .filter(col("kind").isNotNull)
    onAlerts(alerts, from, to)
    val newTs = greatest(col("_ts"), coalesce(col("last_seen"), col("_ts")))
    val cdc = joined.select(col(keyName), lit("upsert").as("_op"),
        newTs.as("_ver"), newTs.as("last_seen"))
      .unionByName(feed.filter(col("change") === "delete")
        .select(col(keyName), lit("delete").as("_op"),
          // a delete must outrank any upsert version in this range
          lit(Long.MaxValue).as("_ver"),
          lit(null: java.lang.Long).cast("long").as("last_seen")))
    MergeSink.applyBatch(cdc, to, stateDir, keyName, "_op", "_ver",
      Seq("last_seen"))
  }

  /** The live wiring: subscribe to the store's change feed and run
    * [[processRange]] per trigger. Offsets live with the source store
    * (`_subscribers/<subscriber>`), state with `stateDir`; the
    * Structured Streaming checkpoint only makes the trigger clock
    * restartable. Wire to `.start()`. */
  def alertsStream(spark: SparkSession, storeDir: String, subscriber: String,
      stateDir: String, checkpoint: String, tsCol: String,
      gapSec: Long = 3600L, versionsPerTrigger: Int = 10,
      clock: Option[DataFrame] = None)(
      onAlerts: (DataFrame, Long, Long) => Unit): DataStreamWriter[Row] =
    // from BEFORE history: the first delivery is the store's existing
    // population as inserts, so devices present at subscription time
    // get their first_seen instead of silently becoming state
    MergeSink.changeFeedStream(spark, storeDir, subscriber, checkpoint,
      versionsPerTrigger, startAtVersion = Some(-1L), clock)(
      processRange(spark, stateDir, tsCol, gapSec)(onAlerts))
}
