package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata/table access layer. Every reader is a plain parquet scan so
  * Catalyst predicate pushdown, column pruning, and partition pruning
  * apply unchanged. At fleet scale the fact table would be written
  * partitioned by (date, sensor) — see `graft.streaming.IngestPipeline`.
  */
object Tables {
  /** Per-(dir, table) parquet schema, inferred ONCE per JVM (r17):
    * every `spark.read.parquet` without an explicit schema runs a
    * footer-inference job, and a session running many queries re-paid
    * it on every read of the same immutable file (the bench: ~2 tables
    * x 2-3 passes x 250 queries of 40-60 ms jobs). A production
    * deployment reads through a catalog that serves the schema; this
    * cache is that catalog's stand-in — METADATA only, the data path
    * is untouched (first read still infers from the file). */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), org.apache.spark.sql.types.StructType]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val cached = schemaCache.get((dir, name))
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaCache.putIfAbsent((dir, name), df.schema)
      df
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  /** `events.ts` has shipped as two different physical types across
    * testdata generations: INT64 TIMESTAMP(NANOS) (which Spark 4 rejects
    * unless read as a long via the legacy conf, then truncated ns → µs
    * with integer division — NOT double division, ns epochs exceed
    * double's 53-bit mantissa) and plain TIMESTAMP(MICROS) without a
    * timezone (read as TIMESTAMP_NTZ). Normalize both to session-zone
    * TIMESTAMP: the session timezone is UTC everywhere (Verify, Bench,
    * specs), so the NTZ→LTZ cast is wall-value-identical to DuckDB's
    * naive read and every downstream query sees one ts type. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // DELIBERATELY session-global and never restored: the conf gates
    // schema CONVERSION at load, but the vectorized reader consults it
    // again at execution from the captured session state — restoring
    // it after load() would make the returned (lazy) frame fail at
    // materialization. Sessions in this engine treat nanos-as-long as
    // a standing contract (Verify/Bench/specs all set UTC + read
    // through here); a session that needs TIMESTAMP(NANOS) rejected
    // must not read the events table first.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "embeddings")

  /** Explicit parallelism hint for CPU-bound per-row pipelines reading a
    * sub-split local input. The testdata files are single-row-group
    * parquet — ONE input split — so a pipeline whose first stage does
    * heavy per-row work (shingling → MinHash, PQ encode) would run that
    * stage on one core of local[32]; this exchange (a few MB) buys ~8×
    * there (measured: minhash signatures 8.2 s → 0.8 s at sf0.1).
    * It is deliberately NOT applied inside the library operators or the
    * default readers: at fleet scale the scan has thousands of natural
    * splits and an unconditional round-robin exchange is a pure tax —
    * round-5 bench showed it costing 2-4× on map-light queries
    * (f11/f12/f13).
    *
    * SPLIT-AWARE since r17 (VERDICT r16 #3): the repartition now fires
    * only when the PLANNED scan has fewer partitions than the session's
    * parallelism, so a declared query is scale-safe without per-site
    * judgment — over a well-split fleet table this is the identity (no
    * Exchange in the plan), over the single-split testdata it spreads
    * exactly as before. The probe builds the pre-AQE physical plan and
    * counts its RDD partitions — planning only, no job (every call site
    * passes a scan-shaped frame; a probe failure conservatively assumes
    * under-split and keeps the old unconditional behavior). */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val planned =
      try df.queryExecution.sparkPlan.execute().getNumPartitions
      catch { case scala.util.control.NonFatal(_) => 0 }
    if (planned >= target) df else df.repartition(target)
  }
}
