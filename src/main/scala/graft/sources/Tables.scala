package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata/table access layer. Every reader is a plain parquet scan so
  * Catalyst predicate pushdown, column pruning, and partition pruning
  * apply unchanged. At fleet scale the fact table would be written
  * partitioned by (date, sensor) — see `graft.streaming.IngestPipeline`.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  /** `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark 4 rejects
    * by default. Read it as a long and truncate ns → µs with integer
    * division (NOT double division — ns epochs exceed double's 53-bit
    * mantissa). Truncation matches DuckDB's ns→µs read, so oracle
    * comparisons stay exact. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // spread BEFORE the ts conversion so the per-row work parallelizes
    // (the single-row-group scan itself is irreducibly one task)
    spread(spark, apply(spark, dir, "events"))
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
  }
  /** documents/embeddings feed CPU-bound pipelines (shingling, MinHash,
    * SimHash, cosine). The testdata files are single-row-group parquet —
    * one input split — so without a repartition every map-side hash
    * would run on ONE core of local[32]. At fleet scale the scan has
    * thousands of natural splits and this exchange (a few MB here)
    * would be dropped; locally it is what buys 32× on the hash-heavy
    * operators. */
  private def spread(spark: SparkSession, df: DataFrame): DataFrame =
    df.repartition(spark.sparkContext.defaultParallelism)

  def documents(spark: SparkSession, dir: String): DataFrame =
    spread(spark, apply(spark, dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spread(spark, apply(spark, dir, "embeddings"))
}
