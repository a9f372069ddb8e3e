package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata/table access layer. Every reader is a plain parquet scan so
  * Catalyst predicate pushdown, column pruning, and partition pruning
  * apply unchanged. At fleet scale the fact table would be written
  * partitioned by (date, sensor) — see `graft.operators.ObsPipeline`.
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
    apply(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
