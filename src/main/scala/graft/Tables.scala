package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access for the relational substrate (TESTDATA.md).
  *
  * All queries in [[SparkEntry.queries]] read through here so the scan
  * layer is one place: parquet with Catalyst filter/column pushdown.
  * At 100 TB the same call sites would point at a partitioned table
  * (directory-partitioned or catalog-backed) without query changes.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects. Read it as raw nanos (legacy conf) and convert to a proper
    * TimestampType column (µs precision — the data carries nothing finer,
    * and the DuckDB oracle reads the same file at µs precision too).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
