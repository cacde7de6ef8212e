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
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some testdata
    * generations (which Spark's reader only accepts as raw longs via the
    * legacy conf) and plain TIMESTAMP(MICROS) in others. Normalize both to
    * a proper TimestampType column at µs precision — the same instant the
    * DuckDB oracle reads from the same file (session timezone is UTC, so
    * the NTZ→TZ cast is the identity). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long generation: convert to µs timestamp
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => // TIMESTAMP_NTZ generation: identity cast under UTC
        raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
