package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew-handling substrate: salted aggregation and salted joins — the
  * manual fallbacks when AQE's skew-join split isn't applicable (e.g.
  * skewed groupBy keys, or builds where AQE is off).
  *
  * Pattern: explode the hot key into `salt` sub-keys, pre-aggregate on
  * (key, salt) — the heavy shuffle carries salt-spread partitions — then
  * finish with a cheap second aggregation on the (now tiny) keyed rows.
  */
object Skew {

  val Salts = 8

  /** Two-stage salted aggregation over a skewed key (event_type has ~5
    * values across all rows — every partition-sized key is "hot").
    * Results are identical to a direct groupBy; the oracle checks that.
    */
  def saltedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val salted = Tables.events(spark, sfDir)
      .withColumn("salt", pmod(col("event_id"), lit(Salts)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("v"))
    salted.groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"),
        round(sum(col("v")), 2).cast("double").as("total_value"))
  }

  /** Salted join of a skewed fact against a replicated small side:
    * the hot build rows are replicated once per salt so the stream side
    * spreads across `Salts` partitions per key. Equivalent to the plain
    * broadcast join (oracle-checked); the pattern matters when the
    * small side is too large to broadcast but the key histogram is
    * extreme.
    */
  def saltedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val facts = Tables.events(spark, sfDir)
      .withColumn("salt", pmod(col("event_id"), lit(Salts)))
    val dim = Seq("click" -> 1.0, "view" -> 0.1, "purchase" -> 10.0,
      "signup" -> 5.0, "error" -> 0.0)
      .toDF("event_type", "weight")
      .withColumn("salt", explode(sequence(lit(0), lit(Salts - 1))))
    facts.join(dim, Seq("event_type", "salt"))
      .groupBy(col("event_type"))
      .agg(round(sum(col("value").cast("decimal(18,2)") * col("weight").cast("decimal(18,2)")), 2)
        .cast("double").as("weighted_value"))
  }

  /** Exact percentiles substrate (sort-based, interpolating — matches
    * DuckDB quantile_cont). */
  def percentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 2).as("p50_exact"),
        round(expr("percentile(l_extendedprice, 0.95)"), 2).as("p95_exact"))

  /** Sketch-based approximate aggregates (rows-only vs the oracle —
    * sketch internals are engine-specific by nature). */
  def approxAggs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        round(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)), 2).as("p50_approx"))
}
