package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.PortableHash
import graft.plans.BoundedAggregates

/** Query surface of the bounded-state custom aggregates
  * ([[graft.plans.BoundedAggregates]]): a deterministic KMV
  * distinct-count sketch and a partial-aggregated per-group top-k.
  * Both exist because the window/exact formulations shuffle every row
  * per group; these shuffle O(k) per group (see the plan doc).
  */
object Sketches {

  val KmvK = 64

  /** KMV distinct-user estimate per event type. The sketch hashes with
    * the engine-portable 48-bit hash, so kth-minimum AND estimate are
    * bit-replicable in the DuckDB oracle — an oracle-checkable
    * approximate-distinct, unlike HLL (see `rowsOnly` on
    * sub_approx_aggs). Groups with fewer than k distinct values are
    * exact by construction (the sketch holds ALL their hashes). */
  def kmvDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    BoundedAggregates.register(spark)
    val est = lit((KmvK - 1) * math.pow(2, 48)) /
      element_at(col("kmv"), size(col("kmv"))).cast("double")
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        PortableHash.md5Hash48(col("user_id").cast("string")).as("h"))
      .groupBy(col("event_type"))
      .agg(call_function("kmv_sketch", col("h"), lit(KmvK)).as("kmv"))
      .select(col("event_type"),
        size(col("kmv")).cast("long").as("k_used"),
        element_at(col("kmv"), size(col("kmv"))).as("kth_min"),
        when(size(col("kmv")) < KmvK, size(col("kmv")).cast("double"))
          .otherwise(PortableRound.pround(est, 4)).as("est_distinct"))
  }

  /** Top-5 events by (value DESC, event_id ASC) per event type via the
    * bounded-buffer aggregate — the shuffle carries ≤5 pairs per
    * (partition, group) instead of every row like the row_number()
    * window twin the oracle uses. */
  def topKPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    BoundedAggregates.register(spark)
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(call_function("topk_by", col("value"), col("event_id"), lit(5)).as("top"))
      .select(col("event_type"), posexplode(col("top")))
      .select(col("event_type"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("event_id"), col("col.value").as("value"))
  }
}
