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

  val CmsDepth = 4
  val CmsWidth = 1024

  /** Count-Min Sketch heavy-hitter AUDIT — the third bounded-state
    * sketch family (beside KMV distinct and bounded top-k): frequency
    * estimation whose state is a fixed d×w counter matrix regardless
    * of key cardinality. Built relationally: each event explodes into
    * `d` salted-hash cells and ONE map-side-combined aggregate
    * collapses them to ≤ d·w counter rows — at 100 TB the sketch build
    * shuffles 4096 rows, not a row per user. The estimate for a key is
    * `min` over its d counters; CMS guarantees `est ≥ exact` (one-sided
    * error ≤ ~2N/w with prob 1−(1/2)^d — Cormode & Muthukrishnan 2005).
    *
    * The salted hash is the engine-portable md5-48, so unlike a
    * library CMS the SKETCH ITSELF is bit-replicable: the DuckDB
    * oracle rebuilds the identical counter matrix and the gate
    * compares estimates exactly. Output: the exact top-k users (the
    * ground truth an audit needs anyway) with their CMS estimate and
    * overcount. */
  def cmsHeavyHitters(spark: SparkSession, sfDir: String,
      depth: Int = CmsDepth, width: Int = CmsWidth, k: Int = 20): DataFrame = {
    // lazy checkpoint: the sketch build and the exact top-k both
    // consume this projection — one parquet scan, not two
    val users = Tables.events(spark, sfDir).select(col("user_id"))
      .localCheckpoint(eager = false)
    def cell(d: org.apache.spark.sql.Column) = pmod(
      PortableHash.md5Hash48(
        concat(d.cast("string"), lit(":"), col("user_id").cast("string"))),
      lit(width.toLong))
    val dCol = explode(array((0 until depth).map(lit): _*)).as("d")
    val cms = users.select(col("user_id"), dCol)
      .withColumn("c", cell(col("d")))
      .groupBy(col("d"), col("c")).agg(count(lit(1)).as("n"))
    val top = users.groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("user_id")).limit(k)
    top.select(col("user_id"), col("exact_n"), dCol)
      .withColumn("c", cell(col("d")))
      .join(cms, Seq("d", "c"), "left")
      .groupBy(col("user_id"), col("exact_n"))
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_est"))
      .select(col("user_id"), col("exact_n"), col("cms_est"),
        (col("cms_est") - col("exact_n")).as("overcount"))
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
