package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** AQE skew-join — the PLATFORM half of the skew story. The manual
  * salting operators ([[Skew.saltedAgg]]/[[Skew.saltedJoin]]) are the
  * portable, oracle-checked shapes; this spec proves we can also hand
  * the same problem to Spark's AdaptiveSparkPlan: a sort-merge join
  * with one pathological key gets its skewed partition SPLIT at
  * runtime (`skew=true` in the final plan) once the skew thresholds
  * see it, with no query rewrite at all. At 100 TB the decision rule
  * is exactly this ladder: broadcast if the dim fits, AQE skew-join if
  * the histogram is moderate, explicit salting when one key dwarfs the
  * advisory partition size so badly that even split partitions strangle.
  *
  * Confs are scoped to an isolated child session (same pattern as the
  * range-join rule) so the tiny thresholds cannot leak into other
  * suites sharing the SparkContext.
  */
class AqeSkewJoinSpec extends AnyFunSuite {

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    val session = TestSpark.spark.newSession()
    session.conf.set("spark.sql.adaptive.enabled", "true")
    // forbid broadcast so the join MUST sort-merge (the skew-relevant case)
    session.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    session.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // shrink the skew thresholds so test-scale data trips them
    session.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    session.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    session.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    session.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    session.conf.set("spark.sql.shuffle.partitions", "4")

    import session.implicits._
    // left: 50k rows on ONE hot key + a uniform tail; right: 200 rows/key
    val left = session.range(0, 50000).select(
      when(col("id") < 45000, 0L).otherwise(col("id") % 16).as("k"),
      col("id").as("v"))
    val right = session.range(0, 16 * 200).select(
      (col("id") % 16).as("k"), (col("id") * 7).as("w"))
    val joined = left.join(right, "k")
    // drive THIS DataFrame's own QueryExecution (count() would plan a
    // fresh one and leave this plan un-finalized)
    val n = joined.queryExecution.toRdd.count()
    // correctness first: hot key 45000×200 + 15 cold keys ~312-313×200 each
    val expected = left.groupBy("k").count().as[(Long, Long)].collect()
      .map { case (k, c) => c * 200L }.sum
    assert(n == expected, s"join row count wrong: $n vs $expected")

    // the FINAL adaptive plan must have split the skewed partition
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("isFinalPlan=true"), finalPlan.take(500))
    assert(finalPlan.contains("skew=true"),
      s"AQE did not mark the sort-merge join skew-handled:\n${finalPlan.take(2000)}")
  }

  test("AQE coalesces undersized shuffle partitions at runtime") {
    val session = TestSpark.spark.newSession()
    session.conf.set("spark.sql.adaptive.enabled", "true")
    session.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // declared parallelism far above what this tiny aggregate needs:
    // without AQE every stage runs 64 near-empty reducers (the
    // small-files / scheduler-overhead tax at 100 TB when a filter is
    // selective); with it the map stats collapse them at runtime
    session.conf.set("spark.sql.shuffle.partitions", "64")
    session.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    session.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
    val agg = session.range(0, 10000)
      .groupBy((org.apache.spark.sql.functions.col("id") % 16).as("k"))
      .count()
    val n = agg.queryExecution.toRdd.getNumPartitions
    assert(agg.queryExecution.executedPlan.toString.contains("coalesced") || n < 64,
      "AQE must not launch 64 reducers for a 16-group aggregate")
    assert(n < 64, s"still $n partitions after AQE coalesce")
  }
}
