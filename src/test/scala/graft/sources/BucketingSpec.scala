package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Plan-level proof of the bucketing contract: a self-join on the
  * bucket key plans with zero Exchange nodes (the write-time shuffle
  * bought co-location), while the identical join over plain parquet
  * shuffles both sides.
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("bucketed self-join has no Exchange; plain parquet twin does") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    Bucketing.writeBucketed(docs, "docs_bucketed", "doc_id", nBuckets = 8)
    // the test tables are broadcast-sized; disable broadcast so the
    // join key's distribution requirement is visible in the plan
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val b = Bucketing.table(spark, "docs_bucketed")
      val bucketedJoin = b.as("x").join(b.as("y"), "doc_id")
        .select(col("x.doc_id"), col("y.n_chars"))
      val bucketedPlan = bucketedJoin.queryExecution.executedPlan.toString
      assert(!bucketedPlan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$bucketedPlan")
      assert(bucketedPlan.contains("SelectedBucketsCount"), bucketedPlan)

      val plainPlan = docs.as("x").join(docs.as("y"), "doc_id")
        .select(col("x.doc_id"), col("y.n_chars"))
        .queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange hashpartitioning(doc_id"),
        s"control: the non-bucketed twin should shuffle on the key:\n$plainPlan")

      // and the results agree
      assert(bucketedJoin.count() ==
        docs.as("x").join(docs.as("y"), "doc_id").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS docs_bucketed")
    }
  }
}
