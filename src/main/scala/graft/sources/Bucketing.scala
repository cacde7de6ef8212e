package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for hot join keys (SURVEY §8): pay one
  * write-time shuffle, then every equi-join/aggregation on the bucket
  * key reads co-located partitions and plans WITHOUT a shuffle — at
  * 100 TB this removes the dominant cost from every downstream
  * self-join (dedup pair verification, ANN candidate refinement,
  * incremental re-ingestion against yesterday's corpus).
  *
  * BucketingSpec proves the contract on the physical plan: the
  * bucketed self-join contains NO Exchange, the plain-parquet twin
  * does.
  */
object Bucketing {

  /** Persist `df` bucketed (and sorted) by `key` as a catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int = 16): Unit =
    df.write
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
