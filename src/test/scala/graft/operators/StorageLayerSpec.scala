package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Storage-layer platform behaviors the 100 TB deployment leans on
  * daily, pinned like the AQE-skew and z-order-skipping specs:
  *
  *  - SCHEMA EVOLUTION: a table directory accumulates files written at
  *    different schema versions (columns added over time); mergeSchema
  *    must read them as one table with nulls for the missing columns —
  *    the contract that lets a 100 TB table evolve without rewriting
  *    history.
  *  - PARTITION PRUNING: a directory-partitioned write + a partition
  *    predicate must show `PartitionFilters` at the scan and plan only
  *    the matching partition's files — pruning at the FILE level before
  *    any I/O, the coarse sibling of the z-order row-group skipping
  *    proven in [[ZorderSkippingSpec]].
  */
class StorageLayerSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("schema evolution: files written at different versions read as one table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    val docs = Tables.documents(spark, sfDir)
    // v1 files: (doc_id, lang); later files add quality + source cols
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lang"))
      .write.mode("append").parquet(dir)
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("source"))
      .write.mode("append").parquet(dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("doc_id", "lang", "n_chars", "source"))
    assert(merged.count() == docs.count())
    // old files surface the new columns as nulls, new files carry data
    val v1 = merged.filter(col("doc_id") % 2 === 0)
    assert(v1.filter(col("n_chars").isNotNull).count() == 0)
    val v2 = merged.filter(col("doc_id") % 2 === 1)
    assert(v2.filter(col("n_chars").isNull).count() == 0)
    // and the evolved column still aggregates correctly across the mix
    val total = merged.agg(sum(col("n_chars"))).collect()(0).getLong(0)
    val expect = docs.filter(col("doc_id") % 2 === 1)
      .agg(sum(col("n_chars"))).collect()(0).getLong(0)
    assert(total == expect)
  }

  test("partition pruning: a partition predicate plans only matching files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.documents(spark, sfDir)
      .write.partitionBy("lang").mode("overwrite").parquet(dir)
    val langs = Tables.documents(spark, sfDir)
      .select("lang").distinct().count()
    assert(langs > 1, "test needs multiple partitions")

    val pruned = spark.read.parquet(dir).filter(col("lang") === "en")
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scan.isDefined)
    // the predicate lands in PartitionFilters (file-level pruning at
    // planning), NOT as a data filter evaluated per row
    assert(scan.get.partitionFilters.nonEmpty,
      s"lang predicate must prune partitions: ${scan.get}")
    // only the en partition's files are selected
    assert(scan.get.selectedPartitions.partitionCount == 1,
      s"expected 1 selected partition, got ${scan.get.selectedPartitions.partitionCount}")
    // correctness: pruned result equals the unpartitioned filter
    val expect = Tables.documents(spark, sfDir)
      .filter(col("lang") === "en").count()
    assert(pruned.count() == expect)
  }
}
