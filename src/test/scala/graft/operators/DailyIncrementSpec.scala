package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.TestSpark.{spark, sfDir}

/** The composition contract of [[Dedup.dailyIncrement]] (round-10
  * verdict item #5): every stage count of the day-2 census must
  * reconcile with the standalone, already-oracle-proven queries — the
  * IVM family composes, it isn't five unrelated numbers. The
  * reconciliations below derive each delta INDEPENDENTLY (full rebuild
  * minus corpus-only rebuild) rather than re-reading the refresh
  * operators' own delta slices, so a slicing bug can't self-certify. */
class DailyIncrementSpec extends AnyFunSuite {

  private val docs = Tables.documents(spark, sfDir)
  private val corpusDocs = docs.filter(col("doc_id") % 10 >= 2)
  private lazy val keptDf = Dedup.incrementalDedup(spark, sfDir)
    .filter(col("outcome") === "kept").select(col("doc_id"))
    .localCheckpoint()
  private def corpusPlusKept: DataFrame =
    corpusDocs.unionByName(docs.join(keptDf, Seq("doc_id"), "left_semi"))

  private def distinctFps(d: DataFrame): DataFrame =
    TextAnalysis.winnowFingerprints(d, 4)
      .select(col("doc_id"), col("fp_hash")).distinct()

  private def edgeCount(d: DataFrame): Long = {
    val fp = distinctFps(d)
    fp.select(col("fp_hash"), col("doc_id").as("id1"))
      .join(fp.select(col("fp_hash").as("h2"), col("doc_id").as("id2")),
        col("fp_hash") === col("h2") && col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 3).count()
  }

  test("every stage count reconciles with the standalone queries") {
    val s = Dedup.dailyIncrement(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s.keySet == Set("docs_admitted", "buckets_added",
      "fingerprints_added", "signatures_added", "edges_added",
      "cells_touched", "clusters_touched"))

    val kept = keptDf.count()
    assert(kept > 0, "need admitted docs at this SF for a meaningful census")
    assert(s("docs_admitted") == kept)

    val corpusBuckets = Dedup.minhashLshBuckets(spark, sfDir)
      .filter(col("doc_id") % 10 >= 2).count()
    assert(s("buckets_added") ==
      Dedup.bucketRefresh(spark, sfDir).count() - corpusBuckets)

    assert(s("fingerprints_added") ==
      distinctFps(corpusPlusKept).count() - distinctFps(corpusDocs).count())

    val corpusVecs = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 10 >= 2).count()
    assert(s("signatures_added") ==
      Similarity.indexRefresh(spark, sfDir).count() - corpusVecs)

    // adding docs cannot change corpus-corpus shared-fp counts, so the
    // edge delta equals full-minus-corpus edge counts
    assert(s("edges_added") ==
      edgeCount(corpusPlusKept) - edgeCount(corpusDocs))

    // the cell-refresh delta touches exactly the distinct cells the
    // standalone refresh assigns the admitted vectors to
    assert(s("cells_touched") ==
      Similarity.cellRefresh(spark, sfDir)
        .filter(col("vec_id") % 10 < 2)
        .select(col("cent_id")).distinct().count())

    // label-IVM composition (r16 verdict #1): the touched-cluster count
    // must equal the distinct labels a ONE-SHOT star-contraction
    // rebuild over the union edge set assigns the admitted docs —
    // derived here without the incremental merge path, so a merge bug
    // cannot self-certify
    val rebuilt = {
      val fp = distinctFps(corpusPlusKept)
      val edges = fp.select(col("fp_hash"), col("doc_id").as("id1"))
        .join(fp.select(col("fp_hash").as("h2"), col("doc_id").as("id2")),
          col("fp_hash") === col("h2") && col("id1") < col("id2"))
        .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 3).select(col("id1"), col("id2"))
      GraphOps.connectedComponentsStar(
          corpusPlusKept.select(col("doc_id")), edges, "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val keptIds = keptDf.collect().map(_.getLong(0))
    assert(s("clusters_touched") == keptIds.map(rebuilt).distinct.length)
  }

  test("cellRefresh equals the frozen-centroid rebuild over corpus ∪ admitted") {
    // refresh ≡ rebuild must hold WITHIN the engine too (the DuckDB
    // gate proves it cross-engine): assigning the admitted delta to
    // the frozen corpus-trained centroids in one pass over
    // corpus ∪ admitted gives the same index as the incremental union
    val refreshed = Similarity.cellRefresh(spark, sfDir)
    val admittedIds = Similarity.indexRefresh(spark, sfDir)
      .filter(col("vec_id") % 10 < 2).select(col("vec_id"))
    val corpusIds = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 10 >= 2).select(col("vec_id"))
    assert(refreshed.select(col("vec_id")).collect().map(_.getLong(0)).sorted.toSeq ==
      corpusIds.unionByName(admittedIds).collect().map(_.getLong(0)).sorted.toSeq)
    // every admitted vector lands in a trained cell with a bounded shard
    val delta = refreshed.filter(col("vec_id") % 10 < 2)
    assert(delta.count() > 0, "need admitted vectors at this SF")
    assert(delta.filter(col("shard") < 0).count() == 0)
  }

  test("fpRefresh equals the full rebuild over corpus ∪ admitted") {
    val rebuilt = distinctFps(corpusPlusKept).collect().map(_.toSeq).toSet
    val refreshed = Dedup.fpRefresh(spark, sfDir).collect().map(_.toSeq).toSet
    assert(refreshed == rebuilt)
    assert(refreshed.nonEmpty)
  }
}
