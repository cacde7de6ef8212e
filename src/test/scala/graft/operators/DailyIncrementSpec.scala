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
      "fingerprints_added", "signatures_added", "edges_added"))

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
  }

  test("fpRefresh equals the full rebuild over corpus ∪ admitted") {
    val rebuilt = distinctFps(corpusPlusKept).collect().map(_.toSeq).toSet
    val refreshed = Dedup.fpRefresh(spark, sfDir).collect().map(_.toSeq).toSet
    assert(refreshed == rebuilt)
    assert(refreshed.nonEmpty)
  }
}
