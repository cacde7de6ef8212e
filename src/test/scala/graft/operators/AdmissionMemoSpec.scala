package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.{spark, sfDir}
import graft.SparkEntry

/** The build-once contract of [[Dedup.incrementalDedupMaterialized]]
  * (r18): one admission-cascade evaluation feeds every day-2 refresh
  * consumer, the same three guards as [[GraphEdgesSpec]]:
  * memoization, consumer plan shape, and value equality against a
  * fresh un-memoized cascade.
  */
class AdmissionMemoSpec extends AnyFunSuite {

  test("incrementalDedupMaterialized memoizes per (app, sfDir)") {
    val a = Dedup.incrementalDedupMaterialized(spark, sfDir)
    val b = Dedup.incrementalDedupMaterialized(spark, sfDir)
    assert(a eq b, "second call must return the memoized instance")
  }

  test("materialized admission table value-matches a fresh cascade") {
    val mat = Dedup.incrementalDedupMaterialized(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val fresh = Dedup.incrementalDedup(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(mat == fresh)
  }

  test("day-2 consumers scan the checkpoint, not a re-run cascade") {
    Dedup.incrementalDedupMaterialized(spark, sfDir) // ensure built
    // the cascade's signature aggregation carries the m0..m31 minhash
    // columns; a consumer plan that mentions them re-runs the cascade
    for (q <- Seq("dedup_fp_refresh", "dedup_cluster_refresh",
        "corpus_split_churn")) {
      val p = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(p.contains("ExistingRDD"),
        s"$q must read the materialized admission table:\n$p")
      assert(!p.contains("m31"),
        s"$q re-runs the minhash signature pass of the cascade:\n$p")
    }
  }
}
