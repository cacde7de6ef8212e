package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark.{spark, sfDir}
import graft.SparkEntry

/** The build-once contract of [[Dedup.winnowEdgesMaterialized]]
  * (round-9 verdict item #1): one winnow pair build feeds the whole
  * graph family. Three guards:
  *   1. memoization — repeated calls return the SAME DataFrame
  *      instance (same checkpointed RDD underneath);
  *   2. plan shape — a graph query's physical plan scans the
  *      materialized rows (`Scan ExistingRDD`) and contains NO
  *      `Generate` (the winnow gram explode) and NO window over
  *      doc positions: the census provably does not re-run;
  *   3. values — the materialized table row-matches a fresh
  *      un-memoized [[Dedup.winnowSharedPairsAll]] build.
  */
class GraphEdgesSpec extends AnyFunSuite {

  test("winnowEdgesMaterialized memoizes per (app, sfDir)") {
    val a = Dedup.winnowEdgesMaterialized(spark, sfDir)
    val b = Dedup.winnowEdgesMaterialized(spark, sfDir)
    assert(a eq b, "second call must return the memoized instance")
  }

  test("graph consumers scan the checkpoint; winnow census absent from their plans") {
    Dedup.winnowEdgesMaterialized(spark, sfDir) // ensure built
    for (q <- Seq("graph_triangles", "graph_assortativity", "graph_rich_club")) {
      val p = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(p.contains("ExistingRDD"),
        s"$q must read the materialized edge list:\n$p")
      assert(!p.contains("Generate"),
        s"$q re-derives the winnow gram explode:\n$p")
    }
  }

  test("pagerank consumes the build (ExistingRDD present, no gram explode)") {
    Dedup.winnowEdgesMaterialized(spark, sfDir)
    val p = GraphOps.pagerankNearDup(spark, sfDir, iters = 1)
      .queryExecution.executedPlan.toString
    assert(p.contains("ExistingRDD") && !p.contains("Generate"), p)
  }

  test("lsh pair list memoizes and cc_star consumes the checkpoint") {
    val a = Similarity.lshPairsMaterialized(spark, sfDir)
    val b = Similarity.lshPairsMaterialized(spark, sfDir)
    assert(a eq b)
    val p = SparkEntry.queries("graph_cc_star")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("ExistingRDD"),
      s"cc_star must read the materialized pair list:\n$p")
  }

  test("materialized lsh pairs value-match a fresh un-memoized build") {
    val mat = Similarity.lshPairsMaterialized(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val fresh = Similarity.lshVerifiedPairs(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(mat == fresh)
  }

  test("clearFamily forces a cold rebuild (the bench's honest-accounting knob)") {
    val a = Dedup.winnowEdgesMaterialized(spark, sfDir)
    val lsh = Similarity.lshPairsMaterialized(spark, sfDir)
    BuildOnce.clearFamily(Dedup.EdgesFamily)
    val b = Dedup.winnowEdgesMaterialized(spark, sfDir)
    assert(!(a eq b), "after clearFamily the build must run again")
    assert(lsh eq Similarity.lshPairsMaterialized(spark, sfDir),
      "clearing one family must not evict the other")
    assert(b eq Dedup.winnowEdgesMaterialized(spark, sfDir),
      "the rebuilt instance is memoized again")
  }

  test("releaseScoped sweeps per-invocation checkpoint blocks but spares live memos") {
    val memo = Dedup.winnowEdgesMaterialized(spark, sfDir) // live memo
    // a per-invocation-style lazy checkpoint, materialized → its RDD
    // is persisted and would otherwise pin blocks until GC
    val scratch = spark.range(1000).toDF("x").localCheckpoint(eager = false)
    assert(scratch.count() == 1000)
    val scratchIds = scratch.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.toSet
    assert(scratchIds.nonEmpty &&
      scratchIds.subsetOf(spark.sparkContext.getPersistentRDDs.keySet),
      "the materialized lazy checkpoint must be persisted before the sweep")
    BuildOnce.releaseScoped(spark)
    assert(scratchIds.intersect(spark.sparkContext.getPersistentRDDs.keySet).isEmpty,
      "the sweep must unpersist the per-invocation checkpoint")
    // the memo survives: same live instance, still scannable
    assert(memo eq Dedup.winnowEdgesMaterialized(spark, sfDir),
      "the sweep must not evict the memo entry")
    assert(memo.count() > 0, "the memo's blocks must still be readable")
  }

  test("materialized edges value-match a fresh un-memoized build") {
    val mat = Dedup.winnowEdgesMaterialized(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val fresh = Dedup.winnowSharedPairsAll(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(mat == fresh)
    assert(mat.nonEmpty, "sf0.001 winnow edge list should be non-empty")
  }
}
