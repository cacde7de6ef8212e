package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for the scaling-audit invariants (r11 verdict #6):
  * the per-family scaling exponents recorded in BENCHNOTES ("Scaling
  * audit", round 12) hold BECAUSE of specific plan shapes — this suite
  * re-derives those shapes on the named queries, so a refactor that
  * would bend an exponent fails in CI instead of at the next audit.
  *
  * Invariants pinned (each maps to an audit family):
  *  1. graph CONSUMERS read the memoized edge/candidate list — no
  *     Generate (shingle explode) may reappear under them; their cost
  *     must stay O(edges), not O(corpus-regrind);
  *  2. every top-k boundary stays a TakeOrderedAndProject — a global
  *     Sort+Limit would turn the k-row boundary into an n·log n sort;
  *  3. the capped blocked self-joins stay equi-keyed — a
  *     CartesianProduct or BroadcastNestedLoopJoin anywhere in the
  *     builder is the quadratic melt the caps exist to prevent;
  *  4. the winnow candidate builder's Exchange census stays at its
  *     audited count — a new shuffle in the hot blocked join is
  *     exactly the "new Exchange" the audit exponents assume away.
  */
class ScalingGuardSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  /** The nine graph consumers + link prediction: all consume a
    * build-once scan; the winnow gram explode must never reappear
    * under them (it would re-grind the corpus once per query — the
    * r9 17s→6s lesson, now load-bearing for the audit's ~O(edges)
    * consumer exponents). */
  private val graphConsumers = Seq(
    "graph_pagerank_neardup", "graph_triangles", "graph_cc_star",
    "graph_label_prop", "graph_kcore", "graph_modularity",
    "graph_assortativity", "graph_rich_club", "graph_core_distance",
    "graph_link_prediction")

  test("graph consumers: no Generate — the edge/candidate list is a memo scan") {
    graphConsumers.foreach { q =>
      val p = plan(q)
      assert(!p.contains("Generate"),
        s"$q re-derives the gram explode instead of scanning the memo:\n$p")
    }
  }

  test("top-k boundaries stay TakeOrderedAndProject, never a global sort") {
    for (q <- Seq("dedup_winnow_pairs", "graph_link_prediction",
        "dedup_ngram_top_pairs")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q lost its top-k boundary (global Sort+Limit instead):\n$p")
    }
  }

  test("capped blocked self-joins stay equi-keyed: no cartesian, no nested loop") {
    // the UN-memoized builders — the shapes the audit exponents price
    val builders = Map(
      "winnow candidate builder (minShared=1)" ->
        graft.operators.Dedup.winnowSharedPairsAll(spark, sfDir, minShared = 1),
      "winnow edge builder (minShared=3)" ->
        graft.operators.Dedup.winnowSharedPairsAll(spark, sfDir),
      "lsh verified-pair builder" ->
        graft.operators.Similarity.lshVerifiedPairs(spark, sfDir))
    builders.foreach { case (name, df) =>
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name melted to all-pairs:\n$p")
    }
  }

  test("winnow candidate builder: Exchange census pinned at the audited count") {
    val p = graft.operators.Dedup
      .winnowSharedPairsAll(spark, sfDir, minShared = 1)
      .queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    // audited round 12: exactly 3 — the fingerprint distinct, the
    // hot-key census aggregate, and the final (id1, id2) aggregate
    // (the shuffle_merge sides reuse the checkpoint scan's exchange;
    // the pre-checkpoint window shuffles live behind the LogicalRDD).
    // A count above this means a NEW shuffle entered the hot path.
    assert(exchanges <= 3,
      s"new Exchange in the capped self-join (found $exchanges):\n$p")
  }
}
