package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the integer fixed-point PageRank — value
  * correctness is the DuckDB oracle's job (bit-exact replay); these pin
  * the fixed-point semantics a refactor could silently break. */
class GraphOpsSpec extends AnyFunSuite {
  import graft.TestSpark.{spark, sfDir}

  private lazy val ranks = GraphOps.pagerankNearDup(spark, sfDir).cache()

  test("isolated documents keep exactly the base (1-d) rank") {
    val iso = ranks.filter(col("degree") === 0)
    assert(iso.count() > 0, "test data should contain isolated docs")
    assert(iso.filter(col("rank_micro") =!= 150000L).count() == 0,
      "an isolated doc receives no contributions: r = 150000 + 0 forever")
  }

  test("every connected document ranks strictly above the isolated floor") {
    val conn = ranks.filter(col("degree") > 0)
    assert(conn.count() > 0, "test data should contain near-dup edges")
    assert(conn.filter(col("rank_micro") <= 150000L).count() == 0,
      "a neighbor's floor-div contribution is >= 1 micro-unit")
  }

  test("degrees sum even (each undirected edge counted twice)") {
    val total = ranks.agg(sum(col("degree"))).head.getLong(0)
    assert(total > 0 && total % 2 == 0, s"degree total $total")
  }

  test("every document appears exactly once") {
    val n = graft.Tables.documents(spark, sfDir).count()
    assert(ranks.count() == n)
    assert(ranks.select(col("doc_id")).distinct().count() == n)
  }

  test("star contraction equals min-label propagation on the near-dup graph") {
    val star = GraphOps.ccStarLabels(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = Dedup.clusterLabels(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop, "two CC algorithms must agree on every label")
  }

  test("star contraction solves a long chain, a cycle, and singletons") {
    import graft.TestSpark.spark.implicits._
    // path 0-1-…-19 (diameter 19 — the case min-propagation pays
    // O(diameter) rounds for and star contraction O(log²)), a separate
    // 4-cycle 100-103, and isolated nodes 200, 201
    val edges = ((0L until 19L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (102L, 103L), (103L, 100L)))
      .toDF("x", "y")
    val nodes = ((0L to 19L) ++ (100L to 103L) ++ Seq(200L, 201L))
      .toDF("id")
    val got = GraphOps.connectedComponentsStar(nodes, edges, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 19L).foreach(i => assert(got(i) == 0L, s"chain node $i"))
    (100L to 103L).foreach(i => assert(got(i) == 100L, s"cycle node $i"))
    assert(got(200L) == 200L && got(201L) == 201L, "singletons label themselves")
  }
}
