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
}
