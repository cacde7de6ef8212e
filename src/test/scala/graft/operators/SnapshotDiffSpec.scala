package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Semantics of the CDC snapshot diff: every emitted change row is
  * exactly one the simulated version-B mutations produced, and the
  * counts recount from the mutation predicates directly.
  */
class SnapshotDiffSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("change rows partition cleanly by the mutation predicates") {
    val diff = Relational.snapshotDiff(spark, sfDir).collect()
    assert(diff.nonEmpty)
    for (r <- diff) {
      val key = r.getLong(0)
      r.getString(1) match {
        case "insert" =>
          assert(key % 93 == 0 && key % 97 != 0, s"bad insert key $key")
          assert(r.isNullAt(3) && !r.isNullAt(4), "insert has only new_fp")
        case "delete" =>
          assert(key % 97 == 0 && key % 93 != 0, s"bad delete key $key")
          assert(!r.isNullAt(3) && r.isNullAt(4), "delete has only old_fp")
        case "update" =>
          assert(key % 89 == 0 && key % 93 != 0 && key % 97 != 0,
            s"bad update key $key")
          // +5% reprice: delta = (p*105 div 100) - p > 0, fingerprints move
          assert(r.getLong(2) > 0, s"update delta must be positive ($key)")
          assert(r.getLong(3) != r.getLong(4), "fingerprint must change")
        case other => fail(s"unexpected change_type $other")
      }
    }
  }

  test("counts recount from the order-key predicates") {
    val diff = Relational.snapshotDiff(spark, sfDir)
      .groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keys = Tables.orders(spark, sfDir).select(col("o_orderkey"))
      .collect().map(_.getLong(0))
    val expected = Map(
      "insert" -> keys.count(k => k % 93 == 0 && k % 97 != 0).toLong,
      "delete" -> keys.count(k => k % 97 == 0 && k % 93 != 0).toLong,
      "update" -> keys.count(k =>
        k % 89 == 0 && k % 93 != 0 && k % 97 != 0).toLong)
    assert(diff == expected.filter(_._2 > 0),
      s"got $diff expected $expected")
  }

  test("unchanged rows are never emitted") {
    val diff = Relational.snapshotDiff(spark, sfDir)
    val n = Tables.orders(spark, sfDir).count()
    assert(diff.count() < n / 10,
      "the changelog must be churn-sized, not table-sized")
  }

  test("incremental view maintenance equals full recompute at version B") {
    val inc = Relational.incrementalAgg(spark, sfDir)
    // independent full recompute of the view at snapshot B
    val full = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("price_c"))
      .filter(col("o_orderkey") % 97 =!= 0)
      .withColumn("price_c", when(col("o_orderkey") % 89 === 0,
        expr("price_c * 105 DIV 100")).otherwise(col("price_c")))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sum(col("price_c")).as("spend_c"))
    assert(inc.count() > 0)
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
      "view ⊕ changelog must equal the recomputed view")
    // the merge path must stay join+aggregate — no window, no sort-all
    val p = inc.queryExecution.executedPlan.toString
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
  }
}
