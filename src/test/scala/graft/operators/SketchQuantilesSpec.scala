package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Invariants for the fixed-bin histogram quantile estimator: the
  * estimate can never leave the holding bin (error ≤ one bin width +
  * the 1-cent lo rounding), estimates are monotone in the requested
  * percentile, and the exact twin really is the rank statistic. */
class SketchQuantilesSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("histogram quantiles: bounded error, monotone, exact twin is the rank value") {
    val rows = Sketches.histogramQuantiles(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("q_pct"))
    assert(rows.map(_.getAs[Long]("q_pct")).toSeq == Seq(25L, 50L, 75L, 90L, 99L))
    for (r <- rows) {
      val err = math.abs(r.getAs[Long]("err_cents"))
      assert(err <= r.getAs[Long]("bin_width") + 1,
        s"q=${r.getAs[Long]("q_pct")} err=$err width=${r.getAs[Long]("bin_width")}")
    }
    val ests = rows.map(_.getAs[Long]("est_cents")).toSeq
    assert(ests == ests.sorted, s"estimates not monotone: $ests")
    // the exact twin: recount the median rank directly
    val cents = graft.Tables.lineitem(spark, sfDir)
      .select(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("c"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length.toLong
    val r50 = (50L * n + 99L) / 100L
    val exact50 = rows.find(_.getAs[Long]("q_pct") == 50L).get.getAs[Long]("exact_cents")
    assert(exact50 == cents((r50 - 1).toInt))
  }
}
