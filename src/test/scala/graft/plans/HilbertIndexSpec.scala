package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Substrate

/** The native order-16 Hilbert expression must be BIT-IDENTICAL to the
  * 16-round column chain it replaces — the chain is the documented
  * reference the DuckDB oracle replays, so any drift here would
  * silently split the production layout from its oracle. */
class HilbertIndexSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("native expression equals the column chain across the domain") {
    val n = HilbertIndex.N
    // corners, axes, diagonals, high/low bit mixes, and a pseudo-random
    // scatter — the cases where a rotation/reflection bug would bite
    val pts = (
      Seq((0L, 0L), (n - 1, 0L), (0L, n - 1), (n - 1, n - 1),
        (n / 2, n / 2), (n / 2 - 1, n / 2), (1L, 0L), (0L, 1L)) ++
      (0 until 256).map { i =>
        (((i * 2654435761L) % n + n) % n, ((i * 40503L + 12345L) % n + n) % n)
      }).distinct
    val df = pts.toDF("x", "y")
    val chain = Substrate.withHilbertColumns(df, col("x"), col("y"), "d_chain")
    val both = Substrate.withHilbert(chain, col("x"), col("y"), "d_native")
      .select("x", "y", "d_chain", "d_native").collect()
    both.foreach { r =>
      assert(r.getLong(2) == r.getLong(3),
        s"diverged at (${r.getLong(0)}, ${r.getLong(1)}): " +
          s"chain=${r.getLong(2)} native=${r.getLong(3)}")
    }
  }

  test("scala-side xy2d agrees with the expression path") {
    val viaExpr = Substrate.withHilbert(
      Seq((12345L, 54321L)).toDF("x", "y"), col("x"), col("y"), "d")
      .select("d").head().getLong(0)
    assert(HilbertIndex.xy2d(12345L, 54321L) == viaExpr)
  }

  test("range stays inside the order-16 square") {
    val n = HilbertIndex.N
    for ((x, y) <- Seq((0L, 0L), (n - 1, n - 1), (n / 3, 2 * n / 3))) {
      val d = HilbertIndex.xy2d(x, y)
      assert(d >= 0L && d < n * n)
    }
  }
}
