package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable rounding of computed doubles.
  *
  * `round()` semantics on DOUBLE differ between engines at binary
  * representation boundaries (measured: DuckDB rounds
  * 52724.244999999995 → .25 while Spark's BigDecimal HALF_UP yields
  * .24; DuckDB itself rounds 2.675 → 2.68 but 1.005 → 1.00). Spelling
  * the rounding out as `floor(x * 10^k + 0.5) / 10^k` makes every
  * intermediate an identical IEEE-754 operation on both sides, so a
  * bit-equal input always rounds bit-equally. Used wherever an oracle
  * compares a rounded COMPUTED double; exact decimal aggregates keep
  * plain `round` (exact inputs round exactly everywhere).
  */
object PortableRound {
  def pround(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    floor(c * f + 0.5).cast("double") / f
  }

  /** The same formula as SQL text for the DuckDB oracle. */
  def sql(expr: String, scale: Int): String = {
    val f = math.pow(10, scale).toLong
    s"floor(($expr) * $f + 0.5) / $f"
  }
}
