package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}

/** Optimizer rule: rewrite a naive point-in-interval INNER join into the
  * bin-blocked equi-join ([[graft.operators.Temporal.rangeJoinBinned]]'s
  * shape) automatically — the §2.8/§4.3 extension rung the engine had
  * not exercised yet (a `Rule[LogicalPlan]`, injected permanently via
  * [[GraftExtensions]] or per-session via `experimental.extraOptimizations`).
  *
  * Users write the natural thing:
  * {{{ points.join(intervals, $"ts" >= $"lo" && $"ts" < $"hi") }}}
  * which Spark can only plan as BroadcastNestedLoopJoin — O(n·m)
  * compares, and a broadcast of whichever side is smaller that stops
  * fitting in memory long before 100 TB. With
  * `spark.graft.rangeJoin.binWidth` set (raw units of the point column:
  * µs for timestamps), this rule turns it into:
  * {{{
  *   points  + __graft_bin_p = floorDiv(ts, w)                (narrow)
  *   intervals + explode(sequence(bin(lo), bin(hi')))          (≤ len/w+1 rows)
  *   JOIN ON __graft_bin_p = __graft_bin_i AND <original cond> (equi!)
  * }}}
  * so Catalyst plans a shuffled hash/sort-merge join whose key space is
  * time bins, with the original predicate re-checked exactly. The
  * duplication factor of the interval side is interval_len/width + 1 —
  * pick the width ≈ the typical interval length (same guidance as the
  * explicit helper, and as Databricks' range-join binning).
  *
  * Scope guards (all conservative — when in doubt, leave the join alone):
  *  - inner joins with no join hint only;
  *  - skipped when ANY cross-side equality conjunct exists (Spark
  *    already plans those as an equi-join; this also makes the rule a
  *    fixed-point: its own output contains the bin equality);
  *  - both bounds must constrain the SAME point expression, one side
  *    supplying the point and the other both bounds;
  *  - point/bound types must be integral-backed (long/int/timestamp).
  *
  * Empty or inverted intervals (hi <= lo, or a null bound) are
  * pre-filtered on the interval side — an inner join can never match
  * them, and `sequence()` would raise on start > stop.
  */
object RangeJoinRule extends Rule[LogicalPlan] {

  val WidthConf = "spark.graft.rangeJoin.binWidth"

  /** Per-session registration (the permanent path is
    * `spark.sql.extensions=graft.plans.GraftExtensions`). */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRule)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRule
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthConf, "0").toLong
    if (width <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), hint) if hint == JoinHint.NONE =>
        rewrite(j, width).getOrElse(j)
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** A normalized bound conjunct: `point (>=|>) bound` (lower) or
    * `point (<=|<) bound` (upper). */
  private case class Bound(point: Expression, bound: Expression,
      isLower: Boolean, inclusive: Boolean)

  private def classify(e: Expression): Seq[Bound] = e match {
    case GreaterThanOrEqual(a, b) =>
      Seq(Bound(a, b, isLower = true, inclusive = true),
        Bound(b, a, isLower = false, inclusive = true))
    case GreaterThan(a, b) =>
      Seq(Bound(a, b, isLower = true, inclusive = false),
        Bound(b, a, isLower = false, inclusive = false))
    case LessThanOrEqual(a, b) =>
      Seq(Bound(a, b, isLower = false, inclusive = true),
        Bound(b, a, isLower = true, inclusive = true))
    case LessThan(a, b) =>
      Seq(Bound(a, b, isLower = false, inclusive = false),
        Bound(b, a, isLower = true, inclusive = false))
    case _ => Seq.empty
  }

  /** point value → LongType expression, or None for unsupported types. */
  private def toLong(e: Expression): Option[Expression] = e.dataType match {
    case LongType => Some(e)
    case IntegerType => Some(Cast(e, LongType))
    case TimestampType => Some(UnixMicros(e))
    case _ => None
  }

  /** Exact floor-division bin (floor semantics for negatives too, which
    * Long `/` does not give): (x - pmod(x, w)) div w. */
  private def bin(x: Expression, w: Long): Expression =
    IntegralDivide(Subtract(x, Pmod(x, Literal(w))), Literal(w))

  private def rewrite(j: Join, width: Long): Option[LogicalPlan] = {
    val Join(left, right, _, Some(cond), hint) = j
    val conjuncts = splitConjuncts(cond)

    def side(e: Expression): Option[Boolean] = // Some(true)=left
      if (e.references.nonEmpty && e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.nonEmpty && e.references.subsetOf(right.outputSet)) Some(false)
      else None

    // Bail if a cross-side equality already exists (incl. our own output).
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => (for (sa <- side(a); sb <- side(b)) yield sa != sb).getOrElse(false)
      case EqualNullSafe(a, b) => (for (sa <- side(a); sb <- side(b)) yield sa != sb).getOrElse(false)
      case _ => false
    }
    if (hasEqui) return None

    // Cross-side bounds, keyed by which side holds the point expression.
    val bounds = conjuncts.flatMap(classify).flatMap { b =>
      for (ps <- side(b.point); bs <- side(b.bound); if ps != bs) yield (b, ps)
    }
    val pair = (for {
      (lo, pSide) <- bounds.iterator.filter(_._1.isLower)
      (hi, hSide) <- bounds.iterator.filter(!_._1.isLower)
      if pSide == hSide && lo.point.semanticEquals(hi.point)
    } yield (lo, hi, pSide)).take(1).toSeq.headOption
    val (lower, upper, pointOnLeft) = pair.getOrElse(return None)

    val pLong = toLong(lower.point).getOrElse(return None)
    val loLong = toLong(lower.bound).getOrElse(return None)
    val hiRaw = toLong(upper.bound).getOrElse(return None)
    // Last covered bin: bin(hi) when inclusive, bin(hi - 1) when strict.
    val hiLong = if (upper.inclusive) hiRaw else Subtract(hiRaw, Literal(1L))

    val (pointSide, intervalSide) = if (pointOnLeft) (left, right) else (right, left)
    val binP = Alias(bin(pLong, width), "__graft_bin_p")()
    val pointPlan = Project(pointSide.output :+ binP, pointSide)
    // Inner join can never match an empty/inverted/null interval; the
    // filter also keeps sequence() from raising on start > stop.
    val nonEmpty = GreaterThanOrEqual(hiLong, loLong)
    // timeZoneId must be filled in by hand: Sequence is TimeZoneAware
    // (hence unresolved without it) and the analyzer's ResolveTimeZone
    // has already run by the time an optimizer rule fires.
    val seq = Sequence(bin(loLong, width), bin(hiLong, width), Some(Literal(1L)),
      Some(conf.sessionLocalTimeZone))
    val gen = Explode(seq)
    val elem = gen.elementSchema.head
    val binI = AttributeReference("__graft_bin_i", elem.dataType, elem.nullable)()
    val intervalPlan = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(binI),
      child = Filter(nonEmpty, intervalSide))

    val binEq = EqualTo(binP.toAttribute, binI)
    val rewritten =
      if (pointOnLeft) Join(pointPlan, intervalPlan, Inner, Some(And(binEq, cond)), hint)
      else Join(intervalPlan, pointPlan, Inner, Some(And(binEq, cond)), hint)
    Some(Project(left.output ++ right.output, rewritten))
  }
}
