package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Backward AS-OF join as a FIRST-CLASS operator — the full custom-
  * operator ladder (SURVEY §4.3/§2.8 rung (c)): a resolved logical node
  * ([[AsofJoinPlan]]), a planner strategy ([[AsofJoinStrategy]],
  * registered per-session via `spark.experimental.extraStrategies` or
  * permanently via [[GraftExtensions]]), and a sort-merge physical
  * exec ([[AsofJoinExec]]).
  *
  * Semantics match [[graft.operators.Temporal.asofJoin]] (the
  * window-composition form, kept as the portable twin): for each left
  * row, the payload of the LATEST right row with equal keys and
  * `right.ts <= left.ts`, nulls when none; ties at equal ts resolve
  * right-first; the right side must be unique per (keys, ts). Null
  * timestamps never match (either side).
  *
  * Why a custom exec at 100 TB: the window form UNIONs both sides, so
  * the shuffle carries left+right and the per-key sort runs over the
  * union. This exec declares `ClusteredDistribution`/`SortOrder`
  * requirements per CHILD — each side shuffles and sorts separately
  * (right is typically much smaller), the merge itself is a streaming
  * single pass with O(1) state per partition (one buffered match), and
  * Spark's EnsureRequirements elides the exchanges entirely when a
  * side is already bucketed/sorted by (keys, ts) — the layout the
  * window form can never exploit across the union.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    rightValues: Seq[Attribute],
    matched: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ matched
  override def producedAttributes: AttributeSet = AttributeSet(matched)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lts, rts, rv, m) =>
      AsofJoinExec(lk, rk, lts, rts, rv, m, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    rightValues: Seq[Attribute],
    matched: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ matched

  /** Both children cluster on their join keys (EnsureRequirements
    * co-partitions them exactly as for a shuffled equi-join). */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  /** …and sort within partitions by (keys, ts) so the merge is one
    * streaming pass. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val out = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val rValProj = UnsafeProjection.create(rightValues, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(leftKeys.map(_.dataType))
      val tsType = leftTs.dataType
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
      val lTsOrdinal = lOut.indexWhere(_.exprId == leftTs.exprId)
      val rTsOrdinal = rOut.indexWhere(_.exprId == rightTs.exprId)
      val resultProj = UnsafeProjection.create(out, lOut ++ matched)
      val joiner = new JoinedRow
      val nullRow = new GenericInternalRow(matched.length)
      val rBuf = rIt.buffered
      // O(1) merge state: the current key's best match so far.
      var matchRow: UnsafeRow = null
      var matchKey: UnsafeRow = null
      lIt.map { lRow =>
        val lKey = lKeyProj(lRow)
        if (matchKey != null && keyOrd.compare(matchKey, lKey) != 0) {
          matchRow = null; matchKey = null
        }
        val lTsVal = lRow.get(lTsOrdinal, tsType)
        var advance = true
        while (advance && rBuf.hasNext) {
          val head = rBuf.head
          val rKey = rKeyProj(head)
          val c = keyOrd.compare(rKey, lKey)
          if (c < 0) rBuf.next() // stale key: left is ascending, drop
          else if (c > 0) advance = false
          else {
            val rTsVal = head.get(rTsOrdinal, tsType)
            if (rTsVal == null) rBuf.next() // null ts never matches
            else if (lTsVal != null && tsOrd.lteq(rTsVal, lTsVal)) {
              matchRow = rValProj(rBuf.next()).copy()
              if (matchKey == null) matchKey = lKey.copy()
            } else advance = false
          }
        }
        resultProj(joiner(lRow, if (matchRow != null) matchRow else nullRow))
      }
    }
  }
}

/** Registration + DataFrame-level API for the native as-of join. */
object AsofJoinNative {

  /** Per-session registration through the PUBLIC experimental seam
    * (the permanent-build path is `spark.sql.extensions=`
    * [[GraftExtensions]], which injects the same strategy). */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    }
  }

  /** Backward as-of join via the native operator; same contract as
    * [[graft.operators.Temporal.asofJoin]] — right payload columns plus
    * the matched timestamp as `matched_<tsCol>`, callers pre-rename
    * collisions. */
  def asofJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = left.queryExecution.analyzed
    // Re-alias the right side so its attributes get FRESH exprIds: a
    // self-join (both sides derived from one table) would otherwise
    // put the same exprId in both children, and attribute resolution
    // inside the custom node becomes ambiguous (the analyzer's
    // DeduplicateRelations only knows how to repair built-in joins).
    val rPlan = right.select(right.columns.toSeq.map(c =>
      org.apache.spark.sql.functions.col(c).as(c)): _*).queryExecution.analyzed
    def attr(plan: LogicalPlan, n: String): Attribute =
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${plan.output.map(_.name)}"))
    val lKeys = keys.map(attr(lPlan, _))
    val rKeys = keys.map(attr(rPlan, _))
    val lTs = attr(lPlan, tsCol)
    val rTs = attr(rPlan, tsCol)
    require(lTs.dataType == rTs.dataType, "ts columns must share a type")
    val payload = rPlan.output.filterNot(a => keys.contains(a.name) || a.name == tsCol)
    require(payload.nonEmpty, "right side needs at least one payload column")
    val matched = AttributeReference(s"matched_$tsCol", rTs.dataType, nullable = true)() +:
      payload.map(a => AttributeReference(a.name, a.dataType, nullable = true)())
    GraftSqlShim.ofRows(spark,
      AsofJoinPlan(lPlan, rPlan, lKeys, rKeys, lTs, rTs, rTs +: payload, matched))
  }
}
