package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `edit_within1(a, b)` — true iff Levenshtein(a, b) ≤ 1, via a
  * two-pointer single scan instead of the O(n·m) DP that the general
  * `levenshtein` function runs. The FastSS verify stage
  * ([[graft.operators.Dedup.fuzzyNeighbors]]) only ever asks "is the
  * distance ≤ 1?", and at threshold 1 the answer is decidable in O(n)
  * with no allocation: walk both strings to the first mismatch, spend
  * the single edit (substitute if equal length, else skip one char of
  * the longer), and require the tails to match exactly.
  *
  * Exactly equivalent to `levenshtein(a, b) <= 1` (property-tested
  * against it in EditWithin1Spec), which is also what the DuckDB
  * oracle runs.
  */
case class EditWithin1(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.DataTypeMismatch(
      errorSubClass = "UNEXPECTED_INPUT_TYPE",
      messageParameters = Map(
        "paramIndex" -> "1", "requiredType" -> "string",
        "inputSql" -> left.sql, "inputType" -> left.dataType.sql))
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "edit_within1"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Boolean.valueOf(EditWithin1.check(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.EditWithin1.check($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EditWithin1 =
    copy(left = newLeft, right = newRight)
}

object EditWithin1 {

  /** One-edit check over code points (the unit `levenshtein` counts).
    * Static forwarder so generated code can call it directly. */
  def check(a: UTF8String, b: UTF8String): Boolean = {
    val s = a.toString
    val t = b.toString
    val n = s.codePointCount(0, s.length)
    val m = t.codePointCount(0, t.length)
    if (n - m > 1 || m - n > 1) return false
    var i = 0 // UTF-16 offsets
    var j = 0
    var edits = 0
    while (i < s.length && j < t.length) {
      val cs = s.codePointAt(i)
      val ct = t.codePointAt(j)
      if (cs == ct) { i += Character.charCount(cs); j += Character.charCount(ct) }
      else {
        edits += 1
        if (edits > 1) return false
        if (n == m) { // substitution
          i += Character.charCount(cs); j += Character.charCount(ct)
        }
        else if (n > m) i += Character.charCount(cs) // code point of s deleted
        else j += Character.charCount(ct)            // code point of t deleted
      }
    }
    val tailS = s.codePointCount(i, s.length)
    val tailT = t.codePointCount(j, t.length)
    edits + tailS + tailT <= 1
  }

  /** Register `edit_within1` in the session's function registry
    * (idempotent, same hook as [[L2Distance.register]]). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier("edit_within1")
    if (!registry.functionExists(ident)) {
      registry.createOrReplaceTempFunction(
        "edit_within1", exprs => EditWithin1(exprs(0), exprs(1)), "built-in")
    }
  }
}
