package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native squared-L2 distance over two double arrays, with whole-stage
  * codegen — the hot inner op of the PQ/IVF-PQ family
  * ([[graft.operators.Similarity.ivfPqTopK]] evaluates it corpus ×
  * centroids times during assignment and corpus × codebook times during
  * encoding). Accumulates `(x[i]−y[i])²` in index order, so results are
  * bit-identical to the `zip_with`+`aggregate` fold it replaces and to
  * the DuckDB oracle's `list_dot_product` of the element diff.
  *
  * Mismatched lengths or a null element yield null (the operators only
  * feed equal-length non-null slices; strictness here surfaces misuse
  * instead of silently truncating).
  */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.DataTypeMismatch(
      errorSubClass = "UNEXPECTED_INPUT_TYPE",
      messageParameters = Map(
        "paramIndex" -> "1", "requiredType" -> "array<double>",
        "inputSql" -> left.sql, "inputType" -> left.dataType.sql))
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_dist2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < x.numElements()) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val bad = ctx.freshName("bad")
      s"""
         |double $acc = 0.0;
         |boolean $bad = $a.numElements() != $b.numElements();
         |for (int $i = 0; !$bad && $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Distance =
    copy(left = newLeft, right = newRight)
}

object L2Distance {
  /** Register `l2_dist2` in the session's function registry (idempotent,
    * same extension hook as [[CosineSimilarity.register]]). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier("l2_dist2")
    if (!registry.functionExists(ident)) {
      registry.createOrReplaceTempFunction(
        "l2_dist2", exprs => L2Distance(exprs(0), exprs(1)), "built-in")
    }
  }
}
