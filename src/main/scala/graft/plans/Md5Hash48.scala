package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native form of [[graft.functions.PortableHash.md5Hash48]]: the
  * 48-bit portable hash read directly from the first 6 digest bytes,
  * skipping the hex-encode → substring → conv(16,10) string round-trip
  * of the composed version. Bit-identical by construction (the first
  * 12 hex chars ARE the first 6 bytes, big-endian), proven by
  * PortableHashSpec's equivalence sweep, so the DuckDB oracle replica
  * is unchanged.
  *
  * MEASURED RESULT (sf0.1, A/B on dedup_simhash / dedup_minhash_buckets
  * / dedup_simhash_pairs, median-of-3 each): no significant difference
  * vs the composed form — medians 1.00 vs 1.03 s, 1.09 vs 1.31 s
  * (inside repeat noise), 1.44 vs 1.40 s. The MD5 digest dominates;
  * Spark's md5/conv intrinsics are already codegen'd, so skipping the
  * 32-char hex round-trip is not visible at this scale. The hot call
  * sites therefore stay on the composed built-ins (no registry
  * dependency); this expression remains as the registered tier-(b)
  * extension-surface demonstration (SURVEY §4.3 preference order), kept
  * bit-compatible by PortableHashSpec.
  */
case class Md5Hash48(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.DataTypeMismatch(
        errorSubClass = "UNEXPECTED_INPUT_TYPE",
        messageParameters = Map(
          "paramIndex" -> "1", "requiredType" -> "string",
          "inputSql" -> child.sql, "inputType" -> other.sql))
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash48"

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash48.hash48(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Hash48.hash48($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash48 =
    copy(child = newChild)
}

object Md5Hash48 {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 6 md5 bytes as an unsigned big-endian 48-bit value — the
    * integer the first 12 hex chars spell. Called from generated code. */
  def hash48(s: UTF8String): Long = {
    val d = digests.get().digest(s.getBytes)
    ((d(0) & 0xFFL) << 40) | ((d(1) & 0xFFL) << 32) | ((d(2) & 0xFFL) << 24) |
      ((d(3) & 0xFFL) << 16) | ((d(4) & 0xFFL) << 8) | (d(5) & 0xFFL)
  }

  /** Register `md5_hash48` in the session's function registry
    * (idempotent; same extension hook as [[CosineSimilarity]]). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier("md5_hash48")
    if (!registry.functionExists(ident)) {
      registry.createOrReplaceTempFunction(
        "md5_hash48", exprs => Md5Hash48(exprs.head), "built-in")
    }
  }
}
