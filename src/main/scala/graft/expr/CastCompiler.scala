package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.DslCasts._
import graft.functions.PyUdfs

/** Column-level `convert_to_type` (ref: scicat_dataset.py:119-145):
  * dispatches on the variable's compile-time DSL type so the common
  * paths stay built-in casts (codegen'd); only string inputs that may
  * hold python literals fall back to the PyUdfs parse path. Conversion
  * failures become nulls — the F11 error channel.
  */
object CastCompiler {

  private val intRe = "^\\s*[+-]?\\d+\\s*$"

  def sparkType(t: DslType): DataType = t match {
    case DString | DEmail | DLink | DDate => StringType
    case DInteger => LongType
    case DFloat => DoubleType
    case DStringArr => ArrayType(StringType)
    case DIntegerArr => ArrayType(LongType)
    case DFloatArr => ArrayType(DoubleType)
    case DDict => MapType(StringType, StringType)
    case DList => ArrayType(StringType)
    case DNone => StringType
  }

  /** Compile a cast of `v` to `target`, preserving the unit
    * (ref: extract_variables_values keeps value.unit post-conversion,
    * scicat_dataset.py:417-420). */
  def cast(v: VarCol, target: DslType): VarCol = {
    val in = v.dtype
    val value = target match {
      case DString | DEmail | DLink => TemplateCompiler.pyStrCol(v)

      case DInteger => in match {
        case Some(DInteger) => v.value
        case Some(DFloat) => v.value.cast("long")
        case _ =>
          val s = v.value.cast("string")
          when(s.rlike(intRe), trim(s).cast("long")).otherwise(lit(null).cast("long"))
      }

      case DFloat => in match {
        case Some(DFloat) => v.value
        case Some(DInteger) => v.value.cast("double")
        case _ => v.value.cast("string").cast("double") // null on parse failure
      }

      case DStringArr => in match {
        case Some(DStringArr) => v.value
        case Some(DIntegerArr) | Some(DFloatArr) | Some(DList) =>
          v.value.cast("array<string>")
        case _ => PyUdfs.pyStringArray(v.value.cast("string"))
      }

      case DIntegerArr => in match {
        case Some(DIntegerArr) => v.value
        case Some(DFloatArr) => v.value.cast("array<long>") // python int() truncation
        case Some(DStringArr) =>
          // strict: ANY bad element fails the whole variable (python raises)
          when(exists(v.value, x => !x.rlike(intRe)), lit(null).cast("array<long>"))
            .otherwise(transform(v.value, x => trim(x).cast("long")))
        case _ => PyUdfs.pyIntegerArray(v.value.cast("string"))
      }

      case DFloatArr => in match {
        case Some(DFloatArr) => v.value
        case Some(DIntegerArr) => v.value.cast("array<double>")
        case Some(DStringArr) =>
          when(exists(v.value, x => x.cast("double").isNull && x.isNotNull),
            lit(null).cast("array<double>"))
            .otherwise(v.value.cast("array<double>"))
        case _ => PyUdfs.pyFloatArray(v.value.cast("string"))
      }

      case DDate => in match {
        case Some(DInteger) | Some(DFloat) => PyUdfs.pyEpochIso(v.value.cast("double"))
        case _ => PyUdfs.pyIsoDate(v.value.cast("string"))
      }

      case DDict => in match {
        case Some(DDict) => v.value
        case _ => PyUdfs.pyDictOfStrings(v.value.cast("string"))
      }

      case DList => in match {
        case Some(DList) | Some(DStringArr) => v.value.cast("array<string>")
        case Some(DIntegerArr) | Some(DFloatArr) => v.value.cast("array<string>")
        case _ => PyUdfs.pyListOfStrings(v.value.cast("string"))
      }

      case DNone => lit(null).cast("string")
    }
    VarCol(value, v.unit, Some(target))
  }
}
