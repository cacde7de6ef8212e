package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.DslCasts._
import graft.functions.PyUdfs

/** The VALUE-operator registry compiled to `Column` transforms
  * (ref: _OPERATOR_REGISTRY src/scicat_dataset.py:245-267, doc table
  * documentation/docs/user-guide/metadata-schemas.md:296-307).
  *
  * Reference semantics preserved:
  *  - unknown / empty operator name falls back to DO_NOTHING
  *    (ref: scicat_dataset.py:277-282);
  *  - every operator except DO_NOTHING and `sum` drops the unit;
  *    `sum` forwards it (ref: scicat_dataset.py:237-242);
  *  - `str-replace` is a LITERAL replace and a no-op when pattern or
  *    replacement is missing (ref: scicat_dataset.py:200-210).
  *
  * All operators are built-in expression compositions (codegen'd);
  * only string-typed inputs that need a python-literal parse fall back
  * to a UDF.
  */
object ValueOperators {

  /** Operator arguments from the variable config
    * (ref: VariableConfigValue, scicat_metadata.py:126-135). */
  final case class OpSpec(
      field: Option[String] = None,
      pattern: Option[String] = None,
      replacement: Option[String] = None)

  type Op = (VarCol, OpSpec) => VarCol

  val registry: Map[String, Op] = Map(
    "DO_NOTHING" -> ((v, _) => v),
    "join_with_space" -> joinWithSpace,
    "filename" -> ((v, _) => VarCol(basename(v.value), lit(""), Some(DString))),
    "dirname" -> ((v, _) => VarCol(dirname(v.value), lit(""), Some(DString))),
    "dirname-2" -> ((v, _) => VarCol(dirname(dirname(v.value)), lit(""), Some(DString))),
    "getitem" -> getItem,
    "str-replace" -> strReplace,
    "urlsafe" -> ((v, _) => VarCol(url_encode(v.value.cast("string")), lit(""), Some(DString))),
    "to-lower" -> ((v, _) => VarCol(lower(v.value.cast("string")), lit(""), Some(DString))),
    "to-upper" -> ((v, _) => VarCol(upper(v.value.cast("string")), lit(""), Some(DString))),
    "sum" -> sumOp,
  )

  /** Lookup with DO_NOTHING default — mirrors `_get_operator`. */
  def apply(name: Option[String], in: VarCol, spec: OpSpec): VarCol =
    registry.getOrElse(name.filter(_.nonEmpty).getOrElse("DO_NOTHING"),
      registry("DO_NOTHING"))(in, spec)

  /** os.path.basename — text after the last '/'. */
  def basename(c: Column): Column = element_at(split(c, "/"), -1)

  /** os.path.dirname with posixpath edge cases: no slash → "",
    * all-slash head kept verbatim, else trailing slashes stripped. */
  def dirname(c: Column): Column = {
    val head = regexp_extract(c, "^(.*/)", 1)
    when(head.rlike("^/+$"), head)
      .otherwise(regexp_replace(head, "/+$", ""))
  }

  private def joinWithSpace: Op = (v, _) => {
    val joined = v.dtype match {
      case Some(DStringArr) | Some(DList) => array_join(v.value, ", ")
      case Some(DIntegerArr) | Some(DFloatArr) =>
        // python would raise (join of non-str); engine nulls out (F11)
        lit(null).cast("string")
      case _ => PyUdfs.pyJoinWithSpace(v.value.cast("string"))
    }
    VarCol(joined, lit(""), Some(DString))
  }

  private def getItem: Op = (v, spec) => {
    val field = spec.field.getOrElse("")
    val isInt = field.matches("-?\\d+")
    val out = v.dtype match {
      case Some(DStringArr) | Some(DIntegerArr) | Some(DFloatArr) | Some(DList) if isInt =>
        val k = field.toLong
        element_at(v.value, if (k >= 0) (k + 1).toInt else k.toInt)
      case Some(DDict) => element_at(v.value, lit(field))
      case _ if isInt =>
        get_json_object(v.value.cast("string"), s"$$[$field]")
      case _ =>
        get_json_object(v.value.cast("string"), s"$$.$field")
    }
    VarCol(out, lit(""), None)
  }

  private def strReplace: Op = (v, spec) => (spec.pattern, spec.replacement) match {
    case (Some(p), Some(r)) =>
      VarCol(replace(v.value.cast("string"), lit(p), lit(r)), lit(""), Some(DString))
    case _ => VarCol(v.value, lit(""), v.dtype)
  }

  private def sumOp: Op = (v, _) => {
    val summed = v.dtype match {
      case Some(DIntegerArr) =>
        aggregate(v.value, lit(0L), (acc, x) => acc + x)
      case _ =>
        aggregate(v.value.cast("array<double>"), lit(0.0), (acc, x) => acc + x)
    }
    VarCol(summed, v.unit, v.dtype.map { case DIntegerArr => DInteger; case _ => DFloat })
  }
}
