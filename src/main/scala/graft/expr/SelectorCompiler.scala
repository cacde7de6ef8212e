package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.schema.ConfigValue
import graft.schema.ConfigValue._

/** The imsc schema-selector grammar compiled both ways:
  *  - [[eval]]: plain driver-side evaluation (schema selection happens
  *    once per file, ref: _select_applicable_schema
  *    src/scicat_metadata.py:354-417);
  *  - [[compile]]: the same predicate as a `Column`, for the data-plane
  *    first-match `when` cascade over a filename column.
  *
  * Reference quirks preserved:
  *  - a selector string must split into exactly 3 ':'-separated parts
  *    (`a:b:c:d` → no match, not an error);
  *  - unknown target/function names → no match (warned, not fatal);
  *  - dict composition: keys are folded CONJUNCTIVELY in order —
  *    `or` contributes `output && any(...)`, `and` contributes
  *    `output && all(...)`, unknown keys leave output unchanged
  *    (ref: scicat_metadata.py:393-414).
  */
object SelectorCompiler {

  val targets: Set[String] = Set("filename")
  val functions: Set[String] = Set("starts_with", "contains")

  def eval(sel: ConfigValue, filename: String): Boolean = sel match {
    case CStr("*") => true
    case CStr(s) =>
      s.split(":", -1) match {
        case Array(target, fn, arg) if targets(target) =>
          fn match {
            case "starts_with" => filename.startsWith(arg)
            case "contains" => filename.contains(arg)
            case _ => false
          }
        case _ => false
      }
    case m: CMap =>
      m.items.foldLeft(true) {
        case (out, ("or", CSeq(items))) => out && items.exists(eval(_, filename))
        case (out, ("and", CSeq(items))) => out && items.forall(eval(_, filename))
        case (out, _) => out // unknown operator key: warned & ignored
      }
    case _ => false
  }

  def compile(sel: ConfigValue, filenameCol: Column): Column = sel match {
    case CStr("*") => lit(true)
    case CStr(s) =>
      s.split(":", -1) match {
        case Array(target, fn, arg) if targets(target) =>
          fn match {
            case "starts_with" => filenameCol.startsWith(lit(arg))
            case "contains" => filenameCol.contains(lit(arg))
            case _ => lit(false)
          }
        case _ => lit(false)
      }
    case m: CMap =>
      m.items.foldLeft(lit(true)) {
        case (out, ("or", CSeq(items))) =>
          out && items.map(compile(_, filenameCol)).reduceOption(_ || _).getOrElse(lit(false))
        case (out, ("and", CSeq(items))) =>
          out && items.map(compile(_, filenameCol)).reduceOption(_ && _).getOrElse(lit(true))
        case (out, _) => out
      }
    case _ => lit(false)
  }

  /** python `str.capitalize()` — used by the schema sort key
    * (ref: scicat_metadata.py:334-342). */
  def pyCapitalize(s: String): String =
    if (s.isEmpty) s else s.head.toUpper.toString + s.tail.toLowerCase
}
