package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.DslCasts._
import graft.schema.ConfigValue
import graft.schema.ConfigValue._

/** Compiles imsc `<var>` templates to `Column` expressions
  * (ref: render_variable_value, src/scicat_metadata.py:279-325).
  *
  * Reference semantics:
  *  - a value that is exactly `<var>` substitutes the whole typed value
  *    WITH its unit;
  *  - embedded `<var>`s in a longer string splice python-str renderings
  *    and DROP the unit;
  *  - an unresolved `<...>` leftover is an error (→ F11 null-out);
  *  - dicts and lists recurse with unit consensus (all-equal or '').
  *
  * Because variables are per-schema constants, what the reference decides
  * per record is decided here at plan time; only unit consensus stays a
  * runtime expression (units are columns).
  */
object TemplateCompiler {

  /** Ordered variable registry (definition order matters). */
  final case class Registry(entries: Vector[(String, VarCol)]) {
    lazy val byName: Map[String, VarCol] = entries.toMap
    def +(kv: (String, VarCol)): Registry = Registry(entries :+ kv)
  }
  object Registry { val empty: Registry = Registry(Vector.empty) }

  def render(spec: ConfigValue, reg: Registry): Either[String, VarCol] = spec match {
    case CStr(s) => renderString(s, reg)
    case m: CMap =>
      val rendered = m.items.map { case (k, v) =>
        for {
          kc <- renderString(k, reg)
          vc <- render(v, reg)
        } yield (kc, vc)
      }
      sequence(rendered).map { kvs =>
        val mapCol = map(kvs.flatMap { case (k, v) =>
          Seq(k.value.cast("string"), pyStrCol(v))
        }: _*)
        VarCol(mapCol, VarCol.unitConsensus(kvs.map(_._2.unit)), Some(DDict))
      }
    case CSeq(items) =>
      sequence(items.map(render(_, reg))).map { vals =>
        val dtypes = vals.flatMap(_.dtype).distinct
        val (elems, elemType) =
          if (vals.nonEmpty && dtypes.forall(t => t == DFloat || t == DInteger) && dtypes.nonEmpty)
            (vals.map(_.value.cast("double")), DFloatArr)
          else (vals.map(pyStrCol), DStringArr)
        VarCol(array(elems: _*), VarCol.unitConsensus(vals.map(_.unit)), Some(elemType))
      }
    // Non-string scalars go through json.dumps then the string renderer
    // (ref: scicat_metadata.py:323-325) — they become strings.
    case CLong(v) => renderString(v.toString, reg)
    case CDouble(v) => renderString(graft.functions.PyLiteral.formatDouble(v), reg)
    case CBool(b) => renderString(if (b) "true" else "false", reg)
    case CNull => renderString("null", reg)
  }

  private def sequence[A](xs: Vector[Either[String, A]]): Either[String, Vector[A]] =
    xs.foldLeft[Either[String, Vector[A]]](Right(Vector.empty)) {
      case (acc, x) => acc.flatMap(v => x.map(v :+ _))
    }

  /** `_render_item` (ref: scicat_metadata.py:287-305). */
  def renderString(s: String, reg: Registry): Either[String, VarCol] = {
    // exactly one known variable → whole typed value incl. unit
    if (s.startsWith("<") && s.endsWith(">")) {
      val key = s.stripPrefix("<").stripSuffix(">")
      reg.byName.get(key) match {
        case Some(v) => return Right(v)
        case None => // fall through to splice path, like the reference
      }
    }
    // f-string-style splice: replace each known <var>, drop units
    var segments: Vector[Either[String, VarCol]] = Vector(Left(s))
    for ((name, varCol) <- reg.entries) {
      val token = "<" + name + ">"
      segments = segments.flatMap {
        case l @ Right(_) => Vector(l)
        case Left(text) =>
          val parts = splitKeep(text, token)
          parts.map {
            case Right(_) => Right(varCol)
            case Left(t) => Left(t)
          }
      }
    }
    val leftoverText = segments.collect { case Left(t) => t }.mkString
    if (leftoverText.contains("<") && leftoverText.contains(">"))
      Left(s"Unresolved variable: $s")
    else {
      val cols = segments.map {
        case Left(t) => lit(t)
        case Right(v) => pyStrCol(v)
      }
      val value = cols match {
        case Vector(single) => single
        case many => concat(many: _*)
      }
      Right(VarCol(value, lit(""), Some(DString)))
    }
  }

  /** Split text on a token, keeping the token occurrences as Right. */
  private def splitKeep(text: String, token: String): Vector[Either[String, Unit]] = {
    val out = Vector.newBuilder[Either[String, Unit]]
    var rest = text
    var idx = rest.indexOf(token)
    while (idx >= 0) {
      if (idx > 0) out += Left(rest.substring(0, idx))
      out += Right(())
      rest = rest.substring(idx + token.length)
      idx = rest.indexOf(token)
    }
    if (rest.nonEmpty) out += Left(rest)
    out.result()
  }

  /** python str() of a variable value as a Column, for string splicing. */
  def pyStrCol(v: VarCol): Column = v.dtype match {
    case Some(DStringArr) =>
      concat(lit("["),
        array_join(transform(v.value, x => concat(lit("'"), x, lit("'"))), ", "),
        lit("]"))
    case Some(DIntegerArr) | Some(DFloatArr) | Some(DList) =>
      concat(lit("["), array_join(v.value.cast("array<string>"), ", "), lit("]"))
    case _ => v.value.cast("string")
  }
}
