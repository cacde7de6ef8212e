package graft.functions

import java.time._
import java.time.format.DateTimeFormatter

import PyLiteral._

/** The imsc DSL's closed `value_type` cast system
  * (ref: src/scicat_dataset.py:42-145, type table in
  * documentation/docs/user-guide/metadata-schemas.md:195-205).
  *
  * Scalar semantics implemented once over [[PyLiteral.PyValue]]; the imsc
  * compiler wraps these in UDFs only where a python-literal parse of a
  * string input is required — array/numeric inputs cast with Spark
  * built-ins (see ImscCompiler).
  */
object DslCasts {

  sealed abstract class DslType(val name: String) extends Serializable
  case object DString extends DslType("string")
  case object DStringArr extends DslType("string[]")
  case object DInteger extends DslType("integer")
  case object DIntegerArr extends DslType("integer[]")
  case object DFloat extends DslType("float")
  case object DFloatArr extends DslType("float[]")
  case object DDate extends DslType("date")
  case object DDict extends DslType("dict")
  case object DList extends DslType("list")
  case object DEmail extends DslType("email")
  case object DLink extends DslType("link")
  case object DNone extends DslType("none")

  val all: Seq[DslType] = Seq(DString, DStringArr, DInteger, DIntegerArr,
    DFloat, DFloatArr, DDate, DDict, DList, DEmail, DLink, DNone)

  /** Invalid dtype name is a hard error (ref: scicat_dataset.py:138-145). */
  def byName(name: String): DslType =
    all.find(_.name == name).getOrElse(throw new IllegalArgumentException(
      s"Invalid dtype description. Must be one of: ${all.map(_.name).mkString(",")} Got: $name"))

  /** `convert_to_type` semantics. Left = per-variable failure (collected
    * and skipped by the pipeline, F11 — never aborts the run). */
  def convert(v: PyValue, t: DslType): Either[String, PyValue] = t match {
    case DString | DEmail | DLink => Right(PyStr(pyStr(v)))
    case DInteger => pyInt(v).map(PyInt.apply)
    case DFloat => pyFloat(v).map(PyFloat.apply)
    case DStringArr => elementwise(v)(x => Right(PyStr(pyStr(x))))
    case DIntegerArr => elementwise(v)(x => pyInt(x).map(PyInt.apply))
    case DFloatArr => elementwise(v)(x => pyFloat(x).map(PyFloat.apply))
    case DDate => toIsoDate(v)
    case DDict => v match {
      case s: PyStr => parseAs(s, { case d: PyDict => d }, "dictionary")
      case d: PyDict => Right(d)
      case other => Left(s"cannot convert to dict: ${pyStr(other)}")
    }
    case DList => v match {
      case s: PyStr => parseAs(s, { case l: PyList => l }, "list")
      case l: PyList => Right(l)
      case other => Left(s"cannot convert to list: ${pyStr(other)}")
    }
    case DNone => v match {
      case PyNone => Right(PyNone)
      case _ => Left("`None` type value should be `None`.")
    }
  }

  /** literal_eval string inputs first, then convert elementwise —
    * `"'test'"` therefore iterates characters (ref quirk pinned at
    * tests/test_scicat_dataset.py:28). */
  private def elementwise(v: PyValue)(f: PyValue => Either[String, PyValue]): Either[String, PyValue] = {
    val iterable = v match {
      case PyStr(s) => parse(s).flatMap(pyIterate)
      case other => pyIterate(other)
    }
    iterable.flatMap { items =>
      items.foldLeft[Either[String, Vector[PyValue]]](Right(Vector.empty)) {
        case (acc, item) => acc.flatMap(xs => f(item).map(xs :+ _))
      }.map(PyList.apply)
    }
  }

  private def parseAs(s: PyStr, pf: PartialFunction[PyValue, PyValue], what: String): Either[String, PyValue] =
    parse(s.s).flatMap(p => pf.lift(p).toRight(
      s"Invalid value. Must be able to convert to a $what. Got ${s.s}"))

  // --- date handling (ref: scicat_dataset.py:72-79) --------------------

  /** `to_date`: ISO strings re-rendered via python `isoformat()`, numbers
    * treated as epoch seconds in UTC, any other type → None (not an error).
    */
  def toIsoDate(v: PyValue): Either[String, PyValue] = v match {
    case PyStr(s) => parseIso(s).map(PyStr.apply)
    case PyInt(i) => Right(PyStr(epochToIso(i.toDouble)))
    case PyFloat(d) => Right(PyStr(epochToIso(d)))
    case _ => Right(PyNone)
  }

  private val isoRe =
    """^(\d{4})-(\d{2})-(\d{2})(?:[T ](\d{2}):(\d{2})(?::(\d{2})(?:\.(\d{1,6}))?)?)?(Z|[+-]\d{2}:?\d{2}(?::\d{2})?)?$""".r

  /** python `datetime.fromisoformat(s).isoformat()`. */
  def parseIso(s: String): Either[String, String] = s match {
    case isoRe(y, mo, d, h, mi, se, frac, off) =>
      val hh = Option(h).getOrElse("00")
      val mm = Option(mi).getOrElse("00")
      val ss = Option(se).getOrElse("00")
      val micros = Option(frac).map(f => (f + "0" * (6 - f.length))).getOrElse("")
      val base = s"$y-$mo-${d}T$hh:$mm:$ss" + (if (micros.nonEmpty && micros.toLong != 0) s".$micros" else "")
      val offset = Option(off).map {
        case "Z" => "+00:00"
        case o if o.length == 5 => o.substring(0, 3) + ":" + o.substring(3) // +HHMM
        case o => o
      }.getOrElse("")
      Right(base + offset)
    case _ => Left(s"Invalid isoformat string: '$s'")
  }

  /** python `datetime.fromtimestamp(x, tz=UTC).isoformat()`. */
  def epochToIso(epochSeconds: Double): String = {
    val micros = math.rint(epochSeconds * 1e6).toLong
    val inst = Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
      Math.floorMod(micros, 1000000L) * 1000L)
    val odt = OffsetDateTime.ofInstant(inst, ZoneOffset.UTC)
    val base = odt.format(DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"))
    val microPart = odt.getNano / 1000
    (if (microPart != 0) f"$base.$microPart%06d" else base) + "+00:00"
  }

  // --- bridging raw (Spark-side) values into the python value model ----

  /** Lift a JVM value produced by a Spark row into [[PyValue]]. */
  def lift(v: Any): PyValue = v match {
    case null => PyNone
    case s: String => PyStr(s)
    case i: Int => PyInt(i.toLong)
    case l: Long => PyInt(l)
    case s: Short => PyInt(s.toLong)
    case b: Byte => PyInt(b.toLong)
    case d: Double => PyFloat(d)
    case f: Float => PyFloat(f.toDouble)
    case b: Boolean => PyBool(b)
    case bd: java.math.BigDecimal => PyFloat(bd.doubleValue)
    case seq: scala.collection.Seq[_] => PyList(seq.iterator.map(lift).toVector)
    case arr: Array[_] => PyList(arr.iterator.map(lift).toVector)
    case m: scala.collection.Map[_, _] =>
      PyDict(m.iterator.map { case (k, x) => (lift(k), lift(x)) }.toVector)
    case other => PyStr(other.toString)
  }
}
