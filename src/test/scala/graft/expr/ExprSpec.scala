package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.DslCasts._
import graft.schema.ConfigValue
import graft.schema.ConfigValue._
import TemplateCompiler.Registry
import ValueOperators.OpSpec

/** Column-level goldens for selector, template and value-operator
  * compilation, ported from the reference's unit tests
  * (tests/test_scicat_metadata_schema.py, tests/test_scicat_dataset.py,
  * conftest fixture semantics).
  */
class ExprSpec extends AnyFunSuite {
  import TestSpark.spark

  private def one(c: Column): Any =
    spark.range(1).select(c.as("v")).collect()(0).get(0)

  private def onePair(v: VarCol): (Any, Any) = {
    val row = spark.range(1).select(v.value.as("v"), v.unit.as("u")).collect()(0)
    (row.get(0), row.get(1))
  }

  // --- selector ---------------------------------------------------------

  private def sel(s: String) = ConfigValue.fromJson(s)

  test("selector: string forms") {
    assert(SelectorCompiler.eval(CStr("*"), "anything"))
    assert(SelectorCompiler.eval(CStr("filename:starts_with:right"), "right_name.nxs"))
    assert(!SelectorCompiler.eval(CStr("filename:starts_with:wrong"), "right_name.nxs"))
    assert(SelectorCompiler.eval(CStr("filename:contains:right_part"), "some_right_part_in_name.nxs"))
    // invalid target / function / arity → no match, not an error
    assert(!SelectorCompiler.eval(CStr("data_file:starts_with:x"), "x.nxs"))
    assert(!SelectorCompiler.eval(CStr("filename:start_with:x"), "x.nxs"))
    assert(!SelectorCompiler.eval(CStr("filename:contains:a:b"), "ab.nxs"))
  }

  test("selector: dict composition is conjunctive over keys") {
    val s = sel("""{"or": ["filename:starts_with:/ess", "filename:contains:coda"],
                    "and": ["filename:contains:.hdf"]}""")
    assert(SelectorCompiler.eval(s, "/ess/data/file.hdf"))
    assert(SelectorCompiler.eval(s, "/data/coda-x.hdf"))
    assert(!SelectorCompiler.eval(s, "/ess/data/file.nxs")) // and-branch fails
    assert(!SelectorCompiler.eval(s, "/data/file.hdf")) // or-branch fails
    // unknown keys ignored
    assert(SelectorCompiler.eval(sel("""{"xor": ["filename:contains:q"]}"""), "no-match"))
  }

  test("selector: Column compilation agrees with eval") {
    val cases = Seq(
      CStr("*") -> "f.nxs",
      CStr("filename:starts_with:/ess") -> "/ess/f.nxs",
      CStr("filename:starts_with:/ess") -> "/other/f.nxs",
      sel("""{"or": ["filename:contains:a", "filename:contains:b"]}""") -> "xbx",
      sel("""{"or": ["filename:contains:a", "filename:contains:b"]}""") -> "xcx")
    for ((s, fn) <- cases) {
      val compiled = one(SelectorCompiler.compile(s, lit(fn))).asInstanceOf[Boolean]
      assert(compiled == SelectorCompiler.eval(s, fn), s"mismatch for $s on $fn")
    }
  }

  test("pyCapitalize matches python str.capitalize") {
    assert(SelectorCompiler.pyCapitalize("small-Ymir") == "Small-ymir")
    assert(SelectorCompiler.pyCapitalize("CODA") == "Coda")
    assert(SelectorCompiler.pyCapitalize("") == "")
  }

  // --- template renderer ------------------------------------------------

  private val reg = Registry(Vector(
    "proposal_id" -> VarCol(lit("123456"), lit(""), Some(DString)),
    "det1" -> VarCol(lit(10.5), lit("m"), Some(DFloat)),
    "det2" -> VarCol(lit(12.5), lit("m"), Some(DFloat)),
    "temperature" -> VarCol(lit(300.0), lit("K"), Some(DFloat)),
  ))

  test("template: single variable keeps unit") {
    val v = TemplateCompiler.render(CStr("<det1>"), reg).toOption.get
    assert(onePair(v) == ((10.5, "m")))
  }

  test("template: splice drops unit and uses python str()") {
    val v = TemplateCompiler.render(CStr("ess_proposal_<proposal_id>"), reg).toOption.get
    assert(onePair(v) == (("ess_proposal_123456", "")))
    val f = TemplateCompiler.render(CStr("T=<temperature>!"), reg).toOption.get
    assert(onePair(f) == (("T=300.0!", "")))
  }

  test("template: unresolved variable errors") {
    assert(TemplateCompiler.render(CStr("<not_a_var> <other>"), reg).isLeft)
  }

  test("template: list with unit consensus") {
    val same = TemplateCompiler.render(
      CSeq(Vector(CStr("<det1>"), CStr("<det2>"))), reg).toOption.get
    val (v1, u1) = onePair(same)
    assert(v1.asInstanceOf[scala.collection.Seq[Double]].toSeq == Seq(10.5, 12.5) && u1 == "m")

    val mixed = TemplateCompiler.render(
      CSeq(Vector(CStr("<det1>"), CStr("<temperature>"))), reg).toOption.get
    val (v2, u2) = onePair(mixed)
    assert(v2.asInstanceOf[scala.collection.Seq[Double]].toSeq == Seq(10.5, 300.0) && u2 == "")
  }

  test("template: dict renders keys and values with consensus") {
    val d = TemplateCompiler.render(ConfigValue.fromJson(
      """{"p_<proposal_id>": "<det1>", "other": "<det2>"}"""), reg).toOption.get
    val (v, u) = onePair(d)
    val m = v.asInstanceOf[Map[String, String]]
    assert(m == Map("p_123456" -> "10.5", "other" -> "12.5"))
    assert(u == "m")
  }

  test("template: non-string scalars become strings (json.dumps path)") {
    val v = TemplateCompiler.render(CLong(123), reg).toOption.get
    assert(onePair(v) == (("123", "")))
  }

  // --- value operators --------------------------------------------------

  test("operators: sum forwards unit (detector_12_numbers_sum golden)") {
    val arr = VarCol(array(lit(10.5), lit(12.5)), lit("m"), Some(DFloatArr))
    val summed = ValueOperators(Some("sum"), arr, OpSpec())
    assert(onePair(summed) == ((23.0, "m")))
  }

  test("operators: join_with_space on arrays, drops unit") {
    val arr = VarCol(array(lit("a"), lit("b")), lit("m"), Some(DStringArr))
    val joined = ValueOperators(Some("join_with_space"), arr, OpSpec())
    assert(onePair(joined) == (("a, b", "")))
  }

  test("operators: join_with_space on literal strings (char quirk)") {
    val s = VarCol(lit("'test'"), lit(""), Some(DString))
    val joined = ValueOperators(Some("join_with_space"), s, OpSpec())
    assert(onePair(joined) == (("t, e, s, t", "")))
  }

  test("operators: filename / dirname / dirname-2") {
    val p = VarCol(lit("/ess/data/run1/file.nxs"), lit(""), Some(DString))
    assert(one(ValueOperators(Some("filename"), p, OpSpec()).value) == "file.nxs")
    assert(one(ValueOperators(Some("dirname"), p, OpSpec()).value) == "/ess/data/run1")
    assert(one(ValueOperators(Some("dirname-2"), p, OpSpec()).value) == "/ess/data")
    // posix edge cases
    assert(one(ValueOperators.dirname(lit("abc"))) == "")
    assert(one(ValueOperators.dirname(lit("/a"))) == "/")
    assert(one(ValueOperators.dirname(lit("a/b/"))) == "a/b")
  }

  test("operators: str-replace literal, no-op without args") {
    val s = VarCol(lit("a.b.c"), lit(""), Some(DString))
    val replaced = ValueOperators(Some("str-replace"), s,
      OpSpec(pattern = Some("."), replacement = Some("-")))
    assert(one(replaced.value) == "a-b-c") // literal, NOT regexp
    val untouched = ValueOperators(Some("str-replace"), s, OpSpec(pattern = Some(".")))
    assert(one(untouched.value) == "a.b.c")
  }

  test("operators: urlsafe quote_plus, case folds") {
    val s = VarCol(lit("a b&c"), lit(""), Some(DString))
    assert(one(ValueOperators(Some("urlsafe"), s, OpSpec()).value) == "a+b%26c")
    assert(one(ValueOperators(Some("to-upper"), s, OpSpec()).value) == "A B&C")
  }

  test("operators: getitem on arrays and dicts") {
    val arr = VarCol(array(lit("x"), lit("y")), lit(""), Some(DStringArr))
    assert(one(ValueOperators(Some("getitem"), arr, OpSpec(field = Some("0"))).value) == "x")
    assert(one(ValueOperators(Some("getitem"), arr, OpSpec(field = Some("-1"))).value) == "y")
    val m = VarCol(map(lit("k"), lit("v")), lit(""), Some(DDict))
    assert(one(ValueOperators(Some("getitem"), m, OpSpec(field = Some("k"))).value) == "v")
  }

  test("operators: unknown name falls back to DO_NOTHING") {
    val s = VarCol(lit("keep"), lit("u"), Some(DString))
    assert(onePair(ValueOperators(Some("not_an_op"), s, OpSpec())) == (("keep", "u")))
    assert(onePair(ValueOperators(None, s, OpSpec())) == (("keep", "u")))
  }
}
