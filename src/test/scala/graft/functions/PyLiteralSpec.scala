package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import PyLiteral._

class PyLiteralSpec extends AnyFunSuite {

  test("parses scalars") {
    assert(parse("123") == Right(PyInt(123)))
    assert(parse("-4") == Right(PyInt(-4)))
    assert(parse("1.5") == Right(PyFloat(1.5)))
    assert(parse("1e3") == Right(PyFloat(1000.0)))
    assert(parse("'test'") == Right(PyStr("test")))
    assert(parse("\"test\"") == Right(PyStr("test")))
    assert(parse("True") == Right(PyBool(true)))
    assert(parse("None") == Right(PyNone))
  }

  test("parses collections") {
    assert(parse("['test']") == Right(PyList(Vector(PyStr("test")))))
    assert(parse("['test', 'test2']") == Right(PyList(Vector(PyStr("test"), PyStr("test2")))))
    assert(parse("[1, 2, 3]") == Right(PyList(Vector(PyInt(1), PyInt(2), PyInt(3)))))
    assert(parse("(1, 2)") == Right(PyList(Vector(PyInt(1), PyInt(2)))))
    assert(parse("{'a': 1, 'b': 'x'}") ==
      Right(PyDict(Vector(PyStr("a") -> PyInt(1), PyStr("b") -> PyStr("x")))))
    assert(parse("[[1], [2]]") ==
      Right(PyList(Vector(PyList(Vector(PyInt(1))), PyList(Vector(PyInt(2)))))))
  }

  test("property: pyRepr → parse round-trips arbitrary nested literals") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val strGen: Gen[PyValue] = Gen.oneOf(
      Gen.const(""),
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf('\'', '"', '\\', '\n', '\t', 'Ω', '中', 'a', ' ', ':'))
        .map(_.mkString)).map(PyStr(_))
    val scalarGen: Gen[PyValue] = Gen.oneOf(
      strGen,
      Gen.chooseNum(-1000000000000L, 1000000000000L).map(PyInt(_)),
      Gen.chooseNum(-1e12, 1e12).map(PyFloat(_)),
      Gen.double.map(d => PyFloat(d * 1e-5)), // small fractions
      Gen.oneOf(PyBool(true), PyBool(false), PyNone))
    def valueGen(depth: Int): Gen[PyValue] =
      if (depth == 0) scalarGen
      else Gen.frequency(
        3 -> scalarGen,
        1 -> Gen.listOf(Gen.lzy(valueGen(depth - 1))).map(l => PyList(l.toVector)),
        1 -> Gen.listOf(Gen.zip(scalarGen, Gen.lzy(valueGen(depth - 1))))
          .map(kvs => PyDict(kvs.toVector)))
    val prop = Prop.forAll(valueGen(3)) { v =>
      parse(pyRepr(v)) == Right(v)
    }
    val result = check(Parameters.default.withMinSuccessfulTests(300), prop)
    assert(result.passed, result.status.toString)
  }

  test("rejects malformed input") {
    assert(parse("[1,").isLeft)
    assert(parse("hello").isLeft)
    assert(parse("'unterminated").isLeft)
    assert(parse("1 2").isLeft)
  }

  test("pyStr matches python str()") {
    assert(pyStr(PyFloat(1.0)) == "1.0")
    assert(pyStr(PyFloat(1.1)) == "1.1")
    assert(pyStr(PyInt(42)) == "42")
    assert(pyStr(PyBool(true)) == "True")
    assert(pyStr(PyList(Vector(PyStr("a"), PyInt(1)))) == "['a', 1]")
    assert(pyStr(PyNone) == "None")
  }

  test("pyInt is strict on strings, truncates floats") {
    assert(pyInt(PyStr("123")) == Right(123L))
    assert(pyInt(PyStr("1.2")).isLeft)
    assert(pyInt(PyFloat(1.9)) == Right(1L))
    assert(pyInt(PyFloat(-1.9)) == Right(-1L))
    assert(pyInt(PyBool(true)) == Right(1L))
  }

  test("pyIterate: strings iterate chars, scalars fail") {
    assert(pyIterate(PyStr("abc")) ==
      Right(Vector(PyStr("a"), PyStr("b"), PyStr("c"))))
    assert(pyIterate(PyInt(1)).isLeft)
  }
}
