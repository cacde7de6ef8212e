package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import PyLiteral._
import DslCasts._

/** Ports the reference's converter goldens
  * (ref: tests/test_scicat_dataset.py:21-79). */
class DslCastsSpec extends AnyFunSuite {

  private def conv(v: PyValue, t: String) = convert(v, byName(t))

  test("string converter") {
    assert(conv(PyStr("test"), "string") == Right(PyStr("test")))
    assert(conv(PyInt(123), "string") == Right(PyStr("123")))
    assert(conv(PyFloat(123.456), "string") == Right(PyStr("123.456")))
  }

  test("string[] converter — incl. char-iteration quirk") {
    assert(conv(PyStr("'test'"), "string[]") ==
      Right(PyList(Vector("t", "e", "s", "t").map(PyStr.apply))))
    assert(conv(PyStr("['test']"), "string[]") == Right(PyList(Vector(PyStr("test")))))
    assert(conv(PyStr("['test', 'test2']"), "string[]") ==
      Right(PyList(Vector(PyStr("test"), PyStr("test2")))))
    assert(conv(PyList(Vector(PyInt(1), PyInt(2), PyInt(3))), "string[]") ==
      Right(PyList(Vector(PyStr("1"), PyStr("2"), PyStr("3")))))
    assert(conv(PyList(Vector(PyFloat(1.1), PyFloat(2.2), PyFloat(3.3))), "string[]") ==
      Right(PyList(Vector(PyStr("1.1"), PyStr("2.2"), PyStr("3.3")))))
  }

  test("integer[] converter — strict parse raises on floats-in-strings") {
    assert(conv(PyStr("['1']"), "integer[]") == Right(PyList(Vector(PyInt(1)))))
    assert(conv(PyStr("['1', '2']"), "integer[]") ==
      Right(PyList(Vector(PyInt(1), PyInt(2)))))
    assert(conv(PyList(Vector(PyInt(1), PyInt(2), PyInt(3))), "integer[]") ==
      Right(PyList(Vector(PyInt(1), PyInt(2), PyInt(3)))))
    assert(conv(PyList(Vector(PyFloat(1.1), PyFloat(2.2), PyFloat(3.3))), "integer[]") ==
      Right(PyList(Vector(PyInt(1), PyInt(2), PyInt(3)))))
    val failed = conv(PyStr("['1.2', '2.5']"), "integer[]")
    assert(failed.isLeft && failed.swap.exists(_.contains("invalid literal for int")))
  }

  test("float[] converter") {
    assert(conv(PyStr("['1']"), "float[]") == Right(PyList(Vector(PyFloat(1.0)))))
    assert(conv(PyStr("['1.2', '2.5']"), "float[]") ==
      Right(PyList(Vector(PyFloat(1.2), PyFloat(2.5)))))
    assert(conv(PyList(Vector(PyInt(1), PyInt(2))), "float[]") ==
      Right(PyList(Vector(PyFloat(1.0), PyFloat(2.0)))))
  }

  test("integer converter") {
    assert(conv(PyStr("123"), "integer") == Right(PyInt(123)))
    assert(conv(PyInt(123), "integer") == Right(PyInt(123)))
    assert(conv(PyFloat(123.456), "integer") == Right(PyInt(123)))
  }

  test("float converter") {
    assert(conv(PyStr("123.456"), "float") == Right(PyFloat(123.456)))
    assert(conv(PyInt(123), "float") == Right(PyFloat(123.0)))
  }

  test("date converter") {
    val iso = "1994-06-28T10:20:30+00:00"
    assert(conv(PyStr("1994-06-28T10:20:30Z"), "date") == Right(PyStr(iso)))
    // epoch seconds of that instant
    assert(conv(PyFloat(772798830.0), "date") == Right(PyStr(iso)))
    // unsupported type → None, not an error
    assert(conv(PyList(Vector.empty), "date") == Right(PyNone))
    // bad string → error
    assert(conv(PyStr("not-a-date"), "date").isLeft)
  }

  test("dict/list converters") {
    assert(conv(PyStr("{'a': 1}"), "dict") ==
      Right(PyDict(Vector(PyStr("a") -> PyInt(1)))))
    assert(conv(PyStr("[1, 2]"), "list") == Right(PyList(Vector(PyInt(1), PyInt(2)))))
    assert(conv(PyStr("{'a': 1}"), "list").isLeft)
    assert(conv(PyStr("[1]"), "dict").isLeft)
  }

  test("none converter") {
    assert(conv(PyNone, "none") == Right(PyNone))
    assert(conv(PyStr("x"), "none").isLeft)
  }

  test("invalid dtype raises") {
    assertThrows[IllegalArgumentException](byName("invalid_type"))
  }

  test("email/link alias string") {
    assert(conv(PyInt(5), "email") == Right(PyStr("5")))
    assert(conv(PyStr("http://x"), "link") == Right(PyStr("http://x")))
  }
}
