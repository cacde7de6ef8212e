package graft.expr

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.schema.ConfigValue._

/** The selector grammar runs through two independent implementations —
  * driver-side [[SelectorCompiler.eval]] (offline schema selection) and
  * the compiled Column cascade (streaming F3/F4). If they ever diverge,
  * the same file picks DIFFERENT schemas online vs offline. This
  * property pins them together over random selector trees (including
  * the reference quirks: 3-part strings only, unknown fn/target → no
  * match, conjunctive dict-key folding, empty or/and lists).
  */
class SelectorConsistencySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val fragGen = Gen.oneOf("/data/", "/ess/raw/", "run", "2024",
    "coda", "ymir_", ".nxs", "x")
  private val filenameGen: Gen[String] =
    Gen.listOfN(3, fragGen).map(_.mkString)

  private val leafGen: Gen[graft.schema.ConfigValue] = Gen.oneOf(
    Gen.const(CStr("*")),
    for {
      t <- Gen.oneOf("filename", "nope", "file")
      f <- Gen.oneOf("starts_with", "contains", "endz")
      a <- fragGen
    } yield CStr(s"$t:$f:$a"),
    fragGen.map(a => CStr(s"filename:$a")), // 2 parts → no match
    fragGen.map(a => CStr(s"filename:contains:$a:extra"))) // 4 parts

  private def treeGen(depth: Int): Gen[graft.schema.ConfigValue] =
    if (depth == 0) leafGen
    else Gen.frequency(
      2 -> leafGen,
      1 -> (for {
        keys <- Gen.someOf(Seq("or", "and", "unknown_op"))
        items <- Gen.listOf(Gen.lzy(treeGen(depth - 1)))
      } yield CMap(keys.map(k => k -> (CSeq(items.toVector): graft.schema.ConfigValue)).toVector)))

  test("property: eval (driver) == compile (Column) over random selector trees") {
    // evaluate batches of (selector, filenames) through one DataFrame
    val prop = Prop.forAll(treeGen(2), Gen.listOfN(5, filenameGen)) { (sel, files) =>
      val expected = files.map(SelectorCompiler.eval(sel, _))
      val got = files.toDF("f")
        .select(coalesce(SelectorCompiler.compile(sel, col("f")), lit(false)))
        .collect().map(_.getBoolean(0)).toList
      got == expected
    }
    val result = check(Parameters.default.withMinSuccessfulTests(60), prop)
    assert(result.passed, result.status.toString)
  }
}
