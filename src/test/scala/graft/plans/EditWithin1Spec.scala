package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** `edit_within1` must agree with `levenshtein(a, b) <= 1` everywhere —
  * that identity is what keeps the fuzzyNeighbors DuckDB oracle (which
  * runs the real levenshtein) valid. */
class EditWithin1Spec extends AnyFunSuite {
  import TestSpark.spark

  private def viaSpark(pairs: Seq[(String, String)]): Seq[(Boolean, Boolean)] = {
    EditWithin1.register(spark)
    import spark.implicits._
    pairs.toDF("a", "b")
      .select(
        call_function("edit_within1", col("a"), col("b")).as("fast"),
        (levenshtein(col("a"), col("b")) <= 1).as("dp"))
      .collect().toSeq.map(r => (r.getBoolean(0), r.getBoolean(1)))
  }

  private def assertAgree(cases: Seq[(String, String)]): Unit =
    cases.zip(viaSpark(cases)).foreach { case ((a, b), (fast, dp)) =>
      assert(fast == dp, s"mismatch on ($a, $b): fast=$fast dp=$dp")
    }

  test("hand cases: equal, sub, insert, delete, distance 2, length gap 2") {
    assertAgree(Seq(
      ("abc", "abc"), ("abc", "abd"), ("abc", "abcd"), ("abcd", "abc"),
      ("abc", "xbd"), ("ab", "abcd"), ("", ""), ("", "a"), ("", "ab"),
      ("aa", "ab"), ("aab", "ab"), ("ab", "ba"), ("kitten", "sitting"),
      ("Customer#000000001", "Customer#000000002"),
      ("Customer#000000001", "Customer#00000001")))
  }

  test("property: agrees with levenshtein <= 1 on random short strings") {
    // small alphabet makes near-miss pairs (distance 1 and 2) common;
    // batch pairs through ONE DataFrame per scalacheck sample
    val word = Gen.chooseNum(0, 6).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
    val prop = Prop.forAll(Gen.listOfN(100, Gen.zip(word, word))) { pairs =>
      pairs.isEmpty || pairs.zip(viaSpark(pairs)).forall { case (_, (fast, dp)) => fast == dp }
    }
    val result = check(Parameters.default.withMinSuccessfulTests(20), prop)
    assert(result.passed, result.status.toString)
  }

  test("non-ASCII: multi-byte code points count as single edits") {
    assertAgree(Seq(
      ("café", "cafe"), ("café", "café"), ("éé", "ee"),
      ("naïve", "naive"), ("你好", "你好x")))
  }

  test("interpreted eval matches codegen path") {
    // eval() directly (interpreted) vs the codegen'd column result
    import org.apache.spark.unsafe.types.UTF8String
    val cases = Seq(("abc", "abd"), ("abc", "xyd"), ("ab", "ba"), ("a", "abc"))
    val interpreted = cases.map { case (a, b) =>
      EditWithin1.check(UTF8String.fromString(a), UTF8String.fromString(b))
    }
    val codegen = viaSpark(cases).map(_._1)
    assert(interpreted == codegen)
  }
}
