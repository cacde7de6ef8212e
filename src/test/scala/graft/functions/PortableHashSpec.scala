package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The native codegen'd md5_hash48 must be bit-identical to the
  * composed built-in formulation (whose DuckDB replica is the oracle
  * contract) on every input class — otherwise every minhash/simhash/
  * split result silently diverges from the oracle.
  */
class PortableHashSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("native md5_hash48 == composed conv(substring(md5)) on edge strings") {
    val edge = Seq("", " ", "a", "Ωäß中✓", "\n\t", "0" * 5000,
      "the quick brown fox", "svc:\"quoted\\path\"")
    val df = edge.toDF("s").select(
      PortableHash.md5Hash48(col("s")).as("composed"),
      PortableHash.md5Hash48Native(spark, col("s")).as("native"))
    assert(df.filter(col("composed") =!= col("native")).count() == 0)
    // spot-check against a known digest: md5("") = d41d8cd98f00b204...
    val empty = df.limit(1).collect().head
    assert(empty.getLong(1) == java.lang.Long.parseLong("d41d8cd98f00", 16))
  }

  test("native md5_hash48 == composed over the whole documents corpus") {
    val words = graft.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
    val diff = words.select(
      PortableHash.md5Hash48(col("w")).as("composed"),
      PortableHash.md5Hash48Native(spark, col("w")).as("native"))
      .filter(col("composed") =!= col("native"))
    assert(diff.count() == 0)
  }

  test("null propagates, and the expression survives codegen in a real plan") {
    val df = Seq(Some("x"), None).toDF("s")
      .select(PortableHash.md5Hash48Native(spark, col("s")).as("h"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) == 1)
    df.explain() // forces plan build; codegen failures would surface on collect
  }
}
