package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for all specs (lazy, reused across suites). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

/** Smoke-level spec: every declared query runs and returns rows on
  * sf0.001, and every query key with an oracle actually exists.
  * Value-level correctness is checked by the driver's DuckDB gate
  * (tools/check_oracle.py replicates it locally).
  */
class QueriesSpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query has an oracle or a declared rows-only reason") {
    val uncovered = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- SparkEntry.rowsOnly.keySet
    assert(uncovered.isEmpty, s"no oracle and no rows-only reason: $uncovered")
  }

  test("benchQueries exist") {
    val missing = SparkEntry.benchQueries.toSet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"bench without query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"query $name runs and returns rows on sf0.001") {
      val df = fn(spark, sfDir)
      if (SparkEntry.mayBeEmpty(name)) df.count() // must run, may be empty
      else assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
