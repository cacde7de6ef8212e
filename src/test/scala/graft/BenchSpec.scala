package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks the bench harness contract so BENCH_r{N}.json can't silently
  * regress to unparseable again (VERDICT r2 "What's wrong" #1-3):
  * the emitted line must be a single valid JSON object with the fields
  * the driver expects, failures must surface in "failed", and the
  * timing statistic must be a median.
  */
class BenchSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("buildLine emits driver-parseable JSON with metric/value/queries/failed/sf") {
    val line = Bench.buildLine(Seq("q1_pricing" -> 1.25, "bad_query" -> -1.0), sfDir)
    assert(!line.contains("\n"))
    // Parse with the JSON parser that ships in the Spark jars.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() == "total")
    assert(node.get("unit").asText() == "sec")
    assert(math.abs(node.get("value").asDouble() - 1.25) < 1e-9,
      "failed queries must not shrink or inflate the total")
    assert(node.get("queries").get("q1_pricing").asDouble() == 1.25)
    assert(node.get("queries").get("bad_query").asDouble() == -1.0)
    assert(node.get("failed").get(0).asText() == "bad_query")
    assert(node.get("sf").asText() == sfDir)
  }

  test("median of 3 is the middle value") {
    assert(Bench.median(Seq(5.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(3.0)) == 3.0)
  }

  test("a mini-run of one query through Bench.once returns a positive time") {
    val t = Bench.once(spark, sfDir, "q1_pricing")
    assert(t > 0.0)
  }

  test("run reports -1 when any repeat fails") {
    assert(Bench.run(spark, sfDir, "no_such_query") == -1.0)
  }
}
