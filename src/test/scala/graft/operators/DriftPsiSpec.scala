package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Semantic invariants for the PSI drift monitor: a genuinely shifted
  * distribution scores high, a stationary one scores ≈ 0, and the
  * real-events query covers every type. The hash-level gate is the
  * DuckDB oracle; these pin the semantics a hash can't explain. */
class DriftPsiSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("synthetic shift: moved distribution scores high, stationary near zero") {
    // first half us ∈ [0, 1000), second half [1000, 2000).
    // "stable": value uniform 0..99 in both halves.
    // "shifted": values 0..49 in the first half, 150..199 in the second.
    val rows =
      (0 until 200).map(i => ("stable", i.toLong * 10, (i % 100).toDouble)) ++
      (0 until 100).map(i => ("shifted", i.toLong * 10, (i % 50).toDouble)) ++
      (0 until 100).map(i => ("shifted", 1000L + i * 10, 150.0 + (i % 50)))
    val ev = rows.toDF("event_type", "us", "value")
    val psi = Relational.driftPsiOf(ev, bins = 10).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("psi_micro")).toMap
    // total shift between disjoint supports: PSI is large (≫ 0.2 bits)
    assert(psi("shifted") > 1000000L, s"shifted psi=${psi("shifted")}")
    // same generator in both halves: only smoothing noise remains
    assert(math.abs(psi("stable")) < 100000L, s"stable psi=${psi("stable")}")
  }

  test("events table: every type reported, counts add up, psi non-degenerate") {
    val df = Relational.eventsDriftPsi(spark, sfDir).cache()
    val types = graft.Tables.events(spark, sfDir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    val got = df.collect()
    assert(got.map(_.getAs[String]("event_type")).toSet == types.keySet)
    for (r <- got) {
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_base") + r.getAs[Long]("n_curr") == types(t))
      // integer-floor jitter can push a hair below zero, never far
      assert(r.getAs[Long]("psi_micro") > -1000L,
        s"$t psi=${r.getAs[Long]("psi_micro")}")
    }
    df.unpersist()
  }
}
