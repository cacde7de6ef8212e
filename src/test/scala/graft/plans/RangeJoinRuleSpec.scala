package graft.plans

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.Temporal

/** The range-join optimizer rule: plan shape (nested loop → equi-join),
  * semantics preservation, scope guards, and degenerate intervals. */
class RangeJoinRuleSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def withWidth[A](widthUs: Long)(f: => A): A = {
    RangeJoinRule.register(spark)
    spark.conf.set(RangeJoinRule.WidthConf, widthUs.toString)
    try f finally spark.conf.unset(RangeJoinRule.WidthConf)
  }

  private lazy val points = Seq(
    (1L, ts("2024-01-01 10:00:00")), // == start: in
    (2L, ts("2024-01-01 10:09:59")), // just inside
    (3L, ts("2024-01-01 10:10:00")), // == end: out (strict <)
    (4L, ts("2024-01-01 09:59:59"))  // just before: out
  ).toDF("point_id", "ts")

  private lazy val intervals = Seq(
    (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")),
    (101L, ts("2024-01-01 11:00:00"), ts("2024-01-01 11:00:00")), // empty
    (102L, ts("2024-01-01 12:00:00"), ts("2024-01-01 11:00:00"))  // inverted
  ).toDF("interval_id", "start_ts", "end_ts")

  private def naive: DataFrame = intervals.join(points,
    col("ts") >= col("start_ts") && col("ts") < col("end_ts"))

  test("inert without the width conf: naive join stays a nested loop") {
    RangeJoinRule.register(spark)
    spark.conf.unset(RangeJoinRule.WidthConf)
    val p = naive.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"), p)
  }

  test("with width set: rewritten to an equi-join, same rows, empty/inverted survive") {
    for (widthUs <- Seq(600L * 1000000L, 60L * 1000000L, 7L * 1000000L)) {
      withWidth(widthUs) {
        val df = naive
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
          s"width=$widthUs still a nested loop:\n$p")
        val got = df.select("interval_id", "point_id").as[(Long, Long)].collect().toSet
        assert(got == Set((100L, 1L), (100L, 2L)), s"width=$widthUs gave $got")
      }
    }
  }

  test("inclusive upper bound covers its boundary bin") {
    withWidth(600L * 1000000L) {
      val df = intervals.join(points,
        col("ts") >= col("start_ts") && col("ts") <= col("end_ts"))
      val got = df.select("point_id").as[Long].collect().toSet
      assert(got == Set(1L, 2L, 3L)) // == end now matches
      assert(!df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    }
  }

  test("guard: joins that already have an equi key are left alone") {
    withWidth(600L * 1000000L) {
      val l = Seq((1L, 10L)).toDF("k", "a")
      val r = Seq((1L, 5L, 20L)).toDF("k", "lo", "hi")
      val df = l.join(r, l("k") === r("k") && col("a") >= col("lo") && col("a") < col("hi"))
      val p = df.queryExecution.optimizedPlan.toString
      assert(!p.contains("__graft_bin"), s"equi-keyed join must not be rewritten:\n$p")
      assert(df.count() == 1)
    }
  }

  test("long-typed points work and extra cross-side conjuncts are kept") {
    withWidth(10L) {
      val l = Seq((1L, 15L), (2L, 25L), (3L, 35L)).toDF("pid", "x")
      val r = Seq((7L, 10L, 30L), (8L, 20L, 40L)).toDF("iid", "lo", "hi")
      val df = l.join(r,
        col("x") >= col("lo") && col("x") < col("hi") && col("pid") =!= col("iid"))
      val got = df.select("iid", "pid").as[(Long, Long)].collect().toSet
      assert(got == Set((7L, 1L), (7L, 2L), (8L, 2L), (8L, 3L)))
      assert(!df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    }
  }

  test("declared query: rule path row-identical to the explicit-binning twin") {
    withWidth(600L * 1000000L) {
      val viaRule = Temporal.rangeIncidentStatsRule(spark, sfDir)
      val explicit = Temporal.rangeIncidentStats(spark, sfDir)
      assert(viaRule.count() > 0)
      assert(viaRule.exceptAll(explicit).isEmpty && explicit.exceptAll(viaRule).isEmpty)
      val p = viaRule.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    }
  }
}
