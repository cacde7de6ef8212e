package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Semantics + plan shape of the temporal joins: backward as-of (>=,
  * right-first on ties, null when no prior row) and the bin-blocked
  * interval join (boundary inclusivity, bin-width independence). */
class TemporalSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00"), 1.0), // after two quotes
    (2L, 10L, ts("2024-01-01 08:59:59"), 2.0), // before any quote
    (3L, 10L, ts("2024-01-01 09:30:00"), 3.0), // EXACTLY at a quote ts
    (4L, 20L, ts("2024-01-01 12:00:00"), 4.0), // other key
    (5L, 30L, ts("2024-01-01 12:00:00"), 5.0)  // key with no right rows
  ).toDF("event_id", "user_id", "ts", "err_value")

  private lazy val right = Seq(
    (10L, ts("2024-01-01 09:00:00"), 100.0),
    (10L, ts("2024-01-01 09:30:00"), 130.0),
    (20L, ts("2024-01-01 11:00:00"), 200.0)
  ).toDF("user_id", "ts", "click_value")

  test("asof: latest right row at-or-before, per key") {
    val out = Temporal.asofJoin(left, right, Seq("user_id"), "ts")
      .select("event_id", "click_value").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).contains(130.0)) // 10:00 sees the 09:30 quote
    assert(out(2L).isEmpty)         // nothing before 08:59:59
    assert(out(3L).contains(130.0)) // tie: right row at same ts IS visible
    assert(out(4L).contains(200.0))
    assert(out(5L).isEmpty)         // key absent from right side
  }

  test("asof: matched timestamp is carried through") {
    val m = Temporal.asofJoin(left, right, Seq("user_id"), "ts")
      .filter(col("event_id") === 1L).select("matched_ts")
      .as[Timestamp].head()
    assert(m == ts("2024-01-01 09:30:00"))
  }

  test("asof: no join operator — single window pass (union trick)") {
    val p = Temporal.asofLastClick(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    assert(p.contains("Window"))
  }

  test("range: boundaries are [start, end) and bin width is semantics-free") {
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00")), // == start: in
      (2L, ts("2024-01-01 10:09:59")), // just inside
      (3L, ts("2024-01-01 10:10:00")), // == end: out
      (4L, ts("2024-01-01 09:59:59"))  // just before: out
    ).toDF("point_id", "ts")
    val intervals = Seq(
      (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"))
    ).toDF("interval_id", "start_ts", "end_ts")
    for (bin <- Seq(60L, 600L, 7L)) { // intervals spanning 1, 2, many bins
      val got = Temporal.rangeJoinBinned(points, intervals, "ts", "start_ts", "end_ts", bin)
        .select("point_id").as[Long].collect().toSet
      assert(got == Set(1L, 2L), s"bin=$bin gave $got")
    }
  }

  test("range: no duplicate pairs when an interval spans many bins") {
    val points = Seq((1L, ts("2024-01-01 10:05:00"))).toDF("point_id", "ts")
    val intervals = Seq(
      (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"))
    ).toDF("interval_id", "start_ts", "end_ts")
    // 7s bins: the interval explodes to ~86 bins; the point matches once
    val n = Temporal.rangeJoinBinned(points, intervals, "ts", "start_ts", "end_ts", 7L).count()
    assert(n == 1L)
  }

  test("range: plans as an equi-join on the bin key, not nested loop") {
    val p = Temporal.rangeIncidentStats(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval join degenerated to a nested loop:\n$p")
  }

  test("declared queries return rows at sf0.001") {
    assert(Temporal.asofLastClick(spark, sfDir).count() > 0)
    assert(Temporal.rangeIncidentStats(spark, sfDir).count() > 0)
  }

  // --- native as-of exec (graft.plans.AsofJoinPlan) --------------------

  test("native asof: same semantics on the synthetic edge cases") {
    val out = graft.plans.AsofJoinNative.asofJoin(left, right, Seq("user_id"), "ts")
      .select("event_id", "click_value").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).contains(130.0))
    assert(out(2L).isEmpty)
    assert(out(3L).contains(130.0)) // tie: right row at same ts IS visible
    assert(out(4L).contains(200.0))
    assert(out(5L).isEmpty)
    val m = graft.plans.AsofJoinNative.asofJoin(left, right, Seq("user_id"), "ts")
      .filter(col("event_id") === 1L).select("matched_ts")
      .as[Option[Timestamp]].head()
    assert(m.contains(ts("2024-01-01 09:30:00")))
  }

  test("native asof: plans the custom exec, row-identical to the window form") {
    val native = Temporal.asofLastClickNative(spark, sfDir)
    val p = native.queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), s"expected the custom exec in the plan:\n$p")
    val composed = Temporal.asofLastClick(spark, sfDir)
    assert(native.count() > 0)
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty,
      "native exec and window composition must agree row-for-row")
  }

  test("native asof forward: earliest right at-or-after, per key") {
    val out = graft.plans.AsofJoinNative.asofJoin(left, right, Seq("user_id"), "ts",
        direction = "forward")
      .select("event_id", "click_value").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).isEmpty)          // 10:00 — nothing after
    assert(out(2L).contains(100.0))  // 08:59:59 sees the 09:00 quote
    assert(out(3L).contains(130.0))  // tie: equal ts matches forward too
    assert(out(4L).isEmpty)          // 12:00 — the 11:00 quote is before
    assert(out(5L).isEmpty)
    val m = graft.plans.AsofJoinNative.asofJoin(left, right, Seq("user_id"), "ts",
        direction = "forward")
      .filter(col("event_id") === 2L).select("matched_ts")
      .as[Option[Timestamp]].head()
    assert(m.contains(ts("2024-01-01 09:00:00")))
  }

  test("native asof nearest: closer side wins, ties go backward") {
    // lefts placed asymmetrically between the 09:00 and 09:30 quotes
    val lefts = Seq(
      (1L, 10L, ts("2024-01-01 09:10:00"), 0.0), // closer to 09:00
      (2L, 10L, ts("2024-01-01 09:20:00"), 0.0), // closer to 09:30
      (3L, 10L, ts("2024-01-01 09:15:00"), 0.0), // EXACT midpoint: backward
      (4L, 10L, ts("2024-01-01 08:00:00"), 0.0), // only forward exists
      (5L, 10L, ts("2024-01-01 23:00:00"), 0.0)  // only backward exists
    ).toDF("event_id", "user_id", "ts", "err_value")
    val out = graft.plans.AsofJoinNative.asofJoin(lefts, right, Seq("user_id"), "ts",
        direction = "nearest")
      .select("event_id", "click_value").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).contains(100.0))
    assert(out(2L).contains(130.0))
    assert(out(3L).contains(100.0)) // tie → backward
    assert(out(4L).contains(100.0))
    assert(out(5L).contains(130.0))
  }

  test("native asof tolerance: out-of-window candidates are rejected") {
    val lefts = Seq(
      (1L, 10L, ts("2024-01-01 09:31:00"), 0.0), // 60s after 09:30: in
      (2L, 10L, ts("2024-01-01 09:40:00"), 0.0), // 600s after: out (tol 300s)
      (3L, 10L, ts("2024-01-01 08:58:00"), 0.0)  // 120s before 09:00
    ).toDF("event_id", "user_id", "ts", "err_value")
    def run(dir: String) =
      graft.plans.AsofJoinNative.asofJoin(lefts, right, Seq("user_id"), "ts",
          direction = dir, tolerance = Some(300L * 1000000L))
        .select("event_id", "click_value").as[(Long, Option[Double])]
        .collect().toMap
    val back = run("backward")
    assert(back(1L).contains(130.0) && back(2L).isEmpty && back(3L).isEmpty)
    val fwd = run("forward")
    assert(fwd(1L).isEmpty && fwd(2L).isEmpty && fwd(3L).contains(100.0))
    val near = run("nearest")
    assert(near(1L).contains(130.0) && near(2L).isEmpty && near(3L).contains(100.0))
  }

  test("native asof variants: custom exec planned, no window fallback") {
    for (q <- Seq(Temporal.asofNextClickNative(spark, sfDir),
                  Temporal.asofNearestClickNative(spark, sfDir))) {
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("AsofJoin"), s"expected the custom exec:\n$p")
      assert(!p.contains("Window"), p)
      assert(q.count() > 0)
    }
  }

  test("native asof: each child sorts on (key, ts) — no union, no window") {
    val p = Temporal.asofLastClickNative(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"native path must not fall back to the window form:\n$p")
    assert(!p.contains("Union"), p)
  }

  test("overlap: exact pair set under open/closed boundaries, any bin width") {
    val a = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")),
      (2L, ts("2024-01-01 11:00:00"), ts("2024-01-01 11:05:00"))
    ).toDF("a_id", "a_s", "a_e")
    val b = Seq(
      (10L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:20:00")), // overlaps 1
      (11L, ts("2024-01-01 10:10:00"), ts("2024-01-01 10:30:00")), // abuts 1: NO (end exclusive)
      (12L, ts("2024-01-01 09:00:00"), ts("2024-01-01 10:00:01")), // 1s overlap with 1
      (13L, ts("2024-01-01 11:04:59"), ts("2024-01-01 11:04:59"))  // empty interval: NO
    ).toDF("b_id", "b_s", "b_e")
    for (bin <- Seq(60L, 600L, 7L)) {
      val got = Temporal.overlapJoinBinned(a, b, "a_s", "a_e", "b_s", "b_e", bin)
        .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      assert(got == Seq((1L, 10L), (1L, 12L)), s"bin=$bin gave $got")
    }
  }

  test("overlap: a pair sharing many bins is emitted exactly once") {
    val a = Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")))
      .toDF("a_id", "a_s", "a_e")
    val b = Seq((10L, ts("2024-01-01 09:00:00"), ts("2024-01-01 13:00:00")))
      .toDF("b_id", "b_s", "b_e")
    // 7s bins: the pair shares ~1000 bins; the responsibility rule
    // (first shared bin) must emit it once
    val n = Temporal.overlapJoinBinned(a, b, "a_s", "a_e", "b_s", "b_e", 7L).count()
    assert(n == 1L)
  }

  test("overlap agg: recounts against the naive O(n·m) join at sf0.001") {
    import org.apache.spark.sql.functions._
    val df = Temporal.overlapIncidentPurchases(spark, sfDir)
    val events = graft.Tables.events(spark, sfDir)
    val i = events.filter(col("event_type") === "error")
      .select(col("event_id").as("incident"), col("ts").as("i_s"),
        timestamp_micros(unix_micros(col("ts")) + 600L * 1000000L).as("i_e"))
    val p = events.filter(col("event_type") === "purchase" && col("value") >= 100)
      .select(col("user_id"), col("ts").as("p_s"),
        timestamp_micros(unix_micros(col("ts")) + 1800L * 1000000L).as("p_e"))
    val naive = i.join(p, col("i_s") < col("p_e") && col("p_s") < col("i_e"))
      .groupBy("incident")
      .agg(count(lit(1)).as("n_windows"), countDistinct(col("user_id")).as("n_users"),
        sum(least(unix_micros(col("i_e")), unix_micros(col("p_e"))) -
          greatest(unix_micros(col("i_s")), unix_micros(col("p_s")))).as("total_overlap_us"))
    assert(df.count() > 0)
    assert(df.exceptAll(naive).isEmpty && naive.exceptAll(df).isEmpty,
      "binned overlap join must equal the naive inequality join")
  }

  test("overlap: plans as a bin equi-join, not nested loop") {
    val p = Temporal.overlapIncidentPurchases(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"overlap join degenerated to a nested loop:\n$p")
  }
}
