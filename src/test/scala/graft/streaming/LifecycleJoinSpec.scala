package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The pl72→wrdn lifecycle join: matched, orphan, and late paths, plus
  * the bounded-state claim (ref: scicat_kafka.py:227-249 run-start
  * daemon, scicat_sample_ingestor.py:186-211 finish daemon).
  */
class LifecycleJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("lifecycle join: matched run enriched, orphan finish nulls, late start dropped, state bounded") {
    implicit val sqlCtx = spark.sqlContext
    val starts = MemoryStream[(String, String, String, Timestamp)]
    val finishes = MemoryStream[(String, String, Timestamp)]
    val joined = LifecycleJoin.runLifecycle(
      starts.toDF().toDF("job_id", "filename", "instrument_name", "start_ts"),
      finishes.toDF().toDF("job_id", "file_name", "finish_ts"),
      maxRun = "60 seconds", watermark = "2 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("lifecycle_out").start()

    // matched: finish 30 s after its run start, same job_id
    starts.addData(("jobA", "/runs/a.nxs", "instrA", ts("2024-01-01 10:00:00")))
    finishes.addData(("jobA", "/runs/a.nxs", ts("2024-01-01 10:00:30")))
    // orphan: no run-start ever announced for jobB
    finishes.addData(("jobB", "/runs/b.nxs", ts("2024-01-01 10:00:40")))
    // out-of-window: jobD's start exists but the finish lands 90 s
    // after it — outside maxRun, so it must NOT match
    starts.addData(("jobD", "/runs/d.nxs", "instrD", ts("2024-01-01 10:00:00")))
    finishes.addData(("jobD", "/runs/d.nxs", ts("2024-01-01 10:01:30")))
    // jobC finish now; its start will arrive too late to count
    finishes.addData(("jobC", "/runs/c.nxs", ts("2024-01-01 10:00:50")))
    q.processAllAvailable()

    // advance both watermarks far past jobC's window so the engine
    // finalizes the outer rows and evicts buffered state…
    starts.addData(("jobZ", "/runs/z.nxs", "instrZ", ts("2024-01-01 11:00:00")))
    finishes.addData(("jobZ", "/runs/z.nxs", ts("2024-01-01 11:00:01")))
    q.processAllAvailable()
    // …then the LATE start for jobC: watermark already proved "no
    // match" and emitted the orphan — this row must change nothing
    starts.addData(("jobC", "/runs/c.nxs", "instrC", ts("2024-01-01 10:00:45")))
    q.processAllAvailable()
    // close the jobZ window too so every outer row is emitted
    starts.addData(("jobY", "/runs/y.nxs", "instrY", ts("2024-01-01 12:00:00")))
    finishes.addData(("jobY", "/runs/y.nxs", ts("2024-01-01 12:00:01")))
    q.processAllAvailable()

    val rows = spark.sql("select * from lifecycle_out").collect()
      .map(r => r.getAs[String]("job_id") ->
        (r.getAs[String]("instrument_name"), r.getAs[Any]("run_millis"),
          r.getAs[Boolean]("matched")))
    // exactly ONE row per finish: matched exactly once, orphans once
    assert(rows.count(_._1 == "jobA") == 1)
    assert(rows.find(_._1 == "jobA").get._2 == (("instrA", 30000L, true)))
    assert(rows.count(_._1 == "jobB") == 1)
    assert(rows.find(_._1 == "jobB").get._2 == ((null, null, false)))
    // out-of-window start → orphan, not a match
    assert(rows.count(_._1 == "jobD") == 1)
    assert(rows.find(_._1 == "jobD").get._2 == ((null, null, false)))
    // late start arrived after the watermark: the finish stays an
    // orphan and the late row creates no second output
    assert(rows.count(_._1 == "jobC") == 1)
    assert(rows.find(_._1 == "jobC").get._2 == ((null, null, false)))
    assert(rows.count(_._1 == "jobZ") == 1 &&
      rows.find(_._1 == "jobZ").get._2._3 == true)

    // bounded state: after the watermark advanced to 11:58, every
    // pre-11:00 buffered row is evictable — the store must hold only
    // the tail (jobY/jobZ region), not all 11 input rows
    val state = q.lastProgress.stateOperators
    assert(state.nonEmpty)
    val totalStateRows = state.map(_.numRowsTotal).sum
    assert(totalStateRows <= 4,
      s"state not evicted by watermark: $totalStateRows rows buffered")
    q.stop()
  }

  test("file-bus wiring: one frame stream splits into pl72/wrdn legs and joins") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val busDir = Files.createTempDirectory("lifecycle_bus")
    def put(name: String, bytes: Array[Byte], mtime: String): Unit = {
      val p = busDir.resolve(name)
      Files.write(p, bytes)
      Files.setLastModifiedTime(p, FileTime.fromMillis(ts(mtime).getTime))
    }
    // matched pair 30 s apart; an orphan finish; a far-future closer
    // pair that advances the watermark past the first window
    put("00-start-a.bin", MessageCodec.encodePl72Fb(
      Messages.RunStartInfo("jobA", "/runs/a.nxs", "instrA")), "2024-01-01 10:00:00")
    put("01-finish-a.bin", MessageCodec.encodeWrdnFb(Messages.WritingFinished(
      "svc", "jobA", error_encountered = false, "/runs/a.nxs", "{}", "done")),
      "2024-01-01 10:00:30")
    put("02-finish-orphan.bin", MessageCodec.encodeWrdnFb(Messages.WritingFinished(
      "svc", "jobB", error_encountered = false, "/runs/b.nxs", "{}", "done")),
      "2024-01-01 10:00:40")
    put("03-start-z.bin", MessageCodec.encodePl72Fb(
      Messages.RunStartInfo("jobZ", "/runs/z.nxs", "instrZ")), "2024-01-01 12:00:00")
    put("04-finish-z.bin", MessageCodec.encodeWrdnFb(Messages.WritingFinished(
      "svc", "jobZ", error_encountered = false, "/runs/z.nxs", "{}", "done")),
      "2024-01-01 12:00:01")

    val joined = LifecycleJoin.busLifecycle(
      StressHarness.fileBusWithTime(spark, busDir.toString, maxFilesPerTrigger = 16))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("bus_lifecycle_out").start()
    q.processAllAvailable()
    val rows = spark.sql("select job_id, instrument_name, run_millis, matched " +
        "from bus_lifecycle_out").collect()
      .map(r => r.getAs[String]("job_id") ->
        (r.getAs[String]("instrument_name"), r.getAs[Any]("run_millis"),
          r.getAs[Boolean]("matched"))).toMap
    q.stop()
    assert(rows("jobA") == (("instrA", 30000L, true)))
    assert(rows("jobB") == ((null, null, false)))
    assert(rows("jobZ") == (("instrZ", 1000L, true)))
  }
}
