package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The streaming acceptance story the round-5 verdict called the #1
  * gap: sustained-rate ingestion with live health polling and a drain
  * check (`_scicat_stress_test.py` scaled to spec time), and crash
  * recovery from the checkpoint with exactly-once delivery proven at
  * the BACKEND (duplicate-POST counter), not just at the stream.
  */
class StressHarnessSpec extends AnyFunSuite {
  import TestSpark.spark

  test("sustained rate: all messages ingest, health stays green, admission bounded") {
    // Opt-in soak: SPARK_GRAFT_SOAK_SECONDS=300 runs the reference's
    // full 300 s × 1 msg/s envelope (_scicat_stress_test.py:26-31) at
    // its real rate; CI default stays 3 s × 10 msg/s (same 30-message
    // volume, 1/100 wall time). All assertions scale off r.produced.
    val soak = sys.env.get("SPARK_GRAFT_SOAK_SECONDS").map(_.toDouble)
    val (duration, rate) = soak.map((_, 1.0)).getOrElse((3.0, 10.0))
    val r = StressHarness.run(spark,
      durationSec = duration, ratePerSec = rate, healthHz = 5.0,
      maxFilesPerTrigger = 8, drainTimeoutSec = math.max(60.0, duration / 5.0))
    assert(r.produced == math.max(1, (duration * rate).toInt))
    assert(r.ingested == r.produced, s"drain incomplete: $r")
    assert(r.datasetPosts == r.produced && r.duplicatePosts == 0,
      s"backend must see every message exactly once: $r")
    // A8-analogue admission control: no batch may exceed the trigger cap
    assert(r.maxBatchRows <= 8, s"admission control breached: $r")
    // the health endpoint was really polled, concurrently, and stayed 200
    assert(r.healthPolls >= 10 && r.healthFailures == 0, s"health: $r")
    // reference budget: 60 s end-to-end per message — expect far less here
    assert(r.maxE2eMs < 60000, s"e2e budget blown: $r")
  }

  test("J5 kill mid-create, restart: one sample per (name, proposal), per-instrument order holds") {
    val r = StressHarness.runSampleKillRecovery(spark)
    assert(r.crashed, s"the injected crash must actually kill the first query: $r")
    // some creates committed before the crash, but not all of them
    assert(r.createsBeforeCrash >= 1 && r.createsBeforeCrash < 24, s"$r")
    // get-or-create across the replay: every logical sample exists,
    // EXACTLY once at the backend — replayed creates were swallowed by
    // the existence probe, in-batch dups by the batch dedup
    assert(r.samples.size == 24, s"lost samples after recovery: $r")
    assert(r.sampleCreates == 24 && r.duplicateCreates == 0,
      s"backend must see each (name, proposal) exactly once: $r")
    assert(r.batchesSecondRun >= 1, s"second run must replay from checkpoint: $r")
    // ADR-003: per-instrument serialization + deterministic order
    assert(r.perInstrumentSingleThreaded, s"instrument creates fanned out over threads: $r")
    assert(r.perInstrumentOrdered, s"per-instrument creation order broke: $r")
  }

  test("kill mid-batch, restart from checkpoint: backend sees each pid exactly once") {
    val r = StressHarness.runKillRecovery(spark, nMessages = 30, filesPerTrigger = 10)
    assert(r.crashed, s"the injected crash must actually kill the first query: $r")
    // the crash landed after ≥1 POST of a non-first batch committed
    assert(r.postsBeforeCrash >= 1 && r.postsBeforeCrash < 30, s"$r")
    // replay delivered the remainder; nothing was lost, nothing doubled
    assert(r.pidsIngested == 30, s"lost messages after recovery: $r")
    assert(r.datasetPosts == 30 && r.duplicatePosts == 0,
      s"replayed batch must dedup against committed pids: $r")
    assert(r.batchesSecondRun >= 1, s"second run must replay from checkpoint: $r")
  }
}
