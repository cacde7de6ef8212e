package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Compute-once registry behind the build-once artifacts
  * ([[Dedup.winnowEdgesMaterialized]], [[Similarity.lshPairsMaterialized]]):
  * one `localCheckpoint`ed build per (application, family, sfDir), every
  * later consumer receives the SAME DataFrame instance (plan = a scan of
  * the stored rows — GraphEdgesSpec pins both properties).
  *
  * Lifecycle fixes over the round-10 inline ConcurrentHashMaps (ADVICE.md):
  *  - the build runs OUTSIDE any map lock: `computeIfAbsent` would execute
  *    the whole Spark job while holding the bin lock, blocking concurrent
  *    same-bin lookups — here a losing racer just discards its build
  *    (`putIfAbsent` decides; both candidates are value-identical);
  *  - entries EVICT when their application ends (one SparkListener per
  *    application), so a JVM that starts/stops many sessions — test
  *    suites, notebooks — never accumulates checkpointed DataFrames
  *    pinned to dead SparkContexts;
  *  - [[clearFamily]] gives the bench a COLD-START knob: resetting a
  *    family before timing its declared build query makes that query
  *    report the real build cost instead of a memo lookup, and the
  *    family's consumers report steady-state marginal cost (VERDICT r10
  *    "What's wrong" #3 — the build cost was landing on whichever
  *    consumer happened to run first).
  */
object BuildOnce {
  private val memos = new ConcurrentHashMap[String, DataFrame]()
  private val hooked = ConcurrentHashMap.newKeySet[String]()

  private def key(appId: String, family: String, k: String): String =
    appId + "|" + family + "|" + k

  /** Memoized `build` per (application, family, key). The by-name build
    * is evaluated at most once per caller; concurrent racers resolve via
    * `putIfAbsent` (first writer wins, value-identical losers discard). */
  def get(spark: SparkSession, family: String, k: String)
      (build: => DataFrame): DataFrame = {
    val appId = spark.sparkContext.applicationId
    val full = key(appId, family, k)
    val hit = memos.get(full)
    if (hit != null) return hit
    val built = build // outside the map lock — this runs Spark jobs
    val prev = memos.putIfAbsent(full, built)
    if (hooked.add(appId)) {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          memos.keySet.removeIf(_.startsWith(appId + "|"))
          hooked.remove(appId)
        }
      })
    }
    if (prev != null) prev else built
  }

  /** Evict one family's entries (all applications) — the bench's
    * cold-start knob for timing a declared build query honestly. */
  def clearFamily(family: String): Unit =
    memos.keySet.removeIf(_.contains("|" + family + "|"))

  /** Evict everything (test isolation). */
  def clearAll(): Unit = memos.clear()
}
