package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** PHYSICAL proof of the z-order layout's value: `layout_zorder`
  * reports zone-map pruning counts logically; this spec lays the same
  * rows out as REAL parquet (range-partitioned on the Morton value, one
  * row group per file) and shows Spark's parquet reader actually
  * skipping: the same two-key rectangle predicate materializes a small
  * fraction of the rows from the z-ordered layout that it reads from a
  * shuffled layout, via row-group zone maps (min/max footer stats) —
  * the mechanism a 100 TB scan prunes with after a layout job.
  */
class ZorderSkippingSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  /** Rows materialized by the parquet reader across a closure — the
    * zone-map signal: skipped row groups never surface rows (the
    * residual filter then runs post-scan). Listener events are async;
    * poll until the counter stabilizes. */
  private def recordsRead(f: => Unit): Long = {
    val acc = new AtomicLong()
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          acc.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      f
      var last = -1L
      var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val now = acc.get
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      acc.get
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("z-ordered parquet: the two-key rectangle reads a fraction of the rows a shuffled layout reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"))
    val total = rows.count()

    // z-ordered: range-partition + sort on the Morton curve → every
    // file's (partkey, suppkey) zone map is TIGHT on both dims
    rows.withColumn("z", Substrate.morton(col("l_partkey"), col("l_suppkey")))
      .repartitionByRange(16, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z")
      .write.mode("overwrite").parquet(s"$dir/zorder")
    // control: hash-shuffled layout → every file spans the whole domain
    rows.repartition(16, col("l_orderkey"))
      .write.mode("overwrite").parquet(s"$dir/shuffled")

    // a mid-domain rectangle ~10% wide on partkey, ~30% on suppkey —
    // bounds adapt to the SF's key domain (sf0.001: partkey 0..199,
    // suppkey 0..9)
    val b = rows.agg(max(col("l_partkey")).as("pm"), max(col("l_suppkey")).as("sm"))
      .collect()(0)
    val (pLo, pHi) = (b.getLong(0) * 45 / 100, b.getLong(0) * 55 / 100)
    val (sLo, sHi) = (0L, b.getLong(1) * 3 / 10)
    def rect(path: String): Long = {
      val df = spark.read.parquet(path)
        .filter(col("l_partkey").between(pLo, pHi) &&
          col("l_suppkey").between(sLo, sHi))
      df.agg(count(lit(1))).collect()(0).getLong(0)
    }
    // same answer from both layouts…
    val nZ = rect(s"$dir/zorder")
    val nS = rect(s"$dir/shuffled")
    assert(nZ == nS, "layout must never change query results")
    assert(nZ > 0, "the probe rectangle must match some rows at this SF")

    // …but the z-ordered scan materializes far fewer rows: parquet
    // row-group stats on the two correlated columns prune most files
    val readZ = recordsRead { rect(s"$dir/zorder") }
    val readS = recordsRead { rect(s"$dir/shuffled") }
    assert(readS >= total,
      s"shuffled layout must read every row group ($readS < $total)")
    assert(readZ * 2 <= readS,
      s"z-order must skip at least half the rows ($readZ vs $readS of $total)")
  }

  test("skip workload: consistent block census; z-order never loses in aggregate") {
    val df = Substrate.layoutSkipWorkload(spark, sfDir).collect()
    assert(df.length == 24, "2 layouts x 12 rectangles")
    val byLayout = df.groupBy(_.getString(0))
    // both layouts pack the same rows → identical block count
    assert(byLayout.values.flatMap(_.map(_.getLong(2))).toSet.size == 1)
    for (r <- df) {
      val (blocks, touched, skip) =
        (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(touched >= 0 && touched <= blocks)
      assert(skip >= 0.0 && skip <= 100.0)
    }
    // the layout decision metric: workload-aggregate touched blocks
    val zSum = byLayout("zorder").map(_.getLong(3)).sum
    val lSum = byLayout("linear").map(_.getLong(3)).sum
    assert(zSum <= lSum,
      s"z-order must not touch more blocks than linear across the workload ($zSum vs $lSum)")
  }
}
