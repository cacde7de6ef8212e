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

  test("skip workload: consistent block census; space-filling curves never lose in aggregate") {
    val df = Substrate.layoutSkipWorkload(spark, sfDir).collect()
    assert(df.length == 36, "3 layouts x 12 rectangles")
    val byLayout = df.groupBy(_.getString(0))
    assert(byLayout.keySet == Set("zorder", "hilbert", "linear"))
    // all layouts pack the same rows → identical block count
    assert(byLayout.values.flatMap(_.map(_.getLong(2))).toSet.size == 1)
    for (r <- df) {
      val (blocks, touched, skip) =
        (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(touched >= 0 && touched <= blocks)
      assert(skip >= 0.0 && skip <= 100.0)
    }
    // the layout decision metric: workload-aggregate touched blocks
    val zSum = byLayout("zorder").map(_.getLong(3)).sum
    val hSum = byLayout("hilbert").map(_.getLong(3)).sum
    val lSum = byLayout("linear").map(_.getLong(3)).sum
    assert(zSum <= lSum,
      s"z-order must not touch more blocks than linear across the workload ($zSum vs $lSum)")
    assert(hSum <= lSum,
      s"hilbert must not touch more blocks than linear across the workload ($hSum vs $lSum)")
  }

  test("hilbert index: bijective on the grid and consecutive cells are adjacent") {
    import spark.implicits._
    // order-3 curve over the full 8×8 grid — small enough to check the
    // DEFINING properties exhaustively: every cell gets a unique d in
    // [0, 64), and walking d in order moves one grid step at a time
    val cells = (for (x <- 0 until 8; y <- 0 until 8) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val d = Substrate.withHilbertColumns(cells, col("x"), col("y"), "d", order = 3)
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1)))).sortBy(_._1)
    assert(d.map(_._1).toSeq == (0L until 64L).toSeq, "d must be a bijection onto [0, 64)")
    for (w <- d.toSeq.sliding(2)) {
      val (_, (x1, y1)) = w(0)
      val (_, (x2, y2)) = w(1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jumped from ($x1,$y1) to ($x2,$y2) — not a Hilbert walk")
    }
    // the order-16 production curve agrees with DuckDB's unrolled CTE
    // replica through the oracle; here pin one spot value so the Scala
    // and SQL transforms can't drift silently
    val one = Substrate.withHilbertColumns(Seq((5L, 3L)).toDF("x", "y"),
        col("x"), col("y"), "d", order = 3)
      .select("d").head().getLong(0)
    assert(d.find(_._2 == ((5L, 3L))).get._1 == one)
  }
}
