package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the integer fixed-point PageRank — value
  * correctness is the DuckDB oracle's job (bit-exact replay); these pin
  * the fixed-point semantics a refactor could silently break. */
class GraphOpsSpec extends AnyFunSuite {
  import graft.TestSpark.{spark, sfDir}

  private lazy val ranks = GraphOps.pagerankNearDup(spark, sfDir).cache()

  test("isolated documents keep exactly the base (1-d) rank") {
    val iso = ranks.filter(col("degree") === 0)
    assert(iso.count() > 0, "test data should contain isolated docs")
    assert(iso.filter(col("rank_micro") =!= 150000L).count() == 0,
      "an isolated doc receives no contributions: r = 150000 + 0 forever")
  }

  test("every connected document ranks strictly above the isolated floor") {
    val conn = ranks.filter(col("degree") > 0)
    assert(conn.count() > 0, "test data should contain near-dup edges")
    assert(conn.filter(col("rank_micro") <= 150000L).count() == 0,
      "a neighbor's floor-div contribution is >= 1 micro-unit")
  }

  test("degrees sum even (each undirected edge counted twice)") {
    val total = ranks.agg(sum(col("degree"))).head.getLong(0)
    assert(total > 0 && total % 2 == 0, s"degree total $total")
  }

  test("every document appears exactly once") {
    val n = graft.Tables.documents(spark, sfDir).count()
    assert(ranks.count() == n)
    assert(ranks.select(col("doc_id")).distinct().count() == n)
  }

  test("star contraction equals min-label propagation on the near-dup graph") {
    val star = GraphOps.ccStarLabels(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = Dedup.clusterLabels(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop, "two CC algorithms must agree on every label")
  }

  test("star contraction solves a long chain, a cycle, and singletons") {
    import graft.TestSpark.spark.implicits._
    // path 0-1-…-19 (diameter 19 — the case min-propagation pays
    // O(diameter) rounds for and star contraction O(log²)), a separate
    // 4-cycle 100-103, and isolated nodes 200, 201
    val edges = ((0L until 19L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (102L, 103L), (103L, 100L)))
      .toDF("x", "y")
    val nodes = ((0L to 19L) ++ (100L to 103L) ++ Seq(200L, 201L))
      .toDF("id")
    val got = GraphOps.connectedComponentsStar(nodes, edges, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 19L).foreach(i => assert(got(i) == 0L, s"chain node $i"))
    (100L to 103L).foreach(i => assert(got(i) == 100L, s"cycle node $i"))
    assert(got(200L) == 200L && got(201L) == 201L, "singletons label themselves")
  }

  test("Adamic–Adar link prediction matches a brute-force recount") {
    val edges = Dedup.winnowSharedPairsAll(spark, sfDir, minShared = 1)
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      nbrs.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      nbrs.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val edgeSet = edges.map { case (a, b) => (a.min(b), a.max(b)) }.toSet
    // brute force: every node pair with >=1 common neighbor of deg>=2
    val scored = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    nbrs.foreach { case (w, ns) =>
      val d = ns.size.toLong
      if (d >= 2 && d <= 256) {
        val aa = 1000000000000L / ImageCodec.plog2MicroJvm(d)
        val sorted = ns.toSeq.sorted
        for (i <- sorted.indices; j <- (i + 1) until sorted.size) {
          val key = (sorted(i), sorted(j))
          val (n0, s0) = scored.getOrElse(key, (0L, 0L))
          scored(key) = (n0 + 1, s0 + aa)
        }
      }
    }
    val expected = scored.toSeq
      .filter { case (k, _) => !edgeSet.contains(k) }
      .map { case ((a, b), (n, s)) => (a, b, n, s) }
      .sortBy { case (a, b, _, s) => (-s, a, b) }.take(20)
    val got = GraphOps.linkPrediction(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, s"got=$got\nexpected=$expected")
    assert(got.nonEmpty, "the >=1-shared graph must have open wedges")
    got.foreach { case (a, b, _, _) =>
      assert(!edgeSet.contains((a, b)), "predicted pairs must not be edges")
    }
  }

  test("hub cap: over-cap middles generate no wedges, the alert channel reports them") {
    // the executable half of the SCALING_r12 flag contract: the wedge
    // workload is sum(min(deg, cap)^2), so a hub past the cap must
    // contribute ZERO candidate pairs — visibly (alert), not silently.
    // Synthetic graph: hub 100 with six leaves (deg 6), one open wedge
    // 10-20-30 (middle deg 2), one triangle 40-50-60 (all closed).
    import spark.implicits._
    val pairs = Seq(
      (100L, 101L), (100L, 102L), (100L, 103L),
      (100L, 104L), (100L, 105L), (100L, 106L),
      (10L, 20L), (20L, 30L),
      (40L, 50L), (50L, 60L), (40L, 60L)).toDF("id1", "id2")
    // capped run: hub (deg 6 > 4) excluded from wedge generation
    val capped = GraphOps.linkPredictionOf(pairs, k = 20, maxHubDeg = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // only the open wedge survives: middle 20 has deg 2, so the exact
    // AA score is 1e12 DIV plog2micro(2) = 1e12 / 1e6 = 1e6; the
    // triangle's wedges all close onto existing edges (anti-joined out)
    assert(capped.toSeq == Seq((10L, 30L, 1L, 1000000L)), capped.toSeq.toString)
    // alert channel: exactly the hub, with its full degree
    val dropped = GraphOps.droppedHubsOf(pairs, maxHubDeg = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dropped.toSeq == Seq((100L, 6L)), dropped.toSeq.toString)
    // uncapped run: the 15 leaf pairs reappear, each weaker than the
    // deg-2 wedge (AA decreases with middle degree), so (10,30) still
    // ranks first — the cap changed coverage, never relative order
    val full = GraphOps.linkPredictionOf(pairs, k = 20, maxHubDeg = 4096)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(full.length == 16, s"15 hub pairs + 1 open wedge: ${full.length}")
    assert(full.head == ((10L, 30L, 1L, 1000000L)), full.head.toString)
    val hubScores = full.tail.map(_._4).toSet
    assert(hubScores.size == 1 && hubScores.head < 1000000L,
      s"hub-mediated pairs share one sub-1e6 AA weight: $hubScores")
    assert(GraphOps.droppedHubsOf(pairs, maxHubDeg = 4096).count() == 0,
      "default-cap alert must be empty on this graph")
  }

  test("packed-key guard raises on ids outside [0, 2^31) — including negatives") {
    // r13 advice: the guard must reject NEGATIVE ids too — a negative
    // id would pack into an ambiguous key and unpack as the wrong
    // pair, exactly the silent corruption the raise exists to prevent
    import spark.implicits._
    def run(pairs: org.apache.spark.sql.DataFrame): Unit = {
      GraphOps.linkPredictionOf(pairs, k = 20).collect(); ()
    }
    // a wide id (>= 2^31) on a closing wedge must raise
    val wide = Seq((5000000000L, 1L), (1L, 2L)).toDF("id1", "id2")
    val eWide = intercept[Exception] { run(wide) }
    assert(eWide.getMessage.contains("disable pair-key packing"), eWide.getMessage)
    // a NEGATIVE id on a closing wedge must raise, not corrupt
    val neg = Seq((-7L, 1L), (1L, 2L)).toDF("id1", "id2")
    val eNeg = intercept[Exception] { run(neg) }
    assert(eNeg.getMessage.contains("disable pair-key packing"), eNeg.getMessage)
    // in-range ids keep working
    val ok = Seq((10L, 20L), (20L, 30L)).toDF("id1", "id2")
    assert(GraphOps.linkPredictionOf(ok, k = 20).count() == 1L)
  }

  test("simplified silhouette matches a brute-force recount") {
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Double](2).toArray))
    // exact decimal centroid means, like the operator
    val cents = vecs.groupBy(_._2).map { case (lab, vs) =>
      val dims = vs.head._3.length
      // exact decimal SUM, then double division — the operator's
      // sum(decimal).cast(double) / count order exactly
      lab -> Array.tabulate(dims) { d =>
        vs.map(v => BigDecimal(v._3(d))).sum.toDouble / vs.length
      }
    }
    def dist2(a: Array[Double], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - c(i); s += d * d; i += 1 }
      s
    }
    val sx4 = vecs.map { case (id, lab, e) =>
      val a2 = dist2(e, cents(lab))
      val b2 = cents.filter(_._1 != lab).map(c => dist2(e, c._2)).min
      val s = if (math.max(a2, b2) > 0)
        math.floor((b2 - a2) / math.max(a2, b2) * 10000 + 0.5).toLong else 0L
      (lab, s)
    }
    val expected = sx4.groupBy(_._1).map { case (lab, ss) =>
      val sum = ss.map(_._2).sum; val n = ss.length.toLong
      val mean = if (sum >= 0) sum / n else -((-sum) / n)
      (lab, n, mean, ss.map(_._2).min, ss.map(_._2).max,
        ss.count(_._2 < 0).toLong)
    }.toSet
    val got = Similarity.silhouetteSimplified(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
