package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}

/** Behavior pins for the round-8 third wave: vocabulary drift,
  * deterministic weighted sampling, EWMA burst detection, kNN-graph
  * label agreement, quality-model calibration, grouping sets and
  * unpivot. Value-level cross-engine correctness is the DuckDB
  * oracle's job; these tests pin the ALGORITHMIC invariants that a
  * green hash alone wouldn't explain. */
class Round8WaveSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  // --- text_vocab_drift -------------------------------------------------

  test("vocab drift: descending contributions, counts consistent with a recount") {
    val rows = TextAnalysis.vocabDrift(spark, sfDir).collect()
    assert(rows.length == 25)
    val contribs = rows.map(_.getAs[Long]("jsd_contrib_micro"))
    assert(contribs.toSeq == contribs.sortBy(-_).toSeq, "must be ranked desc")
    // exact-math JSD contributions are >= 0; the piecewise-linear log
    // gives each side <= 0.086 bit error, so allow a small negative slack
    assert(contribs.forall(_ >= -20000L), s"contribution far below zero: ${contribs.min}")
    // recount the top term's per-half counts straight off the table
    val top = rows.head
    val recount = Tables.documents(spark, sfDir)
      .select((col("doc_id") % 2 === 0).as("h0"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") === top.getAs[String]("w"))
      .agg(sum(when(col("h0"), 1L).otherwise(0L)),
        sum(when(!col("h0"), 1L).otherwise(0L))).head()
    assert(recount.getLong(0) == top.getAs[Long]("n1"))
    assert(recount.getLong(1) == top.getAs[Long]("n2"))
  }

  // --- text_quality_calibration ----------------------------------------

  test("calibration: bins partition the corpus and rates recompute") {
    val rows = TextAnalysis.qualityCalibration(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n")).sum == nDocs, "bins must partition all docs")
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin")
      assert(bin >= 0 && bin < 8)
      assert(r.getAs[Long]("n_keep") <= r.getAs[Long]("n"))
      assert(r.getAs[Long]("keep_rate_milli") ==
        r.getAs[Long]("n_keep") * 1000 / r.getAs[Long]("n"))
      assert(r.getAs[Long]("bin_min_milli") <= r.getAs[Long]("bin_max_milli"))
    }
  }

  // --- sketch_weighted_sample ------------------------------------------

  /** Test-side replica of the plog2micro integer log (the same
    * piecewise-linear definition as TextAnalysis.plog2MicroSql). */
  private def plog2Micro(x: Long): Long = {
    val msb = 63 - java.lang.Long.numberOfLeadingZeros(x)
    msb * 1000000L + ((x - (1L << msb)) * 1000000L) / (1L << msb)
  }

  test("weighted sample: contiguous ranks, ascending keys, formula replay") {
    val rows = Sketches.weightedSample(spark, sfDir).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length).toSeq)
      val keys = sorted.map(_.getAs[Double]("es_key"))
      assert(keys.toSeq == keys.sorted.toSeq, "exponential clocks ascend with rank")
    }
    // replay the exponential-clock key for one sampled row end-to-end:
    // md5("ws:"+id) -> top 30 bits -> integer log -> / weight
    val r = rows.head
    val docId = r.getAs[Long]("doc_id")
    val nChars = Tables.documents(spark, sfDir)
      .filter(col("doc_id") === docId).head().getAs[Long]("n_chars")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(s"ws:$docId".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val h48 = java.lang.Long.parseLong(md5.take(12), 16)
    val key = (30000000L - plog2Micro(h48 / 262144L)).toDouble / nChars.toDouble
    val expected = math.floor(key * 1e6 + 0.5) / 1e6
    assert(math.abs(r.getAs[Double]("es_key") - expected) < 1e-9,
      s"es_key mismatch: got ${r.getAs[Double]("es_key")}, expected $expected")
  }

  test("weighted sample: deterministic across runs") {
    val a = Sketches.weightedSample(spark, sfDir).collect().map(_.toString).sorted
    val b = Sketches.weightedSample(spark, sfDir).collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }

  // --- events_ewma_burst ------------------------------------------------

  test("ewma burst: series heads are null, one row replays the integer fold") {
    val rows = Relational.eventsEwmaAnomaly(spark, sfDir).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    val weights = Seq.tabulate(7)(j =>
      math.pow(3, j).toLong * math.pow(4, 6 - j).toLong)
    byType.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("day"))
      assert(sorted.head.isNullAt(sorted.head.fieldIndex("ewma_milli")),
        "first day has no history -> null EWMA")
      assert(!sorted.head.getAs[Boolean]("is_burst"))
      // replay the 8th row (full 7-day window) from raw daily counts
      if (sorted.length > 7) {
        val ns = sorted.map(_.getAs[Long]("n"))
        val i = 7
        val s = (1 to 7).map(j => weights(j - 1) * ns(i - j)).sum
        val w = weights.sum
        assert(sorted(i).getAs[Long]("ewma_milli") == s * 1000 / w)
        assert(sorted(i).getAs[Boolean]("is_burst") == (ns(i) * w > 2 * s))
      }
    }
  }

  // --- embed_knn_agreement ----------------------------------------------

  test("knn agreement: edge counts bounded, rate recomputes") {
    val rows = Similarity.knnLabelAgreement(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("label")).distinct.length == rows.length)
    rows.foreach { r =>
      val nVecs = r.getAs[Long]("n_vecs")
      val nEdges = r.getAs[Long]("n_edges")
      val nSame = r.getAs[Long]("n_same")
      assert(nSame <= nEdges && nEdges <= nVecs * 5)
      assert(r.getAs[Long]("agree_milli") == nSame * 1000 / nEdges)
      val mc = r.getAs[Long]("mean_cos_x4")
      assert(mc >= -10000 && mc <= 10000, "mean cosine is a cosine")
    }
  }

  // --- sub_grouping_sets -------------------------------------------------

  test("grouping sets: detail rows roll up into the declared supersets") {
    val rows = Substrate.groupingSetsOp(spark, sfDir).collect()
    val total = Tables.lineitem(spark, sfDir).count()
    val grand = rows.filter(r =>
      r.getAs[Long]("g_rf") == 1 && r.getAs[Long]("g_ls") == 1)
    assert(grand.length == 1 && grand.head.getAs[Long]("n") == total)
    val detail = rows.filter(r =>
      r.getAs[Long]("g_rf") == 0 && r.getAs[Long]("g_ls") == 0)
    assert(detail.map(_.getAs[Long]("n")).sum == total)
    val perFlag = rows.filter(r =>
      r.getAs[Long]("g_rf") == 0 && r.getAs[Long]("g_ls") == 1)
    assert(perFlag.map(_.getAs[Long]("n")).sum == total)
    // each per-flag row equals the sum of its detail rows
    perFlag.foreach { pf =>
      val rf = pf.getAs[String]("rf")
      assert(pf.getAs[Long]("n") ==
        detail.filter(_.getAs[String]("rf") == rf).map(_.getAs[Long]("n")).sum)
    }
  }

  // --- sub_unpivot --------------------------------------------------------

  test("unpivot: 3 measures per flag, values survive the melt") {
    val rows = Substrate.unpivotOp(spark, sfDir).collect()
    val flags = rows.map(_.getAs[String]("l_returnflag")).distinct
    assert(rows.length == flags.length * 3)
    val qty = rows.filter(_.getAs[String]("measure") == "qty_cents")
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("value_cents")).toMap
    val expected = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("bigint") * 100).as("q")).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("q")).toMap
    assert(qty == expected)
  }

  // --- plan shapes --------------------------------------------------------

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("plan: weighted sample uses the bounded aggregate, not a window") {
    val p = plan("sketch_weighted_sample")
    assert(p.contains("topk_by") || p.contains("ObjectHashAggregate"),
      s"must go through the bounded TopKBy aggregate:\n$p")
    assert(!p.contains("Window"), s"the window formulation is the oracle, not the plan:\n$p")
  }

  test("plan: vocab drift is aggregate + distributed top-k, no window") {
    val p = plan("text_vocab_drift")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must be distributed:\n$p")
    assert(!p.contains("Window"), p)
  }

  test("plan: knn self-join is cell-keyed equi, never a cartesian product") {
    val p = plan("embed_knn_agreement")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"cell join must be equi-keyed:\n$p")
  }

  test("plan: ewma windows partition by event_type (no global sort)") {
    val p = plan("events_ewma_burst")
    assert(p.contains("hashpartitioning(event_type"), p)
    assert(!p.contains("Exchange SinglePartition"),
      s"a single-partition window would serialize the series:\n$p")
  }

  test("plan: grouping sets and unpivot both plan as a single Expand") {
    assert(plan("sub_grouping_sets").contains("Expand"))
    assert(plan("sub_unpivot").contains("Expand"))
  }
}
