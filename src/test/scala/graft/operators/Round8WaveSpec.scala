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

  // --- events_cusum_shift --------------------------------------------------

  test("cusum: the windowed identity replays the literal max(0, S+x) recursion") {
    val rows = Relational.eventsCusumShift(spark, sfDir).collect()
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("day"))
      val mean = ordered.head.getAs[Long]("mean_milli")
      var s = 0L
      ordered.foreach { r =>
        val dev = r.getAs[Long]("n") * 1000 - mean - mean / 20
        s = math.max(0L, s + dev)
        assert(r.getAs[Long]("cusum_milli") == s,
          s"identity diverged from the recursion at day ${r.getAs[Long]("day")}")
        assert(r.getAs[Boolean]("is_shift") == (s > 3 * mean))
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

  // --- dedup_threshold_sweep ---------------------------------------------

  test("threshold sweep: stable spine, monotone counts, mean above threshold") {
    val rows = Dedup.thresholdSweep(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("threshold_x10"))
    assert(rows.map(_.getAs[Long]("threshold_x10")).toSeq == Seq(5L, 6L, 7L, 8L, 9L),
      "every threshold emits a row even when empty")
    val pairs = rows.map(_.getAs[Long]("n_pairs"))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b },
      "raising the threshold can only drop pairs")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs_removed") <= r.getAs[Long]("n_pairs"))
      if (r.getAs[Long]("n_pairs") > 0)
        // each admitted pair has floor(10000*j) >= 1000*t by the filter
        assert(r.getAs[Long]("mean_jac_x4") >= r.getAs[Long]("threshold_x10") * 1000)
    }
  }

  // --- embed_cell_balance --------------------------------------------------

  test("cell balance: classes partition the cells, bounds honored") {
    val rows = Similarity.cellBalance(spark, sfDir).collect()
    val nVecs = Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == nVecs,
      "every vector sits in exactly one size class")
    rows.foreach { r =>
      val cls = r.getAs[Long]("size_class")
      assert(r.getAs[Long]("min_sz") >= (1L << cls.toInt))
      assert(r.getAs[Long]("max_sz") < (1L << (cls.toInt + 1)))
      assert(r.getAs[Long]("share_milli") <= 1000L)
    }
  }

  // --- corpus_window_efficiency -------------------------------------------

  test("window efficiency: ceil-division identities hold and one row replays") {
    val rows = Corpus.windowEfficiency(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("window_len")).sorted.toSeq == Seq(128L, 256L, 512L))
    rows.foreach { r =>
      val w = r.getAs[Long]("window_len")
      assert(r.getAs[Long]("n_pad_tokens") ==
        w * r.getAs[Long]("n_windows") - r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("efficiency_milli") <= 1000L)
    }
    // replay W=128 from the raw token counts
    val toks = Tables.documents(spark, sfDir)
      .select(size(split(col("text"), " ")).cast("long").as("n")).collect()
      .map(_.getLong(0))
    val r128 = rows.find(_.getAs[Long]("window_len") == 128L).get
    assert(r128.getAs[Long]("n_windows") == toks.map(n => (n + 127) / 128).sum)
    assert(r128.getAs[Long]("n_tokens") == toks.sum)
  }

  // --- corpus_bpe_compression ---------------------------------------------

  test("compression sweep: merges only shrink token mass, chars invariant") {
    val rows = Corpus.bpeCompressionSweep(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("k_merges"))
    assert(rows.map(_.getAs[Long]("k_merges")).toSeq == Seq(4L, 8L, 16L))
    assert(rows.map(_.getAs[Long]("n_chars")).distinct.length == 1,
      "merges rewrite boundaries, never characters")
    val toks = rows.map(_.getAs[Long]("n_tokens"))
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b },
      "each extra merge can only reduce the token count")
    val cpt = rows.map(_.getAs[Long]("chars_per_token_x4"))
    assert(cpt.zip(cpt.tail).forall { case (a, b) => a <= b },
      "compression is monotone in the merge budget")
  }

  // --- ann_nprobe_sweep ----------------------------------------------------

  test("nprobe sweep: monotone recall, nprobe=2 point matches the single-point eval") {
    val rows = Similarity.annNprobeSweep(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("nprobe"))
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq == Seq(1L, 2L, 4L))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_true") == r.getAs[Long]("n_queries") * 5)
      assert(r.getAs[Long]("recall_x4") ==
        r.getAs[Long]("n_hits") * 10000 / r.getAs[Long]("n_true"))
    }
    val hits = rows.map(_.getAs[Long]("n_hits"))
    assert(hits.zip(hits.tail).forall { case (a, b) => a <= b },
      "widening the probe set only adds candidates")
    // the nprobe=2 sweep point aggregates to ann_ivf_recall's numbers
    val single = Similarity.annIvfRecall(spark, sfDir)
      .agg(sum(col("n_true")), sum(col("n_hits"))).head()
    val np2 = rows.find(_.getAs[Long]("nprobe") == 2L).get
    assert(np2.getAs[Long]("n_true") == single.getLong(0))
    assert(np2.getAs[Long]("n_hits") == single.getLong(1))
  }

  // --- corpus_gate_sweep ---------------------------------------------------

  test("gate sweep: raising the bar only sheds docs and tokens, one row replays") {
    val rows = TextAnalysis.gateSweep(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("threshold_micro"))
    val docs = rows.map(_.getAs[Long]("n_docs_kept"))
    val toks = rows.map(_.getAs[Long]("n_tokens_kept"))
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b })
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_share_milli") <= 1000L)
      assert(r.getAs[Long]("token_share_milli") <= 1000L)
    }
    // replay the 5000-micro row against a direct recount
    val direct = Tables.documents(spark, sfDir)
      .select(TextAnalysis.qualityMicroCol.as("q"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .filter(col("q") >= 5000L)
      .agg(count(lit(1)), sum(col("n"))).head()
    val r5000 = rows.find(_.getAs[Long]("threshold_micro") == 5000L).get
    assert(r5000.getAs[Long]("n_docs_kept") == direct.getLong(0))
    assert(r5000.getAs[Long]("n_tokens_kept") == direct.getLong(1))
  }

  // --- dedup_semantic_sweep ------------------------------------------------

  test("semantic sweep: stable spine, monotone counts, mean above threshold") {
    val rows = Similarity.semanticSweep(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("threshold_x4"))
    assert(rows.map(_.getAs[Long]("threshold_x4")).toSeq ==
      Seq(4000L, 5000L, 6000L, 7000L))
    val pairs = rows.map(_.getAs[Long]("n_pairs"))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs_removed") <= r.getAs[Long]("n_pairs"))
      if (r.getAs[Long]("n_pairs") > 0)
        assert(r.getAs[Long]("mean_cos_x4") >= r.getAs[Long]("threshold_x4"))
    }
  }

  // --- corpus_release_funnel ----------------------------------------------

  test("release funnel: monotone stage yields, raw row exact, lang stage replays") {
    val rows = Corpus.releaseFunnel(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("stage"))
    assert(rows.map(_.getAs[String]("stage_name")).toSeq ==
      Seq("raw", "lang", "length", "exact_dedup", "quality", "decontaminated"))
    val docs = rows.map(_.getAs[Long]("n_docs"))
    val toks = rows.map(_.getAs[Long]("n_tokens"))
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b },
      "every stage can only shed documents")
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b })
    assert(rows.head.getAs[Long]("n_docs") ==
      Tables.documents(spark, sfDir).count())
    assert(rows.head.getAs[Long]("doc_retained_milli") == 1000L)
    // replay stage 1 (language filter) directly
    val langDirect = Tables.documents(spark, sfDir)
      .filter(col("lang").isin("en", "de", "fr")).count()
    assert(rows(1).getAs[Long]("n_docs") == langDirect)
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

  test("plan: threshold sweep candidates stay bucket equi-keyed, never all-pairs") {
    val p = plan("dedup_threshold_sweep")
    assert(!p.contains("CartesianProduct"),
      s"the sweep must ride the capped LSH candidate join:\n$p")
  }

  test("plan: cell balance is one keyed count, no cartesian product") {
    assert(!plan("embed_cell_balance").contains("CartesianProduct"))
  }
}
