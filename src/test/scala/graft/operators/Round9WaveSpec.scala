package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Value-level invariants for the round-9 operator wave — the oracle
  * gate proves engine agreement; these pin the SEMANTICS (the things
  * that would stay wrong even if both engines agreed on them).
  */
class Round9WaveSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  // --- embed_kcenter_coreset --------------------------------------------

  test("kcenter: seed is min vec_id, radii nonincreasing, centers distinct") {
    val rows = Similarity.kcenterCoreset(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("round"))
    assert(rows.length == 8)
    val minId = graft.Tables.embeddings(spark, sfDir)
      .agg(min(col("vec_id"))).head().getLong(0)
    assert(rows.head.getAs[Long]("center_id") == minId, "seed must be min vec_id")
    // min_d only shrinks as centers accumulate, so max min_d (the
    // radius at selection) is nonincreasing across rounds 1..k-1
    val radii = rows.tail.map(_.getAs[Long]("radius_x4"))
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"coverage radius must be nonincreasing: ${radii.toSeq}")
    val ids = rows.map(_.getAs[Long]("center_id"))
    assert(ids.distinct.length == ids.length, "a center must never repeat")
  }

  // --- ann_lsh_multiprobe -----------------------------------------------

  test("multiprobe dominates single-probe: superset candidates, better-or-equal top-1") {
    def top1(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.filter(col("rank") === 1).collect()
        .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("cos_sim")).toMap
    val single = top1(Similarity.annLshTopK(spark, sfDir)
      .withColumn("rank", col("rank").cast("long")))
    val multi = top1(Similarity.annLshMultiprobe(spark, sfDir))
    // every query the home bucket answers, multiprobe answers at least
    // as well (its candidate set is a superset)
    for ((q, c) <- single) {
      assert(multi.contains(q), s"query $q lost by multiprobe")
      assert(multi(q) >= c - 1e-9, s"query $q: multiprobe top-1 ${multi(q)} < single $c")
    }
    assert(multi.size >= single.size, "multiprobe must answer at least as many queries")
  }

  // --- graph_triangles --------------------------------------------------

  test("triangle counts: total participation divisible by 3") {
    // every triangle contributes exactly one count to each of its 3
    // members — the degree-ordered orientation must not double-count
    val total = GraphOps.triangleCounts(spark, sfDir)
      .agg(sum(col("n_triangles"))).head().getLong(0)
    assert(total % 3 == 0, s"sum of participations must be 3×#triangles, got $total")
    assert(total > 0, "fixture must contain at least one near-dup triangle")
  }

  // --- text_zipf_fit ----------------------------------------------------

  test("zipf slope is negative and in a plausible band") {
    val r = TextAnalysis.zipfFit(spark, sfDir).head()
    val slope = r.getAs[Long]("slope_milli")
    assert(slope < 0, s"rank-frequency slope must be negative, got $slope")
    assert(slope > -4000, s"implausibly steep slope: $slope")
  }

  // --- events_trending_decay --------------------------------------------

  test("trending decay: anchored-day events carry full weight, score <= n_events * 1e6") {
    val rows = Relational.eventsTrendingDecay(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val score = r.getAs[Long]("score_micro")
      val n = r.getAs[Long]("n_events")
      assert(score <= n * 1000000L, s"decayed score cannot exceed undecayed: $r")
      assert(score >= 0, s"score must be nonnegative: $r")
    }
  }

  // --- corpus_budget_mix -------------------------------------------------

  test("budget mix: allocation exactly exhausts the budget, never oversubscribes a source") {
    val rows = Corpus.budgetMix(spark, sfDir).collect()
    val budget = rows.head.getAs[Long]("budget_toks")
    assert(rows.map(_.getAs[Long]("alloc_toks")).sum == budget,
      "greedy fill with a partial boundary source must spend the budget exactly")
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc_toks") <= r.getAs[Long]("n_toks"),
        s"allocated more than available: $r")
    }
    // ranks are a permutation of 1..n
    assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq ==
      (1L to rows.length).toSeq)
    // quality ordering: a fully-allocated source never ranks below a
    // zero-allocated one
    val byRank = rows.sortBy(_.getAs[Long]("rank"))
    val firstZero = byRank.indexWhere(_.getAs[Long]("alloc_toks") == 0L)
    if (firstZero >= 0)
      assert(byRank.drop(firstZero).forall(_.getAs[Long]("alloc_toks") == 0L),
        "allocation must be a prefix of the quality ranking")
  }

  // --- embed_centroid_drift ----------------------------------------------

  test("centroid drift: halves partition each label, cosine bounded") {
    val rows = Similarity.centroidDrift(spark, sfDir).collect()
    val perLabel = graft.Tables.embeddings(spark, sfDir)
      .groupBy(col("label")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.length == perLabel.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_old") + r.getAs[Long]("n_new") ==
        perLabel(r.getAs[Int]("label")), s"halves must partition the label: $r")
      val c = r.getAs[Long]("centroid_cos_x4")
      assert(c >= -10000 && c <= 10000, s"cosine out of range: $r")
    }
  }

  // --- events_transition_matrix -------------------------------------------

  test("transition matrix: bigram mass = events - users, rows normalize to ~1000") {
    val rows = Relational.eventsTransitionMatrix(spark, sfDir).collect()
    val ev = graft.Tables.events(spark, sfDir)
    val expected = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == expected,
      "every user contributes exactly (events - 1) bigrams")
    // per-row probabilities are floor-milli: each row's sum lands in
    // (1000 - |types|, 1000]
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (f, rs) =>
      val s = rs.map(_.getAs[Long]("prob_milli")).sum
      assert(s <= 1000 && s > 1000 - rs.length,
        s"row $f milli sum $s out of floor-division band")
    }
  }

  // --- events_monitor_ensemble --------------------------------------------

  test("monitor ensemble: votes recount from flags, components agree with standalone queries") {
    val rows = Relational.eventsMonitorEnsemble(spark, sfDir).collect()
    rows.foreach { r =>
      val votes = Seq("spike_3sigma", "mad_outlier", "cusum_shift", "ewma_burst")
        .count(r.getAs[Boolean])
      assert(r.getAs[Long]("votes") == votes, s"vote miscount: $r")
    }
    // composition check: the MAD flag column equals the standalone query
    val standalone = Relational.eventsMadOutliers(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("day")) -> r.getAs[Boolean]("is_outlier"))
      .toMap
    rows.foreach { r =>
      assert(r.getAs[Boolean]("mad_outlier") ==
        standalone((r.getString(0), r.getAs[Long]("day"))),
        s"ensemble drifted from the standalone MAD flag: $r")
    }
    assert(rows.length == standalone.size)
  }

  // --- text_entropy_profile ------------------------------------------------

  test("entropy profile: nonnegative, bounded by log2 vocab (plus chord slack)") {
    val rows = TextAnalysis.entropyProfile(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Long]("entropy_micro_bits")
      assert(h >= 0, s"entropy negative: $r")
      val norm = r.getAs[Long]("norm_entropy_milli")
      // H <= log2(vocab); the piecewise-linear log allows <=0.086-bit
      // error on each side, so allow 1200 milli
      assert(norm >= 0 && norm <= 1200, s"normalized entropy out of band: $r")
    }
  }

  // --- sub_apply_changeset (CDC round trip) ------------------------------

  test("apply(diff(A,B), A) == B on the full key space, not just the slice") {
    // the declared query slices keys ≡0 mod 4 for output size; the
    // invariant itself holds everywhere — spot-check by recomputing B
    val merged = Relational.applyChangeset(spark, sfDir)
      .withColumnRenamed("price_c", "m_price")
    val ord = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("price_c"))
      .filter(col("o_orderkey") % 4 === 0)
    val b = ord.filter(col("o_orderkey") % 97 =!= 0)
      .withColumn("price_c", when(col("o_orderkey") % 89 === 0,
        expr("price_c * 105 DIV 100")).otherwise(col("price_c")))
    val mismatch = merged.join(b, Seq("o_orderkey"), "full_outer")
      .filter(col("m_price").isNull || col("price_c").isNull ||
        col("m_price") =!= col("price_c"))
      .count()
    assert(mismatch == 0, s"$mismatch rows diverge from snapshot B")
  }

  // --- events_seasonal_hampel -------------------------------------------

  test("seasonal hampel: baseline is a member lower median, flag recounts") {
    val rows = Relational.eventsSeasonalHampel(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // the dow baseline must be an ACTUAL daily count of its own
    // (type, dow) group, at the lower-median rank
    rows.groupBy(r => (r.getAs[String]("event_type"), r.getAs[Long]("dow")))
      .foreach { case ((t, dow), g) =>
        val ns = g.map(_.getAs[Long]("n")).sorted
        val med = ns((ns.length + 1) / 2 - 1)
        assert(g.head.getAs[Long]("dow_med") == med,
          s"($t, dow=$dow): dow_med ${g.head.getAs[Long]("dow_med")} != lower median $med")
      }
    // flag recount from the published columns
    rows.foreach { r =>
      val expect = math.abs(r.getAs[Long]("resid") - r.getAs[Long]("med_r")) >
        3L * r.getAs[Long]("mad_r")
      assert(r.getAs[Boolean]("is_anom") == expect, s"flag mismatch at $r")
      assert(r.getAs[Long]("resid") ==
        r.getAs[Long]("n") - r.getAs[Long]("dow_med"))
    }
    // same (type, day) coverage as the undeseasonalized Hampel twin
    assert(rows.length ==
      Relational.eventsMadOutliers(spark, sfDir).count())
  }

  // --- events_attribution_u ---------------------------------------------

  test("attribution: credits conserve exactly 1000 per converted path") {
    val rows = Relational.attributionUShape(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val credit = rows.map(_.getAs[Long]("credit_milli")).sum
    val nFirst = rows.map(_.getAs[Long]("n_first")).sum
    val nLast = rows.map(_.getAs[Long]("n_last")).sum
    // one first and one last touch per converted path, and the
    // 40/20/40 split must re-sum to exactly 1000 per path (the
    // integer remainder lands on the first touch, never lost)
    assert(nFirst == nLast, s"first/last path counts diverge: $nFirst vs $nLast")
    assert(credit == 1000L * nFirst,
      s"credit $credit != 1000 × $nFirst paths — credits leaked")
    val touches = rows.map(_.getAs[Long]("n_touches")).sum
    assert(touches >= nFirst, "every path has at least its first touch")
  }

  // --- graph_label_prop -------------------------------------------------

  test("label prop: communities refine connected components, sizes recount") {
    val lp = GraphOps.labelPropagation(spark, sfDir)
    val rows = lp.collect()
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(rows.length == nDocs, "one labeled row per document")
    // comm_size is the exact census of its own label
    val sizes = rows.groupBy(_.getAs[Long]("community")).view.mapValues(_.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("comm_size") == sizes(r.getAs[Long]("community")),
        s"comm_size mismatch at $r")
    }
    // labels only travel along edges, so a community can never span
    // two connected components of the same graph
    val pairs = Dedup.winnowSharedPairsAll(spark, sfDir)
    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"))
    val cc = GraphOps.connectedComponentsStar(
      docs, pairs.select(col("id1"), col("id2")), "doc_id")
    val spanning = lp.join(cc, "doc_id")
      .groupBy(col("community"))
      .agg(countDistinct(col("cluster")).as("n_cc"))
      .filter(col("n_cc") > 1).count()
    assert(spanning == 0, s"$spanning communities span multiple components")
  }

  // --- text_kn_perplexity -----------------------------------------------

  test("KN perplexity: slice docs fully contexted, coverage matches stupid backoff") {
    val kn = TextAnalysis.knPerplexity(spark, sfDir).collect()
    kn.foreach { r =>
      assert(r.getAs[Long]("nll_avg_micro") >= 0, s"p > 1 at $r")
      assert(r.getAs[Long]("n_no_ctx") <= r.getAs[Long]("n_trans"))
      // training-slice docs contributed every one of their contexts,
      // so none can be unseen
      if (r.getAs[Long]("doc_id") % 5 == 0)
        assert(r.getAs[Long]("n_no_ctx") == 0,
          s"slice doc with unseen context: $r")
    }
    // same transition stream as the stupid-backoff LM: identical doc
    // coverage and per-doc transition counts
    val sb = TextAnalysis.lmPerplexity(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_trans")).toMap
    assert(kn.map(_.getAs[Long]("doc_id")).toSet == sb.keySet)
    kn.foreach(r => assert(r.getAs[Long]("n_trans") ==
      sb(r.getAs[Long]("doc_id")), s"n_trans mismatch at $r"))
  }

  // --- graph_kcore ------------------------------------------------------

  test("kcore: fixed point reached, members mutually supported at degree >= 3") {
    // peel rounds are idempotent at the fixed point — rounds vs
    // rounds−1 must already agree, or the unrolled oracle would lie
    val e5 = GraphOps.kcoreEdges(spark, sfDir, rounds = 5).collect().toSet
    val e6 = GraphOps.kcoreEdges(spark, sfDir, rounds = 6).collect().toSet
    assert(e5 == e6, s"peel not converged: ${e5.size} vs ${e6.size} edges")
    val rows = GraphOps.kcoreMembership(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val inCore = r.getAs[Boolean]("in_3core")
      val coreDeg = r.getAs[Long]("core_deg")
      assert(coreDeg <= r.getAs[Long]("deg_full"))
      if (inCore) {
        assert(coreDeg >= 3, s"3-core member with core_deg < 3: $r")
        assert(r.getAs[Long]("deg_full") >= 3)
      } else assert(coreDeg == 0)
    }
    assert(rows.exists(_.getAs[Boolean]("in_3core")),
      "fixture must contain a non-empty 3-core")
    assert(rows.exists(r => !r.getAs[Boolean]("in_3core")),
      "peeling must actually remove someone")
  }

  // --- events_forecast_snaive -------------------------------------------

  test("snaive eval: MASE recomputes from the daily census") {
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rows = Relational.forecastSnaiveEval(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val scored = daily.keys.toSeq.filter(_._1 == t).map(_._2)
        .filter(d => daily.contains((t, d - 1)) && daily.contains((t, d - 7)))
      assert(r.getAs[Long]("n_days") == scored.size)
      val s1 = scored.map(d => math.abs(daily((t, d)) - daily((t, d - 1)))).sum
      val s7 = scored.map(d => math.abs(daily((t, d)) - daily((t, d - 7)))).sum
      assert(r.getAs[Long]("sum_abs_err_naive") == s1)
      assert(r.getAs[Long]("sum_abs_err_snaive") == s7)
      assert(r.getAs[Long]("mase_milli") == s7 * 1000 / math.max(s1, 1))
    }
  }

  // --- orders_rfm_segments ----------------------------------------------

  test("rfm: segment rollup recomputes from a hand-built scorer") {
    val ord = graft.Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000").as("day"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val maxDay = ord.map(_._2).max
    val cust = ord.groupBy(_._1).map { case (ck, rows) =>
      (ck, maxDay - rows.map(_._2).max, rows.size.toLong,
        rows.map(_._3).sum)
    }.toSeq
    val n = cust.size.toLong
    // value-quantile cutoff: rank ceil(q*N/5) in the sorted multiset
    def cutoffs(vs: Seq[Long]): Seq[Long] = {
      val sorted = vs.sorted
      (1 to 4).map(q => sorted(((q * n + 4) / 5 - 1).toInt))
    }
    val rc = cutoffs(cust.map(_._2))
    val fc = cutoffs(cust.map(_._3))
    val mc = cutoffs(cust.map(_._4 / 10000))
    def sc(v: Long, cuts: Seq[Long]): Long = 1L + cuts.count(v > _)
    val expected = cust.groupBy { case (_, r, f, m) =>
      (6L - sc(r, rc), sc(f, fc), sc(m / 10000, mc))
    }.map { case (k, rows) => k -> ((rows.size.toLong, rows.map(_._4).sum)) }
    val rows = Relational.ordersRfmSegments(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_cust")).sum == n,
      "every ordering customer lands in exactly one segment")
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val k = (r.getAs[Long]("r_score"), r.getAs[Long]("f_score"),
        r.getAs[Long]("m_score"))
      assert(Seq(k._1, k._2, k._3).forall(s => s >= 1 && s <= 5), s"$k")
      val (en, em) = expected(k)
      assert(r.getAs[Long]("n_cust") == en, s"count mismatch at $k")
      assert(r.getAs[Long]("m_cents_total") == em, s"monetary mismatch at $k")
      val seg = r.getAs[String]("segment")
      val want =
        if (k._1 >= 4 && k._2 >= 4 && k._3 >= 4) "champion"
        else if (k._2 >= 4) "loyal"
        else if (k._3 >= 4) "big_spender"
        else if (k._1 <= 2 && k._2 >= 3) "at_risk"
        else if (k._1 <= 2) "hibernating"
        else "regular"
      assert(seg == want)
    }
  }

  // --- sketch_kmv_setops ------------------------------------------------

  test("kmv set ops: union/intersection sketches recompute from raw hashes") {
    def h48(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(6).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    val du = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = du.groupBy(_._1).map { case (t, rs) =>
      t -> rs.map(x => h48(x._2.toString)).distinct.sorted
    }
    val users = du.groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).toSet }
    val k = Sketches.KmvK
    def pr(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    val rows = Sketches.kmvSetOps(spark, sfDir).collect()
    val types = byType.keys.toSeq.sorted
    assert(rows.length == types.size * (types.size - 1) / 2,
      "one row per unordered type pair")
    rows.foreach { r =>
      val (t1, t2) = (r.getAs[String]("t1"), r.getAs[String]("t2"))
      assert(t1 < t2)
      val s1 = byType(t1).take(k).toSet
      val s2 = byType(t2).take(k).toSet
      val uk = (s1 ++ s2).toSeq.sorted.take(k)
      assert(r.getAs[Long]("u_size") == uk.size)
      assert(r.getAs[Long]("u_kth") == uk.last)
      val interK = uk.count(h => s1.contains(h) && s2.contains(h)).toLong
      assert(r.getAs[Long]("inter_k") == interK)
      val estU =
        if (uk.size < k) uk.size.toDouble
        else pr((k - 1) * math.pow(2, 48) / uk.last.toDouble)
      assert(r.getAs[Double]("est_union") == estU)
      val estI =
        if (uk.size < k) interK.toDouble
        else pr((k - 1) * math.pow(2, 48) / uk.last.toDouble * interK / k.toDouble)
      assert(r.getAs[Double]("est_inter") == estI)
      val exactI = (users(t1) & users(t2)).size.toLong
      assert(r.getAs[Long]("exact_inter") == exactI)
      assert(r.getAs[Long]("exact_union") == (users(t1) | users(t2)).size.toLong)
      // the estimator must actually estimate: saturated unions land
      // within 50% of truth at k=64 (std err ≈ 1/√(k−2) ≈ 13%)
      if (uk.size == k)
        assert(math.abs(estU - (users(t1) | users(t2)).size) <=
          0.5 * (users(t1) | users(t2)).size, s"union estimate off: $r")
    }
  }

  // --- text_readability -------------------------------------------------

  test("readability: integer Flesch/FK recompute from raw text") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextAnalysis.readability(spark, sfDir).collect()
    assert(rows.length == docs.count(_._2.split(" ", -1).nonEmpty))
    rows.foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      val w = text.split(" ", -1).length.toLong
      val s = math.max(text.count(c => c == '.' || c == '!' || c == '?'), 1).toLong
      val y = "[aeiouy]+".r.findAllIn(text.toLowerCase).length.toLong
      assert(r.getAs[Long]("n_words") == w)
      assert(r.getAs[Long]("n_sentences") == s)
      assert(r.getAs[Long]("n_syllables") == y, s"syllable proxy at $r")
      val flesch = 206835L - (1015L * w) / s - (84600L * y) / w
      val fk = (390L * w) / s + (11800L * y) / w - 15590L
      assert(r.getAs[Long]("flesch_milli") == flesch)
      assert(r.getAs[Long]("fk_grade_milli") == fk)
      val band =
        if (flesch >= 90000) "very_easy" else if (flesch >= 70000) "easy"
        else if (flesch >= 50000) "medium" else if (flesch >= 30000) "hard"
        else "very_hard"
      assert(r.getAs[String]("band") == band)
    }
    // the corpus must exercise more than one band or the CASE is dead
    assert(rows.map(_.getAs[String]("band")).distinct.length > 1)
  }

  // --- mm_shot_boundaries -----------------------------------------------

  test("shot boundaries: SAD recomputes from the generator, both classes present") {
    val meta = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = VideoCodec.shotBoundaries(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(_.getAs[Long]("doc_id") % 10 == 0),
      "truncated payloads must contribute no pairs")
    val expectedPairs = meta.filter(_._1 % 10 != 0)
      .map { case (_, nc) => VideoCodec.nFrames(nc) - 1 }.sum
    assert(rows.length == expectedPairs)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val nc = meta(id)
      val (w, h) = (VideoCodec.frameW(nc), VideoCodec.frameH(nc))
      val f = r.getAs[Int]("f_from")
      assert(r.getAs[Int]("f_to") == f + 1)
      var sad = 0L
      for (x <- 0 until w; y <- 0 until h)
        sad += math.abs(
          VideoCodec.lumaAt(id, f + 1, x, y) - VideoCodec.lumaAt(id, f, x, y))
      assert(r.getAs[Long]("sad") == sad, s"SAD mismatch at $r")
      val mad = sad * 100L / (w.toLong * h)
      assert(r.getAs[Long]("mad_centi") == mad)
      assert(r.getAs[Boolean]("is_boundary") == (mad >= 1000L))
    }
    val flags = rows.map(_.getAs[Boolean]("is_boundary")).distinct
    assert(flags.length == 2, "fixture must contain both cuts and non-cuts")
  }

  // --- events_user_gini -------------------------------------------------

  test("user gini: matches the sorted-definition coefficient exactly") {
    val perUser = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    val rows = Relational.eventsUserGini(spark, sfDir).collect()
    assert(rows.length == perUser.map(_._1).distinct.length)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val cs = perUser.filter(_._1 == t).map(_._2).sorted
      val n = cs.length.toLong
      val s = cs.sum
      val ranksum = cs.zipWithIndex.map { case (c, i) => (i + 1) * c }.sum
      assert(r.getAs[Long]("n_users") == n)
      assert(r.getAs[Long]("total_events") == s)
      assert(r.getAs[Long]("rank_weighted_sum") == ranksum,
        s"grouped rank sum must equal the sorted rank sum at $t")
      val gini = (2 * ranksum - (n + 1) * s) * 1000 / (n * s)
      assert(r.getAs[Long]("gini_milli") == gini)
      assert(gini >= 0 && gini < 1000)
    }
  }

  // --- graph_core_distance ----------------------------------------------

  test("core distance: converged BFS, core at 0, Lipschitz along edges") {
    val r3 = GraphOps.bfsDepthFromCore(spark, sfDir, bfsRounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = GraphOps.bfsDepthFromCore(spark, sfDir).collect()
    val d4 = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3 == d4, "min-propagation must have reached its fixed point")
    val core = GraphOps.kcoreMembership(spark, sfDir).collect()
      .filter(_.getAs[Boolean]("in_3core")).map(_.getAs[Long]("doc_id")).toSet
    rows.foreach { r =>
      val (id, depth) = (r.getLong(0), r.getAs[Long]("depth"))
      assert(r.getAs[Boolean]("reached") == (depth >= 0))
      assert((depth == 0L) == core.contains(id),
        s"depth 0 iff 3-core member: $r")
    }
    // distance is 1-Lipschitz along edges; reachability is
    // component-wide once converged
    val edges = Dedup.winnowSharedPairsAll(spark, sfDir)
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    edges.foreach { case (a, b) =>
      val (da, db) = (d4(a), d4(b))
      assert((da >= 0) == (db >= 0), s"reachability splits edge ($a,$b)")
      if (da >= 0) assert(math.abs(da - db) <= 1,
        s"BFS depths differ by >1 across edge ($a,$b): $da vs $db")
    }
    // the winnow fixture's components are dense cliques: a component
    // either IS a 3-core or has none, so depth>0 satellites need not
    // exist at small SF — but both reach classes must
    assert(rows.exists(_.getAs[Boolean]("reached")) &&
      rows.exists(!_.getAs[Boolean]("reached")),
      "fixture must exercise both the reached and unreached branches")
  }

  // --- events_funnel_latency --------------------------------------------

  test("funnel latency: quantiles recompute from the completed funnels") {
    val lats = Relational
      .eventsFunnel(spark, sfDir, windowUs = 86400L * 1000000L).collect()
      .filter(!_.isNullAt(3))
      .map(r => (r.getAs[Long]("purchase_us") - r.getAs[Long]("view_us")) / 60000000L)
      .sorted
    val r = Relational.funnelLatency(spark, sfDir).head()
    val n = lats.length.toLong
    assert(n > 0, "the 24 h funnel must convert at sf0.001")
    assert(r.getAs[Long]("n_conv") == n)
    // domain bound from the funnel definition itself
    assert(lats.forall(l => l >= 0 && l <= 2880))
    def pct(q: Long): Long = lats(((q * n + 99) / 100 - 1).toInt)
    assert(r.getAs[Long]("p50_min") == pct(50))
    assert(r.getAs[Long]("p90_min") == pct(90))
    assert(r.getAs[Long]("p99_min") == pct(99))
    assert(r.getAs[Long]("mean_min_milli") == lats.sum * 1000 / n)
    assert(pct(50) <= pct(90) && pct(90) <= pct(99))
  }

  // --- embed_alignment --------------------------------------------------

  test("alignment: closed form equals brute-force pairwise sum, corpus pseudo-label composes") {
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0).toLong,
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 100 + 0.5).toLong).toArray))
    val rows = Similarity.embedAlignment(spark, sfDir).collect()
      .map(r => r.getAs[Long]("label") -> r).toMap
    def brute(qs: Array[Array[Long]]): Long = {
      var s = 0L
      for (i <- qs.indices; j <- i + 1 until qs.length)
        s += qs(i).zip(qs(j)).map { case (a, b) => (a - b) * (a - b) }.sum
      s
    }
    val byLabel = vecs.groupBy(_._1).map { case (l, vs) => l -> vs.map(_._2) }
    byLabel.foreach { case (l, qs) =>
      val r = rows(l)
      assert(r.getAs[Long]("n_vecs") == qs.length)
      val ssd = brute(qs)
      assert(r.getAs[Long]("ssd_centi2") == ssd,
        s"identity must equal the O(n²) pairwise sum at label $l")
      val np = qs.length.toLong * (qs.length - 1) / 2
      assert(r.getAs[Long]("mean_sq_micro") == ssd * 100 / np)
    }
    val all = rows(-1L)
    assert(all.getAs[Long]("n_vecs") == vecs.length)
    assert(all.getAs[Long]("ssd_centi2") == brute(vecs.map(_._2)),
      "the -1 pseudo-label must cover the whole corpus")
    // the fixture's labels are RANDOM (embed_label_purity measures the
    // same), so within-label spread ≈ corpus spread here — the audit's
    // value is exactly that it makes this visible as a number; pin that
    // every spread is positive and label/corpus agree within 2%
    val allMean = all.getAs[Long]("mean_sq_micro")
    byLabel.keys.foreach { l =>
      val m = rows(l).getAs[Long]("mean_sq_micro")
      assert(m > 0 && math.abs(m - allMean) * 50 < allMean,
        s"random-label fixture: spread at $l should track the corpus")
    }
  }

  // --- mm_audio_vad -----------------------------------------------------

  test("audio vad: frame gates and run lengths recompute from the generator") {
    val meta = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = AudioCodec.audioVad(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(_.getAs[Long]("doc_id") % 10 == 0),
      "truncated payloads must drop")
    assert(rows.length == meta.count(_._1 % 10 != 0))
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = AudioCodec.nSamples(meta(id))
      val silent = (0 until n).grouped(80).map { idxs =>
        idxs.map(i => math.abs(AudioCodec.sampleAt(id, i)).toLong).sum <
          12288L * idxs.length
      }.toSeq
      assert(r.getAs[Long]("n_frames") == silent.length)
      assert(r.getAs[Long]("n_silent") == silent.count(identity))
      val longest =
        if (!silent.contains(true)) 0L
        else silent.foldLeft((0L, 0L)) { case ((best, run), s) =>
          if (s) (math.max(best, run + 1), run + 1) else (best, 0L)
        }._1
      assert(r.getAs[Long]("longest_silence") == longest, s"run length at $r")
      assert(r.getAs[Long]("active_milli") ==
        (silent.length - silent.count(identity)) * 1000L / silent.length)
    }
    // the sawtooth must make the gate discriminate across the corpus
    assert(rows.exists(_.getAs[Long]("n_silent") > 0) &&
      rows.exists(_.getAs[Long]("n_silent") == 0),
      "fixture must contain both silent-bearing and fully-active docs")
  }

  // --- events_gap_census ------------------------------------------------

  test("gap census: recomputes from the distinct-day sets") {
    val days = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).sorted }
    val rows = Relational.eventsGapCensus(spark, sfDir).collect()
    assert(rows.length == days.size)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val ds = days(t)
      assert(r.getAs[Long]("n_days") == ds.length)
      assert(r.getAs[Long]("span_days") == ds.last - ds.head + 1)
      val jumps = ds.zip(ds.tail).map { case (a, b) => b - a - 1 }
      assert(r.getAs[Long]("longest_gap") ==
        (if (jumps.isEmpty) 0L else jumps.max))
      assert(r.getAs[Long]("n_gaps") == jumps.count(_ > 0))
      assert(r.getAs[Long]("completeness_milli") ==
        ds.length * 1000L / (ds.last - ds.head + 1))
    }
  }

  // --- embed_rank_corr --------------------------------------------------

  test("rank corr: Spearman recomputes from exact top-20 + hand int8 dots") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def codesOf(v: Array[Double]): Array[Long] = {
      val ma = v.map(math.abs).max
      val qs = if (ma > 0) 127.0 / ma else 0.0
      v.map(x => math.floor(x * qs + 0.5).toLong)
    }
    val exact = Similarity.annBruteForceTopK(spark, sfDir, 20).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getInt(1).toLong))
    val rows = Similarity.rankCorrInt8(spark, sfDir).collect()
      .map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(rows.size == exact.map(_._1).distinct.length)
    exact.groupBy(_._1).foreach { case (q, top) =>
      val qc = codesOf(emb(q))
      val ranked = top.map { case (_, n, re) =>
        val dot = qc.zip(codesOf(emb(n))).map { case (a, b) => a * b }.sum
        (n, re, dot)
      }.sortBy { case (n, _, dot) => (-dot, n) }
        .zipWithIndex.map { case ((_, re, _), i) => (re, i + 1L) }
      val sumD2 = ranked.map { case (re, rq) => (re - rq) * (re - rq) }.sum
      val k = ranked.length.toLong
      val r = rows(q)
      assert(r.getAs[Long]("k") == k)
      assert(r.getAs[Long]("sum_d2") == sumD2, s"sum_d2 at query $q")
      assert(r.getAs[Long]("rho_milli") ==
        1000L - 6000L * sumD2 / (k * (k * k - 1)))
    }
    // int8 at d=64 must preserve ranking better than chance
    val rhos = rows.values.map(_.getAs[Long]("rho_milli")).toSeq
    assert(rhos.sum / rhos.length > 0, s"mean rho must be positive: $rhos")
  }

  // --- events_markov_stationary -----------------------------------------

  test("markov stationary: hand-iterated power method, mass conserved up to floor leak") {
    val m = Relational.eventsTransitionMatrix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("row_total")))).toMap
    val types = m.keys.map(_._1).toSeq.distinct.sorted
    val total = m.values.map(_._1).sum
    var pi = types.map(t =>
      t -> m.filter(_._1._1 == t).head._2._2 * 1000000L / total).toMap
    var prev = pi
    for (_ <- 1 to 8) {
      prev = pi
      pi = types.map { to =>
        to -> types.flatMap(f => m.get((f, to)).map { case (n, rt) =>
          prev(f) * n / rt
        }).sum
      }.toMap
    }
    val rows = Relational.markovStationary(spark, sfDir).collect()
    assert(rows.length == types.length)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("pi_stat_micro") == pi(t), s"stationary at $t")
      assert(r.getAs[Long]("delta_micro") == math.abs(pi(t) - prev(t)))
    }
    // floor leak: each round floors types² terms, plus the π0 floor
    val mass = rows.map(_.getAs[Long]("pi_stat_micro")).sum
    val maxLeak = 8L * types.length * types.length + types.length
    assert(mass <= 1000000L && mass >= 1000000L - maxLeak,
      s"mass $mass outside the floor-leak envelope ($maxLeak)")
    // 8 rounds must have effectively converged on a 5-state chain
    assert(rows.forall(_.getAs[Long]("delta_micro") < 1000),
      "power iteration far from fixed point at the audit round")
  }

  // --- graph_modularity -------------------------------------------------

  test("modularity: Q terms recompute from edges+labels, LPA beats chance") {
    val pairs = Dedup.winnowSharedPairsAll(spark, sfDir)
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val labels = GraphOps.labelPropagation(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("community")).toMap
    val m = pairs.length.toLong
    val rows = GraphOps.modularity(spark, sfDir).collect()
    val noded = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == noded.length,
      "every noded doc lands in exactly one community row")
    rows.foreach { r =>
      val c = r.getAs[Long]("community")
      val members = noded.filter(labels(_) == c).toSet
      val ein = pairs.count(p => members(p._1) && members(p._2)).toLong
      val degSum = pairs.map(p =>
        (if (members(p._1)) 1L else 0L) + (if (members(p._2)) 1L else 0L)).sum
      assert(r.getAs[Long]("e_in") == ein, s"e_in at community $c")
      assert(r.getAs[Long]("deg_sum") == degSum)
      val qNum = 4 * m * ein - degSum * degSum
      assert(r.getAs[Long]("q_num") == qNum)
      val expectedTerm =
        if (qNum >= 0) qNum * 1000000L / (4 * m * m)
        else -(-qNum * 1000000L / (4 * m * m))
      assert(r.getAs[Long]("q_term_micro") == expectedTerm)
    }
    // dense near-dup cliques: the LPA partition must beat chance
    val q = rows.map(_.getAs[Long]("q_term_micro")).sum
    assert(q > 0, s"modularity of the near-dup communities must be positive: $q")
  }

  // --- mm_image_entropy -------------------------------------------------

  test("image entropy: recomputes from the gradient, bounded by log2 support") {
    val meta = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = ImageCodec.imageEntropy(spark, sfDir).collect()
    assert(rows.length == meta.count(_._1 % 10 != 0))
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (w, h) = ((meta(id) % 64 + 16).toInt, (meta(id) % 48 + 16).toInt)
      val hist = new Array[Long](256)
      for (x <- 0 until w; y <- 0 until h) hist(((id + x + y) % 256).toInt) += 1
      val n = w.toLong * h
      val wsum = hist.filter(_ > 0)
        .map(c => c * ImageCodec.plog2MicroJvm(c)).sum
      val ent = ImageCodec.plog2MicroJvm(n) - wsum / n
      assert(r.getAs[Long]("n_pixels") == n)
      assert(r.getAs[Long]("n_distinct") == hist.count(_ > 0))
      assert(r.getAs[Long]("entropy_micro") == ent, s"entropy at $id")
      // H ≤ log2(support) up to the piecewise-linear chord slack
      assert(ent >= 0 &&
        ent <= ImageCodec.plog2MicroJvm(hist.count(_ > 0).toLong) + 86000,
        s"entropy out of band: $r")
    }
    // dims vary, so support (and entropy) must vary across the corpus
    assert(rows.map(_.getAs[Long]("entropy_micro")).distinct.length > 1)
  }

  // --- text_ndcg_eval ---------------------------------------------------

  test("ndcg: recomputes from bm25 ranks + quality grades; ideal dominates") {
    val qm = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextAnalysis.qualityMicroCol.as("qm")).collect()
      .map(r => r.getLong(0) -> math.min(3L, r.getLong(1) / 2500)).toMap
    val ranked = TextAnalysis.bm25TopK(spark, sfDir, 10).collect()
      .map(r => (r.getAs[Int]("query_id"), r.getInt(1), r.getAs[Long]("doc_id")))
    val disc = TextAnalysis.NdcgDiscMilli
    val rows = TextAnalysis.ndcgEval(spark, sfDir).collect()
      .map(r => r.getAs[Int]("query_id") -> r).toMap
    ranked.groupBy(_._1).foreach { case (q, rs) =>
      val dcg = rs.map { case (_, rank, d) => qm(d) * disc(rank - 1) }.sum
      val idealGrades = rs.map { case (_, _, d) => (qm(d), d) }
        .sortBy { case (g, d) => (-g, d) }.map(_._1)
      val idcg = idealGrades.zipWithIndex.map { case (g, i) => g * disc(i) }.sum
      val r = rows(q)
      assert(r.getAs[Long]("n_ranked") == rs.length)
      assert(r.getAs[Long]("dcg_milli") == dcg, s"dcg at query $q")
      assert(r.getAs[Long]("idcg_milli") == idcg)
      assert(idcg >= dcg, "the ideal reorder can only improve DCG")
      if (idcg > 0)
        assert(r.getAs[Long]("ndcg_milli") == dcg * 1000 / idcg)
      else assert(r.isNullAt(r.fieldIndex("ndcg_milli")))
    }
    assert(rows.nonEmpty)
  }

  // --- events_ohlc_hourly -----------------------------------------------

  test("ohlc: bars recompute from raw events, invariants hold") {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts)").as("us"),
        col("event_id"), expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val rows = Relational.eventsOhlcHourly(spark, sfDir).collect()
    val byBar = ev.groupBy(e => (e._1, e._2 / 3600000000L))
    assert(rows.length == byBar.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[Long]("hr"))
      val bar = byBar(k)
      assert(r.getAs[Long]("n") == bar.length)
      assert(r.getAs[Long]("high_cents") == bar.map(_._4).max)
      assert(r.getAs[Long]("low_cents") == bar.map(_._4).min)
      val open = bar.minBy(e => (e._2, e._3))._4
      val close = bar.maxBy(e => (e._2, e._3))._4
      assert(r.getAs[Long]("open_cents") == open, s"open at $k")
      assert(r.getAs[Long]("close_cents") == close, s"close at $k")
      assert(r.getAs[Long]("low_cents") <= open && open <= r.getAs[Long]("high_cents"))
      assert(r.getAs[Long]("low_cents") <= close && close <= r.getAs[Long]("high_cents"))
    }
  }

  // --- mm_crossmodal_audit ----------------------------------------------

  test("crossmodal audit: hamming recomputes from per-modality hashes, F11 nulls") {
    val img = ImageCodec.imageAHash(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val aud = AudioCodec.audioFingerprint(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val pairs = Dedup.winnowSharedPairsAll(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) ->
        r.getAs[Long]("n_shared")).toMap
    val rows = Multimodal.crossmodalDedupAudit(spark, sfDir).collect()
    assert(rows.length == pairs.size, "one audit row per text near-dup pair")
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    rows.foreach { r =>
      val (i, j) = (r.getAs[Long]("id1"), r.getAs[Long]("id2"))
      assert(r.getAs[Long]("n_shared") == pairs((i, j)))
      val imgIdx = r.fieldIndex("img_ham")
      if (i % 10 == 0 || j % 10 == 0) {
        assert(r.isNullAt(imgIdx), s"failed decode must null img_ham: $r")
        assert(r.isNullAt(r.fieldIndex("audio_ham")))
        assert(r.isNullAt(r.fieldIndex("img_dup")))
      } else {
        assert(r.getInt(imgIdx) == ham(img(i), img(j)), s"img ham at ($i,$j)")
        assert(r.getAs[Int]("audio_ham") == ham(aud(i), aud(j)))
        assert(r.getAs[Boolean]("img_dup") == (ham(img(i), img(j)) <= 3))
        assert(r.getAs[Boolean]("audio_dup") == (ham(aud(i), aud(j)) <= 3))
      }
    }
  }

  // --- sketch_group_quantiles -------------------------------------------

  test("group quantiles: estimate lands within one bin width of the exact rank value") {
    val vals = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).sorted }
    val rows = Sketches.groupHistQuantiles(spark, sfDir).collect()
    assert(rows.length == vals.size * 2, "two percentiles per type")
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val cs = vals(t)
      val n = cs.length.toLong
      assert(r.getAs[Long]("n") == n)
      val q = r.getAs[Long]("q_pct")
      val exact = cs(((q * n + 99) / 100 - 1).toInt)
      val binWidth = (cs.last - cs.head + 1 + 127) / 128
      assert(math.abs(r.getAs[Long]("est_cents") - exact) <= binWidth,
        s"estimate off by more than a bin at ($t, p$q): " +
          s"est ${r.getAs[Long]("est_cents")} vs exact $exact (bin $binWidth)")
    }
  }

  // --- dedup_edit_distance ----------------------------------------------

  test("edit distance: hand Wagner-Fischer agrees, candidates skew near") {
    def lev(a: String, b: String): Long = {
      val prev = Array.tabulate(b.length + 1)(_.toLong)
      val cur = new Array[Long](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i
        for (j <- 1 to b.length)
          cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
            prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        Array.copy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length)
    }
    val texts = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Dedup.editDistancePairs(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (i, j) = (r.getAs[Long]("id1"), r.getAs[Long]("id2"))
      val d = lev(texts(i), texts(j))
      assert(r.getAs[Long]("edit_dist") == d, s"levenshtein at ($i,$j)")
      val maxLen = math.max(texts(i).length, texts(j).length).toLong
      assert(r.getAs[Long]("max_len") == maxLen)
      assert(r.getAs[Long]("edit_milli") == d * 1000 / maxLen)
      assert(r.getAs[Boolean]("is_near") == (d * 1000 / maxLen <= 200))
    }
    // winnow candidates are text-near by construction: the median
    // candidate must sit well under a random-pair distance (~1000)
    val milli = rows.map(_.getAs[Long]("edit_milli")).sorted
    assert(milli(milli.length / 2) < 800,
      s"candidate pairs should skew near: median ${milli(milli.length / 2)}")
  }

  // --- orders_basket_rules ----------------------------------------------

  test("basket rules: support/conf/lift recompute, rule identities hold") {
    val baskets = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
      .join(graft.Tables.part(spark, sfDir)
        .select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byOrder = baskets.groupBy(_._1).map { case (o, rs) => o -> rs.map(_._2).toSet }
    val n = byOrder.size.toLong
    val marg = baskets.groupBy(_._2).map { case (b, rs) => b -> rs.size.toLong }
    val rows = Relational.basketRules(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val got = rows.map(r => (r.getAs[String]("brand_a"),
      r.getAs[String]("brand_b")) -> r).toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("brand_a"), r.getAs[String]("brand_b"))
      val nab = byOrder.values.count(s => s(a) && s(b)).toLong
      assert(r.getAs[Long]("n_ab") == nab, s"pair count at ($a,$b)")
      assert(r.getAs[Long]("n_a") == marg(a) && r.getAs[Long]("n_b") == marg(b))
      assert(r.getAs[Long]("n_orders") == n)
      assert(r.getAs[Long]("support_micro") == nab * 1000000L / n)
      assert(r.getAs[Long]("conf_micro") == nab * 1000000L / marg(a))
      assert(r.getAs[Long]("lift_milli") == nab * n * 1000L / (marg(a) * marg(b)))
      // the reverse rule exists with identical n_ab (support symmetric)
      assert(got((b, a)).getAs[Long]("n_ab") == nab)
    }
  }

  // --- events_pareto_share ----------------------------------------------

  test("pareto share: cutoff is the p90 order statistic, share recomputes") {
    val perUser = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).sorted }
    val rows = Relational.eventsParetoShare(spark, sfDir).collect()
    assert(rows.length == perUser.size)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val cs = perUser(t)
      val n = cs.length.toLong
      val cutoff = cs(((9 * n + 9) / 10 - 1).toInt)
      assert(r.getAs[Long]("n_users") == n)
      assert(r.getAs[Long]("total_events") == cs.sum)
      assert(r.getAs[Long]("cutoff") == cutoff, s"p90 cutoff at $t")
      val top = cs.filter(_ >= cutoff)
      assert(r.getAs[Long]("n_top") == top.length)
      assert(r.getAs[Long]("top_events") == top.sum)
      assert(r.getAs[Long]("top_share_milli") == top.sum * 1000 / cs.sum)
      // the top decile (plus cutoff ties) must out-earn its headcount
      assert(top.sum * n >= top.length.toLong * cs.sum,
        s"top users must hold at least a proportional share at $t")
    }
  }

  // --- embed_kmeans_elbow -----------------------------------------------

  test("kmeans elbow: inertia recomputes, nested ladders are monotone") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val rows = Similarity.kmeansElbow(spark, sfDir).collect()
      .map(r => r.getAs[Long]("k_centroids") -> r).toMap
    assert(rows.keySet == Set(10L, 20L, 40L))
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val inertias = Seq(10, 20, 40).map { k =>
      val cents = emb.filter(_._1 < k).map(_._2)
      val inertia = emb.map { case (_, e) =>
        math.floor(cents.map(c => d2(e, c)).min * 10000 + 0.5).toLong
      }.sum
      val r = rows(k.toLong)
      assert(r.getAs[Long]("n_vecs") == emb.length)
      assert(r.getAs[Long]("inertia_x4") == inertia, s"inertia at k=$k")
      assert(r.getAs[Long]("mean_inertia_x4") == inertia / emb.length)
      inertia
    }
    // nested centroid sets: more centroids can only tighten the fit
    assert(inertias(0) >= inertias(1) && inertias(1) >= inertias(2),
      s"nested ladder must be monotone: $inertias")
    assert(inertias(2) > 0, "stride centroids cannot fit the corpus exactly")
  }

  // --- mm_image_edges ---------------------------------------------------

  test("image edges: gradient mass recomputes, strong edges are the wrap seams") {
    val meta = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = ImageCodec.imageEdgeDensity(spark, sfDir).collect()
    assert(rows.length == meta.count(_._1 % 10 != 0))
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (w, h) = ((meta(id) % 64 + 16).toInt, (meta(id) % 48 + 16).toInt)
      def v(x: Int, y: Int): Long = (id + x + y) % 256
      var sum = 0L; var strong = 0L; var pairs = 0L
      for (x <- 0 until w; y <- 0 until h) {
        if (x + 1 < w) {
          val d = math.abs(v(x + 1, y) - v(x, y))
          sum += d; pairs += 1; if (d >= 128) strong += 1
        }
        if (y + 1 < h) {
          val d = math.abs(v(x, y + 1) - v(x, y))
          sum += d; pairs += 1; if (d >= 128) strong += 1
        }
      }
      assert(r.getAs[Long]("n_pairs") == pairs)
      assert(r.getAs[Long]("grad_sum") == sum, s"gradient mass at $id")
      assert(r.getAs[Long]("grad_mean_centi") == sum * 100 / pairs)
      assert(r.getAs[Long]("strong_edges") == strong)
    }
    // wrap seams exist for most images — the feature must discriminate
    assert(rows.map(_.getAs[Long]("strong_edges")).distinct.length > 1)
  }

  // --- events_streak_census ---------------------------------------------

  test("streak census: per-user longest runs recompute from distinct days") {
    val ud = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val best = ud.groupBy(_._1).map { case (_, rs) =>
      val days = rs.map(_._2).sorted
      var bestRun = 1L; var run = 1L
      days.zip(days.tail).foreach { case (a, b) =>
        if (b == a + 1) { run += 1; bestRun = math.max(bestRun, run) }
        else run = 1
      }
      bestRun
    }.toSeq
    val expected = best.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rows = Relational.eventsStreakCensus(spark, sfDir).collect()
      .map(r => r.getAs[Long]("best_streak") -> r.getAs[Long]("n_users")).toMap
    assert(rows == expected, s"census mismatch: $rows vs $expected")
    assert(rows.values.sum == ud.map(_._1).distinct.length.toLong,
      "every active user lands in exactly one streak bucket")
  }

  // --- events_entropy_rate ----------------------------------------------

  test("entropy rate: recomposes from the matrix + stationary pi, bounded") {
    def plog(x: Long): Long = ImageCodec.plog2MicroJvm(x)
    val m = Relational.eventsTransitionMatrix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("row_total")))).toMap
    val pi = Relational.markovStationary(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("pi_stat_micro")).toMap
    val rows = Relational.eventsEntropyRate(spark, sfDir).collect()
    assert(rows.length == pi.size)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val cells = m.filter(_._1._1 == t)
      val rt = cells.head._2._2
      val tsum = cells.values.map { case (n, _) => n * (plog(rt) - plog(n)) }.sum
      val h = tsum / rt
      assert(r.getAs[Long]("pi_stat_micro") == pi(t))
      assert(r.getAs[Long]("cond_entropy_micro") == h, s"H at $t")
      assert(r.getAs[Long]("contrib_micro") == pi(t) * h / 1000000L)
      // H_i ∈ [0, log2(fanout)] up to the piecewise-linear chord slack
      assert(h >= 0 && h <= plog(cells.size.toLong) + 2 * 86000,
        s"conditional entropy out of band at $t: $h")
    }
    val rate = rows.map(_.getAs[Long]("contrib_micro")).sum
    assert(rate > 0, "a non-deterministic chain must have positive rate")
  }

  // --- embed_norm_profile -----------------------------------------------

  test("norm profile: median is the true per-label order statistic") {
    val norms = graft.Tables.embeddings(spark, sfDir)
      .select(col("label"), col("embedding")).collect()
      .map { r =>
        val e = r.getSeq[Float](1).map(_.toDouble)
        (r.getInt(0).toLong,
          math.floor(e.map(x => x * x).sum * 100 + 0.5).toLong)
      }
    val rows = Similarity.embedNormProfile(spark, sfDir).collect()
    val byLabel = norms.groupBy(_._1).map { case (l, rs) => l -> rs.map(_._2).sorted }
    assert(rows.length == byLabel.size)
    rows.foreach { r =>
      val l = r.getAs[Long]("label")
      val ns = byLabel(l)
      val n = ns.length.toLong
      assert(r.getAs[Long]("n_vecs") == n)
      assert(r.getAs[Long]("min_norm2_centi") == ns.head)
      assert(r.getAs[Long]("max_norm2_centi") == ns.last)
      assert(r.getAs[Long]("p50_norm2_centi") == ns(((n + 1) / 2 - 1).toInt),
        s"median at label $l")
    }
  }

  // --- mm_release_funnel ------------------------------------------------

  test("multimodal funnel: flags recompose from the component queries") {
    val ent = ImageCodec.imageEntropy(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("entropy_micro")).toMap
    val act = AudioCodec.audioVad(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("active_milli")).toMap
    val cuts = VideoCodec.shotBoundaries(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (d, rs) => d -> rs.count(_.getAs[Boolean]("is_boundary")).toLong }
    val rows = Multimodal.releaseFunnel(spark, sfDir).collect()
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(rows.length == nDocs, "one funnel row per document, failed or not")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      if (id % 10 == 0) {
        assert(!r.getAs[Boolean]("decoded"))
        assert(r.isNullAt(r.fieldIndex("textured")) &&
          r.isNullAt(r.fieldIndex("passed_all")),
          s"failed decode must null the gates: $r")
      } else {
        assert(r.getAs[Boolean]("decoded"))
        assert(r.getAs[Boolean]("textured") == (ent(id) >= 6000000L))
        assert(r.getAs[Boolean]("speech_dense") == (act(id) >= 900L))
        assert(r.getAs[Long]("n_cuts") == cuts(id))
        assert(r.getAs[Boolean]("has_cuts") == (cuts(id) >= 1))
        assert(r.getAs[Boolean]("passed_all") ==
          (ent(id) >= 6000000L && act(id) >= 900L && cuts(id) >= 1))
      }
    }
    // each gate must actually discriminate on the fixture
    val ok = rows.filter(_.getAs[Boolean]("decoded"))
    for (c <- Seq("textured", "speech_dense", "has_cuts"))
      assert(ok.map(_.getAs[Boolean](c)).distinct.length == 2,
        s"gate $c never fires or never blocks")
  }

  // --- events_new_returning ---------------------------------------------

  test("new vs returning: conservation identities hold per day and overall") {
    val ud = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val first = ud.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).min }
    val rows = Relational.eventsNewVsReturning(spark, sfDir).collect()
    assert(rows.length == ud.map(_._2).distinct.length)
    rows.foreach { r =>
      val d = r.getAs[Long]("day")
      val active = ud.filter(_._2 == d)
      val nNew = active.count(a => first(a._1) == d).toLong
      assert(r.getAs[Long]("n_new") == nNew)
      assert(r.getAs[Long]("n_returning") == active.length - nNew)
      assert(r.getAs[Long]("returning_milli") ==
        (active.length - nNew) * 1000 / active.length)
    }
    // every user is new exactly once: Σ n_new == distinct users
    assert(rows.map(_.getAs[Long]("n_new")).sum == first.size.toLong)
  }

  // --- text_quality_chi2 ------------------------------------------------

  test("quality chi2: contingency recomputes, marginals conserve, terms exact") {
    val qg = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextAnalysis.qualityMicroCol.as("qm")).collect()
      .map(r => r.getLong(0) -> math.min(3L, r.getLong(1) / 2500)).toMap
    val bands = TextAnalysis.readability(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("band")).toMap
    val expected = bands.toSeq.map { case (d, b) => (qg(d), b) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = TextAnalysis.qualityReadabilityChi2(spark, sfDir).collect()
    assert(got.length == expected.size)
    val n = bands.size.toLong
    val rowM = expected.groupBy(_._1._1).map { case (g, v) => g -> v.values.sum }
    val colM = expected.groupBy(_._1._2).map { case (b, v) => b -> v.values.sum }
    got.foreach { r =>
      val k = (r.getAs[Long]("qgrade"), r.getAs[String]("band"))
      val obs = r.getAs[Long]("obs")
      assert(obs == expected(k), s"cell $k")
      assert(r.getAs[Long]("row_n") == rowM(k._1))
      assert(r.getAs[Long]("col_n") == colM(k._2))
      val dev = obs * n - rowM(k._1) * colM(k._2)
      assert(r.getAs[Long]("chi2_term_milli") ==
        dev * dev * 1000 / (n * rowM(k._1) * colM(k._2)))
    }
    assert(got.map(_.getAs[Long]("obs")).sum == n,
      "cells must partition the corpus")
  }

  // --- orders_cohort_revenue --------------------------------------------

  test("cohort revenue: triangular table recomputes, revenue conserves") {
    val ord = graft.Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        year(col("o_orderdate").cast("timestamp")).cast("long").as("yr"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cohort = ord.groupBy(_._1).map { case (c, rs) => c -> rs.map(_._2).min }
    val rows = Relational.ordersCohortRevenue(spark, sfDir).collect()
    rows.foreach { r =>
      val (cy, oy) = (r.getAs[Long]("cohort_year"), r.getAs[Long]("order_year"))
      assert(oy >= cy, "no order can predate its customer's cohort")
      val sel = ord.filter(o => cohort(o._1) == cy && o._2 == oy)
      assert(r.getAs[Long]("n_customers") == sel.map(_._1).distinct.length)
      assert(r.getAs[Long]("n_orders") == sel.length)
      assert(r.getAs[Long]("revenue_cents") == sel.map(_._3).sum,
        s"revenue at ($cy, $oy)")
    }
    assert(rows.map(_.getAs[Long]("revenue_cents")).sum == ord.map(_._3).sum,
      "the cohort table must conserve total revenue")
    // diagonal completeness: every cohort has its own birth-year row
    val cys = rows.map(_.getAs[Long]("cohort_year")).distinct
    cys.foreach(cy => assert(rows.exists(r =>
      r.getAs[Long]("cohort_year") == cy && r.getAs[Long]("order_year") == cy)))
  }

  // --- embed_pq_distortion ----------------------------------------------

  test("pq distortion: per-subspace audit recomputes from hand encoding") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val cws = emb.filter { case (id, _) => id % 8 == 0 && id < 128 }
      .map { case (id, e) => (id / 8).toInt -> e }
    val rows = Similarity.pqDistortion(spark, sfDir).collect()
      .map(r => r.getAs[Long]("s") -> r).toMap
    assert(rows.keySet == Set(0L, 1L, 2L, 3L))
    for (s <- 0 until 4) {
      def sv(e: Array[Double]) = e.slice(s * 16, s * 16 + 16)
      val encoded = emb.toSeq.map { case (_, e) =>
        val cands = cws.toSeq.map { case (cid, c) =>
          val d = sv(e).zip(sv(c)).map { case (a, b) => (a - b) * (a - b) }.sum
          (d, cid)
        }
        val best = cands.minBy { case (d, cid) => (d, cid) }
        (best._2, math.floor(best._1 * 1000000 + 0.5).toLong)
      }
      val r = rows(s.toLong)
      assert(r.getAs[Long]("n_vecs") == emb.size)
      assert(r.getAs[Long]("total_dist_micro") == encoded.map(_._2).sum,
        s"distortion at subspace $s")
      assert(r.getAs[Long]("mean_dist_micro") ==
        encoded.map(_._2).sum / emb.size)
      val usage = encoded.groupBy(_._1).view.mapValues(_.size.toLong)
      assert(r.getAs[Long]("codes_used") == usage.size)
      assert(r.getAs[Long]("top_code_share_milli") ==
        usage.values.max * 1000 / emb.size)
    }
  }

  // --- events_ab_srm ----------------------------------------------------

  test("ab srm: hash split recomputes, chi2 small for a healthy split") {
    def h48(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(6).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    val users = graft.Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().collect().map(_.getLong(0))
    val arm = users.map(u => u -> h48(s"ab:$u") % 2).toMap
    val (ga, gb) = (arm.values.count(_ == 0).toLong, arm.values.count(_ == 1).toLong)
    val tu = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val rows = Relational.eventsAbSrm(spark, sfDir).collect()
    assert(rows.length == tu.map(_._1).distinct.length)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val us = tu.filter(_._1 == t).map(_._2)
      val ua = us.count(arm(_) == 0).toLong
      assert(r.getAs[Long]("users_a") == ua, s"arm A reach at $t")
      assert(r.getAs[Long]("users_b") == us.length - ua)
      assert(r.getAs[Long]("g_a") == ga && r.getAs[Long]("g_b") == gb)
      assert(r.getAs[Long]("reach_a_milli") == ua * 1000 / ga)
      assert(r.getAs[Long]("reach_diff_milli") ==
        ua * 1000 / ga - (us.length - ua) * 1000 / gb)
      assert(r.getAs[Long]("srm_chi2_milli") ==
        (ga - gb) * (ga - gb) * 1000 / (ga + gb))
    }
    // a correct hash split must be healthy: χ² < 3.84 (5% critical, 1 df)
    assert(rows.head.getAs[Long]("srm_chi2_milli") < 3840,
      s"hash split itself shows SRM: ${rows.head}")
  }

  // --- events_ab_lift ---------------------------------------------------

  test("ab lift: per-arm means recompute, assignment matches the SRM split") {
    def h48(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(6).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c")).collect()
      .map(r => (r.getString(0), h48(s"ab:${r.getLong(1)}") % 2, r.getLong(2)))
    val rows = Relational.eventsAbLift(spark, sfDir).collect()
    assert(rows.length == ev.map(_._1).distinct.length)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val a = ev.filter(e => e._1 == t && e._2 == 0)
      val b = ev.filter(e => e._1 == t && e._2 == 1)
      assert(r.getAs[Long]("n_a") == a.length && r.getAs[Long]("n_b") == b.length)
      assert(r.getAs[Long]("cents_a") == a.map(_._3).sum)
      assert(r.getAs[Long]("cents_b") == b.map(_._3).sum)
      val (ma, mb) = (a.map(_._3).sum * 1000 / a.length,
        b.map(_._3).sum * 1000 / b.length)
      assert(r.getAs[Long]("mean_a_mc") == ma)
      assert(r.getAs[Long]("mean_b_mc") == mb)
      assert(r.getAs[Long]("mean_diff_mc") == ma - mb)
      // no treatment exists — arm means differ only by sampling noise,
      // which at sf0.001's per-arm counts can reach ~20%; pin the
      // order of magnitude, not a tight band
      assert(ma < 2 * mb && mb < 2 * ma,
        s"null experiment shows implausible lift at $t: $ma vs $mb")
    }
  }

  // --- text_winnow_density ----------------------------------------------

  test("winnow density: bounds hold, fingerprints reconcile with the dedup chain") {
    val rows = TextAnalysis.winnowDensity(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nf) = (r.getAs[Long]("n_windows"), r.getAs[Long]("n_fps"))
      assert(r.getAs[Long]("n_grams") == nw + 3,
        "full windows = grams - w + 1 under the 32768 prefix cap")
      // Schleimer et al. §3: every selected key serves ≤ w windows and
      // every window is served → density ∈ [1/w, 1]
      assert(nf * 4 >= nw, s"density below the 1/w guarantee: $r")
      assert(nf <= nw, s"more fingerprints than windows: $r")
      assert(r.getAs[Long]("density_milli") == nf * 1000 / nw)
    }
    // expectation 2/(w+1) = 400 milli; the corpus mean must sit near it
    val mean = rows.map(_.getAs[Long]("density_milli")).sum / rows.length
    assert(mean > 300 && mean < 500, s"corpus density far from 2/(w+1): $mean")
    // reconciliation: n_fps sums to the dedup chain's fingerprint count
    val chainFps = TextAnalysis.winnowFingerprints(spark, sfDir)
      .select(col("doc_id"), col("fp_hash"), col("pos")).count()
    assert(rows.map(_.getAs[Long]("n_fps")).sum == chainFps,
      "the audit must count exactly the fingerprints the dedup chain emits")
  }

  // --- corpus_pack_waste ------------------------------------------------

  test("pack waste: audit recomputes from the packer, tokens conserve") {
    val packed = Corpus.packTokenBins(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("shard"),
        r.getAs[Long]("bin_id"), r.getAs[Long]("tokens")))
    val rows = Corpus.packWasteAudit(spark, sfDir).collect()
    val byGroup = packed.groupBy(p => (p._1, p._2))
    assert(rows.length == byGroup.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("lang"), r.getAs[Long]("shard"))
      val g = byGroup(k)
      val bins = g.groupBy(_._3).view.mapValues(_.map(_._4).sum)
      assert(r.getAs[Long]("n_bins") == bins.size)
      assert(r.getAs[Long]("packed_tokens") == g.map(_._4).sum,
        s"token conservation at $k")
      assert(r.getAs[Long]("capacity_tokens") == bins.size * 2048L)
      assert(r.getAs[Long]("fill_milli") ==
        g.map(_._4).sum * 1000 / (bins.size * 2048L))
      assert(r.getAs[Long]("max_bin_tokens") == bins.values.max)
      // concat-then-chunk: bins 0..n−2 each span a full budget, so
      // fill ≥ (n−1)/n — only a lone partial bin may run sparse
      if (bins.size > 1)
        assert(r.getAs[Long]("fill_milli") >= (bins.size - 1) * 1000L / bins.size,
          s"packing below the concat-then-chunk floor at $k: $r")
    }
    assert(rows.map(_.getAs[Long]("packed_tokens")).sum ==
      packed.map(_._4).sum, "global token conservation")
  }

  // --- graph_assortativity ----------------------------------------------

  test("assortativity: exact rational equals hand Pearson on arc degrees") {
    val pairs = Dedup.winnowSharedPairsAll(spark, sfDir)
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = pairs.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val arcs = pairs.flatMap(p => Seq((p._1, p._2), (p._2, p._1)))
      .map { case (u, v) => (deg(u), deg(v)) }
    val m = arcs.length.toLong
    val sxy = arcs.map { case (x, y) => x * y }.sum
    val sx = arcs.map(_._1).sum
    val sxx = arcs.map(x => x._1 * x._1).sum
    val r = GraphOps.degreeAssortativity(spark, sfDir).head()
    assert(r.getAs[Long]("m") == m)
    assert(r.getAs[Long]("sxy") == sxy && r.getAs[Long]("sx") == sx &&
      r.getAs[Long]("sxx") == sxx)
    val (num, den) = (m * sxy - sx * sx, m * sxx - sx * sx)
    assert(r.getAs[Long]("r_num") == num && r.getAs[Long]("r_den") == den)
    val milli = if (num >= 0) num * 1000 / den else -(-num * 1000 / den)
    assert(r.getAs[Long]("assort_milli") == milli)
    // Pearson is bounded: |r| ≤ 1 (floor keeps us inside ±1000)
    assert(math.abs(milli) <= 1000, s"correlation out of range: $milli")
    assert(den > 0, "degenerate graph: zero degree variance")
  }

  // --- embed_pq_recall --------------------------------------------------

  test("pq recall: hits recount from the two audited answer sets") {
    val bf = Similarity.annBruteForceTopK(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val pq = Similarity.pqAdcTopK(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val rows = Similarity.pqRecall(spark, sfDir).collect()
    assert(rows.length == bf.map(_._1).size)
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val truth = bf.filter(_._1 == q)
      val hits = truth.count(pq.contains).toLong
      assert(r.getAs[Long]("n_true") == truth.size)
      assert(r.getAs[Long]("n_hits") == hits, s"hit count at query $q")
      assert(r.getAs[Double]("recall") ==
        math.floor(hits.toDouble / truth.size * 10000 + 0.5) / 10000)
    }
    // the fixture's RANDOM embeddings are PQ's adversarial case, but
    // codes must still answer far above chance (top-5 of ~500 ≈ 1%)
    val mean = rows.map(_.getAs[Double]("recall")).sum / rows.length
    assert(mean > 0.05, s"PQ-ADC recall indistinguishable from chance: $mean")
  }

  // --- events_stickiness ------------------------------------------------

  test("stickiness: DAU/WAU recompute, ratio bounded by construction") {
    val ud = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val rows = Relational.eventsStickiness(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("report_day")
      val dau = ud.filter(_._2 == d).map(_._1).distinct.length.toLong
      val wau = ud.filter(u => u._2 >= d - 6 && u._2 <= d)
        .map(_._1).distinct.length.toLong
      assert(r.getAs[Long]("dau") == dau, s"DAU at $d")
      assert(r.getAs[Long]("wau") == wau, s"WAU at $d")
      assert(dau <= wau, "a daily active is weekly active by definition")
      assert(r.getAs[Long]("stickiness_milli") == dau * 1000 / wau)
      assert(r.getAs[Long]("stickiness_milli") <= 1000)
    }
  }

  // --- sketch_kmv_wau ---------------------------------------------------

  test("kmv wau: merged sketch equals k-min of the 7-day hash union") {
    def h48(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(6).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    val ud = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val k = Sketches.KmvK
    def pr(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    val rows = Sketches.kmvWau(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("report_day")
      val win = ud.filter(u => u._2 >= d - 6 && u._2 <= d)
      val hashes = win.map(u => h48(u._1.toString)).distinct.sorted
      val uk = hashes.take(k)
      assert(r.getAs[Long]("k_used") == uk.length)
      assert(r.getAs[Long]("kth_min") == uk.last, s"kth min at $d")
      val exact = win.map(_._1).distinct.length.toLong
      assert(r.getAs[Long]("exact_wau") == exact)
      val est =
        if (uk.length < k) uk.length.toDouble
        else pr((k - 1) * math.pow(2, 48) / uk.last.toDouble)
      assert(r.getAs[Double]("est_wau") == est)
      assert(r.getAs[Double]("rel_err") == pr((est - exact) / exact))
      // k=64 → std err ≈ 1/√62 ≈ 12.7%; 4σ sanity band
      assert(math.abs(r.getAs[Double]("rel_err")) < 0.5,
        s"sketch estimate far off at $d: $r")
    }
  }

  // --- graph_rich_club --------------------------------------------------

  test("rich club: ladder recomputes, clubs nest as k rises") {
    val pairs = Dedup.winnowSharedPairsAll(spark, sfDir)
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = pairs.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = GraphOps.richClub(spark, sfDir).collect()
      .map(r => r.getAs[Long]("k") -> r).toMap
    assert(rows.keySet == Set(2L, 4L, 8L))
    val stats = Seq(2, 4, 8).map { k =>
      val club = deg.filter(_._2 > k).keySet
      val e = pairs.count(p => club(p._1) && club(p._2)).toLong
      val n = club.size.toLong
      val r = rows(k.toLong)
      assert(r.getAs[Long]("n_club") == n, s"club size at k=$k")
      assert(r.getAs[Long]("e_club") == e)
      if (n >= 2) assert(r.getAs[Long]("phi_milli") ==
        2 * e * 1000 / (n * (n - 1)))
      else assert(r.isNullAt(r.fieldIndex("phi_milli")))
      (n, e)
    }
    // clubs nest: members and internal edges shrink as k rises
    assert(stats(0)._1 >= stats(1)._1 && stats(1)._1 >= stats(2)._1)
    assert(stats(0)._2 >= stats(1)._2 && stats(1)._2 >= stats(2)._2)
  }

  // --- events_hour_heatmap ----------------------------------------------

  test("hour heatmap: cells recompute, weekday shares band to 1000") {
    val ev = graft.Tables.events(spark, sfDir)
      .select(expr("unix_micros(ts)").as("us")).collect().map(_.getLong(0))
    val cells = ev.map(us => (us / 86400000000L % 7, us / 3600000000L % 24))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rows = Relational.eventsHourHeatmap(spark, sfDir).collect()
    assert(rows.length == cells.size)
    val dowTot = cells.groupBy(_._1._1).map { case (d, v) => d -> v.values.sum }
    rows.foreach { r =>
      val k = (r.getAs[Long]("dow"), r.getAs[Long]("hour"))
      assert(r.getAs[Long]("n") == cells(k), s"cell $k")
      assert(r.getAs[Long]("dow_total") == dowTot(k._1))
      assert(r.getAs[Long]("share_milli") == cells(k) * 1000 / dowTot(k._1))
    }
    // floor-milli shares per weekday band into (1000 - cells, 1000]
    rows.groupBy(_.getAs[Long]("dow")).foreach { case (d, rs) =>
      val s = rs.map(_.getAs[Long]("share_milli")).sum
      assert(s <= 1000 && s > 1000 - rs.length,
        s"dow $d share sum $s out of floor band")
    }
  }

  // --- corpus_temp_sweep ------------------------------------------------

  test("temperature sweep: rungs recompute from hashes, keep sets nest") {
    def h48(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(6).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nLang = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val cap = nLang.values.min
    val mod = 1000000L
    val m4 = mod / 1024L
    def kept(tau: Long): Map[String, Long] = docs.filter { case (id, l) =>
      val h = h48(s"temp:$id") % mod
      val h4 = h / 1024L
      val n = nLang(l)
      tau match {
        case 1000L => h * n < cap * mod
        case 500L  => h * h * n < cap * mod * mod
        case 250L  => h4 * h4 * h4 * h4 * n < cap * m4 * m4 * m4 * m4
      }
    }.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val rows = Corpus.temperatureSweep(spark, sfDir).collect()
    Seq(1000L, 500L, 250L).foreach { tau =>
      val exp = kept(tau)
      val tot = exp.values.sum
      val got = rows.filter(_.getAs[Long]("tau_milli") == tau)
      assert(got.length == exp.size, s"lang rows at tau=$tau")
      got.foreach { r =>
        val l = r.getAs[String]("lang")
        assert(r.getAs[Long]("n_kept") == exp(l), s"kept at ($tau, $l)")
        assert(r.getAs[Long]("n_lang") == nLang(l))
        assert(r.getAs[Long]("mix_share_milli") == exp(l) * 1000 / tot)
      }
    }
    // the flattening ladder nests: lower τ keeps a superset per lang
    nLang.keys.foreach { l =>
      val k = Seq(1000L, 500L, 250L).map(t => kept(t).getOrElse(l, 0L))
      assert(k(0) <= k(1) && k(1) <= k(2), s"nesting broken at $l: $k")
    }
  }

  // --- orders_backlog_aging ---------------------------------------------

  test("backlog aging: buckets recompute, open value conserves") {
    val ord = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderstatus"), col("o_orderpriority"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000").as("day"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val snap = ord.map(_._3).max
    val open = ord.filter(_._1 != "F")
    def bucket(age: Long): String =
      if (age <= 30) "0-30" else if (age <= 90) "31-90"
      else if (age <= 365) "91-365" else "365+"
    val rows = Relational.ordersBacklogAging(spark, sfDir).collect()
    rows.foreach { r =>
      val k = (r.getAs[String]("o_orderpriority"), r.getAs[String]("age_bucket"))
      val sel = open.filter(o => o._2 == k._1 && bucket(snap - o._3) == k._2)
      assert(r.getAs[Long]("n_orders") == sel.length, s"count at $k")
      assert(r.getAs[Long]("value_cents") == sel.map(_._4).sum)
      assert(r.getAs[Long]("oldest_days") == sel.map(o => snap - o._3).max)
    }
    assert(rows.map(_.getAs[Long]("n_orders")).sum == open.length.toLong,
      "every open order lands in exactly one cell")
    assert(rows.map(_.getAs[Long]("value_cents")).sum ==
      open.map(_._4).sum, "open value conserves across the census")
  }

  // --- corpus_moore_lewis -----------------------------------------------

  test("moore-lewis: in-domain docs score lower diff than out-of-domain") {
    val df = TextAnalysis.mooreLewisSelect(spark, sfDir)
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getAs[Boolean]("selected") ==
        (r.getAs[Long]("ce_diff_micro") <= 0), s"selected flag at $r")
      assert(r.getAs[Long]("ce_diff_micro") ==
        r.getAs[Long]("nll_in_micro") - r.getAs[Long]("nll_gen_micro"))
    }
    // the selector must actually discriminate: the in-domain source's
    // mean cross-entropy difference sits below the rest of the corpus
    val bySrc = df.join(
        graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("source")),
        "doc_id")
      .groupBy(col("source") === "src1")
      .agg(avg(col("ce_diff_micro"))).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(bySrc(true) < bySrc(false),
      s"src1 mean diff ${bySrc(true)} must undercut others ${bySrc(false)}")
  }

  // --- events_funnel_paths ----------------------------------------------

  test("funnel paths: census conserves attribution's path count, ranks well-formed") {
    val top = Relational.funnelPaths(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(top.nonEmpty && top.length <= 10)
    assert(top.map(_.getAs[Long]("rank")).toSeq ==
      (1L to top.length).toSeq, "ranks are dense 1..k")
    val convs = top.map(_.getAs[Long]("n_conversions"))
    assert(convs.zip(convs.tail).forall { case (a, b) => b <= a },
      "top-k is ordered by conversion count")
    top.foreach { r =>
      assert(r.getAs[Long]("total_touches") >= r.getAs[Long]("n_conversions"))
      assert(r.getAs[Long]("avg_len_milli") ==
        r.getAs[Long]("total_touches") * 1000 / r.getAs[Long]("n_conversions"))
    }
    // the unbounded census must count exactly the converted paths the
    // attribution query credits (n_first = one per path)
    val allPaths = Relational.funnelPaths(spark, sfDir, topK = Int.MaxValue)
      .agg(sum(col("n_conversions"))).head().getLong(0)
    val nPaths = Relational.attributionUShape(spark, sfDir)
      .agg(sum(col("n_first"))).head().getLong(0)
    assert(allPaths == nPaths,
      s"path census $allPaths != attribution's $nPaths converted paths")
  }

  // --- sub_window_funcs -------------------------------------------------

  test("window rank funcs: exact quotient identities against group sizes") {
    val li = graft.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Substrate.windowRankFuncs(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = li(r.getAs[String]("l_returnflag"))
      val rn = r.getAs[Long]("rn")
      assert(r.getAs[Double]("pct_rank") ==
        (rn - 1).toDouble / (n - 1).toDouble, s"pct_rank identity at $r")
      assert(r.getAs[Double]("cume") == rn.toDouble / n.toDouble,
        s"cume_dist identity at $r")
      val q = r.getAs[Long]("quartile")
      assert(q >= 1 && q <= 4)
      // rn % 997 == 0 ≥ 997 > 10, so the nth_value frame is full here
      assert(!r.isNullAt(r.fieldIndex("nth10_price_c")))
    }
  }

  // --- sub_join_order_advisor -------------------------------------------

  test("join-order advisor: actuals are true counts, exactly the cheaper plan chosen") {
    val rows = Substrate.joinOrderAdvisor(spark, sfDir).collect()
    assert(rows.length == 2)
    val byPlan = rows.map(r => r.getAs[String]("plan") -> r).toMap
    val c = graft.Tables.customer(spark, sfDir)
    val o = graft.Tables.orders(spark, sfDir)
    val l = graft.Tables.lineitem(spark, sfDir)
    val actCO = c.join(o, col("c_custkey") === col("o_custkey")).count()
    val actOL = o.join(l, col("o_orderkey") === col("l_orderkey")).count()
    assert(byPlan("customer_orders_first").getAs[Long]("act_inter") == actCO)
    assert(byPlan("orders_lineitem_first").getAs[Long]("act_inter") == actOL)
    // chosen == this plan's estimate is the (possibly tied) minimum
    val ests = rows.map(_.getAs[Long]("est_inter"))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("chosen") ==
        (r.getAs[Long]("est_inter") == ests.min), s"chosen flag wrong at $r")
    }
    assert(rows.count(_.getAs[Boolean]("chosen")) >= 1)
  }
}
