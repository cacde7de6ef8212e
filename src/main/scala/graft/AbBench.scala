package graft

import org.apache.spark.sql.SparkSession

/** Warmed-JVM A/B micro-harness: times named DataFrame thunks
  * back-to-back, interleaved, in ONE JVM — the instrument BENCHNOTES
  * entries come from. Exists because judge-recorded perf deltas on
  * this box have shown 4.2× load-noise swings across JVMs ([[Bench]]
  * commentary); an interleaved same-process A/B is the only
  * measurement that survives that.
  *
  * Usage: `runMain graft.AbBench <sfDir> <case>[,<case>…]` where each
  * case is a key of [[cases]]. Prints one JSON line per case with the
  * per-pass times and the median.
  */
object AbBench {

  /** Each case: (label, thunk). Add pairs here when a round needs an
    * A/B that isn't a declared query (e.g. a parameter variant). */
  def cases(spark: SparkSession, sfDir: String)
      : Map[String, () => org.apache.spark.sql.DataFrame] = Map(
    "winnow_recall_full" ->
      (() => operators.Dedup.winnowRecallEval(spark, sfDir)),
    "winnow_recall_slice2" ->
      (() => operators.Dedup.winnowRecallEval(spark, sfDir,
        docIdModulus = 2, docIdResidue = 1)),
    "winnow_recall_slice4" ->
      (() => operators.Dedup.winnowRecallEval(spark, sfDir,
        docIdModulus = 4, docIdResidue = 1)),
    "skip_workload_full" ->
      (() => operators.Substrate.layoutSkipWorkload(spark, sfDir)),
    "skip_workload_zonemaps_z" ->
      (() => operators.Substrate.zoneMapsBench(spark, sfDir, "zorder")),
    "skip_workload_zonemaps_h" ->
      (() => operators.Substrate.zoneMapsBench(spark, sfDir, "hilbert")),
    "skip_workload_zonemaps_lin" ->
      (() => operators.Substrate.zoneMapsBench(spark, sfDir, "linear")),
    "lp_pairs_build" ->
      (() => operators.Dedup.winnowSharedPairsAll(spark, sfDir, minShared = 1)),
    "lp_full" ->
      (() => operators.GraphOps.linkPrediction(spark, sfDir)),
    // r12 A/B: the wedge WITHOUT the per-invocation lazy mids
    // checkpoint — now that pairs is a memo scan, ReuseExchange may
    // cover both wedge sides, and dropping the checkpoint stops the
    // per-repeat block accumulation behind the in-session slowdown.
    "lp_full_nockpt" -> { () =>
      import org.apache.spark.sql.functions._
      val pairs = operators.GraphOps.candidatePairsMaterialized(spark, sfDir)
      val und = pairs.union(
        pairs.select(col("id2").as("id1"), col("id1").as("id2")))
      val deg = und.groupBy(col("id1")).agg(count(lit(1)).as("deg"))
      val mids = und.select(col("id2").as("w"), col("id1").as("u"))
        .join(deg.select(col("id1").as("w"), col("deg")), Seq("w"))
        .filter(col("deg") >= 2 && col("deg") <= 4096)
        .select(col("w"), col("u"),
          expr(s"1000000000000 DIV (${
            operators.TextAnalysis.plog2MicroSql("deg")})").as("aa_micro"))
      val wedge = mids.select(col("w"), col("u"), col("aa_micro"))
        .join(mids.select(col("w"), col("u").as("v")), Seq("w"))
        .filter(col("u") < col("v"))
      wedge.groupBy(col("u").as("id1"), col("v").as("id2"))
        .agg(count(lit(1)).as("n_common"), sum(col("aa_micro")).as("score_micro"))
        .join(pairs, Seq("id1", "id2"), "left_anti")
        .orderBy(col("score_micro").desc, col("id1"), col("id2"))
        .limit(20)
        .select(col("id1"), col("id2"), col("n_common"), col("score_micro"))
    },
    "lp_wedge_raw" -> { () =>
      import org.apache.spark.sql.functions._
      val pairs = operators.Dedup
        .winnowSharedPairsAll(spark, sfDir, minShared = 1)
        .select(col("id1"), col("id2")).localCheckpoint()
      val und = pairs.union(
        pairs.select(col("id2").as("id1"), col("id1").as("id2")))
      val deg = und.groupBy(col("id1")).agg(count(lit(1)).as("deg"))
      val mids = und.select(col("id2").as("w"), col("id1").as("u"))
        .join(deg.select(col("id1").as("w"), col("deg")), Seq("w"))
        .filter(col("deg") >= 2 && col("deg") <= 4096)
        .select(col("w"), col("u"), col("deg")).localCheckpoint(eager = false)
      mids.join(mids.select(col("w"), col("u").as("v")), Seq("w"))
        .filter(col("u") < col("v"))
    },
    // r12 A/B: collapse middles with IDENTICAL neighbor sets into one
    // class row (near-clique template data ⇒ large classes), generate
    // each class's C(s,2) pairs ONCE with the class count as the
    // multiplier — exact same (n_common, score) sums, Σ class-distinct
    // deg² generated rows instead of Σ deg².
    // RESULT (recorded, BENCHNOTES r12): LOSES at sf0.1 — 21.4 s vs
    // 12.4 s for the join form. The 5.3× (u,v) multiplicity comes from
    // middles with DIFFERENT neighbor sets sharing pair subsets, so
    // classes barely collapse and the collect_list + array-key group +
    // double explode is pure overhead. Kept as the recorded negative.
    "lp_wedge_agg_classes" -> { () =>
      import org.apache.spark.sql.functions._
      val pairs = operators.Dedup
        .winnowSharedPairsAll(spark, sfDir, minShared = 1)
        .select(col("id1"), col("id2")).localCheckpoint()
      val und = pairs.union(
        pairs.select(col("id2").as("id1"), col("id1").as("id2")))
      val nbrs = und.groupBy(col("id2").as("w"))
        .agg(sort_array(collect_list(col("id1"))).as("ns"))
        .filter(size(col("ns")) >= 2 && size(col("ns")) <= 4096)
      val classes = nbrs.groupBy(col("ns"))
        .agg(count(lit(1)).as("n_w"))
        .withColumn("aa_micro", expr(s"1000000000000 DIV (${
          operators.TextAnalysis.plog2MicroSql("size(ns)")})"))
      classes
        .select(posexplode(col("ns")).as(Seq("i", "u")),
          col("ns"), col("n_w"), col("aa_micro"))
        .select(col("u"), explode(expr("slice(ns, i + 2, size(ns))")).as("v"),
          col("n_w"), col("aa_micro"))
        .groupBy(col("u"), col("v"))
        .agg(sum(col("n_w")).as("n"),
          sum(col("n_w") * col("aa_micro")).as("score_micro"))
    },
    "lp_wedge_agg" -> { () =>
      import org.apache.spark.sql.functions._
      val pairs = operators.Dedup
        .winnowSharedPairsAll(spark, sfDir, minShared = 1)
        .select(col("id1"), col("id2")).localCheckpoint()
      val und = pairs.union(
        pairs.select(col("id2").as("id1"), col("id1").as("id2")))
      val deg = und.groupBy(col("id1")).agg(count(lit(1)).as("deg"))
      val mids = und.select(col("id2").as("w"), col("id1").as("u"))
        .join(deg.select(col("id1").as("w"), col("deg")), Seq("w"))
        .filter(col("deg") >= 2 && col("deg") <= 4096)
        .select(col("w"), col("u"), col("deg")).localCheckpoint(eager = false)
      mids.join(mids.select(col("w"), col("u").as("v")), Seq("w"))
        .filter(col("u") < col("v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("n"))
    }) ++ wedgeAggCases(spark, sfDir) ++ ccStarCases(spark, sfDir)

  /** r13 wedge-AGGREGATE A/B (VERDICT r12 ask #4): the measured 10 s of
    * graph_link_prediction is the (u, v) aggregate over 56.4 M wedge
    * rows → 10.7 M keys. All arms share ONE memoized candidate build +
    * ONE lazily-checkpointed mids table, so only the aggregate differs:
    *  - `sum`:    the production groupBy(u, v).agg(count, sum) baseline
    *  - `packed`: (u << 32 | v) single-long grouping key — halves the
    *    key bytes through the exchange and lets HashAggregate use its
    *    single-column fast row path (valid while ids < 2³¹; a 100 TB
    *    deployment with wider ids keeps the two-column form)
    *  - `salted`: two-level aggregate — partial on (u, v, pmod(w, 16))
    *    then final on (u, v); pays a second exchange to test whether
    *    per-key multiplicity concentration is what the single-level
    *    partial aggregation is missing */
  private def wedgeAggCases(spark: SparkSession, sfDir: String)
      : Map[String, () => org.apache.spark.sql.DataFrame] = {
    import org.apache.spark.sql.functions._
    def mids() = {
      val pairs = operators.GraphOps.candidatePairsMaterialized(spark, sfDir)
      val und = pairs.union(
        pairs.select(col("id2").as("id1"), col("id1").as("id2")))
      val deg = und.groupBy(col("id1")).agg(count(lit(1)).as("deg"))
      und.select(col("id2").as("w"), col("id1").as("u"))
        .join(deg.select(col("id1").as("w"), col("deg")), Seq("w"))
        .filter(col("deg") >= 2 && col("deg") <= 4096)
        .select(col("w"), col("u"),
          expr(s"1000000000000 DIV (${
            operators.TextAnalysis.plog2MicroSql("deg")})").as("aa_micro"))
        .localCheckpoint(eager = false)
    }
    def wedge() = {
      val m = mids()
      m.join(m.select(col("w"), col("u").as("v")), Seq("w"))
        .filter(col("u") < col("v"))
    }
    Map(
      // r13 hub-cap curve (VERDICT r12 ask #1): the same declared
      // consumer at LOWERED caps, so the capped wedge bound
      // Σ_{deg≤cap} deg² is MEASURED biting — at sf0.1 (cap64 drops
      // 3976 hubs: 113 M → 1.9 M wedge rows) and at sf1 (cap256 drops
      // 48 151 of 50 000 nodes: 124 G → 73 M; the uncapped default is
      // infeasible there, which IS the contract's point).
      "lp_full_cap1024" -> (() =>
        operators.GraphOps.linkPrediction(spark, sfDir, maxHubDeg = 1024)),
      "lp_full_cap256" -> (() =>
        operators.GraphOps.linkPrediction(spark, sfDir, maxHubDeg = 256)),
      "lp_full_cap64" -> (() =>
        operators.GraphOps.linkPrediction(spark, sfDir, maxHubDeg = 64)),
      "lp_dropped_cap256" -> (() =>
        operators.GraphOps.linkPredictionDroppedHubs(spark, sfDir, maxHubDeg = 256)),
      // r13 sf1-flag mitigations, one per mechanism class (the sf1
      // decade exposed them; each arm measures the documented
      // production knob actually flattening the curve):
      //  - minhash bucket cap (class A): sf1 bucket sizes (~140 max)
      //    sit under the 1024 default, so Σ size² grew ~quadratically;
      //    cap 64 makes the cap bite
      "lsh_pairs_cap64" -> (() =>
        operators.Dedup.minhashNearDupPairs(spark, sfDir, maxBucketSize = 64)),
      //  - hyperplane-LSH width (class B): pair mass ~n²/2^planes;
      //    +4 planes should cut the purity candidate mass ~16×
      // planes = 4 pinned explicitly: the method default became
      // scale-aware (planesFor → 8 at sf1), which would silently turn
      // this arm into an 8-vs-8 no-op (r15 ADVICE)
      "purity_planes4" -> (() =>
        operators.Similarity.labelPurity(spark, sfDir, planes = 4)),
      "purity_planes8" -> (() =>
        operators.Similarity.labelPurity(spark, sfDir, planes = 8)),
      //  - IVF centroid count (class C): the r13 knob (stride 500) is
      //    now superseded by the ADOPTED fixed-k trained quantizer
      //    default; the A/B pins the adopted win — the r13-era
      //    constant-cell stride-50 policy, reconstructed inline,
      //    against the shipping default
      // fixed-k TRAINED, inline (no BuildOnce memo — a memoized thunk
      // would time a cache hit on repeat passes): train + assign +
      // probe + top-k, the annIvfTopK semantics end-to-end
      "ivf_topk_fixedk_trained" -> (() =>
        operators.Similarity.kmeansIvfTopK(spark, sfDir, iters = 2)),
      "ivf_topk_legacy_stride50" -> { () =>
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.expressions.Window
        graft.plans.CosineSimilarity.register(spark)
        def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
          call_function("cosine_sim", a.cast("array<double>"), b.cast("array<double>"))
        val emb = Tables.embeddings(spark, sfDir)
        val centroids = emb.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"))
        val wv = Window.partitionBy(col("vec_id"))
          .orderBy(col("cos_c").desc, col("cent_id"))
        val assigned = emb.crossJoin(broadcast(centroids))
          .select(col("vec_id"), col("embedding"), col("cent_id"),
            cos(col("embedding"), col("c_emb")).as("cos_c"))
          .withColumn("rn", row_number().over(wv)).filter(col("rn") === 1)
          .select(col("vec_id"), col("embedding"), col("cent_id"))
        val queries = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
        val wq = Window.partitionBy(col("query_id"))
          .orderBy(col("cos_c").desc, col("cent_id"))
        val probed = queries.crossJoin(broadcast(centroids))
          .select(col("query_id"), col("q_emb"), col("cent_id"),
            cos(col("q_emb"), col("c_emb")).as("cos_c"))
          .withColumn("rn", row_number().over(wq)).filter(col("rn") <= 2)
          .select(col("query_id"), col("q_emb"), col("cent_id"))
        val scored = probed.join(assigned, Seq("cent_id"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            operators.PortableRound.pround(
              cos(col("q_emb"), col("embedding")), 4).as("cos_sim"))
        val wt = Window.partitionBy(col("query_id"))
          .orderBy(col("cos_sim").desc, col("neighbor_id"))
        scored.withColumn("rank", row_number().over(wt))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
      },
      "lp_wagg_sum" -> { () =>
        wedge().groupBy(col("u"), col("v"))
          .agg(count(lit(1)).as("n_common"), sum(col("aa_micro")).as("score_micro"))
      },
      "lp_wagg_packed" -> { () =>
        wedge()
          .select((shiftleft(col("u"), 32) bitwiseOR col("v")).as("uv"), col("aa_micro"))
          .groupBy(col("uv"))
          .agg(count(lit(1)).as("n_common"), sum(col("aa_micro")).as("score_micro"))
          .select(shiftright(col("uv"), 32).as("u"),
            (col("uv") bitwiseAND lit(0xffffffffL)).as("v"),
            col("n_common"), col("score_micro"))
      },
      "lp_wagg_salted" -> { () =>
        wedge()
          .groupBy(col("u"), col("v"), pmod(col("w"), lit(16)).as("salt"))
          .agg(count(lit(1)).as("n1"), sum(col("aa_micro")).as("s1"))
          .groupBy(col("u"), col("v"))
          .agg(sum(col("n1")).as("n_common"), sum(col("s1")).as("score_micro"))
      })
  }

  /** r17 star-CC round-shape A/B (the optimization round's shared-
    * primitive target: storedClusterLabels, split churn/balance/
    * clustered, cluster census, cc_star, keep_best all pay the star
    * loop). All arms share ONE eagerly-materialized day-1 winnow edge
    * table + node list, so the timed region is ONLY the contraction
    * loop: per round, "base" = r16 shape (eager large-star checkpoint,
    * groupBy+join both stars), "lazyls" = large-star checkpoint LAZY
    * (one fewer driver-synchronized job per round; the small-star
    * checkpoint job materializes it), "window" = large-star min via a
    * partition window (one exchange + sort replaces agg + join). */
  private def ccStarCases(spark: SparkSession, sfDir: String)
      : Map[String, () => org.apache.spark.sql.DataFrame] = {
    import org.apache.spark.sql.functions._
    lazy val day1 = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 >= 2)
    lazy val nodes = day1.select(col("doc_id")).localCheckpoint()
    lazy val edges = {
      val fp = operators.Dedup.capHotKeys(
        operators.TextAnalysis.winnowFingerprints(day1, 4)
          .select(col("doc_id"), col("fp_hash")).distinct(),
        Seq("fp_hash"), 4096)
      fp.select(col("fp_hash"), col("doc_id").as("id1"))
        .join(fp.select(col("fp_hash").as("h2"), col("doc_id").as("id2")),
          col("fp_hash") === col("h2") && col("id1") < col("id2"))
        .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 3).select(col("id1"), col("id2"))
        .localCheckpoint()
    }
    // Arms SET a session conf; build the DataFrame (the conf is read
    // at construction) then UNSET so an interleaved run mixing a
    // variant arm with a plain case measures the default, not the
    // last-set variant (r17 ADVICE).
    def withConf[A](key: String, value: String)(body: => A): A = {
      spark.conf.set(key, value)
      try body finally spark.conf.unset(key)
    }
    def arm(variant: String) = () =>
      withConf("graft.ccstar.variant", variant)(
        operators.GraphOps.connectedComponentsStar(nodes, edges, "doc_id"))
    Map("cc_day1_base" -> arm("base"),
      "cc_day1_lazyls" -> arm("lazyls"),
      "cc_day1_window" -> arm("window")) ++ {
      // r17 wedge-shape A/B (full declared query; the candidate memo is
      // shared, so arms time wedge + aggregate + anti-join + top-k):
      // nockpt = r12 shape (probe side projects without aa_micro — its
      // exchange subtree canonicalizes DIFFERENT, reuse doesn't fire in
      // the initial plan), symmetric = both sides project aa_micro so
      // the exchange subtrees are equal, ckpt = mids materialized once.
      def lpArm(variant: String) = () =>
        withConf("graft.lp.wedge", variant)(
          operators.GraphOps.linkPrediction(spark, sfDir))
      Map("lp_wedge_nockpt" -> lpArm("nockpt"),
        "lp_wedge_symmetric" -> lpArm("symmetric"),
        "lp_wedge_ckpt" -> lpArm("ckpt"),
        // r18: pair generation via per-middle sorted neighbor arrays
        // (no self-join; d(d-1)/2 rows materialized instead of d²)
        "lp_wedge_grouped" -> lpArm("grouped"))
    } ++ {
      // r17 probe: what the interpreted-HOF shingle projection costs
      // per full-corpus evaluation (the verify stages of five minhash
      // operators compute it for ALL docs then join to a small
      // candidate set — if this probe is material, the semi-join
      // belongs BELOW the projection).
      import org.apache.spark.sql.functions._
      Map(
        "probe_docs_scan" -> (() =>
          Tables.documents(spark, sfDir)
            .select(col("doc_id"), length(col("text")).as("n"))),
        "probe_shingles_all" -> (() =>
          operators.Dedup.withShingles(Tables.documents(spark, sfDir))
            .select(col("doc_id"), size(col("sh")).as("n"))))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cs = cases(spark, sfDir)
    def once(n: String): Double = {
      val t0 = System.nanoTime()
      cs(n)().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // Bench-boundary hygiene (r18): without the sweep + GC, lazy
      // checkpoint blocks and garbage from pass N land inside pass
      // N+1's timed window — observed as 7→40 s swings on unchanged
      // arms, which drowns any A/B signal.
      operators.BuildOnce.releaseScoped(spark, blocking = true)
      System.gc()
      Thread.sleep(200)
      dt
    }
    names.foreach(once) // warm-up pass, unreported
    val passes =
      sys.env.get("SPARK_GRAFT_AB_PASSES").map(_.toInt).getOrElse(3)
    val times = collection.mutable.Map.empty[String, Vector[Double]]
    for (_ <- 1 to passes; n <- names)
      times(n) = times.getOrElse(n, Vector.empty) :+ once(n)
    for (n <- names) {
      val ts = times(n)
      val med = ts.sorted.apply(ts.size / 2)
      println(s"""{"case":"$n","passes":[${
        ts.map(t => f"$t%.3f").mkString(",")}],"median":${f"$med%.3f"}}""")
    }
    spark.stop()
  }
}
