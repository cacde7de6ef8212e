package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.PortableHash
import graft.plans.BoundedAggregates

/** Query surface of the bounded-state custom aggregates
  * ([[graft.plans.BoundedAggregates]]): a deterministic KMV
  * distinct-count sketch and a partial-aggregated per-group top-k.
  * Both exist because the window/exact formulations shuffle every row
  * per group; these shuffle O(k) per group (see the plan doc).
  */
object Sketches {

  val KmvK = 64

  /** KMV distinct-user estimate per event type. The sketch hashes with
    * the engine-portable 48-bit hash, so kth-minimum AND estimate are
    * bit-replicable in the DuckDB oracle — an oracle-checkable
    * approximate-distinct, unlike HLL (see `rowsOnly` on
    * sub_approx_aggs). Groups with fewer than k distinct values are
    * exact by construction (the sketch holds ALL their hashes). */
  def kmvDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    BoundedAggregates.register(spark)
    val est = lit((KmvK - 1) * math.pow(2, 48)) /
      element_at(col("kmv"), size(col("kmv"))).cast("double")
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        PortableHash.md5Hash48(col("user_id").cast("string")).as("h"))
      .groupBy(col("event_type"))
      .agg(call_function("kmv_sketch", col("h"), lit(KmvK)).as("kmv"))
      .select(col("event_type"),
        size(col("kmv")).cast("long").as("k_used"),
        element_at(col("kmv"), size(col("kmv"))).as("kth_min"),
        when(size(col("kmv")) < KmvK, size(col("kmv")).cast("double"))
          .otherwise(PortableRound.pround(est, 4)).as("est_distinct"))
  }

  /** KMV SLIDING WAU — the sketch answer to the query [[graft
    * .operators.Relational.eventsWau]] answers exactly: the 7-day
    * sliding distinct-user count per report day, estimated by MERGING
    * the seven daily KMV sketches (union-merge = k smallest of the
    * concatenation — the mergeability [[kmvSetOps]] proves). THE
    * scale contrast of the sketch family: the exact path fans every
    * (user, day) row out ×7 and re-distincts per report day; this
    * path fans out 64 LONGS per day — at 10⁹ DAU that is the
    * difference between shuffling the audience and shuffling 448
    * longs. The exact WAU ships alongside as the calibration twin
    * with the signed error (the histogram-quantile discipline).
    *
    * Days with < k distinct users keep their union exact by
    * construction. Full report windows only, matching the exact twin. */
  def kmvWau(spark: SparkSession, sfDir: String, k: Int = KmvK): DataFrame = {
    BoundedAggregates.register(spark)
    val daily = Tables.events(spark, sfDir)
      .select(expr("unix_micros(ts) DIV 86400000000").as("day"),
        PortableHash.md5Hash48(col("user_id").cast("string")).as("h"))
      .groupBy(col("day"))
      .agg(call_function("kmv_sketch", col("h"), lit(k)).as("kmv"))
      .localCheckpoint(eager = false) // bounds + the ×7 sketch fan-out
    val bounds = daily.agg(min(col("day")).as("min_day"),
      max(col("day")).as("max_day"))
    val merged = daily
      .select(col("day"), explode(sequence(col("day"), col("day") + 6))
        .as("report_day"), col("kmv"))
      .groupBy(col("report_day"))
      .agg(flatten(collect_list(col("kmv"))).as("all_h"))
      .withColumn("uk", slice(array_sort(array_distinct(col("all_h"))), 1, k))
      .crossJoin(broadcast(bounds))
      .filter(col("report_day") >= col("min_day") + 6 &&
        col("report_day") <= col("max_day"))
      .select(col("report_day"), size(col("uk")).cast("long").as("k_used"),
        element_at(col("uk"), size(col("uk"))).as("kth_min"))
    val est = lit((k - 1) * math.pow(2, 48)) / col("kth_min").cast("double")
    merged
      .withColumn("est_wau", when(col("k_used") < k,
        col("k_used").cast("double")).otherwise(PortableRound.pround(est, 4)))
      .join(graft.operators.Relational.eventsWau(spark, sfDir), "report_day")
      .select(col("report_day"), col("k_used"), col("kth_min"),
        col("est_wau"), col("wau").as("exact_wau"),
        PortableRound.pround(
          (col("est_wau") - col("wau").cast("double")) /
            col("wau").cast("double"), 4).as("rel_err"))
  }

  /** KMV SET ALGEBRA (Beyer et al. 2007, "On synopses for distinct-
    * value estimation under multiset operations") — the reason KMV
    * beats HLL for a lakehouse: sketches are MERGEABLE UNDER SET
    * OPERATIONS. For every event-type pair this derives union,
    * intersection, and Jaccard estimates of the distinct-USER
    * audiences from the per-type k-min sketches alone:
    *
    *   - union sketch  = k smallest of S_A ∪ S_B (identical to the
    *     k smallest of the FULL A ∪ B — any of those is among its own
    *     side's k minima, so merging sketches loses nothing);
    *   - est_union     = (k−1)·2⁴⁸ / kth-min of the union sketch;
    *   - est_inter     = est_union · |K ∩ S_A ∩ S_B| / k (the union
    *     sketch is a uniform sample of A ∪ B; membership in both
    *     sketches marks the intersection elements).
    *
    * Pairs with an unsaturated union sketch (< k hashes) are EXACT by
    * construction. The exact twin columns (one distinct + one
    * user-keyed equi-join) ship alongside as the calibration audit,
    * same pattern as [[histogramQuantiles]].
    *
    * Scale: the sketches aggregate with O(k) state and map-side
    * partials; the pair fan-out handles |types|² SKETCH ROWS (tiny,
    * broadcast), never row data — at 100 TB the set algebra costs the
    * same 5×64 longs it costs here. The portable md5-48 hash makes
    * sketch, estimates, and twins bit-replicable in the oracle. */
  def kmvSetOps(spark: SparkSession, sfDir: String, k: Int = KmvK): DataFrame = {
    BoundedAggregates.register(spark)
    val ev = Tables.events(spark, sfDir)
    val sk = ev
      .select(col("event_type"),
        PortableHash.md5Hash48(col("user_id").cast("string")).as("h"))
      .groupBy(col("event_type"))
      .agg(call_function("kmv_sketch", col("h"), lit(k)).as("kmv"))
      .localCheckpoint(eager = false) // both sides of the pair join
    val pairs = sk.select(col("event_type").as("t1"), col("kmv").as("kmv1"))
      .join(broadcast(
        sk.select(col("event_type").as("t2"), col("kmv").as("kmv2"))),
        col("t1") < col("t2"))
      .withColumn("uk", slice(
        array_sort(array_distinct(concat(col("kmv1"), col("kmv2")))), 1, k))
      .withColumn("u_size", size(col("uk")).cast("long"))
      .withColumn("u_kth", element_at(col("uk"), size(col("uk"))))
      .withColumn("inter_k", size(array_intersect(
        array_intersect(col("uk"), col("kmv1")), col("kmv2"))).cast("long"))
    // exact calibration twin: map-side distinct + one user-keyed join
    val du = ev.select(col("event_type"), col("user_id")).distinct()
      .localCheckpoint(eager = false)
    val sizes = du.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val exactI = du.select(col("event_type").as("t1"), col("user_id"))
      .join(du.select(col("event_type").as("t2"), col("user_id")), Seq("user_id"))
      .filter(col("t1") < col("t2"))
      .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("ei"))
    val estU = lit((k - 1) * math.pow(2, 48)) / col("u_kth").cast("double")
    pairs
      .join(broadcast(sizes.select(col("event_type").as("t1"), col("n").as("n1"))), Seq("t1"))
      .join(broadcast(sizes.select(col("event_type").as("t2"), col("n").as("n2"))), Seq("t2"))
      .join(exactI, Seq("t1", "t2"), "left")
      .select(col("t1"), col("t2"), col("u_size"), col("u_kth"), col("inter_k"),
        when(col("u_size") < k, col("u_size").cast("double"))
          .otherwise(PortableRound.pround(estU, 4)).as("est_union"),
        when(col("u_size") < k, col("inter_k").cast("double"))
          .otherwise(PortableRound.pround(
            estU * col("inter_k").cast("double") / lit(k.toDouble), 4))
          .as("est_inter"),
        (col("n1") + col("n2") - coalesce(col("ei"), lit(0L))).as("exact_union"),
        coalesce(col("ei"), lit(0L)).as("exact_inter"))
  }

  val CmsDepth = 4
  val CmsWidth = 1024

  /** Count-Min Sketch heavy-hitter AUDIT — the third bounded-state
    * sketch family (beside KMV distinct and bounded top-k): frequency
    * estimation whose state is a fixed d×w counter matrix regardless
    * of key cardinality. Built relationally: each event explodes into
    * `d` salted-hash cells and ONE map-side-combined aggregate
    * collapses them to ≤ d·w counter rows — at 100 TB the sketch build
    * shuffles 4096 rows, not a row per user. The estimate for a key is
    * `min` over its d counters; CMS guarantees `est ≥ exact` (one-sided
    * error ≤ ~2N/w with prob 1−(1/2)^d — Cormode & Muthukrishnan 2005).
    *
    * The salted hash is the engine-portable md5-48, so unlike a
    * library CMS the SKETCH ITSELF is bit-replicable: the DuckDB
    * oracle rebuilds the identical counter matrix and the gate
    * compares estimates exactly. Output: the exact top-k users (the
    * ground truth an audit needs anyway) with their CMS estimate and
    * overcount. */
  def cmsHeavyHitters(spark: SparkSession, sfDir: String,
      depth: Int = CmsDepth, width: Int = CmsWidth, k: Int = 20): DataFrame = {
    // lazy checkpoint: the sketch build and the exact top-k both
    // consume this projection — one parquet scan, not two
    val users = Tables.events(spark, sfDir).select(col("user_id"))
      .localCheckpoint(eager = false)
    def cell(d: org.apache.spark.sql.Column) = pmod(
      PortableHash.md5Hash48(
        concat(d.cast("string"), lit(":"), col("user_id").cast("string"))),
      lit(width.toLong))
    val dCol = explode(array((0 until depth).map(lit): _*)).as("d")
    val cms = users.select(col("user_id"), dCol)
      .withColumn("c", cell(col("d")))
      .groupBy(col("d"), col("c")).agg(count(lit(1)).as("n"))
    val top = users.groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("user_id")).limit(k)
    top.select(col("user_id"), col("exact_n"), dCol)
      .withColumn("c", cell(col("d")))
      .join(cms, Seq("d", "c"), "left")
      .groupBy(col("user_id"), col("exact_n"))
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_est"))
      .select(col("user_id"), col("exact_n"), col("cms_est"),
        (col("cms_est") - col("exact_n")).as("overcount"))
  }

  /** Top-5 events by (value DESC, event_id ASC) per event type via the
    * bounded-buffer aggregate — the shuffle carries ≤5 pairs per
    * (partition, group) instead of every row like the row_number()
    * window twin the oracle uses. */
  def topKPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    BoundedAggregates.register(spark)
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(call_function("topk_by", col("value"), col("event_id"), lit(5)).as("top"))
      .select(col("event_type"), posexplode(col("top")))
      .select(col("event_type"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("event_id"), col("col.value").as("value"))
  }

  /** Deterministic uniform k-sample per group — bottom-k by the
    * engine-portable 48-bit hash of the row id (a fixed "random" tag:
    * hashing is the classic derandomized reservoir), reusing the
    * bounded [[graft.plans.BoundedAggregates.TopKBy]] aggregate with
    * `value = −hash` (48 bits sit exactly inside the double mantissa).
    *
    * This is the eyeball/eval sampler a 100 TB pipeline needs: the
    * window formulation (row_number over a per-group hash sort — the
    * oracle) shuffles and sorts EVERY row per group, while this holds
    * O(k) state per group with map-side partials and is mergeable
    * across partitions, re-runs, and days (the same ids win every
    * time, so samples are stable across incremental ingests). */
  def groupSample(spark: SparkSession, sfDir: String, k: Int = 8): DataFrame = {
    BoundedAggregates.register(spark)
    val h = PortableHash.md5Hash48(
      concat(lit("gs:"), col("event_id").cast("string")))
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), h.as("h"))
      .groupBy(col("event_type"))
      .agg(call_function("topk_by",
        -col("h").cast("double"), col("event_id"), lit(k)).as("top"))
      .select(col("event_type"), posexplode(col("top")))
      .select(col("event_type"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("event_id"), (-col("col.value")).cast("long").as("h48"))
  }

  /** Fixed-bin histogram quantile estimator with its exact calibration
    * twin — the bounded-state way to get percentiles at 100 TB, where a
    * global sort (the exact path) is off the table. Two passes over
    * `l_extendedprice`: (1) global min/max; (2) a `bins`-bucket count
    * (map-side combined, O(bins) state). Each requested percentile is
    * answered by cumulative-walk + linear interpolation INSIDE the
    * holding bin — error provably ≤ one bin width. Prices are exact
    * integer CENTS (portable `floor(x·100+0.5)`), every later step is
    * integer arithmetic, so estimate AND error replicate bit-for-bit
    * in the oracle.
    *
    * Like [[graft.operators.Dedup.minhashEstErr]], the exact twin
    * (rank statistic via a global sort) is the CALIBRATION harness:
    * run at a small SF to validate the bin count, deploy only the
    * histogram side. The cumulative walk runs over `bins` rows — a
    * single tiny partition by design. */
  def histogramQuantiles(spark: SparkSession, sfDir: String,
      bins: Int = 256, pcts: Seq[Int] = Seq(25, 50, 75, 90, 99)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
    val li = Tables.lineitem(spark, sfDir).select(cents.as("c"))
    val stats = li.agg(min(col("c")).as("cmin"), max(col("c")).as("cmax"),
      count(lit(1)).as("n"))
    val binned = li.crossJoin(broadcast(stats))
      .select(expr(s"((c - cmin) * $bins) DIV (cmax - cmin + 1)").as("bin"),
        col("cmin"), col("cmax"), col("n"))
      .groupBy(col("bin"), col("cmin"), col("cmax"), col("n"))
      .agg(count(lit(1)).as("cnt"))
    val cum = binned.withColumn("cum_before",
      coalesce(sum(col("cnt")).over(
        Window.orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val qs = cum.crossJoin(
      spark.range(1).select(explode(
        array(pcts.map(p => lit(p.toLong)): _*)).as("q_pct")))
      .withColumn("r", expr("(q_pct * n + 99) DIV 100"))
      .filter(col("cum_before") < col("r") &&
        col("cum_before") + col("cnt") >= col("r"))
      .withColumn("lo", expr(s"cmin + (bin * (cmax - cmin + 1)) DIV $bins"))
      .withColumn("width", expr(
        s"((bin + 1) * (cmax - cmin + 1)) DIV $bins - (bin * (cmax - cmin + 1)) DIV $bins"))
      .withColumn("est_cents",
        expr("lo + ((r - cum_before) * width) DIV cnt"))
    // Exact twin WITHOUT a global sort: the histogram already tells us
    // which bin holds global rank r (cum_before < r ≤ cum_before+cnt),
    // and bin membership is a pure function of the value, so the rank-r
    // value is the (r − cum_before)-th smallest INSIDE that bin. Broadcast
    // the ≤|pcts| candidate rows, filter lineitem to the holding bins
    // (≈ n/bins rows each — the single-task volume shrinks by the bin
    // count, and `bins` is the knob that keeps it bounded as n grows),
    // then a window PARTITIONED by q_pct (never a global
    // single-partition WindowExec — PlanShapeSpec pins this).
    val cand = broadcast(qs.select(col("q_pct"), col("r"), col("est_cents"),
      col("width"), col("bin"), col("cum_before"),
      col("cmin").as("qmin"), col("cmax").as("qmax")))
    val inBin = li.join(cand,
      expr(s"((c - qmin) * $bins) DIV (qmax - qmin + 1) = bin"))
    val exact = inBin
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_pct")).orderBy(col("c"))))
      .filter(col("rn") === col("r") - col("cum_before"))
      .select(col("q_pct"), col("est_cents"), col("c").as("exact_cents"),
        (col("est_cents") - col("c")).as("err_cents"), col("width").as("bin_width"))
    exact
  }

  /** PER-GROUP histogram quantiles — [[histogramQuantiles]] lifted to
    * a grouping key (per event type here): the bounded-state way to
    * get per-key percentiles at 100 TB, where per-key sorts (the
    * window formulation) and per-key exact rank reads are both off
    * the table. Two passes: per-type min/max (tiny), then ONE
    * map-side-combined (type, bin) count; each percentile interpolates
    * inside its holding bin walked by a TYPE-PARTITIONED cumulative
    * window over the bins census. Values are exact integer cents and
    * every later step integer arithmetic, so the estimates replicate
    * bit-for-bit — same discipline as the global estimator, whose
    * calibration twin quantifies the ≤ one-bin-width error.
    *
    * Scale: state is |types|·bins counters; no sort, no per-row
    * window, the census walk is partitioned. */
  def groupHistQuantiles(spark: SparkSession, sfDir: String,
      bins: Int = 128, pcts: Seq[Int] = Seq(50, 95)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), cents.as("c"))
    val stats = ev.groupBy(col("event_type"))
      .agg(min(col("c")).as("cmin"), max(col("c")).as("cmax"),
        count(lit(1)).as("n"))
    val binned = ev.join(broadcast(stats), "event_type")
      .select(col("event_type"),
        expr(s"((c - cmin) * $bins) DIV (cmax - cmin + 1)").as("bin"),
        col("cmin"), col("cmax"), col("n"))
      .groupBy(col("event_type"), col("bin"), col("cmin"), col("cmax"), col("n"))
      .agg(count(lit(1)).as("cnt"))
    val cum = binned.withColumn("cum_before",
      coalesce(sum(col("cnt")).over(
        Window.partitionBy(col("event_type")).orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    cum.crossJoin(broadcast(spark.range(1).select(
        explode(array(pcts.map(p => lit(p.toLong)): _*)).as("q_pct"))))
      .withColumn("r", expr("(q_pct * n + 99) DIV 100"))
      .filter(col("cum_before") < col("r") &&
        col("cum_before") + col("cnt") >= col("r"))
      .withColumn("lo", expr(s"cmin + (bin * (cmax - cmin + 1)) DIV $bins"))
      .withColumn("width", expr(
        s"((bin + 1) * (cmax - cmin + 1)) DIV $bins - (bin * (cmax - cmin + 1)) DIV $bins"))
      .select(col("event_type"), col("q_pct"), col("n"),
        expr("lo + ((r - cum_before) * width) DIV cnt").as("est_cents"))
  }

  /** Deterministic WEIGHTED k-sample per group — Efraimidis–Spirakis
    * exponential-clock sampling (Efraimidis & Spirakis 2006: keep the
    * k items minimizing −ln(uᵢ)/wᵢ), derandomized the same way as
    * [[groupSample]]: the uniform uᵢ is the portable 48-bit hash of
    * the row id, so the SAME documents win on every engine, every
    * re-run, and every incremental ingest. Weighting by `n_chars`
    * makes this the byte-budget sampler a corpus release uses
    * ("sample 4 docs per source proportionally to their length" —
    * eyeball sets, human-eval slices, per-source audits).
    *
    * Portability of the KEY, not just the ranking: −ln(u) is replaced
    * by (30·10⁶ − plog2micro(h₃₀)) — the piecewise-linear integer log2
    * ([[TextAnalysis.plog2MicroSql]]; monotone, ≤0.086-bit error,
    * ranking-equivalent to ln up to the positive constant ln 2) over
    * the TOP 30 BITS of the hash (the full 48-bit value × 10⁶
    * overflows Long inside plog2micro; 30 uniform bits are far more
    * resolution than a weighted sampler needs). The key is then an
    * EXACT-INTEGER numerator divided by an exact long weight: one
    * IEEE double division of two integers both under 2⁵³, which is
    * correctly rounded and therefore BIT-IDENTICAL in any engine —
    * no libm call anywhere.
    *
    * Scale shape: identical to [[groupSample]] — the bounded `topk_by`
    * aggregate holds O(k) state per group with map-side partials,
    * while the oracle's window formulation shuffles every row. */
  def weightedSample(spark: SparkSession, sfDir: String, k: Int = 4): DataFrame = {
    BoundedAggregates.register(spark)
    val h = PortableHash.md5Hash48(
      concat(lit("ws:"), col("doc_id").cast("string"))).divide(lit(262144L)).cast("long")
    val key = (lit(30000000L) -
      expr(graft.operators.TextAnalysis.plog2MicroSql("h"))).cast("double") /
      col("n_chars").cast("double")
    Tables.documents(spark, sfDir)
      .filter(col("n_chars") > 0)
      .select(col("source"), col("doc_id"), col("n_chars"), h.as("h"))
      .select(col("source"), col("doc_id"), col("n_chars"), key.as("es_key"))
      .groupBy(col("source"))
      .agg(call_function("topk_by",
        -col("es_key"), col("doc_id"), lit(k)).as("top"))
      .select(col("source"), posexplode(col("top")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("doc_id"),
        PortableRound.pround(-col("col.value"), 6).as("es_key"))
  }
}
