package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative graph analytics over the near-dup document graph — the
  * companion family to [[Dedup]]'s connected-component labels: where
  * the cluster labels answer "which docs form one duplicate group",
  * PageRank answers "which docs sit at the CENTER of the duplication
  * structure" (boilerplate hubs, template sources) — the doc you keep
  * (or investigate) when a cluster collapses.
  *
  * Exact fixed-point arithmetic: ranks live in integer micro-units
  * (1e6 = rank 1.0) and every step is integer floor division
  * (`DIV` / DuckDB `//`), so the iteration is deterministic,
  * partition-order-independent, and the DuckDB oracle replays it
  * bit-for-bit — the same discipline as [[Similarity.pcaPowerTop]]'s
  * power iteration.
  *
  * Scale notes (100 TB):
  *  - the edge list (winnow-fingerprint overlap pairs) is
  *    localCheckpoint'd ONCE and reused by the degree count and every
  *    iteration — the expensive derivation behind it never re-runs
  *    (at cluster scale: a bucketed table keyed on src);
  *  - each iteration is one (src)-keyed join + one (dst)-keyed
  *    map-side-combined sum — the canonical distributed PageRank
  *    step; iterate count is a fixed small constant (unrolled), no
  *    driver-side convergence collect;
  *  - isolated documents never enter the join — they surface only in
  *    the final left join with the base rank, so the edge-side state
  *    scales with EDGES, not corpus size.
  */
object GraphOps {

  /** PageRank (damping 0.85, `iters` unrolled iterations) over the
    * undirected near-dup graph from [[Dedup.winnowSharedPairsAll]].
    * r_{k+1}(v) = 150000 + (85 * Σ_{u~v} (r_k(u) DIV deg(u))) DIV 100,
    * r_0 = 1e6 micro-units for every document. */
  def pagerankNearDup(spark: SparkSession, sfDir: String, iters: Int = 3): DataFrame = {
    val pairs = Dedup.winnowSharedPairsAll(spark, sfDir)
    val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .union(pairs.select(col("id2").as("src"), col("id1").as("dst")))
    // degree travels WITH each edge (one window over the edge shuffle),
    // so every iteration is a single (src)-keyed join — the per-pass
    // deg join is folded into the one-time materialization
    val edgesDeg = edges
      .withColumn("deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .localCheckpoint()
    val deg = edgesDeg.groupBy(col("src")).agg(max(col("deg")).as("deg"))
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"))

    var ranks = docs.select(col("doc_id"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = edgesDeg
        .join(ranks.withColumnRenamed("doc_id", "src"), "src")
        .select(col("dst"), expr("r DIV deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = docs.join(contrib.withColumnRenamed("dst", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(150000L) + expr("(85 * coalesce(s, 0L)) DIV 100")).as("r"))
        .localCheckpoint() // iterative loop: truncate the lineage per pass
    }
    ranks.join(deg.withColumnRenamed("src", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("r").as("rank_micro"),
        coalesce(col("deg"), lit(0L)).as("degree"))
  }
}
