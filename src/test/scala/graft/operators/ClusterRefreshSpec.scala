package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{spark, sfDir}

/** Refresh ≡ rebuild proof for the cluster-label IVM
  * ([[Dedup.clusterRefresh]], r16 verdict item #1), in-engine and
  * independent of the DuckDB gate: the incremental label merge (stored
  * labels + delta-bounded label-graph contraction + broadcast relabel)
  * must emit exactly the labels a one-shot star-contraction rebuild
  * over the union edge set finds — on the fixture corpus AND on a
  * constructed corpus where the day's delta edges genuinely MERGE
  * distinct day-1 components (the case a random fixture may never
  * exercise, and the only case where the merge logic can be wrong).
  */
class ClusterRefreshSpec extends AnyFunSuite {

  /** One-shot rebuild: star CC over (day-1 edges at the day-1 cap) ∪
    * (delta edges at the refreshed cap) — the maintained edge table's
    * append-only union — over all current nodes. */
  private def rebuildLabels(sfd: String): Map[Long, Long] = {
    val docs = graft.Tables.documents(spark, sfd)
    val isNew = col("doc_id") % 10 < 2
    val admitted = Dedup.incrementalDedup(spark, sfd)
      .filter(col("outcome") === "kept").select(col("doc_id"))
      .localCheckpoint()
    val oldFp = Dedup.capHotKeys(
      TextAnalysis.winnowFingerprints(docs.filter(!isNew), 4)
        .select(col("doc_id"), col("fp_hash")).distinct(),
      Seq("fp_hash"), 4096)
    val oldEdges = oldFp.select(col("fp_hash"), col("doc_id").as("id1"))
      .join(oldFp.select(col("fp_hash").as("h2"), col("doc_id").as("id2")),
        col("fp_hash") === col("h2") && col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 3).select(col("id1"), col("id2"))
    val delta = Dedup.deltaEdgesOf(spark, sfd, admitted)
      .select(col("id1"), col("id2"))
    val nodes = docs.filter(!isNew).select(col("doc_id")).unionByName(
      docs.join(admitted, Seq("doc_id"), "left_semi").select(col("doc_id")))
    GraphOps.connectedComponentsStar(
        nodes, oldEdges.unionByName(delta), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def refreshLabels(sfd: String): Map[Long, Long] =
    Dedup.clusterRefresh(spark, sfd)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("refresh equals the one-shot rebuild on the fixture corpus") {
    val refreshed = refreshLabels(sfDir)
    assert(refreshed.nonEmpty)
    assert(refreshed == rebuildLabels(sfDir))
  }

  test("delta edges merging distinct day-1 components relabel to the union min") {
    import spark.implicits._
    def run(tag: String, n: Int) = (0 until n).map(i => f"$tag$i%02d").mkString(" ")
    val p1 = run("alpha", 24) // shared by old docs 12 and 22
    val p2 = run("beta", 24)  // shared by old docs 32 and 42
    val rows = Seq(
      // day-1 corpus (% 10 >= 2): components {12, 22} and {32, 42}, 52 solo
      (12L, p1 + " " + run("afill", 6)),
      (22L, p1 + " " + run("bfill", 6)),
      (32L, p2 + " " + run("cfill", 6)),
      (42L, p2 + " " + run("dfill", 6)),
      (52L, run("esolo", 30)),
      // day-2 batch (% 10 < 2): 40 BRIDGES both components (half of
      // each phrase — Jaccard vs any one old doc ≈ 0.3, far under the
      // 0.7 admission bar), 50 is novel, 60 is an exact dup (rejected)
      (40L, run("alpha", 16) + " " + run("beta", 16)),
      (50L, run("ynew", 30)),
      (60L, p1 + " " + run("afill", 6)))
    val dir = java.nio.file.Files.createTempDirectory("cluref").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    // admission sanity: the bridge and the novel doc are kept, the
    // exact dup is not
    val outcomes = Dedup.incrementalDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(outcomes(40L) == "kept" && outcomes(50L) == "kept")
    assert(outcomes(60L) == "exact")
    // the delta must actually contain merging edges into BOTH old
    // components — otherwise this test exercises nothing
    val delta = Dedup.deltaEdgesOf(spark, dir,
        Dedup.incrementalDedup(spark, dir)
          .filter(col("outcome") === "kept").select(col("doc_id")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(delta.exists(p =>
      Set(12L, 22L).contains(p._1) || Set(12L, 22L).contains(p._2)),
      s"bridge must reach the alpha component: $delta")
    assert(delta.exists(p => Set(32L, 42L).contains(p._1) ||
      Set(32L, 42L).contains(p._2)),
      s"bridge must reach the beta component: $delta")
    val refreshed = refreshLabels(dir)
    assert(refreshed == Map(12L -> 12L, 22L -> 12L, 32L -> 12L,
      42L -> 12L, 40L -> 12L, 52L -> 52L, 50L -> 50L),
      s"merged component must relabel to the union min: $refreshed")
    assert(refreshed == rebuildLabels(dir))
  }
}
