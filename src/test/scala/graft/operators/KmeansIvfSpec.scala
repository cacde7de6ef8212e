package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class KmeansIvfSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("inline training at iters = IvfIters reproduces the build-once annIvfTopK") {
    // the cross-validation pin of the class-C fix: kmeansIvfTopK trains
    // its quantizer INLINE (seed + Lloyd, no memo), annIvfTopK probes
    // the BuildOnce-memoized ivfCentroids/ivfAssignments — same seeds,
    // same iteration count must mean bit-identical answers, whatever
    // the memo/checkpoint state. collected-set compare: exceptAll on
    // these two plans trips a Catalyst GenerateExec attribute-binding
    // bug (INTERNAL_ERROR), the value comparison is what matters here
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val inline = rows(Similarity.kmeansIvfTopK(spark, sfDir, iters = Similarity.IvfIters))
    val memo = rows(Similarity.annIvfTopK(spark, sfDir))
    assert(inline == memo, s"diff: ${(inline diff memo) ++ (memo diff inline)}")
  }

  test("training does not collapse recall vs the untrained fixed-k seeds (top-5)") {
    // on structureless unit-Gaussian embeddings Lloyd mostly relabels
    // cell boundaries, so recall moves by at most a few pairs of the
    // 50 — the pin catches a training bug (e.g. a mis-ordered mean)
    // that would scatter cells and crater recall, while tolerating
    // boundary churn
    val sf = "/root/testdata/sf0.1"
    val brute = pairs(Similarity.annBruteForceTopK(spark, sf))
    val trained = pairs(Similarity.kmeansIvfTopK(spark, sf))
    val untrained = pairs(Similarity.kmeansIvfTopK(spark, sf, iters = 0))
    val rTrained = (trained & brute).size.toDouble / brute.size
    val rUntrained = (untrained & brute).size.toDouble / brute.size
    assert(rTrained >= rUntrained - 0.1,
      s"training cratered recall: trained=$rTrained untrained=$rUntrained")
    // r14 advice: the relative tolerance alone lets a training
    // regression hide inside 0.1 (5 of 50 pairs); pin the exact
    // deterministic value at this fixed seed/SF as well — recorded
    // 0.26 (13/50) at r15 HEAD. A change here is not noise: the whole
    // pipeline is deterministic, so any drop means the quantizer or
    // probe semantics changed and must be re-justified.
    assert(rTrained >= 0.26,
      s"trained recall regressed below the recorded 0.26: $rTrained")
  }

  test("pq-adc: dense ranks, ascending distances, and the ADC estimate " +
      "approximates the true distance") {
    val rows = Similarity.pqAdcTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val byQuery = rows.groupBy(_._1)
    assert(byQuery.size == 10)
    for ((q, rs) <- byQuery) {
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1 to 5), s"query $q ranks not dense")
      assert(sorted.map(_._4).sliding(2).forall(p => p(0) <= p(1)),
        s"query $q approx distances must ascend with rank")
      assert(rs.forall(_._3 != q))
    }
    // ADC vs true L2²: the quantization error is bounded by the codebook
    // granularity; on the PQ top-1 pick they must at least be the same
    // order of magnitude (catches sign/slice/indexing bugs, not recall)
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Double]]("e").toArray).toMap
    for ((q, rs) <- byQuery) {
      val (_, _, n, approx) = rs.minBy(_._2)
      val truth = emb(q).zip(emb(n)).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(approx > 0 && approx < truth * 10 + 1,
        s"query $q: ADC $approx implausible vs true $truth")
    }
  }

  test("ivf-pq: candidates come only from probed cells; residual ADC beats " +
      "plain PQ recall against brute force") {
    val sf = "/root/testdata/sf0.1"
    val brute = pairs(Similarity.annBruteForceTopK(spark, sf, k = 10))
    val ivfpq = pairs(Similarity.ivfPqTopK(spark, sf, k = 5))
    // shape invariants
    val rows = Similarity.ivfPqTopK(spark, sf).collect()
    assert(rows.groupBy(_.getLong(0)).size == 10)
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
    for ((_, rs) <- rows.groupBy(_.getLong(0))) {
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).sameElements(1 to 5))
      assert(sorted.map(_.getDouble(3)).sliding(2)
        .forall(p => p.length < 2 || p(0) <= p(1)))
    }
    // IVF-PQ is an approximation: demand SOME overlap with the true
    // top-10 (catches systematic bugs, not tuned-recall regressions)
    val overlap = (ivfpq & brute).size.toDouble / ivfpq.size
    assert(overlap > 0.1, s"ivf-pq found no true neighbors (overlap $overlap)")
  }

  test("result shape: k ranked neighbors per query, ranks dense") {
    val df = Similarity.kmeansIvfTopK(spark, sfDir)
    val perQ = df.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mr"))
    assert(perQ.filter(col("n") =!= col("mr")).count() == 0)
    assert(df.filter(col("rank") > 5).count() == 0)
    assert(df.select("query_id").distinct().count() == 10)
  }

  test("matryoshka funnel: full-width prefix or all-in shortlist recovers exactly") {
    // dPrefix = full dims → stage 1 IS the exact score → recall 1.0
    val full = Similarity.matryoshkaRecall(spark, sfDir, dPrefix = 64)
      .collect()
    assert(full.length == 10 && full.forall(_.getDouble(3) == 1.0),
      "full-width prefix must recover the exact top-k")
    // shortlist ⊇ corpus → the rerank IS brute force → recall 1.0
    val allIn = Similarity.matryoshkaRecall(spark, sfDir,
        dPrefix = 16, m = 100000).collect()
    assert(allIn.forall(_.getDouble(3) == 1.0),
      "corpus-wide shortlist must recover the exact top-k")
  }

  test("semantic decontaminate: slice membership, flag consistency, train-side neighbors") {
    val df = Similarity.semanticDecontaminate(spark, sfDir).collect()
    assert(df.nonEmpty)
    for (r <- df) {
      assert(r.getLong(0) % 10 == 7, "audited rows are the eval slice")
      assert(r.getLong(1) % 10 != 7, "the nearest neighbor is a train item")
      assert(r.getBoolean(3) == (r.getDouble(2) >= 0.35),
        "leaked must be exactly the thresholded score")
    }
    // one row per audited eval item
    assert(df.map(_.getLong(0)).distinct.length == df.length)
  }

  test("matryoshka recall bounded and n_true = k for every query") {
    val df = Similarity.matryoshkaRecall(spark, sfDir).collect()
    assert(df.length == 10)
    for (r <- df) {
      assert(r.getLong(1) == 5L, "truth is always k rows")
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 5L)
      val rec = r.getDouble(3)
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }
}
