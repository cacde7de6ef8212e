package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Near-dup recall checks at sf0.1 — the only SF carrying true
  * duplicates (8 exact-dup docs among 5000). */
class DedupSpec extends AnyFunSuite {
  import TestSpark.spark
  private val sf01 = "/root/testdata/sf0.1"

  private lazy val trueDupPairs: Set[(Long, Long)] = {
    Dedup.exactDupGroups(spark, sf01).collect().flatMap { r =>
      val ids = r.getAs[scala.collection.Seq[Long]]("doc_ids")
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
  }

  test("sf0.1 carries exact duplicates") {
    assert(trueDupPairs.nonEmpty)
  }

  test("minhash LSH recalls all exact-dup pairs") {
    val found = Dedup.minhashNearDupPairs(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(trueDupPairs.subsetOf(found),
      s"missing: ${trueDupPairs -- found}")
    // verified jaccard of exact dups must be 1.0
    val exact = Dedup.minhashNearDupPairs(spark, sf01)
      .filter(col("jaccard") === 1.0).count()
    assert(exact >= trueDupPairs.size)
  }

  test("simhash of exact duplicates is identical") {
    val sims = Dedup.simhash(spark, sf01)
      .select(col("doc_id"), col("simhash")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((a, b) <- trueDupPairs)
      assert(sims(a) == sims(b), s"simhash($a) != simhash($b)")
  }

  test("simhash banding recalls exact-dup pairs") {
    val cands = Dedup.simhashCandidates(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(trueDupPairs.subsetOf(cands))
  }

  test("ngram jaccard top pairs ranks exact dups first") {
    val top = Dedup.ngramJaccardTopPairs(spark, sf01).collect()
    val topPairs = top.take(trueDupPairs.size)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(topPairs == trueDupPairs)
    assert(top.head.getDouble(2) == 1.0)
  }

  test("minhash keep-first drops the later copy of every exact dup") {
    val survivors = Dedup.minhashKeepFirst(spark, sf01)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    for ((a, b) <- trueDupPairs) {
      assert(!survivors.contains(b), s"doc $b duplicates $a but survived")
    }
    // doc 0 has no smaller id to be dominated by — always survives
    assert(survivors.contains(0L))
    // keep-first drops near-dup collisions too, but never the majority
    val total = graft.Tables.documents(spark, sf01).count()
    assert(survivors.size < total && survivors.size > total / 2)
  }

  test("bucket cap: default leaves results untouched, cap=0 drops everything") {
    val dflt = Dedup.minhashNearDupPairs(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = Dedup.minhashNearDupPairs(spark, sf01, maxBucketSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dflt == uncapped, "no test-SF bucket may trip the default cap")
    val capped = Dedup.minhashNearDupPairs(spark, sf01, maxBucketSize = 0).count()
    assert(capped == 0, "cap=0 must drop every bucket from candidate generation")
    // the monitor reports exactly the buckets the cap would drop
    val buckets = Dedup.minhashLshBuckets(spark, sf01)
    assert(Dedup.oversizedBuckets(buckets, 0).count() > 0)
    assert(Dedup.oversizedBuckets(buckets, 1024).count() == 0)
  }

  test("hot-key cap: a synthetic viral key is cut, cold keys survive") {
    import spark.implicits._
    // 50 rows on one viral key, singletons elsewhere — the boilerplate
    // shape every blocked self-join must survive at corpus scale
    val rows = ((1 to 50).map(i => ("viral", i.toLong)) ++
      (1 to 5).map(i => (s"cold$i", 100L + i))).toDF("shingle", "doc_id")
    val over = Dedup.oversizedKeys(rows, Seq("shingle"), 10).collect()
    assert(over.length == 1 && over.head.getString(0) == "viral")
    assert(over.head.getAs[Long]("n_docs") == 50L)
    val kept = Dedup.capHotKeys(rows, Seq("shingle"), 10)
      .select("shingle").distinct().as[String].collect().toSet
    assert(kept == (1 to 5).map(i => s"cold$i").toSet)
  }

  test("every blocked self-join honors its cap: winnow, ngram, simhash") {
    // default caps leave the declared-oracle results untouched …
    val winDflt = Dedup.winnowSharedPairsAll(spark, sf01).count()
    val winWide = Dedup.winnowSharedPairsAll(spark, sf01, maxFpFreq = Int.MaxValue).count()
    assert(winDflt == winWide, "no test-SF fingerprint may trip the default cap")
    // ngram's cap changes Jaccard SEMANTICS (capped shingles drop out
    // of the denominator universe), so default==uncapped must hold
    // row-for-row, not just count-wise, or the DuckDB oracle silently
    // diverges the day a test-SF shingle trips the 4096 default
    val ngDflt = Dedup.ngramJaccardTopPairs(spark, sf01).collect().toSet
    val ngWide = Dedup.ngramJaccardTopPairs(spark, sf01,
      maxShingleFreq = Int.MaxValue).collect().toSet
    assert(ngDflt == ngWide, "no test-SF shingle may trip the default ngram cap")
    // containment shares the chain: default cap invisible, row-for-row
    val ctDflt = Dedup.containmentPairs(spark, sf01).collect().toSet
    val ctWide = Dedup.containmentPairs(spark, sf01,
      maxShingleFreq = Int.MaxValue).collect().toSet
    assert(ctDflt == ctWide, "no test-SF shingle may trip the containment cap")
    // … and cap=0 empties candidate generation in each path
    assert(Dedup.containmentPairs(spark, sf01, maxShingleFreq = 0).count() == 0)
    assert(Dedup.winnowSharedPairsAll(spark, sf01, maxFpFreq = 0).count() == 0)
    assert(Dedup.ngramJaccardTopPairs(spark, sf01, maxShingleFreq = 0).count() == 0)
    assert(Dedup.simhashCandidates(spark, sf01, maxBucketSize = 0).count() == 0)
    val simDflt = Dedup.simhashCandidates(spark, sf01).count()
    val simWide = Dedup.simhashCandidates(spark, sf01, maxBucketSize = Int.MaxValue).count()
    assert(simDflt == simWide, "no test-SF simhash band may trip the default cap")
  }

  test("containment pairs: driver recount, exact dups score 1.0, asymmetry vs Jaccard") {
    import org.apache.spark.sql.functions.{col, explode, size => fsize}
    val sh = Dedup.withShingles(graft.Tables.documents(spark, sf01))
      .select(col("doc_id"), col("sh")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val rows = Dedup.containmentPairs(spark, sf01).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (id1, id2, shared, n1, n2, cm) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val inter = (sh(id1) intersect sh(id2)).size.toLong
      assert(shared == inter && n1 == sh(id1).size.toLong && n2 == sh(id2).size.toLong)
      assert(cm == shared * 1000000L / math.min(n1, n2) && cm >= 700000L)
    }
    // exact duplicates (sf0.1 carries them) sit at containment 1.0
    assert(rows.exists(_.getLong(5) == 1000000L),
      "exact dups must score containment exactly 1.0")
  }

  test("substring spans: driver recount of window dup-coverage, verbatim copies near 1.0") {
    val n = 20
    val texts = graft.Tables.documents(spark, sf01)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    // global window-content census (strings, not hashes: a portable-
    // hash collision would surface here as a count mismatch)
    val census = scala.collection.mutable.Map.empty[String, Int]
    for ((_, w) <- texts; i <- 0 to w.length - n)
      census.updateWith(w.slice(i, i + n).mkString(" "))(c => Some(c.getOrElse(0) + 1))
    val rows = Dedup.substringSpanStats(spark, sf01).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (id, nt, ndw, cov, pct) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      val w = texts(id)
      assert(nt == w.length.toLong)
      val dupIdx = (0 to w.length - n)
        .filter(i => census(w.slice(i, i + n).mkString(" ")) > 1)
      assert(ndw == dupIdx.length.toLong, s"doc $id window count")
      val covered = dupIdx.flatMap(i => i until i + n).distinct.length.toLong
      assert(cov == covered && pct == covered * 1000000L / nt, s"doc $id coverage")
    }
    // sf0.1 carries exact duplicates: their coverage is exactly 100%
    assert(rows.exists(_.getLong(4) == 1000000L),
      "verbatim copies must report full duplicated coverage")
  }

  test("winnow recall sampling knob: slice truth == full truth restricted to the slice") {
    val (m, r) = (4, 1)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // Jaccard is a per-pair statistic: dropping other docs cannot
    // change it, so the slice truth must be EXACTLY the full truth
    // with both endpoints in the slice — the property that makes
    // slice-calibration honest at 100 TB
    val fullTruth = pairs(Dedup.winnowTruthPairs(spark, sf01))
    val sliceTruth = pairs(
      Dedup.winnowTruthPairs(spark, sf01, docIdModulus = m, docIdResidue = r))
    val restricted = fullTruth.filter { case (a, b) => a % m == r && b % m == r }
    assert(sliceTruth == restricted, s"slice truth diverged: " +
      s"${(sliceTruth -- restricted).take(3)} vs ${(restricted -- sliceTruth).take(3)}")
    assert(fullTruth.nonEmpty, "degenerate corpus: no truth pairs at all")
    // the candidate side restricts identically (the hot-fp cap never
    // binds at test SF — pinned by the cap test above — and a slice
    // can only lower per-fingerprint frequencies)
    val fullCand = pairs(Dedup.winnowSharedPairsAll(spark, sf01)
      .select("id1", "id2"))
    val sliceCand = pairs(Dedup.winnowSharedPairsAll(spark, sf01,
      docIdModulus = m, docIdResidue = r).select("id1", "id2"))
    assert(sliceCand == fullCand.filter { case (a, b) => a % m == r && b % m == r })
    // end-to-end: the sampled eval's n_truth is the slice truth count
    val row = Dedup.winnowRecallEval(spark, sf01,
      docIdModulus = m, docIdResidue = r).collect()(0)
    assert(row.getLong(0) == sliceTruth.size.toLong)
  }

  test("normalized dedup: formatting variants collapse, survivors are min doc_id") {
    import spark.implicits._
    val norms = Seq("Hello,  World!! (test)", "hello world test", "你好。世界",
      "  spaced   out  ").toDF("text")
      .select(Dedup.normalizeText(col("text")).as("n")).collect().map(_.getString(0))
    assert(norms(0) == "hello world test" && norms(1) == "hello world test")
    assert(norms(2) == "你好。世界", "non-ASCII text must pass through untouched")
    assert(norms(3) == "spaced out")
    // table-level: exactly one survivor per norm_hash, and it's the min doc_id
    val all = graft.Tables.documents(spark, sf01)
      .select(col("doc_id"), Dedup.normalizeText(col("text")).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = all.groupBy(_._2).map(_._2.map(_._1).min).toSet
    val got = Dedup.normalizedKeepFirst(spark, sf01).collect().map(_.getLong(0)).toSet
    assert(got == expected)
    // strictly more merging than (or equal to) exact dedup
    assert(got.size <= Dedup.exactKeepFirst(spark, sf01).count())
  }

  test("ANN LSH scores agree with brute force for shared pairs") {
    val brute = Similarity.annBruteForceTopK(spark, sf01, k = 100).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val lsh = Similarity.annLshTopK(spark, sf01).collect()
    assert(lsh.nonEmpty)
    for (r <- lsh) {
      val key = (r.getLong(0), r.getLong(2))
      brute.get(key).foreach(score => assert(score == r.getDouble(3)))
    }
  }

  test("keep-best: clusters partition ids, kept member maximizes quality") {
    import graft.TestSpark.sfDir
    val df = Dedup.keepBestRepresentative(spark, sfDir).cache()
    val labels = Dedup.clusterLabels(spark, sfDir).cache()
    // one output row per cluster; member counts re-add to the node count
    assert(df.count() == labels.select("cluster").distinct().count())
    assert(df.agg(sum("n_members")).head().getLong(0) == labels.count())
    // the kept member really is in its cluster and no member beats it
    // on (quality desc, id asc)
    val q = TextAnalysis.qualityScore(spark, sfDir)
      .select(col("doc_id").as("vec_id"), col("quality_score"))
    val members = labels.join(q, Seq("vec_id"))
    val beaten = df.join(members, Seq("cluster"))
      .filter(col("quality_score") > col("kept_quality") ||
        (col("quality_score") === col("kept_quality") &&
          col("vec_id") < col("kept_id")))
    assert(beaten.count() == 0)
    val orphan = df.join(labels,
      df("cluster") === labels("cluster") && df("kept_id") === labels("vec_id"),
      "left_anti")
    assert(orphan.count() == 0)
    df.unpersist(); labels.unpersist()
  }

  test("cluster census: partitions the corpus exactly; overhead recounts") {
    val census = Dedup.clusterCensus(spark, sf01).collect()
    assert(census.nonEmpty)
    val totalVectors = census.map(_.getLong(3)).sum
    assert(totalVectors ==
      graft.Tables.embeddings(spark, sf01).count(),
      "size classes must partition every vector exactly once")
    for (r <- census) {
      assert(r.getLong(4) == r.getLong(3) - r.getLong(1),
        "dup_overhead = vectors minus one survivor per cluster")
    }
    // singletons exist at this SF and dominate (near-dup classes are rare)
    val single = census.find(_.getLong(0) == 1L)
    assert(single.exists(_.getLong(1) > census.map(_.getLong(1)).sum / 2))
  }

  test("lsh config advisor: S-curve shape — recall falls, selectivity rises with r") {
    val rows = Dedup.lshConfigAdvisor(spark, sf01).collect()
      .map(r => (r.getLong(1), r)).sortBy(_._1) // by rows_per_band
    assert(rows.length == 6)
    val (nPairs, nDup) = (rows.head._2.getLong(2), rows.head._2.getLong(3))
    for ((_, r) <- rows) {
      assert(r.getLong(2) == nPairs && r.getLong(3) == nDup,
        "every config scores the same calibration sample")
      assert(r.getLong(4) >= 0 && r.getLong(4) <= nDup * 1000000L)
      assert(r.getLong(5) >= 0 && r.getLong(5) <= (nPairs - nDup) * 1000000L)
    }
    // r=1 (32 bands of 1 row): any shared permutation detects — every
    // exact-duplicate pair (jaccard 1.0) is caught with probability 1
    assert(rows.head._2.getDouble(6) == 1.0)
    // monotone: larger r → stricter bands → recall AND false mass fall
    for (w <- rows.toSeq.sliding(2)) {
      assert(w(1)._2.getDouble(6) <= w(0)._2.getDouble(6) + 1e-9,
        s"recall must fall with r: ${w(0)._1}->${w(1)._1}")
      assert(w(1)._2.getLong(5) <= w(0)._2.getLong(5),
        s"false-candidate mass must fall with r")
    }
  }
}
