package graft.operators

import org.apache.spark.sql.functions.{col, max}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Corpus-prep + clustering unit semantics (the DuckDB oracle covers
  * the full queries; these pin the operator cores on known inputs).
  */
class CorpusSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("connectedComponents: chain, triangle, and singletons converge to min labels") {
    val nodes = (0L to 9L).toDF("id")
    // chain 1-2-3-4, triangle 5-6-7 (+redundant edge), 0/8/9 singletons
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 7L), (5L, 7L))
      .toDF("id1", "id2")
    val labels = Dedup.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L, 9L -> 9L))
  }

  test("connectedComponents converges on a long chain well under maxIter (star rounds ~ log n)") {
    val n = 12L
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("id1", "id2")
    val labels = Dedup.connectedComponents(nodes, edges, maxIter = 15)
      .collect().map(r => r.getLong(1)).distinct
    assert(labels.toSeq == Seq(0L)) // one component, min label 0
  }

  test("split leakage audit reconciles with the edge list; clustered split is leak-free and total") {
    // audit totals = the materialized near-dup edge count, exactly
    val edges = Dedup.winnowEdgesMaterialized(spark, sfDir)
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val audit = Corpus.splitLeakage(spark, sfDir).collect()
    assert(audit.map(_.getLong(2)).sum == edges.length,
      "per-split-pair edge counts must sum to the full edge list")
    // recount the leaking edges brute-force from the doc-hash split
    val split = Corpus.stratifiedSplit(spark, sfDir)
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val leaks = edges.count { case (a, b) => split(a) != split(b) }
    assert(audit.filter(_.getBoolean(3)).map(_.getLong(2)).sum == leaks,
      "flagged rows must carry exactly the cross-split edges")
    // clustered split: every doc assigned once, crossings exactly zero
    val cs = Corpus.clusteredSplit(spark, sfDir).collect()
    assert(cs.map(_.getLong(3)).distinct.sameElements(Array(0L)),
      "cluster-hashed split must produce zero cross-split edges")
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(cs.map(_.getLong(1)).sum == nDocs,
      "every document lands in exactly one split")
  }

  test("split balance reconciles with a brute-force recount over the cluster labels") {
    import org.apache.spark.sql.functions.{concat, lit}
    val docs = graft.Tables.documents(spark, sfDir)
    val edges = Dedup.winnowEdgesMaterialized(spark, sfDir)
      .select(col("id1"), col("id2"))
    val lab = Dedup.connectedComponents(docs.select(col("doc_id")), edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val toks = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length.toLong).toMap
    // split-of-cluster via the same portable hash, evaluated as data
    val bucketOf = lab.values.toSeq.distinct.toDF("cluster")
      .select(col("cluster"),
        (graft.functions.PortableHash.md5Hash48(
          concat(lit("csplit:"), col("cluster").cast("string"))) % 100).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def splitOf(c: Long): String = {
      val b = bucketOf(c)
      if (b < 80) "train" else if (b < 90) "validation" else "test"
    }
    val byDoc = lab.toSeq.map { case (d, c) => (splitOf(c), c, toks(d)) }
    val grouped = byDoc.groupBy(_._1)
    val totalMass = byDoc.map(_._3).sum
    val rows = Corpus.splitBalance(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet == grouped.keySet)
    for (r <- rows) {
      val g = grouped(r.getString(0))
      val mass = g.map(_._3).sum
      val top = g.groupBy(_._2).map(_._2.map(_._3).sum).max
      assert(r.getLong(1) == g.size, s"n_docs ${r.getString(0)}")
      assert(r.getLong(2) == g.map(_._2).distinct.size, s"n_clusters ${r.getString(0)}")
      assert(r.getLong(3) == mass, s"token_mass ${r.getString(0)}")
      assert(r.getLong(4) == mass * 1000000L / totalMass, s"share ${r.getString(0)}")
      assert(r.getLong(5) == top * 1000000L / mass, s"top share ${r.getString(0)}")
      val target = if (r.getString(0) == "train") 800000L else 100000L
      assert(r.getLong(6) == target)
      assert(r.getBoolean(7) == (math.abs(r.getLong(4) - target) > 50000L))
      assert(r.getBoolean(8) == (r.getLong(5) > 500000L))
    }
    // floor-division shares: sum to 1e6 minus at most |splits| units
    val shareSum = rows.map(_.getLong(4)).sum
    assert(shareSum <= 1000000L && shareSum >= 1000000L - rows.length)
    assert(rows.map(_.getLong(1)).sum == lab.size,
      "every document lands in exactly one split")
  }

  test("split churn matrix reconciles with the stored→refreshed label recount") {
    import org.apache.spark.sql.functions.{concat, lit}
    val stored = Dedup.storedClusterLabels(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val refreshed = Dedup.clusterRefresh(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(refreshed.size >= stored.size, "refresh keeps every day-1 doc")
    val clusters = (stored.values ++ refreshed.values).toSeq.distinct
    val bucketOf = clusters.toDF("cluster")
      .select(col("cluster"),
        (graft.functions.PortableHash.md5Hash48(
          concat(lit("csplit:"), col("cluster").cast("string"))) % 100).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def splitOf(c: Long): String = {
      val b = bucketOf(c)
      if (b < 80) "train" else if (b < 90) "validation" else "test"
    }
    val cells = refreshed.toSeq.map { case (d, c2) =>
      (stored.get(d).map(splitOf).getOrElse("new"), splitOf(c2), d)
    }
    val expected = cells.groupBy(c => (c._1, c._2))
      .map { case (k, v) => k -> (v.size.toLong, v.map(_._3).min) }
    val rows = Corpus.splitChurn(spark, sfDir).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(4))).toMap == expected)
    for (r <- rows)
      assert(r.getBoolean(3) ==
        (r.getString(0) != r.getString(1) && r.getString(0) != "new"))
    assert(rows.map(_.getLong(2)).sum == refreshed.size,
      "matrix covers every refreshed doc exactly once")
  }

  test("lang balance: every language downsamples to ≈ the smallest one") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, sfDir)
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cap = before.values.min
    val after = Corpus.langBalance(spark, sfDir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after.keySet == before.keySet, "no language may vanish")
    for ((lang, n) <- after) {
      assert(n <= before(lang))
      // hash-binomial around cap·(n_lang·cap/n_lang)/n_lang = cap: allow 4·sqrt
      val tol = 4 * math.sqrt(cap.toDouble) + 1
      assert(math.abs(n - cap) <= tol, s"$lang kept $n, expected ≈$cap")
    }
    // deterministic: second run is identical row-for-row
    val a = Corpus.langBalance(spark, sfDir).collect().map(_.getLong(0)).sorted
    val b = Corpus.langBalance(spark, sfDir).collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  test("temperature sample: kept share scales with sqrt(n_lang)") {
    val docs = graft.Tables.documents(spark, sfDir)
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cap = before.values.min
    val after = Corpus.temperatureSample(spark, sfDir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after.keySet == before.keySet)
    for ((lang, n) <- after) {
      val expected = math.sqrt(cap.toDouble * before(lang))
      assert(math.abs(n - expected) <= 4 * math.sqrt(expected) + 1,
        s"$lang kept $n, expected ≈$expected")
    }
    // strictly between full flattening and the raw mixture for the
    // largest language
    val big = before.maxBy(_._2)._1
    assert(after(big) > cap && after(big) < before(big))
  }

  test("vocab/bpe/pmi: counts recount, pairs well-formed, scores consistent") {
    import org.apache.spark.sql.functions.col
    val toks = graft.Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").collect().map(_.getString(0))
    val counts = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // vocab: descending, boundary-correct, counts exact
    val vocab = Corpus.vocabTopK(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(vocab.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    for ((w, n) <- vocab) assert(counts(w) == n, s"vocab count mismatch for '$w'")
    // bpe: every pair is two chars from an [a-z]+ word; recount one pair
    val merges = Corpus.bpeFirstMerges(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(merges.nonEmpty && merges.forall { case (p, n) =>
      p.length == 2 && p.forall(c => c >= 'a' && c <= 'z') && n > 0 })
    val (topPair, topN) = merges.head
    val expectedTopN = counts.iterator.collect { case (w, f)
      if w.matches("^[a-z]+$") && w.length >= 2 =>
        f * w.sliding(2).count(_ == topPair) }.sum
    assert(expectedTopN == topN, s"pair '$topPair': $topN vs recount $expectedTopN")
    // pmi: recompute the rational score for every returned row
    val nTokens = toks.length.toLong
    val pmi = Corpus.pmiTopK(spark, sfDir).collect()
    assert(pmi.nonEmpty)
    for (r <- pmi) {
      val (w1, w2, cp, score) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
      assert(cp >= 5)
      val expect = (cp * nTokens).toDouble / (counts(w1) * counts(w2))
      assert(math.abs(score - expect) < 1e-5, s"($w1,$w2): $score vs $expect")
    }
  }

  /** Driver-side reference of the sequential learner: k rounds of
    * (weighted adjacent-token-pair count → (n desc, pair asc) argmax →
    * literal single-pass replace), the exact semantics the Spark
    * learner and the DuckDB oracle both implement. */
  private def referenceBpe(freqs: Map[String, Long], k: Int)
      : (Seq[(String, Long)], Map[String, String]) = {
    var spaced = freqs.keys.map(w => w -> ("" + w.map(" " + _).mkString + " ")).toMap
    val rules = Seq.newBuilder[(String, Long)]
    for (_ <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      for ((w, s) <- spaced) {
        val tk = s.trim.split(" ")
        for (i <- 0 until tk.length - 1)
          counts.updateWith(tk(i) + " " + tk(i + 1))(c => Some(c.getOrElse(0L) + freqs(w)))
      }
      val (pair, n) = counts.minBy { case (p, c) => (-c, p) }
      rules += ((pair, n))
      val (pat, rep) = (" " + pair + " ", " " + pair.replace(" ", "") + " ")
      spaced = spaced.view.mapValues(_.replace(pat, rep)).toMap
    }
    (rules.result(), spaced.view.mapValues(_.trim).toMap)
  }

  private def bpeWordFreqs: Map[String, Long] = {
    import org.apache.spark.sql.functions.{col, explode, split}
    graft.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$")).collect().map(_.getString(0))
      .filter(_.length >= 2).groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  test("bpe sequential learning: every rule matches the reference recount; multi-char merges appear") {
    val k = 16
    val (refRules, _) = referenceBpe(bpeWordFreqs, k)
    val got = Corpus.learnBpeRules(spark, sfDir, k)
    assert(got == refRules, s"learned $got\nexpected $refRules")
    // rank r+1's statistic was counted AFTER rank r's rewrite — so
    // merges of already-merged (multi-char) tokens must appear, the
    // capability a round-1 candidate census can never have
    val merged = got.map(_._1.replace(" ", ""))
    assert(merged.exists(_.length >= 3),
      s"no multi-char merge in $merged — learner is not sequential")
    // the emitted rule table mirrors the learned rules, rank-ordered
    val tbl = Corpus.bpeLearnedMerges(spark, sfDir, k).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(tbl.toSeq == refRules.zipWithIndex.map { case ((p, n), i) =>
      ((i + 1).toLong, p, p.replace(" ", ""), n) })
  }

  test("bpe vocab: token inventory recounts from the reference learner's final state") {
    val freqs = bpeWordFreqs
    val (_, finalSpaced) = referenceBpe(freqs, 16)
    val expect = finalSpaced.toSeq
      .flatMap { case (w, s) => s.split(" ").map(_ -> freqs(w)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = Corpus.bpeVocab(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.nonEmpty && got.forall { case (t, n) => expect(t) == n })
    // ranked (n desc, token) with learned multi-char tokens present
    assert(got.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    assert(got.exists(_._1.length >= 3), "no learned multi-char token in the vocab")
  }

  test("bpe encode: replace-chain recount, lossless re-join, compression monotone") {
    val merges = Corpus.learnBpeRules(spark, sfDir, 16).map(_._1)
    val rows = Corpus.bpeEncode(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // reference implementation of the declared semantics: rank-ordered
    // single-pass leftmost replaces over the char-spaced word — for
    // SEQUENTIALLY learned rules this equals the learner's final state
    def encode(w: String): String = {
      val spaced = " " + w.map(_.toString).mkString(" ") + " "
      merges.foldLeft(spaced)((s, m) =>
        s.replace(" " + m + " ", " " + m.replace(" ", "") + " ")).trim
    }
    for (r <- rows) {
      val (w, enc, n) = (r.getString(0), r.getString(2), r.getLong(3))
      assert(enc == encode(w), s"'$w' encoded '$enc' != '${encode(w)}'")
      // tokenization is LOSSLESS: stripping spaces recovers the word
      assert(enc.replace(" ", "") == w)
      assert(n == enc.split(" ").length.toLong)
      assert(n >= 1 && n <= w.length, s"'$w': $n tokens for ${w.length} chars")
    }
    // the learned rules actually compress the vocabulary head
    val totalChars = rows.map(_.getString(0).length.toLong).sum
    val totalToks = rows.map(_.getLong(3)).sum
    assert(totalToks < totalChars, s"no compression: $totalToks vs $totalChars")
    // multi-char merged tokens actually reach the emitted token streams
    assert(rows.exists(_.getString(2).split(" ").exists(_.length >= 3)),
      "no >=3-char token in any encoded stream — rules were not sequential")
  }

  test("context windows: full coverage, fixed stride, bounded length") {
    import org.apache.spark.sql.functions.{col, size, split}
    val nTok = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val wins = Corpus.contextWindows(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    assert(wins.keySet == nTok.keySet)
    for ((doc, ws) <- wins) {
      val sorted = ws.sortBy(_._2)
      assert(sorted.head._3 == 0, s"doc $doc: first window must start at 0")
      assert(sorted.map(_._2).sameElements(sorted.indices.map(_.toLong)))
      assert(sorted.forall { case (_, wid, start, len) =>
        start == wid * 48 && len > 0 && len <= 64 })
      val (_, _, lastStart, lastLen) = sorted.last
      assert(lastStart + lastLen == nTok(doc),
        s"doc $doc: windows must cover exactly to the last token")
    }
  }

  test("shuffle order: dense per-shard positions, reproducible, not id-ordered") {
    val rows = Corpus.shuffleOrder(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byShard = rows.groupBy(_._2)
    assert(byShard.keySet.forall(s => s >= 0 && s < 16))
    for ((_, rs) <- byShard)
      assert(rs.map(_._3).sorted.sameElements(1 to rs.length), "positions must be dense")
    // reproducible bit-for-bit
    val again = Corpus.shuffleOrder(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.toSet == again.toSet)
    // and actually shuffled: within some shard, doc_id order != position order
    val scrambled = byShard.values.exists { rs =>
      val byPos = rs.sortBy(_._3).map(_._1)
      !byPos.sorted.sameElements(byPos)
    }
    assert(scrambled, "hash order must not degenerate to doc_id order")
  }

  test("stratified split is deterministic and ~80/10/10") {
    val a = Corpus.stratifiedSplit(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val b = Corpus.stratifiedSplit(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(a == b, "split must be stable across runs")
    val frac = a.values.groupBy(identity).view.mapValues(_.size.toDouble / a.size).toMap
    assert(math.abs(frac("train") - 0.8) < 0.06, frac)
    assert(math.abs(frac("test") - 0.1) < 0.05, frac)
  }

  test("decontaminate: flags only train-eval pairs over the shared-shingle floor") {
    import org.apache.spark.sql.functions.col
    val rows = Corpus.decontaminate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("train_doc") >= 20 && r.getAs[Long]("eval_doc") < 20)
      assert(r.getAs[Long]("n_shared") >= 3)
    }
    // spot-check one flagged pair by direct recount
    val h = rows.head
    val docs = graft.Tables.documents(spark, sfDir)
    def sh(id: Long) = docs.filter(col("doc_id") === id).head()
      .getAs[String]("text").split(" ").sliding(3).map(_.mkString(" ")).toSet
    assert((sh(h.getAs[Long]("train_doc")) & sh(h.getAs[Long]("eval_doc"))).size
      == h.getAs[Long]("n_shared"))
  }

  test("token packing: bins respect the budget boundary per (lang, shard)") {
    val rows = Corpus.packTokenBins(spark, sfDir, budget = 100).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(0), r.getLong(3), r.getLong(4)))
    // within each (lang, shard): bin ids are non-decreasing in doc order,
    // and each doc's bin equals its preceding cumulative / budget
    rows.groupBy(t => (t._1, t._2)).foreach { case (_, group) =>
      val ordered = group.sortBy(_._3)
      var cum = 0L
      ordered.foreach { case (_, _, _, tokens, bin) =>
        assert(bin == cum / 100, s"doc bin $bin != ${cum / 100}")
        cum += tokens
      }
    }
  }

  test("span corruption: spans in range, never overlapping, ~15% density") {
    val rows = Corpus.spanCorruption(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start_tok"), r.getAs[Long]("len_tok")))
    val nTokens = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, spans) =>
      val sorted = spans.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._2 + a._3 <= b._2, s"doc $doc: spans overlap")
        case _ =>
      }
      spans.foreach { s =>
        assert(s._2 >= 0 && s._2 + s._3 <= nTokens(doc), s"doc $doc: span out of range")
        assert(s._3 >= 2 && s._3 <= 4)
      }
      val density = spans.map(_._3).sum.toDouble / nTokens(doc)
      assert(density > 0.04 && density < 0.25, s"doc $doc density $density")
    }
  }

  test("dsir weights: target-language docs outscore the rest; bounds hold") {
    val df = Corpus.dsirWeights(spark, sfDir)
    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"))
    val joined = df.join(docs, "doc_id")
    val avgEn = joined.filter(col("lang") === "en")
      .agg(org.apache.spark.sql.functions.avg("avg_weight")).head().getDouble(0)
    val avgOther = joined.filter(col("lang") =!= "en")
      .agg(org.apache.spark.sql.functions.avg("avg_weight")).head().getDouble(0)
    assert(avgEn > avgOther,
      s"target-domain docs must score higher: en=$avgEn other=$avgOther")
    // smoothing bounds every feature weight into (0, 1e6]
    assert(df.filter(col("score_micro") <= 0 ||
      col("score_micro") > col("n_feats") * 1000000L).count() == 0)
  }

  test("mix epochs: per-lang epoch count is min(4, ceil(n_max/n_lang)), rows unique") {
    val df = Corpus.mixEpochs(spark, sfDir)
    val docs = graft.Tables.documents(spark, sfDir)
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMax = counts.values.max
    val expected = counts.view.mapValues(n =>
      math.min(4L, (nMax + n - 1) / n)).toMap
    val perLang = df.groupBy("lang").agg(max("epoch").as("e")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang == expected, s"got $perLang expected $expected")
    // the dominant language never repeats
    val domLang = counts.maxBy(_._2)._1
    assert(perLang(domLang) == 1L)
    // one row per (doc, epoch); every doc present in every one of its epochs
    assert(df.groupBy("doc_id", "epoch").count().filter(col("count") > 1).count() == 0)
    val total = counts.map { case (l, n) => n * expected(l) }.sum
    assert(df.count() == total)
  }

  test("bpe fertility: merges compress below the char baseline; recounts hold") {
    val df = Corpus.bpeFertility(spark, sfDir).collect()
    assert(df.nonEmpty)
    val docs = graft.Tables.documents(spark, sfDir)
    // independent per-lang word-instance recount with the same filter
    val words = docs.select(col("lang"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") &&
        org.apache.spark.sql.functions.length(col("w")) >= 2)
    val expected = words.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- df) {
      val (lang, nWords, nTokens) =
        (r.getString(0), r.getLong(1), r.getLong(2))
      assert(nWords == expected(lang), s"$lang word recount")
      // 16 learned merges must compress SOME words: strictly fewer
      // tokens than characters (the 0-merge baseline), but at least
      // one token per word
      val tpw = r.getDouble(3)
      val cpt = r.getDouble(4)
      assert(nTokens < nWords * 10 && nTokens >= nWords)
      assert(tpw >= 1.0 && cpt > 1.0,
        s"$lang: tokens_per_word=$tpw chars_per_token=$cpt")
    }
    // chars_per_token > 1 globally means merges fired somewhere
    assert(df.map(_.getDouble(4)).max > 1.0)
  }

  test("report card: per-source counts and dup census recount independently") {
    val df = Corpus.reportCard(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val docs = graft.Tables.documents(spark, sfDir)
    val nBySource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df.keySet == nBySource.keySet)
    // independent duplicate census: group on the raw TEXT, not a hash
    val dupTexts = docs.groupBy("text").count()
      .filter(col("count") > 1).select("text")
    val dupBySource = docs.join(dupTexts, "text")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, row) <- df) {
      assert(row.getLong(1) == nBySource(src), s"$src n_docs")
      val meanQ = row.getDouble(3)
      assert(meanQ >= 0.0 && meanQ <= 1.0, s"$src mean_quality=$meanQ")
      val expectedDupPct =
        math.floor(dupBySource.getOrElse(src, 0L) * 100.0 /
          nBySource(src) * 10000 + 0.5) / 10000
      assert(row.getDouble(5) == expectedDupPct, s"$src dup_pct")
    }
  }
}
