package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Semantic invariants for the round-5 training-data operators:
  * repetition signals, TF-IDF top terms, centroid outliers. The
  * hash-level correctness gate is the DuckDB oracle (SparkEntry
  * .oracleSql); these tests pin the properties a hash compare can't
  * explain when it breaks.
  */
class TextTrainingOpsSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("repetition fractions are in [0,1] and cover every document") {
    val rows = TextAnalysis.repetitionStats(spark, sfDir).collect()
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(rows.length == nDocs)
    for (r <- rows; c <- Seq("dup_word_frac", "top_bigram_char_frac", "dup_trigram_frac")) {
      val v = r.getAs[Double](c)
      assert(v >= 0.0 && v <= 1.0, s"doc ${r.getAs[Long]("doc_id")} $c=$v")
    }
  }

  test("a fully-repeated doc maxes dup fractions; top bigram really is most frequent") {
    // word soup corpus repeats heavily: at least one doc must show
    // duplicate words, and the reported top bigram must match a direct
    // per-doc recount for a sample doc.
    val df = TextAnalysis.repetitionStats(spark, sfDir)
    assert(df.filter(col("dup_word_frac") > 0).count() > 0)
    val sample = df.filter(col("doc_id") === 0).head()
    val text = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") === 0).head().getAs[String]("text")
    val words = text.split(" ")
    val bigrams = words.sliding(2).map(_.mkString(" ")).toSeq
    val counts = bigrams.groupBy(identity).view.mapValues(_.size)
    val best = counts.toSeq.map { case (g, c) => (c, g) }.max // (count, lexicographically largest)
    assert(sample.getAs[String]("top_bigram") == best._2)
  }

  test("tfidf returns k=5 ranked terms per doc, rare terms outscore common ones") {
    val df = TextAnalysis.tfidfTopTerms(spark, sfDir)
    val perDoc = df.groupBy("doc_id").agg(count(lit(1)).as("n"), max("rank").as("mr"))
    assert(perDoc.filter(col("n") =!= col("mr")).count() == 0)
    assert(perDoc.agg(max("n")).head().getLong(0) <= 5)
    // scores strictly ordered by rank within a doc (ties broken by term)
    val bad = df.as("a").join(df.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
        col("a.rank") + 1 === col("b.rank") &&
        col("a.score") < col("b.score"))
      .count()
    assert(bad == 0, "rank order must follow score order")
  }

  test("centroid outliers: 10 per label, distances ranked, centroid is the mean") {
    val df = Similarity.centroidOutliers(spark, sfDir)
    val labels = graft.Tables.embeddings(spark, sfDir).select("label").distinct().count()
    assert(df.count() == labels * 10)
    assert(df.filter(col("dist2") < 0).count() == 0)
    // rank 1 has the max dist2 within its label
    val top = df.filter(col("rank") === 1).as("t")
    val viol = top.join(df.as("o"), col("t.label") === col("o.label") &&
      col("o.dist2") > col("t.dist2")).count()
    assert(viol == 0)
  }

  test("hash embedding: signed counts recount per doc, dims bounded, sparse") {
    val rows = TextAnalysis.hashEmbed(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val d = r.getAs[Long]("dim")
      assert(d >= 0 && d < 64)
      assert(r.getAs[Long]("weight") != 0)
    }
    // total signed mass per doc == sum over its words of ±1 (recount one doc)
    val doc0words = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") === 0).head().getAs[String]("text").split(" ").length
    val mass0 = rows.filter(_.getAs[Long]("doc_id") == 0)
      .map(r => math.abs(r.getAs[Long]("weight"))).sum
    assert(mass0 <= doc0words, "abs mass cannot exceed word count")
    assert(mass0 > 0)
  }

  test("int8 quantization: codes bounded, reconstruction within half a step") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Double]]("e")).toMap
    val q = Similarity.quantizeInt8(spark, sfDir).collect()
    assert(q.length == emb.size)
    for (r <- q) {
      val id = r.getLong(0)
      val scale = r.getDouble(1)
      // codes ship as a CSV string (the oracle gate cannot sort array
      // cells); parse back to ints for the numeric assertions
      val codes = r.getAs[String]("codes").split(",").toSeq.map(_.toInt)
      val orig = emb(id)
      assert(codes.length == orig.length)
      assert(codes.forall(c => c >= -127 && c <= 127))
      if (scale > 0) {
        // max component must hit ±127; every component reconstructs
        // within half a quantization step
        assert(codes.map(math.abs).max == 127)
        val step = 1.0 / scale
        for ((c, v) <- codes.zip(orig))
          assert(math.abs(c * step - v) <= step / 2 + 1e-6,
            s"vec $id: code $c deviates from $v by more than $step/2")
      }
    }
  }

  test("two-stage top-k equals the single-window top-k") {
    // the salted partial pass must not lose any global top-10 row
    import org.apache.spark.sql.expressions.Window
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("e"))
    val ex = emb.select(col("label"), posexplode(col("e")).as(Seq("pos", "x")))
    val means = ex.groupBy(col("label"), col("pos"))
      .agg((sum(col("x").cast("decimal(38,30)")).cast("double") / count(lit(1))).as("m"))
    val cent = means.groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label"), transform(col("pm"), s => s.getField("m")).as("c"))
    val dist = emb.join(broadcast(cent), "label")
      .withColumn("dist2",
        aggregate(zip_with(col("e"), col("c"), (x, m) => (x - m) * (x - m)),
          lit(0.0), (acc, v) => acc + v))
    val w = Window.partitionBy(col("label")).orderBy(col("dist2").desc, col("vec_id"))
    val direct = dist.withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
      .select(col("label"), col("rank"), col("vec_id"),
        PortableRound.pround(col("dist2"), 4).as("dist2"))
    val twoStage = Similarity.centroidOutliers(spark, sfDir)
    assert(twoStage.exceptAll(direct).count() == 0 && direct.exceptAll(twoStage).count() == 0)
  }

  test("pca power iteration: engine direction matches a double-precision recount") {
    val out = Similarity.pcaPowerTop(spark, sfDir).collect()
      .map(r => r.getAs[Long]("j") -> r.getAs[Long]("z2")).toMap
    assert(out.keySet == (1L to 64L).toSet)
    // pure-JVM recount of the same two passes, but in plain doubles
    // WITHOUT quantization or the integer downscale: the fixed-point
    // engine result must point the same way (quantization error is
    // ~1e-3 relative; the iterate direction is what PCA is for)
    val a = graft.Tables.embeddings(spark, sfDir)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    var x = Array.fill(64)(1.0)
    for (_ <- 1 to 2) {
      val y = a.map(row => row.zip(x).map { case (v, w) => v * w }.sum)
      val z = Array.tabulate(64)(jj => a.zip(y).map { case (row, yi) => row(jj) * yi }.sum)
      x = z
    }
    val e = (1 to 64).map(j => out(j.toLong).toDouble)
    val dot = e.zip(x).map { case (p, q) => p * q }.sum
    val cos = dot / (math.sqrt(e.map(v => v * v).sum) * math.sqrt(x.map(v => v * v).sum))
    assert(cos > 0.999, s"fixed-point direction diverged from double recount: cos=$cos")
  }

  test("char diversity: bounds hold and a direct recount agrees for doc 0") {
    val df = TextAnalysis.charDiversity(spark, sfDir)
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(df.count() == nDocs)
    val bad = df.filter(col("alphabet") < 1 || col("n_sampled") > 256 ||
      col("sum_sq") < col("n_sampled") ||
      col("simpson") <= 0.0 || col("simpson") > 1.0).count()
    assert(bad == 0)
    val text = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") === 0).head().getAs[String]("text").take(256)
    val counts = text.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val row = df.filter(col("doc_id") === 0).head()
    assert(row.getAs[Long]("alphabet") == counts.size)
    assert(row.getAs[Long]("n_sampled") == text.length)
    assert(row.getAs[Long]("sum_sq") == counts.values.map(c => c * c).sum)
  }

  test("ngram novelty: first owners partition the gram space; earliest doc is all-novel") {
    val df = TextAnalysis.ngramNovelty(spark, sfDir)
    assert(df.filter(col("n_novel") > col("n_grams")).count() == 0)
    assert(df.filter(col("novelty") < 0.0 || col("novelty") > 1.0).count() == 0)
    // every distinct gram has exactly one first owner
    val totalGrams = Dedup.withShingles(graft.Tables.documents(spark, sfDir))
      .select(explode(col("sh")).as("s")).distinct().count()
    val sumNovel = df.agg(sum("n_novel")).head().getLong(0)
    assert(sumNovel == totalGrams)
    // the smallest doc_id that has grams owns all of them
    val firstDoc = df.agg(min("doc_id")).head().getLong(0)
    val fr = df.filter(col("doc_id") === firstDoc).head()
    assert(fr.getAs[Long]("n_novel") == fr.getAs[Long]("n_grams"))
  }

  test("portable log2: exact at powers of two, within 0.0861 bits elsewhere") {
    import graft.TestSpark.spark
    val xs = Seq(1L, 2L, 3L, 5L, 7L, 255L, 256L, 1000L, 1L << 30, (1L << 40) + 12345L)
    val df = spark.createDataFrame(xs.map(Tuple1(_))).toDF("x")
      .selectExpr("x", TextAnalysis.plog2MicroSql("x") + " AS p")
    for (r <- df.collect()) {
      val x = r.getAs[Long]("x"); val p = r.getAs[Long]("p") / 1e6
      val truth = math.log(x.toDouble) / math.log(2.0)
      // the chord of a concave function underestimates: p ∈ [log2 x − 0.0861, log2 x]
      assert(p <= truth + 1e-9 && p >= truth - 0.0862,
        s"plog2($x)=$p vs $truth")
      if ((x & (x - 1)) == 0) assert(math.abs(p - truth) < 1e-9)
    }
  }

  test("lm perplexity: bounds, bucket partition, and in-domain slice scores lower") {
    val df = TextAnalysis.lmPerplexity(spark, sfDir).cache()
    val nDocs = graft.Tables.documents(spark, sfDir)
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(df.count() == nDocs)
    // nll per transition lives in [0, 30] bits (p ∈ [2^-30, 1])
    assert(df.filter(col("nll_avg_micro") < 0 ||
      col("nll_avg_micro") > 30000000L).count() == 0)
    // oov implies backoff; both bounded by the transition count
    assert(df.filter(col("n_oov") > col("n_backoff")).count() == 0)
    assert(df.filter(col("n_backoff") > col("n_trans")).count() == 0)
    assert(df.select("ppl_bucket").distinct().count() == 3)
    // the reference slice is in-domain by construction: every one of its
    // bigrams was counted, so its mean nll must not exceed out-of-slice
    val m = df.groupBy((col("doc_id") % 5 === 0).as("in_slice"))
      .agg(avg(col("nll_avg_micro")).as("m")).collect()
      .map(r => r.getAs[Boolean]("in_slice") -> r.getAs[Double]("m")).toMap
    assert(m(true) <= m(false), s"slice ${m(true)} vs ${m(false)}")
    df.unpersist()
  }

  test("lm perplexity: tertile cutoffs replicate a by-hand bounded-sample recount") {
    // sampleK=7 forces the bounded-sample path (the slice is larger than
    // the sample), then the spec recounts the whole pipeline stage by
    // hand: bottom-7 slice docs by the portable 48-bit hash, ntile rank
    // arithmetic, bucket labels for EVERY doc.
    val out = TextAnalysis.lmPerplexity(spark, sfDir, sampleK = 7)
      .select("doc_id", "nll_avg_micro", "ppl_bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    def h48(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ppl:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(6).map(b => f"$b%02x").mkString, 16)
    }
    val slice = out.filter(_._1 % 5 == 0)
    assert(slice.length > 7, "fixture too small to exercise the sample cap")
    val sample = slice.sortBy(t => (h48(t._1), t._1)).take(7)
    val sorted = sample.map(t => (t._2, t._1)).sorted
    val n = sorted.length
    val n1 = n / 3 + (if (n % 3 >= 1) 1 else 0)
    val n2 = n / 3 + (if (n % 3 >= 2) 1 else 0)
    val t1 = sorted(n1 - 1)._1
    val t2 = sorted(n1 + n2 - 1)._1
    for ((id, nll, bucket) <- out) {
      val want = if (nll <= t1) "head" else if (nll <= t2) "middle" else "tail"
      assert(bucket == want, s"doc $id nll=$nll: got $bucket want $want (t1=$t1 t2=$t2)")
    }
  }

  test("quality agreement: r bounded, overlap bounded, self-agreement is perfect") {
    val r = TextAnalysis.qualityAgreement(spark, sfDir).head()
    assert(r.getLong(0) > 0)
    val pearson = r.getDouble(1)
    assert(pearson >= -1.0 && pearson <= 1.0, s"r=$pearson")
    assert(r.getLong(3) >= 0 && r.getLong(3) <= r.getLong(2),
      "overlap cannot exceed k")
    // sanity anchor: a score correlated with ITSELF — same moments
    // formula on (x, x) — must give exactly r = 1
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextAnalysis.qualityMicroCol.as("x"))
    val s = docs.agg(count(lit(1)).cast("double").as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("x") * col("x")).cast("double").as("sxx")).head()
    val (n, sx, sxx) = (s.getDouble(0), s.getDouble(1), s.getDouble(2))
    val rSelf = (n * sxx - sx * sx) /
      math.sqrt((n * sxx - sx * sx) * (n * sxx - sx * sx))
    assert(math.abs(rSelf - 1.0) < 1e-12)
  }
}
