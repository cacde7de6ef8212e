package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.PortableHash

/** Corpus-preparation operators a large-scale training-data pipeline
  * needs downstream of dedup/quality: deterministic dataset splits and
  * token-budget sequence packing.
  *
  * Scale notes (100 TB):
  *  - the split is a pure map over a content-independent portable hash:
  *    no shuffle, no RNG state, stable under re-runs and re-partitions
  *    (the property that actually matters — a `rand()` split silently
  *    reshuffles train/test on every retry);
  *  - packing windows are keyed (lang, shard) where shard is a hash of
  *    the doc id: per-key data stays executor-local and the key space
  *    scales with the corpus instead of the ~20 languages (a
  *    partition-by-lang-only window is the skew trap at 100 TB).
  */
object Corpus {

  /** Deterministic stratified train/validation/test split: the md5-based
    * portable hash of the doc id modulo 100 buckets → 80/10/10. The
    * salt prefix decorrelates this hash from any other doc_id-keyed
    * hashing in the pipeline. */
  def stratifiedSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = PortableHash.md5Hash48(
      concat(lit("split:"), col("doc_id").cast("string"))) % 100
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), bucket.as("split_bucket"),
        when(bucket < 80, "train").when(bucket < 90, "validation")
          .otherwise("test").as("split"))
  }

  /** The composed cleaning pipeline a corpus release actually runs:
    * language filter → quality gate (length + lexical diversity) →
    * exact dedup keep-first → redaction, in one DataFrame program.
    * Each stage is the already-oracled operator; composing them stays
    * a single scan + one window shuffle (the dedup) — Catalyst fuses
    * the filters and projections around it. */
  def cleanPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("content_hash")).orderBy(col("doc_id"))
    val words = split(col("text"), " ")
    TextAnalysis.redactPii(spark, sfDir)
      .join(Tables.documents(spark, sfDir), "doc_id")
      .filter(col("lang").isin("en", "de", "fr"))
      .withColumn("n_words", size(words))
      .withColumn("distinct_ratio",
        size(array_distinct(words)).cast("double") / size(words))
      .filter(col("n_words") >= 5 && col("distinct_ratio") > 0.3)
      .withColumn("content_hash", md5(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("n_words"),
        graft.operators.PortableRound.pround(col("distinct_ratio"), 4).as("distinct_ratio"),
        col("redacted"))
  }

  /** Benchmark decontamination: flag training documents that share
    * ≥ `minShared` distinct word-3-grams with any eval-set document
    * (the overlap check run before training so test sets don't leak
    * into the corpus). Eval membership here is doc_id < `evalMax` —
    * a stand-in for the real eval-set table.
    *
    * Scale shape: the eval side is a benchmark (tiny, fixed) — its
    * shingles BROADCAST, so the 100 TB training side never shuffles:
    * one narrow scan + broadcast hash join + a (train,eval)-keyed
    * count with map-side combine. */
  def decontaminate(spark: SparkSession, sfDir: String, evalMax: Long = 20,
      minShared: Long = 3): DataFrame = {
    val docs = Dedup.withShingles(Tables.documents(spark, sfDir))
    def shingleRows(df: DataFrame, idCol: String) = df
      .select(col("doc_id").as(idCol), explode_outer(col("sh")).as("s"))
      .filter(col("s").isNotNull)
    val trainSh = shingleRows(docs.filter(col("doc_id") >= evalMax), "train_doc")
    val evalSh = shingleRows(docs.filter(col("doc_id") < evalMax), "eval_doc")
    trainSh.join(broadcast(evalSh), "s")
      .groupBy(col("train_doc"), col("eval_doc"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Language rebalancing: deterministically downsample every language
    * to (approximately) the size of the smallest one — the mixture-
    * flattening pass run before training so a 90%-English crawl doesn't
    * produce a 90%-English model. A document survives iff
    * `hash(doc_id) mod M  <  M · cap / n_lang`, spelled as the integer
    * cross-multiplication `(h mod M) · n_lang < cap · M` so neither
    * engine ever rounds a division.
    *
    * Scale shape: the per-language counts are a ~|languages|-key
    * aggregate (map-side combine collapses it to one row per lang per
    * partition) whose result BROADCASTS back; the main pass is then a
    * narrow scan + filter — the 100 TB side never shuffles. The
    * hash-threshold keeps the sample deterministic under retries and
    * repartitions, unlike `rand()`-based sampling. */
  def langBalance(spark: SparkSession, sfDir: String, mod: Long = 1000000L): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val cap = counts.agg(min(col("n_lang")).as("cap"))
    val h = PortableHash.md5Hash48(
      concat(lit("bal:"), col("doc_id").cast("string")))
    docs.join(broadcast(counts), "lang")
      .crossJoin(broadcast(cap))
      .filter(pmod(h, lit(mod)) * col("n_lang") < col("cap") * mod)
      .select(col("doc_id"), col("lang"))
  }

  /** Temperature-flattened language sampling (τ = 0.5): keep probability
    * `p_l = sqrt(cap / n_l)`, so a language's expected share scales with
    * `sqrt(n_l)` — the standard multilingual-pretraining compromise
    * between the raw crawl mixture (τ=1, big languages drown the rest)
    * and full flattening (τ=0, [[langBalance]], small languages repeat
    * too often downstream). No `pow`/`sqrt` is ever evaluated: the
    * survival test `h/M < sqrt(cap/n_l)` is squared into the pure
    * integer comparison `(h mod M)² · n_l < cap · M²`, which both
    * engines compute exactly. `(h mod M)² · n_l` needs headroom — with
    * M = 10⁶ it fits a long up to n_l ≈ 9·10⁵; beyond that (the 100 TB
    * mixture) widen the cross-multiply to DECIMAL(38,0) or drop M to
    * 10⁴ — the comparison stays exact either way.
    *
    * Scale shape: same as [[langBalance]] — tiny per-lang count agg
    * broadcast back, then a narrow filter scan; zero corpus shuffle. */
  def temperatureSample(spark: SparkSession, sfDir: String, mod: Long = 1000000L): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val cap = counts.agg(min(col("n_lang")).as("cap"))
    val h = pmod(PortableHash.md5Hash48(
      concat(lit("temp:"), col("doc_id").cast("string"))), lit(mod))
    docs.join(broadcast(counts), "lang")
      .crossJoin(broadcast(cap))
      .filter(h * h * col("n_lang") < col("cap") * mod * mod)
      .select(col("doc_id"), col("lang"))
  }

  /** One row per token instance (split on single space, empties from
    * leading/double spaces dropped — mirrored exactly in the oracles). */
  private def tokenRows(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode_outer(split(col("text"), " ")).as("w"))
      .filter(col("w").isNotNull && col("w") =!= "")

  /** Vocabulary head: global top-k words by instance count — the
    * tokenizer-training vocabulary seed. Deterministic boundary:
    * (count desc, word) is a total order because the word is the group
    * key. Scale: one map-side-combined count shuffle, then Spark's
    * distributed top-k (`TakeOrderedAndProject` — each partition keeps
    * k, the driver merges k·partitions rows, never the full vocab). */
  def vocabTopK(spark: SparkSession, sfDir: String, k: Int = 100,
      minCount: Long = 2L): DataFrame =
    tokenRows(spark, sfDir)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("w")).limit(k)

  /** First-round BPE merge candidates: adjacent character-pair counts
    * weighted by word frequency — exactly the statistic byte-pair
    * encoding maximizes on its first merge. Restricted to `^[a-z]+$`
    * words so character indexing is unambiguous in every engine
    * (multibyte grapheme slicing differs; byte-level BPE would make the
    * same restriction by construction).
    *
    * Scale: the corpus collapses to the DISTINCT-WORD table first
    * (Heaps' law: vocab ≪ corpus), so the char-pair explode runs over
    * vocabulary entries, not the 100 TB token stream; two map-side-
    * combined shuffles end-to-end, then distributed top-k. */
  def bpeFirstMerges(spark: SparkSession, sfDir: String, k: Int = 50): DataFrame =
    tokenRows(spark, sfDir)
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("freq"), explode_outer(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .filter(col("pair").isNotNull)
      .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("pair")).limit(k)

  /** BPE ENCODE — the tokenizer-APPLICATION half of the BPE pair
    * ([[bpeFirstMerges]] is the learning half): the learned rules
    * compile into a chain of `replace` passes over the char-spaced
    * word, applied in rank order, each a single left-to-right
    * non-overlapping pass. `replace` has IDENTICAL semantics in Spark
    * (StringReplace) and DuckDB, including the shared-boundary
    * behavior on runs (' l l l ' merges once per pass), so the oracle
    * replays the whole tokenizer bit-for-bit with a `list_reduce`
    * fold. Output: the vocabulary head with each word's token
    * sequence and token count — the compression audit a tokenizer
    * change ships with.
    *
    * Scale: the k-row rule table collects ONCE and compiles into the
    * plan as literal arguments (a rule table is broadcast
    * configuration, not data — same pattern as a compiled tokenizer);
    * the encode itself is a narrow codegen'd projection, no shuffle
    * beyond the vocab count. */
  def bpeEncode(spark: SparkSession, sfDir: String,
      kMerges: Int = 20, kWords: Int = 100): DataFrame = {
    val merges = bpeFirstMerges(spark, sfDir, kMerges)
      .collect().map(_.getString(0)) // rank order: (n DESC, pair)
    val words = tokenRows(spark, sfDir)
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(kWords)
    val spaced = concat(lit(" "), concat_ws(" ", split(col("w"), "")), lit(" "))
    val encodedCol = merges.foldLeft(spaced) { (c, m) =>
      call_function("replace", c,
        lit(s" ${m.charAt(0)} ${m.charAt(1)} "), lit(s" $m "))
    }
    words.withColumn("encoded", trim(encodedCol))
      .withColumn("n_tokens", size(split(col("encoded"), " ")).cast("long"))
      .select(col("w"), col("freq"), col("encoded"), col("n_tokens"))
  }

  /** Memorization-risk miner: the most-repeated 5-gram spans across
    * the corpus — the statistic behind boilerplate detection and the
    * "repeated substring" contamination sweeps training pipelines run
    * before fitting (a span appearing thousands of times is either
    * boilerplate to strip or a template the model will memorize).
    * Reports total occurrences AND distinct-doc spread; ranked by
    * (total desc, gram) so the LIMIT boundary is a total order.
    *
    * Scale: positional 5-grams collapse map-side per partition before
    * the one (gram)-keyed count shuffle — Heaps' law keeps the distinct
    * gram table ≪ the token stream — then distributed top-k
    * (TakeOrderedAndProject), never a full sort. */
  def dupNgrams(spark: SparkSession, sfDir: String, n: Int = 5,
      k: Int = 50, minDocs: Long = 3L): DataFrame = {
    val words = col("__w")
    Tables.documents(spark, sfDir)
      .withColumn("__w", split(col("text"), " "))
      // sequence(1, x) flips to descending when x < 1 — keep only docs
      // long enough to hold at least one n-gram
      .filter(size(words) >= n)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(words) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(words, i + j)): _*)))
        .as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_total"), countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_total").desc, col("gram")).limit(k)
  }

  /** Collocation mining: top word bigrams by PMI. The log in
    * `pmi = log(N·c_xy / (c_x·c_y))` is monotone, so ranking by the
    * rational score `N·c_xy / (c_x·c_y)` is ranking by PMI without ever
    * evaluating a transcendental the two engines could disagree on; the
    * score itself is one exact integer product per side and a single
    * IEEE division, bit-equal everywhere (the integer cross-products
    * need DECIMAL headroom beyond ~2⁵³ tokens). `minPair` is the
    * standard guard against rare-pair PMI blowup.
    *
    * Scale: bigram counts collapse map-side; the `minPair` filter runs
    * BEFORE the unigram joins, so the joined table is the collocation
    * candidates, not the full bigram space; the totals row broadcasts. */
  def pmiTopK(spark: SparkSession, sfDir: String, k: Int = 50,
      minPair: Long = 5L): DataFrame = {
    val uni = tokenRows(spark, sfDir)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val totals = uni.agg(sum(col("c")).as("n_tokens"))
    val ws = Tables.documents(spark, sfDir)
      .select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
    val pairs = ws.select(explode_outer(transform(
        sequence(lit(1), size(col("ws")) - 1),
        i => struct(element_at(col("ws"), i).as("w1"),
          element_at(col("ws"), i + 1).as("w2")))).as("p"))
      .select(col("p.w1"), col("p.w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_pair"))
      .filter(col("c_pair") >= minPair)
    pairs
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c_pair"),
        PortableRound.pround(
          (col("c_pair") * col("n_tokens")).cast("double") / (col("c1") * col("c2")),
          6).as("pmi_score"))
      .orderBy(col("pmi_score").desc, col("w1"), col("w2")).limit(k)
  }

  /** Context-window chunking: split each document's token stream into
    * overlapping windows of `window` tokens advancing by `stride`
    * (stride < window ⇒ the standard pretraining overlap so no span is
    * seen only at a window edge). Emits the window MANIFEST
    * (doc, window_id, start, length) rather than materialized token
    * slices — the downstream reader slices lazily, so the 100 TB text
    * is never duplicated ~1.33× through a shuffle. All integer
    * arithmetic; the ceil-division is spelled `(x + stride − 1) ∕
    * stride` on exact small integers in both engines.
    *
    * Scale: one narrow scan + a bounded explode (≤ n/stride rows per
    * doc), zero shuffle. */
  /** T5-style SPAN-CORRUPTION manifest: deterministic non-overlapping
    * mask spans per document (~15% noise density, span length 2-4 ≈
    * mean 3), emitted as (doc, span, start, len, sentinel) rows — the
    * denoising-objective prep step. Spans are placed one per equal
    * segment with a portable-hash offset inside it, so they can never
    * overlap and both engines place them identically; the corpus text
    * is never rewritten (same manifest-not-materialization design as
    * the context windows).
    *
    * Scale shape: narrow bounded explode (n_tokens/20 rows per doc),
    * pure integer Column math, zero shuffle. */
  def spanCorruption(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("n_spans", expr("n_tokens div 20"))
      .filter(col("n_spans") > 0)
      .withColumn("seg_len", expr("n_tokens div n_spans"))
    val h = PortableHash.md5Hash48(concat(
      lit("span:"), col("doc_id").cast("string"), lit(":"), col("span_id").cast("string")))
    docs.select(col("doc_id"), col("seg_len"),
        explode(sequence(lit(0L), col("n_spans") - 1)).as("span_id"))
      .withColumn("len_tok", pmod(h, lit(3L)) + 2) // 2..4, mean 3 ≈ 15% of 20
      .withColumn("start_tok",
        col("span_id") * col("seg_len") +
          pmod(h, col("seg_len") - col("len_tok") + 1))
      .select(col("doc_id"), col("span_id"), col("start_tok"), col("len_tok"),
        concat(lit("<extra_id_"), col("span_id").cast("string"), lit(">")).as("sentinel"))
  }

  def contextWindows(spark: SparkSession, sfDir: String, window: Int = 64,
      stride: Int = 48): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
    val nWin = when(col("n_tokens") <= window, lit(1L)).otherwise(
      ((col("n_tokens") - window + stride - 1) / stride).cast("long") + 1L)
    docs
      .select(col("doc_id"), col("n_tokens"),
        explode_outer(sequence(lit(0L), nWin - 1L)).as("window_id"))
      .filter(col("window_id").isNotNull)
      .select(col("doc_id"), col("window_id"),
        (col("window_id") * stride).as("start_tok"),
        least(lit(window.toLong),
          col("n_tokens") - col("window_id") * stride).as("n_tok"))
  }

  /** Deterministic training-order shuffle: every document gets a
    * (shard, pos_in_shard) — shard from one salted portable hash,
    * position by a second-order hash within the shard. The standard
    * write layout before training: S shard files, each internally
    * shuffled, reproducible bit-for-bit across retries (a `rand()`
    * shuffle silently re-orders every epoch on recompute).
    *
    * Scale: ONE shuffle keyed on shard (the window partition), and the
    * shard count is chosen so a shard fits a writer task; the position
    * window sorts within a shard only — there is no global total order
    * anywhere (a global `row_number` would serialize on one partition
    * at 100 TB). */
  def shuffleOrder(spark: SparkSession, sfDir: String, shards: Int = 16): DataFrame = {
    val h = PortableHash.md5Hash48(
      concat(lit("shuf:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shuffle_key"), col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), pmod(h, lit(shards)).as("shard"),
        (h / shards).cast("long").as("shuffle_key"))
      .withColumn("pos_in_shard", row_number().over(w))
      .select(col("doc_id"), col("shard"), col("pos_in_shard"))
  }

  /** Streaming sequence packing: per (lang, shard) stream ordered by
    * doc_id, documents concatenate into fixed token-budget bins; a
    * document lands in the bin its preceding cumulative fills
    * (GPT-style concat-then-chunk pretraining batches). Pure window
    * program — one shuffle on the window key, no UDF. */
  def packTokenBins(spark: SparkSession, sfDir: String, budget: Long = 2048,
      shards: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        pmod(col("doc_id"), lit(shards)).as("shard"),
        size(split(col("text"), " ")).cast("long").as("tokens"))
      .withColumn("cum_tokens", sum(col("tokens")).over(w))
      .select(col("doc_id"), col("lang"), col("shard"), col("tokens"),
        floor((col("cum_tokens") - col("tokens")) / budget).as("bin_id"))
  }

  /** Per-source document cap: keep the `cap` highest-quality documents
    * of every source (quality = lexical diversity, the same
    * distinct-word ratio the cleaning gate uses; ties break on
    * doc_id). The C4/RefinedWeb-style anti-spam pass — one domain
    * mirroring itself a million times must not dominate the mixture.
    *
    * Scale shape: per-source top-k via TWO windows — a partial top-k
    * per (source, salt) first, then the final per-source rank over at
    * most `salts × cap` survivors. A single per-source window is the
    * skew trap: one giant domain serializes into one task at 100 TB,
    * while the salted pre-pass bounds every final partition. The
    * partial pass is correct because the per-source top-`cap` is a
    * subset of every salt-slice's top-`cap`. */
  def sourceCap(spark: SparkSession, sfDir: String,
      cap: Int = 10, salts: Int = 8): DataFrame = {
    val words = split(col("text"), " ")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        (size(array_distinct(words)).cast("double") / size(words)).as("q"),
        pmod(col("doc_id"), lit(salts)).as("salt"))
    val w1 = Window.partitionBy(col("source"), col("salt"))
      .orderBy(col("q").desc, col("doc_id"))
    val w2 = Window.partitionBy(col("source"))
      .orderBy(col("q").desc, col("doc_id"))
    docs.withColumn("r1", row_number().over(w1)).filter(col("r1") <= cap)
      .withColumn("rank", row_number().over(w2)).filter(col("rank") <= cap)
      .select(col("doc_id"), col("source"), col("rank"),
        PortableRound.pround(col("q"), 4).as("quality"))
  }

  /** Domain-mixing EPOCH MANIFEST: scarce languages repeat across
    * training epochs instead of being discarded or materialized —
    * `epochs_l` = smallest e in [1, cap] with `e · n_l >= n_max`,
    * i.e. `min(cap, ceil(n_max / n_l))` in exact integer arithmetic
    * (the static-weights analogue of DoReMi-style mixture tuning; the
    * downsampling twins are [[langBalance]]/[[temperatureSample]]).
    * Emits one (doc, epoch) row plus a portable order hash the reader
    * sorts on — the 100 TB corpus is never physically duplicated, the
    * manifest is the repetition (same design as the context-window
    * manifest).
    *
    * Scale shape: tiny per-lang count agg broadcast back, then a
    * narrow bounded explode (≤ cap rows per doc); zero corpus shuffle.
    */
  /** DSIR-style importance weights (arXiv:2302.03169 shape): score each
    * document by how much its hashed-bigram profile looks like a TARGET
    * domain (here: the `en` slice) relative to the raw corpus — the
    * standard data-selection pass before pretraining. Per feature
    * bucket, the Laplace-smoothed ratio `(cnt_target+1)/(cnt_raw+1)` is
    * kept as an exact micro-scaled integer (`·10⁶` then floor-div), and
    * a document's score is the exact integer sum over its features, so
    * both engines agree bit-for-bit; only the final per-feature average
    * is portably rounded.
    *
    * Scale shape: ONE bigram pass (localCheckpoint'ed — bucket counts
    * and the score join both read it), ONE (bucket) aggregate with both
    * counts as conditional sums (4096 rows), broadcast back, one (doc)
    * aggregate. The 100 TB corpus shuffles once, on the bucket key. */
  def dsirWeights(spark: SparkSession, sfDir: String, buckets: Int = 4096,
      targetLang: String = "en"): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("w"))
      .withColumn("n_words", size(col("w")))
    val grams = docs
      .select(col("doc_id"), col("lang"), col("w"), col("n_words"),
        posexplode(col("w")).as(Seq("pos", "u")))
      .filter(col("pos") + 2 <= col("n_words"))
      .select(col("doc_id"), col("lang"),
        pmod(PortableHash.md5Hash48(concat(lit("ds:"), col("u"), lit(" "),
          element_at(col("w"), col("pos") + 2))), lit(buckets.toLong)).as("bucket"))
      .localCheckpoint()
    val weights = grams.groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt_r"),
        sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("cnt_t"))
      .select(col("bucket"),
        expr("((cnt_t + 1) * 1000000) div (cnt_r + 1)").as("w_micro"))
    grams.join(broadcast(weights), "bucket")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("w_micro")).as("score_micro"))
      .select(col("doc_id"), col("n_feats"), col("score_micro"),
        PortableRound.pround(col("score_micro").cast("double") / col("n_feats"), 2)
          .as("avg_weight"))
  }

  def mixEpochs(spark: SparkSession, sfDir: String, cap: Int = 4): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val mx = counts.agg(max(col("n_lang")).as("n_max"))
    // smallest e with e*n_lang >= n_max, capped: a when-cascade keeps
    // the arithmetic integral (no ceil/div rounding disagreements)
    val e = (1 until cap).foldRight(lit(cap.toLong)) { (k, rest) =>
      when(col("n_lang") * k >= col("n_max"), k.toLong).otherwise(rest)
    }
    docs.join(broadcast(counts), "lang")
      .crossJoin(broadcast(mx))
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(1L), e)).as("epoch"))
      .withColumn("ord_hash", PortableHash.md5Hash48(concat(
        lit("mix:"), col("doc_id").cast("string"), lit(":"),
        col("epoch").cast("string"))))
  }

  /** Per-language quality-percentile gate: keep each language's top
    * decile by [[TextAnalysis.qualityScoreCol]] — the ADAPTIVE variant
    * of a fixed score threshold (a fixed cutoff over- or under-prunes
    * languages whose score distributions differ; a per-lang percentile
    * prunes each distribution equally). The decile test is pure
    * integers — `rn <= (n_lang + 9) DIV 10` on a deterministic
    * (score desc, doc_id) row_number — no percent_rank double at the
    * boundary.
    *
    * Scale notes: scoring is a narrow codegen'd projection; both
    * windows (rank + per-lang count) share ONE lang-keyed shuffle. A
    * language is a coarse partition at corpus scale — the two-stage
    * salted top-k of [[sourceCap]] is the swap-in when a single lang
    * dominates; the decile count then comes from the same pre-agg. */
  def qualityGate(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        graft.operators.TextAnalysis.qualityScoreCol.as("quality_score"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("quality_score").desc, col("doc_id"))
    val cw = Window.partitionBy(col("lang"))
    scored
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n_lang", count(lit(1)).over(cw))
      .filter(col("rn") <= expr("(n_lang + 9) DIV 10"))
      .select(col("doc_id"), col("lang"), col("quality_score"),
        col("rn"), col("n_lang"))
  }
}
