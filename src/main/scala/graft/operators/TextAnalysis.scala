package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for large-scale training-data pipelines:
  * language-ID, quality scoring, token counting, fingerprinting.
  *
  * All pure `Column` programs (single scan, no shuffle except the
  * fingerprint fold which stays map-side): at 100 TB these run as one
  * whole-stage-codegen'd projection per partition. Heuristics use only
  * engine-agnostic primitives (literal replace, length, ascii) so the
  * DuckDB oracle can replicate them bit-for-bit.
  */
object TextAnalysis {

  /** occurrences of literal `pat` in `c` via length difference. */
  private def cnt(c: Column, pat: String): Column =
    (length(c) - length(replace(c, lit(pat), lit("")))) / pat.length

  /** Language-ID by stopword-profile scoring. Real pipelines use
    * char-n-gram models (e.g. fastText); the engine shape is identical:
    * per-doc scores + deterministic argmax, one scan, fully codegen'd.
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val t = concat(lit(" "), col("text"), lit(" "))
    val sEn = cnt(t, " the ") + cnt(t, " and ") + cnt(t, " of ")
    val sFr = cnt(t, " le ") + cnt(t, " la ") + cnt(t, " et ")
    val sDe = cnt(t, " der ") + cnt(t, " und ") + cnt(t, " die ")
    val sEs = cnt(t, " el ") + cnt(t, " los ") + cnt(t, " y ")
    val pred = when(sEn >= sFr && sEn >= sDe && sEn >= sEs && sEn > 0, "en")
      .when(sFr >= sDe && sFr >= sEs && sFr > 0, "fr")
      .when(sDe >= sEs && sDe > 0, "de")
      .when(sEs > 0, "es")
      .otherwise("und")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang").as("declared_lang"),
        pred.as("pred_lang"),
        sEn.cast("long").as("score_en"), sFr.cast("long").as("score_fr"),
        sDe.cast("long").as("score_de"), sEs.cast("long").as("score_es"))
  }

  /** Quality scoring: length / stopword / repetition features with a
    * combined score — the shape of Gopher/C4-style quality filters. */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val words = split(col("text"), " ")
    val nWords = size(words).cast("double")
    val t = concat(lit(" "), col("text"), lit(" "))
    val stopHits = cnt(t, " the ") + cnt(t, " a ") + cnt(t, " of ") + cnt(t, " and ")
    val nChars = length(col("text")).cast("double")
    val avgWordLen = (nChars - (nWords - 1)) / nWords
    val distinctRatio = size(array_distinct(words)).cast("double") / nWords
    val stopRatio = stopHits / nWords
    val score = PortableRound.pround(
      when(avgWordLen.between(3.0, 10.0), 0.4).otherwise(0.0)
        + least(stopRatio * lit(2.0), lit(0.3))
        + least(distinctRatio, lit(0.3)), 4)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        nWords.cast("long").as("n_words"),
        PortableRound.pround(avgWordLen, 4).as("avg_word_len"),
        PortableRound.pround(distinctRatio, 4).as("distinct_ratio"),
        PortableRound.pround(stopRatio, 4).as("stop_ratio"),
        score.as("quality_score"))
  }

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letters / single digits / punctuation as separate tokens). */
  def tokenStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]")).as("bpe_ish_tokens"),
        col("n_chars"))

  /** PII redaction: emails, IPv4 addresses, and long digit runs are
    * masked with typed placeholders — the standard scrub pass before
    * training-data release. Pure regexp_replace chain, single scan, no
    * UDF; the regexes stay in the RE2-compatible subset so the engine
    * and the DuckDB oracle agree. The synthetic contact line makes the
    * redaction observable on the wordlist-only test corpus. */
  def redactPii(spark: SparkSession, sfDir: String): DataFrame = {
    val withPii = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com from 10.1."), (col("doc_id") % 256).cast("string"),
      lit(".7 id "), lpad(col("doc_id").cast("string"), 8, "0"), lit("77"))
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
    val ipv4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    val digitRun = "\\b[0-9]{8,}\\b"
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(withPii, email, "<EMAIL>"),
        ipv4, "<IP>"),
      digitRun, "<NUM>")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), redacted.as("redacted"),
        (length(withPii) - length(redacted)).as("chars_removed"))
  }

  /** Document fingerprinting: position-weighted rolling hash over words,
    * engine-agnostic word hash (length/ascii arithmetic). Single scan,
    * map-side array fold — no shuffle, no UDF.
    */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    val words = split(col("text"), " ")
    def wordHash(w: Column): Column =
      length(w).cast("long") * 31L + ascii(substring(w, 1, 1)).cast("long") +
        ascii(substring(w, -1, 1)).cast("long") * 7L
    val fp = pmod(
      aggregate(
        zip_with(words, sequence(lit(1), size(words)),
          (w, i) => wordHash(w) * i.cast("long")),
        lit(0L), (acc, x) => acc + x),
      lit(1000000007L))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), fp.as("fingerprint"))
  }
}
