package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming corpus admission: the gate a training-data pipeline runs
  * on arriving crawl documents BEFORE they touch the corpus —
  *
  *  1. quality gate: the same Gopher/C4-style score as the batch
  *     `text_quality` query ([[TextAnalysis.qualityScoreCol]] — one
  *     expression, both paths), stateless per row;
  *  2. cross-batch exact dedup: first occurrence of a content hash is
  *     admitted, replays drop — [[StreamSources.statefulDedup]]
  *     (one boolean per key; the TTL'd variant bounds the store at
  *     production arrival rates).
  *
  * Near-dup flagging intentionally stays a SIBLING stream
  * ([[NearDupProbe.probe]] over the same frame): fusing the band-
  * collision aggregation into this query would stack a second stateful
  * operator onto the dedup state, and the verification join is a batch
  * concern over flagged ids anyway.
  *
  * Scale: stateless projection + one keyed state store lookup per row;
  * no shuffle beyond the state-store hash partitioning, no watermark,
  * state O(distinct admitted hashes) (TTL-bounded in production).
  */
object CorpusAdmission {

  /** Admitted rows of a (possibly streaming) `streamDocs(doc_id, text)`
    * frame: quality-gated, first-occurrence-only.
    * Output: (doc_id, text, quality_score). */
  def admit(streamDocs: DataFrame, minQuality: Double = 0.5): DataFrame = {
    val spark = streamDocs.sparkSession
    import spark.implicits._
    val gated = streamDocs
      .withColumn("quality_score", TextAnalysis.qualityScoreCol)
      .filter(col("quality_score") >= minQuality)
      .select(md5(col("text")).as("content_hash"),
        col("doc_id"), col("text"), col("quality_score"))
      .as[(String, Long, String, Double)]
      .map { case (h, id, tx, q) => (h, (id, tx, q)) }
    StreamSources.statefulDedup(gated)
      .flatMap(_.toSeq)
      .toDF("doc_id", "text", "quality_score")
  }
}
