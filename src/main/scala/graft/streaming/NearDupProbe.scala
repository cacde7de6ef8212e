package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming near-duplicate probe: flag arriving documents that
  * minhash-collide with an existing corpus — the admission filter a
  * training-data pipeline runs before letting new crawl data in.
  *
  * Shape: the STREAM side computes its banded minhash buckets per row
  * ([[Dedup.minhashBucketsPerRow]] — stateless, no watermark, no
  * streaming-aggregation state), then a stream-static EQUI-join on
  * (band, bucket) against the precomputed corpus buckets. At 100 TB
  * the static side is a bucketed/partitioned table keyed the same way,
  * so each micro-batch joins against only the matching buckets; no
  * state grows with the stream, and re-banding the corpus is a batch
  * job, not a streaming concern.
  *
  * Output: one row per (arriving doc, corpus doc, band) bucket
  * collision — band-level hits, the same candidate semantics as the
  * batch LSH candidate stage. Verification (true Jaccard/cosine) is a
  * downstream batch join over the flagged ids only.
  */
object NearDupProbe {

  /** (doc_id, corpus_doc_id, band, bucket) collisions of a (possibly
    * streaming) `streamDocs(doc_id, text)` frame against static
    * `corpusBuckets(doc_id, band, bucket)`. */
  def probe(streamDocs: DataFrame, corpusBuckets: DataFrame): DataFrame =
    Dedup.minhashBucketsPerRow(streamDocs)
      .join(corpusBuckets.select(col("doc_id").as("corpus_doc_id"),
        col("band"), col("bucket")), Seq("band", "bucket"))
      .filter(col("doc_id") =!= col("corpus_doc_id"))
      .select(col("doc_id"), col("corpus_doc_id"), col("band"), col("bucket"))
}
