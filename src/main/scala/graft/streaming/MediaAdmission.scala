package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.ImageCodec

/** Streaming MEDIA admission gate — the multimodal twin of
  * [[CorpusAdmission]]/[[NearDupProbe]]: arriving image payloads are
  * decode-VALIDATED through the real codec ([[ImageCodec.decode]],
  * F11 degradation), perceptually hashed, and cross-checked against
  * the standing corpus's aHash census before admission.
  *
  * Division of labor (the [[IngestStream]] architecture):
  *  - [[validate]] is STREAM-SAFE: a stateless narrow mapPartitions —
  *    no watermark, no state, works directly on a readStream frame;
  *  - [[admit]] runs per micro-batch inside `foreachBatch` (its
  *    aggregate + outer join are batch shapes), joining the validated
  *    rows' four 16-bit hash bands against the corpus census — the
  *    [[ImageCodec.imageHammingPairs]] blocking reused verbatim, exact
  *    popcount ≤ maxHam on the collided candidates only. At 100 TB the
  *    census is a bucketed table keyed (band, bval); each micro-batch
  *    touches only matching buckets and no state grows with the stream.
  *
  * Output: one row per arriving doc — `ok`, failure `reason`, hash
  * halves, `dup_of` (smallest matching corpus doc, null if novel).
  * Downstream sinks route: failed → quarantine, dup → drop/link,
  * novel → ingest.
  */
object MediaAdmission {

  val ValidatedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ok", BooleanType),
    StructField("reason", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("ahash_hi", LongType),
    StructField("ahash_lo", LongType)))

  /** Decode-validate arriving (doc_id, payload) rows: real codec, real
    * aHash, failure channel. Stateless — streaming and batch frames
    * produce identical output (spec-pinned). */
  def validate(arrivals: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(ValidatedSchema)
    arrivals.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getLong(0)
        ImageCodec.decode(r.getAs[Array[Byte]](1)) match {
          case Right(d) =>
            val (hi, lo) = ImageCodec.ahashOf(d)
            Row(docId, true, null, d.width, d.height, hi, lo)
          case Left(reason) =>
            Row(docId, false, reason, null, null, null, null)
        }
      }
    }(enc)
  }

  /** Video twin of [[validate]]: container walk + FIRST-FRAME decode
    * through the `idx1` seek index ([[graft.operators.VideoCodec
    * .decodeSampled]] with cap 1) — keyframe validation, so the other
    * frames' bytes never touch the codec at admission time. The
    * keyframe's aHash feeds the SAME banded census dedup as stills
    * (keyframe near-dup is the standard video-dedup first screen); a
    * full decode stays an offline job for admitted docs. Stateless and
    * stream-safe like [[validate]]. */
  def validateVideo(arrivals: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(ValidatedSchema)
    arrivals.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getLong(0)
        graft.operators.VideoCodec.decodeSampled(
            r.getAs[Array[Byte]](1), every = 1, cap = 1) match {
          case Right(frames) if frames.nonEmpty =>
            val d = frames.head.decoded
            val (hi, lo) = ImageCodec.ahashOf(d)
            Row(docId, true, null, d.width, d.height, hi, lo)
          case Right(_) =>
            Row(docId, false, "no frames", null, null, null, null)
          case Left(reason) =>
            Row(docId, false, reason, null, null, null, null)
        }
      }
    }(enc)
  }

  /** Explode (ahash_hi, ahash_lo) into the four 16-bit (band, bval)
    * keys — one shared definition for both join sides so they can
    * never drift. */
  def banded(df: DataFrame): DataFrame = {
    val bandVal = (band: Int) => band match {
      case 0 => col("ahash_lo").bitwiseAND(lit(65535L))
      case 1 => shiftright(col("ahash_lo"), 16).bitwiseAND(lit(65535L))
      case 2 => col("ahash_hi").bitwiseAND(lit(65535L))
      case _ => shiftright(col("ahash_hi"), 16).bitwiseAND(lit(65535L))
    }
    val bk = explode(array((0 until 4).map(b =>
      struct(lit(b).as("band"), bandVal(b).as("bval"))): _*)).as("bk")
    df.select(col("*"), bk)
      .select((df.columns.map(col) :+ col("bk.band").as("band")
        :+ col("bk.bval").as("bval")): _*)
  }

  /** Per-micro-batch admission decision (call inside `foreachBatch`):
    * `validated` rows against `corpusHashes(doc_id, ahash_hi,
    * ahash_lo)`. Failed decodes pass through with null `dup_of`. */
  def admit(validated: DataFrame, corpusHashes: DataFrame, maxHam: Int = 3): DataFrame = {
    val streamBands = banded(
      validated.filter(col("ok")).select(col("doc_id"), col("ahash_hi"), col("ahash_lo")))
    val censusBands = banded(corpusHashes.select(
        col("doc_id").as("c_doc"), col("ahash_hi"), col("ahash_lo")))
      .select(col("c_doc"), col("ahash_hi").as("c_hi"), col("ahash_lo").as("c_lo"),
        col("band"), col("bval"))
    val matches = streamBands.join(censusBands, Seq("band", "bval"))
      .filter(bit_count(col("ahash_hi").bitwiseXOR(col("c_hi"))) +
        bit_count(col("ahash_lo").bitwiseXOR(col("c_lo"))) <= maxHam)
      .groupBy(col("doc_id")).agg(min(col("c_doc")).as("dup_of"))
    validated.join(matches, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("ok"), col("reason"),
        col("ahash_hi"), col("ahash_lo"), col("dup_of"))
  }
}
