package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.ImageCodec

/** The streaming media gate end-to-end: a MemoryStream of real PNG
  * payloads (one valid duplicate of a corpus image, one valid novel
  * image, one corrupt payload) flows through validate → foreachBatch
  * admit, and each lands in the right routing bucket.
  */
class MediaAdmissionSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("validate: stream and batch paths produce identical rows") {
    val payloads = Seq(
      (1L, ImageCodec.encodePng(1L, 20, 16)),
      (2L, Array[Byte](1, 2, 3)))
    val batchOut = MediaAdmission.validate(payloads.toDF("doc_id", "payload"))
      .collect().map(_.toSeq).toSet

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Byte])]
    val q = MediaAdmission.validate(input.toDF().toDF("doc_id", "payload"))
      .writeStream.format("memory").queryName("media_validate")
      .outputMode("append").start()
    try {
      input.addData(payloads: _*)
      q.processAllAvailable()
      val streamOut = spark.sql("SELECT * FROM media_validate")
        .collect().map(_.toSeq).toSet
      assert(streamOut == batchOut)
      assert(batchOut.exists(r => r.head == 1L && r(1) == true))
      assert(batchOut.exists(r => r.head == 2L && r(1) == false))
    } finally q.stop()
  }

  test("validateVideo: keyframe-seek admission — valid AVI hashed by frame 0, truncation degrades") {
    import graft.operators.VideoCodec
    val avi = VideoCodec.encodeAvi(9L, 4, 20, 16)
    val rows = MediaAdmission.validateVideo(Seq(
        (1L, avi), (2L, avi.take(30))).toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getBoolean(1))
    assert(rows(1L).getInt(3) == 20 && rows(1L).getInt(4) == 16)
    assert(!rows(2L).getBoolean(1) && rows(2L).getString(2) != null)
    // the keyframe hash IS the still-image hash of frame 0, so the
    // banded census dedup works unchanged across modalities: a video
    // whose first frame equals a corpus STILL routes as its duplicate
    val Right(frame0) = ImageCodec.decode(ImageCodec.encodePng(9L, 20, 16))
    val (hi, lo) = ImageCodec.ahashOf(frame0)
    assert(rows(1L).getLong(5) == hi && rows(1L).getLong(6) == lo)
    val census = Seq((100L, hi, lo)).toDF("doc_id", "ahash_hi", "ahash_lo")
    val admitted = MediaAdmission.admit(
      MediaAdmission.validateVideo(Seq((1L, avi)).toDF("doc_id", "payload")),
      census).collect()
    assert(admitted.length == 1 && admitted.head.getAs[Long]("dup_of") == 100L)
  }

  test("validateVideo admits genuine MJPG containers: dims exact, corrupt JPEG degrades") {
    import graft.operators.VideoCodec
    // a real JPEG-frame AVI (lossy codec: assert dims + admission, not
    // pixel arithmetic — the PNG twin covers that)
    val mjpg = VideoCodec.encodeAvi(5L, 3, 24, 18, fcc = "MJPG")
    val rows = MediaAdmission.validateVideo(Seq((1L, mjpg)).toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getBoolean(1), s"MJPG admission failed: ${rows(1L).getString(2)}")
    assert(rows(1L).getInt(3) == 24 && rows(1L).getInt(4) == 18)
    assert(!rows(1L).isNullAt(5) && !rows(1L).isNullAt(6),
      "keyframe ahash must be computed for MJPG too")
    // corrupt frame 0's JPEG SOI marker (FF D8): the container walk
    // still finds the chunk, the per-frame codec failure must surface
    // through the failure channel, not throw
    val corrupt = mjpg.clone()
    val soi = corrupt.indexOfSlice(Seq(0xff.toByte, 0xd8.toByte))
    assert(soi > 0)
    corrupt(soi) = 0x00
    val bad = MediaAdmission.validateVideo(Seq((2L, corrupt)).toDF("doc_id", "payload"))
      .collect().head
    assert(!bad.getBoolean(1) && bad.getString(2) != null)
  }

  test("admission gate routes duplicate / novel / corrupt correctly") {
    // corpus census over the real decoded corpus images
    val census = ImageCodec.imageAHash(spark, sfDir).localCheckpoint()
    // an arriving EXACT duplicate of corpus doc 1's image
    val nChars1 = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") === 1).head().getAs[Long]("n_chars")
    val dupPng = ImageCodec.encodePng(1L, (nChars1 % 64 + 16).toInt, (nChars1 % 48 + 16).toInt)
    // a valid but novel image (flat gray — nothing in the corpus is flat)
    val novelPng = {
      val img = new java.awt.image.BufferedImage(
        31, 29, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val results = new ConcurrentLinkedQueue[Row]()
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Byte])]
    val q = MediaAdmission.validate(input.toDF().toDF("doc_id", "payload"))
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        MediaAdmission.admit(batch.toDF(), census).collect().foreach(results.add)
      }.start()
    try {
      input.addData((9001L, dupPng), (9002L, novelPng), (9003L, Array[Byte](9, 9)))
      q.processAllAvailable()
      val byId = results.toArray(Array.empty[Row]).map(r => r.getLong(0) -> r).toMap
      assert(byId.size == 3)
      // duplicate: ok, matched to corpus doc 1
      assert(byId(9001L).getBoolean(1) && byId(9001L).getLong(5) == 1L, s"${byId(9001L)}")
      // novel: ok, no match — hamming to every corpus hash exceeds the cap
      assert(byId(9002L).getBoolean(1) && byId(9002L).isNullAt(5), s"${byId(9002L)}")
      // corrupt: failed with a reason, no match
      assert(!byId(9003L).getBoolean(1) && !byId(9003L).isNullAt(2)
        && byId(9003L).isNullAt(5), s"${byId(9003L)}")
    } finally q.stop()
  }
}
