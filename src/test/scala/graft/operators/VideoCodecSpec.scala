package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Real video decode: a genuine RIFF/AVI container (avih, strl, movi,
  * idx1) with Motion-PNG frames round-trips pixel-exact through the
  * container walk + per-frame ImageIO decode; the idx1 seek path
  * decodes only sampled frames; MJPG containers decode through the
  * same walk; the failure channel degrades. The hash gates are the
  * DuckDB arithmetic replicas in SparkEntry.oracleSql
  * ("mm_decode_video", "mm_video_sample").
  */
class VideoCodecSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("AVI/MPNG round-trip is pixel-exact through the real per-frame codec") {
    val bytes = VideoCodec.encodeAvi(docId = 5L, n = 4, w = 17, h = 11)
    val Right(frames) = VideoCodec.decode(bytes)
    assert(frames.length == 4)
    for (vf <- frames) {
      val d = vf.decoded
      assert(d.width == 17 && d.height == 11)
      for (y <- 0 until 11; x <- 0 until 17)
        assert(d.luma(x, y) == VideoCodec.lumaAt(5L, vf.index, x, y),
          s"pixel ($x,$y) of frame ${vf.index} did not survive the AVI round-trip")
    }
  }

  test("idx1 index-seek sampling decodes exactly frames 0,2,4… and matches full decode") {
    val bytes = VideoCodec.encodeAvi(docId = 9L, n = 6, w = 12, h = 9)
    val Right(sampled) = VideoCodec.decodeSampled(bytes, every = 2, cap = 4)
    assert(sampled.map(_.index) == Seq(0, 2, 4))
    val Right(full) = VideoCodec.decode(bytes)
    for (vf <- sampled; y <- 0 until 9; x <- 0 until 12)
      assert(vf.decoded.luma(x, y) == full(vf.index).decoded.luma(x, y))
    // cap binds when the stride would pick more
    val Right(capped) = VideoCodec.decodeSampled(bytes, every = 1, cap = 3)
    assert(capped.map(_.index) == Seq(0, 1, 2))
  }

  test("idx1 absolute-offset convention is detected and decodes identically") {
    // rewrite the movi-relative idx1 offsets of a real AVI into
    // absolute file offsets — the other convention found in the wild —
    // and expect the same sampled frames out
    val avi = VideoCodec.encodeAvi(docId = 9L, n = 6, w = 12, h = 9)
    def le32(b: Array[Byte], p: Int): Int =
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
        ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
    def wrLe32(b: Array[Byte], p: Int, v: Int): Unit = {
      b(p) = v.toByte; b(p + 1) = (v >> 8).toByte
      b(p + 2) = (v >> 16).toByte; b(p + 3) = (v >> 24).toByte
    }
    val moviFcc = avi.indexOfSlice("movi".getBytes("US-ASCII"))
    val idx1Hdr = avi.indexOfSlice("idx1".getBytes("US-ASCII"))
    assert(moviFcc > 0 && idx1Hdr > moviFcc)
    val abs = avi.clone()
    val nEntries = le32(abs, idx1Hdr + 4) / 16
    for (f <- 0 until nEntries) {
      val offField = idx1Hdr + 8 + 16 * f + 8
      wrLe32(abs, offField, le32(abs, offField) + moviFcc)
    }
    val Right(rel) = VideoCodec.decodeSampled(avi, every = 2, cap = 4)
    val Right(got) = VideoCodec.decodeSampled(abs, every = 2, cap = 4)
    assert(got.map(_.index) == rel.map(_.index))
    for ((a, b) <- got.zip(rel); y <- 0 until 9; x <- 0 until 12)
      assert(a.decoded.luma(x, y) == b.decoded.luma(x, y))
  }

  test("MJPG frames decode through the same container walk (lossy, dims exact)") {
    val bytes = VideoCodec.encodeAvi(docId = 2L, n = 3, w = 16, h = 16, fcc = "MJPG")
    val Right(frames) = VideoCodec.decode(bytes)
    assert(frames.length == 3)
    assert(frames.forall(f => f.decoded.width == 16 && f.decoded.height == 16))
    // JPEG is lossy but close: mean luma within a few steps of the source
    val src = (0 until 16).flatMap(y => (0 until 16).map(x =>
      VideoCodec.lumaAt(2L, 0, x, y))).sum / 256.0
    val got = (0 until 16).flatMap(y => (0 until 16).map(x =>
      frames.head.decoded.luma(x, y))).sum / 256.0
    assert(math.abs(src - got) < 8.0, s"jpeg mean drifted: $src vs $got")
  }

  test("failure channel: garbage, truncated, and frame-corrupt payloads degrade") {
    assert(VideoCodec.decode(Array[Byte](1, 2, 3)).isLeft)
    assert(VideoCodec.decode(Array.empty[Byte]).isLeft)
    val avi = VideoCodec.encodeAvi(1L, 3, 10, 10)
    assert(VideoCodec.decode(avi.take(20)).isLeft, "truncated header must fail cleanly")
    assert(VideoCodec.decodeSampled(avi.take(200), 2, 4).isLeft,
      "payload cut before idx1 must fail cleanly")
    // corrupt ONE frame's PNG signature: container walk still works,
    // the per-frame codec failure surfaces as Left
    val Right(ok) = VideoCodec.decode(avi)
    assert(ok.length == 3)
    val corrupt = avi.clone()
    // find first PNG signature (89 50 4E 47) past the headers and break it
    val sig = corrupt.indexOfSlice(Seq(0x89.toByte, 0x50.toByte, 0x4e.toByte, 0x47.toByte))
    assert(sig > 0)
    corrupt(sig) = 0x00
    assert(VideoCodec.decode(corrupt).isLeft, "frame-codec failure must surface")
  }

  test("decodeVideoStats matches a direct recount; corrupt docs flagged") {
    val rows = VideoCodec.decodeVideoStats(spark, sfDir).collect()
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == docs.size)
    for (r <- rows.take(40)) {
      val id = r.getLong(0)
      if (id % 10 == 0) assert(!r.getBoolean(1) && r.isNullAt(5))
      else {
        val nc = docs(id)
        val (n, w, h) = (VideoCodec.nFrames(nc), VideoCodec.frameW(nc), VideoCodec.frameH(nc))
        assert(r.getInt(2) == n && r.getInt(3) == w && r.getInt(4) == h)
        var expect = 0L
        for (f <- 0 until n; y <- 0 until h; x <- 0 until w)
          expect += VideoCodec.lumaAt(id, f, x, y)
        assert(r.getLong(5) == expect, s"sum_luma mismatch for doc $id")
        assert(r.getLong(6) == expect * 100L / (n.toLong * w * h))
      }
    }
  }

  test("sampledVideoStats decodes only the sampled frames' pixels") {
    val rows = VideoCodec.sampledVideoStats(spark, sfDir).collect()
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- rows.take(40)) {
      val id = r.getLong(0)
      if (id % 10 == 0) assert(!r.getBoolean(1) && r.isNullAt(4))
      else {
        val nc = docs(id)
        val picks = Range(0, VideoCodec.nFrames(nc), 2).take(4)
        assert(r.getInt(2) == picks.length)
        assert(r.getString(3) == picks.mkString(","))
        var expect = 0L
        for (f <- picks; y <- 0 until VideoCodec.frameH(nc); x <- 0 until VideoCodec.frameW(nc))
          expect += VideoCodec.lumaAt(id, f, x, y)
        assert(r.getLong(4) == expect)
      }
    }
  }
}
