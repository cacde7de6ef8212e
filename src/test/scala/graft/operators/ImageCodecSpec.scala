package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The REAL image-decode path: these tests prove the codec actually
  * decodes bytes (PNG round-trip pixel-exact, JPEG/BMP/GIF through the
  * same entry point), that the failure channel degrades instead of
  * throwing, and that the query outputs match a direct recount. The
  * hash-level gate is the DuckDB arithmetic replica of the decoded
  * statistics (SparkEntry.oracleSql: mm_decode_image, mm_image_ahash).
  */
class ImageCodecSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("png round-trip is pixel-exact") {
    val bytes = ImageCodec.encodePng(seed = 7L, w = 20, h = 13)
    val d = ImageCodec.decode(bytes).toOption.get
    assert(d.width == 20 && d.height == 13)
    for (y <- 0 until 13; x <- 0 until 20)
      assert(d.luma(x, y) == ((7 + x + y) % 256),
        s"pixel ($x,$y) did not survive the PNG round-trip")
  }

  test("pHash: flat image hashes to zero; brightness shift is invariant where aHash is not") {
    def gray(w: Int, h: Int)(f: (Int, Int) => Int): ImageCodec.Decoded = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, f(x, y) & 0xff)
      ImageCodec.Decoded(w, h, img)
    }
    // constant image: every DCT AC is 0, lower median 0, no bit > median
    assert(ImageCodec.phashOf(gray(16, 16)((_, _) => 77)) == ((0L, 0L)))
    // a global +40 brightness shift moves ONLY the DC coefficient —
    // the AC pattern and therefore the pHash must be identical
    def tex(x: Int, y: Int): Int = (x * 13 + y * 7) % 128
    val base = ImageCodec.phashOf(gray(24, 24)(tex))
    val brighter = ImageCodec.phashOf(gray(24, 24)((x, y) => tex(x, y) + 40))
    assert(base == brighter, "pHash must survive a global brightness shift")
    assert(base != ((0L, 0L)), "textured image must produce a nonzero hash")
    // the DCT basis is orthogonal-ish fixed point: row 0 is all 16384
    assert(ImageCodec.DctK(0).forall(_ == 16384L))
  }

  test("jpeg, bmp and gif decode through the same entry point") {
    // JPEG is lossy: assert dims exact and mean luminance close.
    val src = new BufferedImage(16, 16, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 16; x <- 0 until 16) {
      val g = (x * 8 + y * 8) % 256
      src.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    for (fmt <- Seq("jpg", "bmp", "gif")) {
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(src, fmt, bos), s"no $fmt writer in this JDK")
      val d = ImageCodec.decode(bos.toByteArray).toOption.get
      assert(d.width == 16 && d.height == 16, s"$fmt dims")
      val mean = (for (y <- 0 until 16; x <- 0 until 16) yield d.luma(x, y)).sum / 256.0
      val srcMean = (for (y <- 0 until 16; x <- 0 until 16) yield (x * 8 + y * 8) % 256).sum / 256.0
      assert(math.abs(mean - srcMean) < 16.0, s"$fmt mean luma $mean vs $srcMean")
    }
  }

  test("failure channel: garbage and truncated payloads degrade, never throw") {
    assert(ImageCodec.decode(Array[Byte](1, 2, 3, 4)).isLeft)
    assert(ImageCodec.decode(Array.empty[Byte]).isLeft)
    val png = ImageCodec.encodePng(3L, 24, 24)
    assert(ImageCodec.decode(png.take(16)).isLeft, "truncated PNG must fail cleanly")
  }

  test("decodeImageStats: real decode matches a direct recount; corrupt docs flagged") {
    val rows = ImageCodec.decodeImageStats(spark, sfDir).collect()
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == docs.size)
    for (r <- rows) {
      val id = r.getLong(0)
      if (id % 10 == 0) {
        assert(!r.getBoolean(1) && r.isNullAt(2) && r.isNullAt(5),
          s"doc $id: truncated payload must yield ok=false with null stats")
      } else {
        assert(r.getBoolean(1))
        val w = (docs(id) % 64 + 16).toInt
        val h = (docs(id) % 48 + 16).toInt
        assert(r.getInt(2) == w && r.getInt(3) == h)
        var expected = 0L
        for (y <- 0 until h; x <- 0 until w) expected += (id + x + y) % 256
        assert(r.getLong(5) == expected, s"doc $id sum_luma through the real codec")
        assert(r.getLong(6) == expected * 100L / (w.toLong * h))
      }
    }
  }

  test("imageHammingPairs: band blocking loses nothing vs the brute-force pair scan") {
    val hashes = ImageCodec.imageAHash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute force over DISTINCT hashes, exactly what the census+bands plan computes
    val census = hashes.groupBy(h => (h._2, h._3)).map { case ((hi, lo), ds) =>
      (hi, lo, ds.length, ds.map(_._1).min)
    }.toSeq
    val expected = (for {
      a <- census; b <- census
      if a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
      ham = java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
      if ham <= 3
    } yield (a._4, b._4, ham)).toSet
    val got = ImageCodec.imageHammingPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    assert(got == expected, s"band-blocked ${got.size} vs brute ${expected.size}")
    assert(got.nonEmpty, "fixture must produce at least one near-dup pair")
  }

  test("imageAHash: bits match the exact cross-multiplication recount for one doc") {
    val r = ImageCodec.imageAHash(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 1L).head()
    val nChars = graft.Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 1L)
      .head().getAs[Long]("n_chars")
    val w = (nChars % 64 + 16).toInt; val h = (nChars % 48 + 16).toInt
    val bSum = Array.ofDim[Long](64); val bN = Array.ofDim[Long](64)
    var total = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val v = (1 + x + y) % 256
      val b = (y * 8 / h) * 8 + (x * 8 / w)
      bSum(b) += v; bN(b) += 1; total += v
    }
    val nPx = w.toLong * h
    var hi = 0L; var lo = 0L
    for (b <- 0 until 64 if bSum(b) * nPx > total * bN(b))
      if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
    assert(r.getLong(1) == hi && r.getLong(2) == lo)
  }
}
