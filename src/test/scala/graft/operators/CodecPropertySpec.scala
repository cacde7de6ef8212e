package graft.operators

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the three real codecs: ANY dims/frame-count/seed
  * must round-trip pixel- or sample-exact through encode→container→
  * decode — not just the doc-derived shapes the oracle queries use.
  * Catching a container-math slip (odd-size padding, idx1 offsets,
  * chunk sizes) at a weird size here is what keeps the arithmetic
  * oracles honest at every SF. */
class CodecPropertySpec extends AnyFunSuite {

  private val params = Parameters.default.withMinSuccessfulTests(40)

  test("AVI/MPNG: any (seed, frames, w, h) round-trips pixel-exact; odd dims pad correctly") {
    val gen = for {
      seed <- Gen.chooseNum(0L, 1000000L)
      n <- Gen.chooseNum(1, 7)
      w <- Gen.chooseNum(1, 33) // odd widths exercise the RIFF pad byte
      h <- Gen.chooseNum(1, 25)
    } yield (seed, n, w, h)
    val prop = Prop.forAll(gen) { case (seed, n, w, h) =>
      VideoCodec.decode(VideoCodec.encodeAvi(seed, n, w, h)) match {
        case Right(frames) =>
          frames.length == n && frames.forall { vf =>
            val d = vf.decoded
            d.width == w && d.height == h &&
              (0 until h).forall(y => (0 until w).forall(x =>
                d.luma(x, y) == VideoCodec.lumaAt(seed, vf.index, x, y)))
          }
        case Left(_) => false
      }
    }
    val r = check(params, prop)
    assert(r.passed, r.status.toString)
  }

  test("AVI idx1 seek: any stride/cap decodes exactly the sampled frames") {
    val gen = for {
      seed <- Gen.chooseNum(0L, 100000L)
      n <- Gen.chooseNum(1, 9)
      every <- Gen.chooseNum(1, 4)
      cap <- Gen.chooseNum(1, 5)
    } yield (seed, n, every, cap)
    val prop = Prop.forAll(gen) { case (seed, n, every, cap) =>
      val avi = VideoCodec.encodeAvi(seed, n, 9, 7)
      VideoCodec.decodeSampled(avi, every, cap) match {
        case Right(frames) =>
          frames.map(_.index) == Range(0, n, every).take(cap).toSeq &&
            frames.forall(vf => (0 until 7).forall(y => (0 until 9).forall(x =>
              vf.decoded.luma(x, y) == VideoCodec.lumaAt(seed, vf.index, x, y))))
        case Left(_) => false
      }
    }
    val r = check(params, prop)
    assert(r.passed, r.status.toString)
  }

  test("WAV: any (doc, n) round-trips sample-exact, including odd sample counts") {
    val gen = for {
      docId <- Gen.chooseNum(0L, 1000000L)
      n <- Gen.chooseNum(1, 4001)
    } yield (docId, n)
    val prop = Prop.forAll(gen) { case (docId, n) =>
      AudioCodec.decode(AudioCodec.encodeWav(docId, n)) match {
        case Right((rate, samples)) =>
          rate == AudioCodec.SampleRate && samples.length == n &&
            samples.indices.forall(i => samples(i) == AudioCodec.sampleAt(docId, i))
        case Left(_) => false
      }
    }
    val r = check(params, prop)
    assert(r.passed, r.status.toString)
  }

  test("PNG: any (seed, w, h) round-trips pixel-exact through ImageIO") {
    val gen = for {
      seed <- Gen.chooseNum(0L, 1000000L)
      w <- Gen.chooseNum(1, 80)
      h <- Gen.chooseNum(1, 60)
    } yield (seed, w, h)
    val prop = Prop.forAll(gen) { case (seed, w, h) =>
      ImageCodec.decode(ImageCodec.encodePng(seed, w, h)) match {
        case Right(d) =>
          d.width == w && d.height == h &&
            (0 until h).forall(y => (0 until w).forall(x =>
              d.luma(x, y) == ((seed + x + y) % 256).toInt))
        case Left(_) => false
      }
    }
    val r = check(params, prop)
    assert(r.passed, r.status.toString)
  }

  test("truncation at ANY byte offset degrades to Left, never throws") {
    val avi = VideoCodec.encodeAvi(7L, 3, 11, 9)
    val wav = AudioCodec.encodeWav(7L, 64)
    val offGen = Gen.chooseNum(0, avi.length - 1)
    val prop = Prop.forAll(offGen) { off =>
      // a cut anywhere inside the container must either fail CLEANLY or
      // (cut inside the trailing idx1, movi intact) decode ALL frames —
      // never a partial/garbage Right
      val full = VideoCodec.decode(avi.take(off)) match {
        case Left(_) => true
        case Right(frames) => frames.length == 3
      }
      // the seek path needs idx1, which is the LAST chunk: any cut
      // strictly inside the file must fail it cleanly
      full && VideoCodec.decodeSampled(avi.take(off), 1, 8).isLeft
    }
    val r = check(params, prop)
    assert(r.passed, r.status.toString)
    // WAV: cut inside the data chunk truncates samples, never throws
    (0 until wav.length by 7).foreach { off =>
      AudioCodec.decode(wav.take(off)) // must not throw
    }
  }
}
