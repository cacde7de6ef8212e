package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Real audio decode through javax.sound: WAV bytes round-trip
  * sample-exact, the failure channel degrades, and the query output
  * matches a direct recount (the hash gate is the DuckDB arithmetic
  * replica in SparkEntry.oracleSql("mm_decode_audio")).
  */
class AudioCodecSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("wav round-trip is sample-exact through the real codec") {
    val bytes = AudioCodec.encodeWav(docId = 3L, n = 777)
    val Right((rate, samples)) = AudioCodec.decode(bytes)
    assert(rate == AudioCodec.SampleRate)
    assert(samples.length == 777)
    for (i <- 0 until 777)
      assert(samples(i) == AudioCodec.sampleAt(3L, i),
        s"sample $i did not survive the WAV round-trip")
  }

  test("failure channel: garbage and truncated payloads degrade, never throw") {
    assert(AudioCodec.decode(Array[Byte](1, 2, 3)).isLeft)
    assert(AudioCodec.decode(Array.empty[Byte]).isLeft)
    val wav = AudioCodec.encodeWav(1L, 100)
    assert(AudioCodec.decode(wav.take(16)).isLeft, "truncated RIFF must fail cleanly")
  }

  test("envelope fingerprint: recount-exact, gain-invariant, separates unlike audio") {
    val samples = (0 until 1000).map(i => AudioCodec.sampleAt(11L, i)).toArray
    val (hi, lo) = AudioCodec.envelopeHashOf(samples)
    // query output equals the direct computation through the codec
    val viaQuery = AudioCodec.audioFingerprint(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, fp) <- viaQuery.take(30)) {
      val direct = AudioCodec.envelopeHashOf(
        (0 until AudioCodec.nSamples(docs(id))).map(i => AudioCodec.sampleAt(id, i)).toArray)
      assert(fp == direct, s"doc $id")
      assert(id % 10 != 0, "truncated docs have no PCM to hash")
    }
    // loudness invariance: uniform gain scales both comparison sides
    // (small synthetic samples so the doubled signal cannot clip)
    val quiet = (0 until 1000).map(i => (i * 37) % 2000 - 1000).toArray
    assert(AudioCodec.envelopeHashOf(quiet.map(_ * 2)) ==
      AudioCodec.envelopeHashOf(quiet))
    // a tiny local edit moves few envelope bits; unlike audio moves many
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val dented = samples.clone(); (0 until 10).foreach(i => dented(i) = 0)
    assert(ham(AudioCodec.envelopeHashOf(dented), (hi, lo)) <= 6)
    val other = (0 until 1000).map(i => AudioCodec.sampleAt(999L, i)).toArray
    assert(ham(AudioCodec.envelopeHashOf(other), (hi, lo)) >= 10)
  }

  test("decodeAudioStats matches a direct recount; corrupt docs flagged") {
    val rows = AudioCodec.decodeAudioStats(spark, sfDir).collect()
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == docs.size)
    for (r <- rows.take(50)) { // recount a prefix; the gate covers all
      val id = r.getLong(0)
      if (id % 10 == 0) assert(!r.getBoolean(1) && r.isNullAt(4))
      else {
        val n = AudioCodec.nSamples(docs(id))
        assert(r.getInt(3) == n)
        var sumAbs = 0L; var sumSq = 0L; var peak = 0
        for (i <- 0 until n) {
          val v = AudioCodec.sampleAt(id, i); val a = math.abs(v)
          sumAbs += a; sumSq += v.toLong * v; peak = math.max(peak, a)
        }
        assert(r.getLong(4) == sumAbs && r.getLong(5) == sumSq && r.getInt(6) == peak,
          s"doc $id stats through the real codec")
      }
    }
  }
}
