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
