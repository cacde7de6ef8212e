package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 wave: MMR diverse selection, calendar-spine ACF, b-bit
  * minwise estimation. Value correctness vs DuckDB is the oracle's
  * job; these pin the SEMANTICS on synthetic inputs with hand-derived
  * answers (the factored `*Of` forms) plus the definitional
  * invariants a refactor could silently break.
  */
class Round12WaveSpec extends AnyFunSuite {
  import graft.TestSpark.{spark, sfDir}
  import spark.implicits._

  test("MMR: the diversity term overrides pure relevance on a planted near-duplicate") {
    graft.plans.CosineSimilarity.register(spark)
    // unit vectors at 0° (seed/query), 20°, 19°, −20°. Pure relevance
    // would pick 19° then 20° (9455 > 9397); MMR must pick 19° then
    // the −20° vector, because 20° is nearly a duplicate of 19°
    // (sim 9998) while −20° is 40° away from everything selected.
    def v(deg: Double) = {
      val r = math.toRadians(deg); Array(math.cos(r), math.sin(r))
    }
    val emb = Seq((0L, v(0)), (1L, v(20)), (2L, v(19)), (3L, v(-20)))
      .toDF("vec_id", "e")
    val got = Similarity.mmrSelectOf(emb, k = 4, lamTenths = 7)
      .orderBy(col("round")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(_._2).toSeq == Seq(0L, 2L, 3L, 1L),
      s"selection order must be seed, 19°, −20°, 20°: ${got.toSeq}")
    // round 1 is pure relevance (max_sim == rel when S = {query}):
    assert(got(1) == ((1L, 2L, 9455L, 9455L, 7 * 9455L - 3 * 9455L)), got(1).toString)
    // round 2: the diverse pick — its max-sim is still its seed
    // similarity (the 19° pick is 39° away, farther than the query):
    assert(got(2) == ((2L, 3L, 9397L, 9397L, 4 * 9397L)), got(2).toString)
    // round 3: the near-duplicate finally enters, penalized by its
    // 1°-to-19° similarity (9998):
    assert(got(3) == ((3L, 1L, 9397L, 9998L, 7 * 9397L - 3 * 9998L)), got(3).toString)
  }

  test("MMR: no re-selection, k rows, deterministic replay") {
    graft.plans.CosineSimilarity.register(spark)
    val a = Similarity.mmrSelect(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(a.length == 8)
    assert(a.map(_._2).distinct.length == 8, "a vector must never be selected twice")
    val b = Similarity.mmrSelect(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(a.toSeq == b.toSeq, "greedy selection must replay identically")
  }

  test("ACF: hand-derived values on a period-2 series; constant series yields NULL, not an error") {
    // "alt": 1,5 alternating over 8 days: dev = 8x−24 ∈ {−16,+16},
    // den = 2048; lag 1: 7 opposite-sign products = −1792 → −875
    // milli; lag 2: 6 equal-sign products = +1536 → +750 milli.
    // "gap": n=3 at days 0 and 2, day 1 ABSENT — the spine must
    // restore it as a zero-count day: dev = (3, −6, 3), den = 54,
    // lag 1 = −36 → −666 (sign-safe DIV truncates toward zero on both
    // engines), lag 2 = 9 → +166 (without restoration the
    // lag-1 numerator would be 0: no adjacent present days exist).
    val daily = (0 until 8).map(d => ("alt", d.toLong, if (d % 2 == 0) 1L else 5L))
      .++(Seq(("gap", 0L, 3L), ("gap", 2L, 3L)))
      .++(Seq(("flat", 0L, 5L), ("flat", 1L, 5L), ("flat", 2L, 5L)))
      .toDF("event_type", "day", "n")
    val got = Relational.acfOf(daily, maxLag = 2).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))))
      .toMap
    assert(got(("alt", 1L)) == ((-1792L, 2048L, Some(-875L))), got.toString)
    assert(got(("alt", 2L)) == ((1536L, 2048L, Some(750L))), got.toString)
    assert(got(("gap", 1L)) == ((-36L, 54L, Some(-666L))), got.toString)
    assert(got(("gap", 2L)) == ((9L, 54L, Some(166L))), got.toString)
    // constant series: every deviation is 0 → den 0 → NULL acf
    assert(got(("flat", 1L)) == ((0L, 0L, None)), got.toString)
    assert(got(("flat", 2L)) == ((0L, 0L, None)), got.toString)
  }

  test("b-bit minwise: masking only ADDS collisions, and the estimator inverts the match count exactly") {
    val rows = Dedup.minhashBbitError(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nf, nb) = (r.getLong(2), r.getLong(3))
      assert(nb >= nf, s"low-bit masking can only add matches: full=$nf bbit=$nb")
      val est = r.getLong(5)
      val expected = // (n·2^b − 32) / (32·(2^b−1)) in sign-safe milli
        if (nb * 16 >= 32) (1000L * (nb * 16 - 32)) / 480
        else -((1000L * (32 - nb * 16)) / 480)
      assert(est == expected, s"estimator mismatch: n=$nb est=$est expected=$expected")
      assert(est <= 1000L && est >= -67L,
        s"estimate range [(0−C)/(1−C), 1] violated: $est")
    }
  }
}
