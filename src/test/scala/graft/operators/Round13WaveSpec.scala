package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 wave: the alert channels as declared queries, and the
  * calibrator cap fix (r12 advice — the minhash calibrators' docstrings
  * claimed a capped bucket join while the code joined uncapped). Value
  * correctness vs DuckDB is the oracle's job; these pin the semantics
  * and the cap actually routing through the join.
  */
class Round13WaveSpec extends AnyFunSuite {
  import graft.TestSpark.{spark, sfDir}

  test("graph_dropped_hubs: the declared low cap BITES on real data and matches a recount") {
    val got = graft.SparkEntry.queries("graph_dropped_hubs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty, "the alert channel must carry rows at the declared cap")
    assert(got.forall(_._2 > 16), s"every reported hub must exceed the cap: ${got.take(5).toSeq}")
    // recount: degree census over the same candidate pair list
    val pairs = GraphOps.candidatePairsMaterialized(spark, sfDir)
    val expect = pairs.select(col("id1").as("d"))
      .union(pairs.select(col("id2").as("d")))
      .groupBy(col("d")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == expect.toSet, "the channel must equal the degree census above the cap")
  }

  test("dedup_oversized_buckets: the declared census is the exact over-cap bucket population") {
    val got = graft.SparkEntry.queries("dedup_oversized_buckets")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.nonEmpty, "the bucket census must carry rows at the declared cap")
    assert(got.forall(_._3 > 2))
    val expect = Dedup.minhashLshBuckets(spark, sfDir)
      .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 2)
      .collect().map(r => (r.getInt(0).toLong, r.getString(1), r.getLong(2)))
    assert(got.toSet == expect.toSet)
  }

  test("minhash calibrators: the candidate join now routes through the cap (docstring == code)") {
    // cap = 0 drops EVERY bucket from candidate generation — a
    // calibrator that ignored its cap (the r12 defect) would still
    // emit its uncapped pair table here
    assert(Dedup.minhashEstimationError(spark, sfDir, maxBucketSize = 0).isEmpty,
      "est-err candidates must route through capHotKeys")
    assert(Dedup.minhashBbitError(spark, sfDir, maxBucketSize = 0).isEmpty,
      "b-bit candidates must route through capHotKeys")
    // a biting-but-nonzero cap yields a strict SUBSET of the default
    // pair table (sf0.001 has 15 buckets over size 2): capping can
    // only remove candidate pairs, never invent them
    val full = Dedup.minhashEstimationError(spark, sfDir)
      .select(col("doc1"), col("doc2"))
    val capped = Dedup.minhashEstimationError(spark, sfDir, maxBucketSize = 2)
      .select(col("doc1"), col("doc2"))
    assert(capped.exceptAll(full).isEmpty,
      "capped candidates must be a subset of the default table")
  }
}
