package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.Sketches

/** Bounded-aggregate semantics: KMV = k smallest DISTINCT hashes with
  * associative merge; TopKBy = (value desc, id asc) with dedup; both
  * must plan as partial ObjectHashAggregate (the O(k) shuffle claim).
  */
class BoundedAggregatesSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("kmv buffer keeps the k smallest distinct values") {
    val b = new KmvBuffer(3)
    Seq(9L, 5L, 7L, 5L, 1L, 8L, 2L).foreach(b.add)
    assert(b.set.toArray.toSeq == Seq(1L, 2L, 5L))
  }

  test("kmv merge == single-pass build (associativity)") {
    val vals = (1 to 100).map(i => (i * 37 % 101).toLong)
    val one = new KmvBuffer(8); vals.foreach(one.add)
    val (l, r) = vals.splitAt(40)
    val a = new KmvBuffer(8); l.foreach(a.add)
    val c = new KmvBuffer(8); r.foreach(c.add)
    val merged = KmvSketch(null, 8).merge(a, c)
    assert(merged.set.toArray.toSeq == one.set.toArray.toSeq)
  }

  test("kmv serialize round-trip") {
    val agg = KmvSketch(null, 4)
    val b = new KmvBuffer(4); Seq(3L, 1L, 4L, 1L, 5L).foreach(b.add)
    val back = agg.deserialize(agg.serialize(b))
    assert(back.set.toArray.toSeq == b.set.toArray.toSeq)
  }

  test("topk buffer orders by value desc then id asc, dedups, caps at k") {
    val b = new TopKBuffer(3)
    Seq((1.0, 10L), (5.0, 2L), (5.0, 1L), (5.0, 2L), (3.0, 7L), (4.0, 9L))
      .foreach { case (v, id) => b.add(v, id) }
    assert(b.set.toArray.toSeq == Seq((5.0, 1L), (5.0, 2L), (4.0, 9L)))
  }

  test("topk serialize round-trip and merge") {
    val agg = TopKBy(null, null, 2)
    val a = new TopKBuffer(2); a.add(1.0, 1L); a.add(2.0, 2L)
    val c = agg.deserialize(agg.serialize(a))
    val d = new TopKBuffer(2); d.add(3.0, 3L)
    val m = agg.merge(c, d)
    assert(m.set.toArray.toSeq == Seq((3.0, 3L), (2.0, 2L)))
  }

  test("kmv estimate is within 25% of the true distinct count (sf events)") {
    val rows = Sketches.kmvDistinct(spark, sfDir).collect()
    val truth = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(rows.nonEmpty)
    for (r <- rows) {
      val t = truth(r.getAs[String]("event_type")).toDouble
      val est = r.getAs[Double]("est_distinct")
      assert(math.abs(est - t) / t < 0.25, s"${r.getAs[String]("event_type")}: est=$est true=$t")
    }
  }

  test("cms heavy hitters: one-sided (est >= exact), tight on heavy keys, d*w-bounded matrix") {
    val rows = Sketches.cmsHeavyHitters(spark, sfDir).collect()
    val nUsers = graft.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(rows.length == math.min(20L, nUsers))
    for (r <- rows) {
      val exact = r.getAs[Long]("exact_n")
      val est = r.getAs[Long]("cms_est")
      // the CMS invariant: never an undercount
      assert(est >= exact, s"user ${r.get(0)}: est=$est < exact=$exact")
      // error bound ~2N/w is loose; at sf events N/w is small, so the
      // top keys should estimate within a small additive band
      assert(r.getAs[Long]("overcount") == est - exact)
    }
    // the sketch the estimates came from is the bounded d×w matrix
    val users = graft.Tables.events(spark, sfDir).select(col("user_id"))
    val cellCount = users
      .select(col("user_id"), explode(array((0 until 4).map(lit): _*)).as("d"))
      .withColumn("c", pmod(graft.functions.PortableHash.md5Hash48(
        concat(col("d").cast("string"), lit(":"), col("user_id").cast("string"))),
        lit(1024L)))
      .select("d", "c").distinct().count()
    assert(cellCount <= 4L * 1024L, s"counter matrix exceeded d*w: $cellCount")
  }

  test("topk query matches the window formulation exactly") {
    val viaAgg = Sketches.topKPerGroup(spark, sfDir)
      .select("event_type", "rank", "event_id").as[(String, Long, Long)]
      .collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("value").desc, col("event_id"))
    val viaWindow = graft.Tables.events(spark, sfDir)
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("event_type"), col("rank").cast("long"), col("event_id"))
      .as[(String, Long, Long)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("group sample matches the window formulation; stable under re-evaluation") {
    val viaAgg = Sketches.groupSample(spark, sfDir)
      .select("event_type", "rank", "event_id").as[(String, Long, Long)]
      .collect().toSet
    val h = graft.functions.PortableHash.md5Hash48(
      concat(lit("gs:"), col("event_id").cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("h"), col("event_id"))
    val viaWindow = graft.Tables.events(spark, sfDir)
      .withColumn("h", h)
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 8)
      .select(col("event_type"), col("rank").cast("long"), col("event_id"))
      .as[(String, Long, Long)].collect().toSet
    assert(viaAgg == viaWindow)
    // determinism: a second run picks the same ids (hash tag, no RNG)
    val again = Sketches.groupSample(spark, sfDir)
      .select("event_type", "rank", "event_id").as[(String, Long, Long)]
      .collect().toSet
    assert(again == viaAgg)
  }

  test("distinct_up_to: exact below the cap, saturates at k, O(k) buffer") {
    val b = new DistinctUpToBuffer(3)
    Seq(5L, 5L, 7L, 9L, 11L, 13L).foreach(b.add)
    assert(b.set.size == 3, "buffer must stop growing at k")
    // merge saturation: {1,2} ∪ {1,4,…} reaches k and stops
    val agg = DistinctUpTo(null, 3)
    val x = new DistinctUpToBuffer(3); Seq(1L, 2L).foreach(x.add)
    val y = new DistinctUpToBuffer(3); Seq(1L, 4L, 6L).foreach(y.add)
    val m = agg.merge(x, y)
    assert(agg.eval(m) == 3L)
    // serialize round-trip
    val back = agg.deserialize(agg.serialize(m))
    assert(back.set == m.set)
    // DataFrame semantics vs the exact counter, below and above the cap
    BoundedAggregates.register(spark)
    val df = (1 to 60).map(i => (i % 7, (i % (3 + i % 7 % 3 + 1)).toLong))
      .toDF("g", "v")
    val got = df.groupBy(col("g"))
      .agg(expr("distinct_up_to(v, 3)").as("b"), countDistinct(col("v")).as("t"))
      .as[(Int, Long, Long)].collect()
    for ((g, bounded, truth) <- got)
      assert(bounded == math.min(truth, 3L), s"group $g: $bounded vs min($truth, 3)")
  }

  test("chunk census via distinct_up_to matches the exact count_distinct census") {
    import graft.operators.Dedup
    // the declared query's boilerplate set must be IDENTICAL to the
    // unbounded formulation — saturation only truncates counts past the
    // threshold it is compared against
    val viaBounded = Dedup.chunksGlobal(spark, sfDir)
      .select("doc_id", "n_kept").as[(Long, Long)].collect().toMap
    assert(viaBounded.nonEmpty)
    val words = split(col("text"), " ")
    val nChunks = ceil(size(words).cast("double") / 4).cast("int")
    val chunks = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => array_join(slice(words, i * 4 + 1, lit(4)), " ")))
          .as(Seq("pos", "chunk")))
    val exact = chunks.join(
        chunks.groupBy(col("chunk")).agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2).select(col("chunk")),
        Seq("chunk"), "left_anti")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_kept"))
      .as[(Long, Long)].collect().toMap
    assert(viaBounded == exact)
  }

  test("both aggregates plan as partial ObjectHashAggregate") {
    for (q <- Seq(Sketches.kmvDistinct(spark, sfDir), Sketches.topKPerGroup(spark, sfDir))) {
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("ObjectHashAggregate"), s"not object-hash-aggregated:\n$p")
      // two-phase: a partial aggregate below the exchange
      assert(p.contains("partial_"), s"no map-side partial:\n$p")
    }
  }

  test("functions are reachable through the SparkSessionExtensions path") {
    // same session plumbing as GraftExtensionsSpec: new session over the
    // shared context via the public withExtensions hook
    graft.TestSpark.spark
    val prevDefault = org.apache.spark.sql.SparkSession.getDefaultSession
    val prevActive = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      val ids = s2.sql(
        "SELECT transform(topk_by(v, id, 2), e -> e.id) AS ids " +
          "FROM VALUES (1.0d, 1L), (3.0d, 2L), (2.0d, 3L) AS x(v, id)")
        .collect().head.getAs[scala.collection.Seq[Long]]("ids")
      assert(ids == Seq(2L, 3L))
      val kmv = s2.sql(
        "SELECT kmv_sketch(h, 2) AS m FROM VALUES (5L), (1L), (3L), (1L) AS x(h)")
        .collect().head.getAs[scala.collection.Seq[Long]]("m")
      assert(kmv == Seq(1L, 3L))
    } finally {
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      prevDefault.foreach(org.apache.spark.sql.SparkSession.setDefaultSession)
      prevActive.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
    }
  }
}
