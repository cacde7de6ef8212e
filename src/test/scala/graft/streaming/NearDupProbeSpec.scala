package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.Dedup

class NearDupProbeSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("per-row minhash buckets equal the grouped batch formulation") {
    val docs = graft.Tables.documents(spark, sfDir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val perRow = rows(Dedup.minhashBucketsPerRow(docs))
    val grouped = rows(Dedup.minhashLshBuckets(spark, sfDir))
    assert(perRow == grouped,
      s"asymmetric diff sizes: ${(perRow diff grouped).size}/${(grouped diff perRow).size}")
  }

  test("streaming probe flags an arriving duplicate of a corpus doc") {
    val corpusBuckets = Dedup.minhashLshBuckets(spark, sfDir)
    val dupText = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") === 0).head().getAs[String]("text")

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val q = NearDupProbe.probe(stream, corpusBuckets)
      .writeStream.format("memory").queryName("neardup_probe")
      .outputMode("append").start()
    try {
      input.addData((9001L, dupText), (9002L, "completely novel words nothing shared"))
      q.processAllAvailable()
      val hits = spark.sql("SELECT doc_id, corpus_doc_id FROM neardup_probe")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // the exact duplicate collides with corpus doc 0 in every band
      assert(hits.contains((9001L, 0L)), s"hits: $hits")
      val bands = spark.sql(
        "SELECT count(*) FROM neardup_probe WHERE doc_id = 9001 AND corpus_doc_id = 0")
        .head().getLong(0)
      assert(bands == 8L, s"exact dup must collide in all 8 bands, got $bands")
    } finally q.stop()
  }
}
