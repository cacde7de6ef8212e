package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CorpusAdmissionSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val good =
    "the quick brown fox and the lazy dog of the meadow ran over the fence"
  private val junk =
    "zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz"

  test("admission: quality gate drops junk, dedup admits first occurrence " +
      "only, replays drop ACROSS batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = CorpusAdmission.admit(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("admission")
      .outputMode("update").start()
    try {
      // batch 1: good doc, junk doc, in-batch duplicate of the good doc
      input.addData((1L, good), (2L, junk), (3L, good))
      q.processAllAvailable()
      // batch 2: cross-batch replay of the good content + a novel doc
      input.addData((4L, good),
        (5L, "a calm river and a stone bridge of the old town"))
      q.processAllAvailable()
      val admitted = spark.sql("SELECT doc_id, quality_score FROM admission")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(admitted.keySet == Set(1L, 5L),
        s"expected first-occurrence good docs only, got ${admitted.keySet}")
      assert(admitted.values.forall(_ >= 0.5))
    } finally q.stop()
  }

  test("the streaming gate scores exactly like the batch text_quality query") {
    val batch = graft.operators.TextAnalysis
      .qualityScore(spark, TestSpark.sfDir)
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // run the same documents through the admission projection (batch DF —
    // the Column is identical by construction, this pins it)
    import org.apache.spark.sql.functions.col
    val viaGate = graft.Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"),
        graft.operators.TextAnalysis.qualityScoreCol.as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaGate == batch)
  }
}
