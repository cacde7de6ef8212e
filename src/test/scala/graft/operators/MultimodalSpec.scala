package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Multimodal binary-column semantics (the DuckDB oracle hash-checks
  * the declared queries; this pins the bit math independently). */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("byte aHash: independent JVM recount agrees, hash fits 8 bits") {
    val df = Multimodal.byteAHash(spark, sfDir)
    assert(df.filter(col("ahash") < 0 || col("ahash") > 255).count() == 0)
    val rows = df.filter(col("doc_id") < 5).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("ahash")).toMap
    val texts = graft.Tables.documents(spark, sfDir).filter(col("doc_id") < 5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    for ((id, text) <- texts) {
      val d = MessageDigest.getInstance("SHA-256").digest(text.getBytes("UTF-8"))
        .map(_ & 0xff)
      val total = d.sum
      val expect = (0 until 8).map { k =>
        if (d.slice(4 * k, 4 * k + 4).sum * 8 > total) 1L << k else 0L
      }.sum
      assert(rows(id) == expect, s"doc $id: got ${rows(id)}, recount $expect")
    }
  }
}
