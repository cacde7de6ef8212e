package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Losslessness proof for the PPJoin prefix filter, independent of the
  * DuckDB gate: the prefix-filtered plan must return exactly the pairs
  * a brute-force Scala recount finds, and corpus_dup_ngrams' top gram
  * must match a direct recount.
  */
class PrefixJaccardSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("prefix-filtered screen equals the brute-force batch-vs-corpus Jaccard join") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSet)
    val batch = docs.filter(_._1 % 20 == 0)
    val corpus = docs.filter(_._1 % 20 != 0)
    val expected = (for {
      (id1, a) <- batch; (id2, b) <- corpus
      shared = (a & b).size
      if shared * 19 >= 9 * (a.size + b.size)
    } yield (id1, id2, a.size.toLong, b.size.toLong, shared.toLong)).toSet
    val got = Dedup.prefixJaccardPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected,
      s"prefix plan ${got.size} pairs vs brute force ${expected.size}")
    assert(got.nonEmpty, "fixture must produce at least one qualifying pair")
  }

  test("dup-ngram miner's top span matches a direct recount") {
    val top = Corpus.dupNgrams(spark, sfDir).head()
    val gram = top.getString(0)
    val counts = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().map { r =>
        val w = r.getString(1).split(" ")
        val c = (0 to w.length - 5).count(i => w.slice(i, i + 5).mkString(" ") == gram)
        (r.getLong(0), c)
      }
    assert(counts.map(_._2).sum.toLong == top.getLong(1), s"total for '$gram'")
    assert(counts.count(_._2 > 0).toLong == top.getLong(2), s"doc spread for '$gram'")
  }
}
