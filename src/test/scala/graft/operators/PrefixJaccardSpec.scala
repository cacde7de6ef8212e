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

  test("positional filter is lossless on an adversarial boundary corpus") {
    // Corners the random fixture may never hit: exact-equality Jaccard
    // (s=18, n=19: J = 18/20 = 9/10 EXACTLY must pass the >= bar),
    // just-below pairs (s=17), single-token docs (prefix length 1),
    // identical docs (J=1), and pairs whose only shared PREFIX token
    // sits at the LAST prefix rank — the max_ub positional bound at
    // its tightest. Brute-force set-equality is the losslessness
    // proof for the whole prefix + positional + packed-verify chain.
    import spark.implicits._
    val toks = (0 until 40).map(i => f"w$i%02d") // lexicographic = stable ties
    def text(ids: Seq[Int]) = ids.map(toks).mkString(" ")
    val base = (0 until 19)
    val rows = Seq(
      // batch doc (id % 20 == 0) vs corpus twins at/below the bar
      (0L, text(base)),                       // n=19
      (1L, text(base.drop(1) :+ 25)),         // s=18 with doc 0 → J=0.9 exact
      (2L, text(base.drop(2) ++ Seq(25, 26))),// s=17 with doc 0 → J<0.9
      (3L, text(base)),                       // identical to 0 → J=1
      // single-token pair (n=1, prefix length 1)
      (20L, text(Seq(30))),
      (4L, text(Seq(30))),                    // J=1 with 20
      (5L, text(Seq(31))),                    // J=0 with 20
      // unrelated fillers to give the df census some spread
      (6L, text(Seq(32, 33, 34))),
      (7L, text(Seq(35, 36, 37, 38, 39)))
    )
    val dir = java.nio.file.Files.createTempDirectory("ppj_adv").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val docs = rows.map { case (id, t) => id -> t.split(" ").toSet }
    val batch = docs.filter(_._1 % 20 == 0)
    val corpus = docs.filter(_._1 % 20 != 0)
    val expected = (for {
      (id1, a) <- batch; (id2, b) <- corpus
      shared = (a & b).size
      if shared * 19 >= 9 * (a.size + b.size)
    } yield (id1, id2, a.size.toLong, b.size.toLong, shared.toLong)).toSet
    val got = Dedup.prefixJaccardPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected, s"adversarial corpus: got $got expected $expected")
    // the corpus is built so the exact-boundary and J=1 pairs exist
    assert(expected.contains((0L, 1L, 19L, 19L, 18L)), "J=0.9-exact pair must qualify")
    assert(expected.contains((0L, 3L, 19L, 19L, 19L)), "identical pair must qualify")
    assert(expected.contains((20L, 4L, 1L, 1L, 1L)), "single-token pair must qualify")
    assert(!expected.exists(p => p._1 == 0L && p._2 == 2L), "s=17 pair must not qualify")
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
