package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.Similarity

/** The native codegen'd squared-L2 expression must be BIT-identical to
  * the higher-order-function fold (same index-order accumulation) —
  * that identity is what keeps the PQ/IVF-PQ DuckDB oracles valid. */
class L2DistanceSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("native expression equals HOF fold bit-for-bit on real embeddings") {
    L2Distance.register(spark)
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val a = emb.select(col("vec_id").as("id1"), col("e").as("e1")).filter(col("id1") < 40)
    val b = emb.select(col("vec_id").as("id2"), col("e").as("e2")).filter(col("id2") < 40)
    val pairs = a.join(b, col("id1") < col("id2"))
      .select(
        Similarity.l2d2(col("e1"), col("e2")).as("native"),
        Similarity.l2d2Fold(col("e1"), col("e2")).as("fold"))
    assert(pairs.filter(col("native") =!= col("fold")).count() == 0)
    assert(pairs.count() == 40L * 39 / 2)
  }

  test("edge cases: identical vectors 0.0, length mismatch null, null elem null") {
    L2Distance.register(spark)
    import spark.implicits._
    val same = Seq((Array(1.5, -2.5), Array(1.5, -2.5))).toDF("a", "b")
      .select(call_function("l2_dist2", col("a"), col("b"))).head()
    assert(same.getDouble(0) == 0.0)
    val mismatch = Seq((Array(1.0), Array(1.0, 2.0))).toDF("a", "b")
      .select(call_function("l2_dist2", col("a"), col("b"))).head()
    assert(mismatch.isNullAt(0))
    val nullElem = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)))
      .toDF("a", "b")
      .select(call_function("l2_dist2", col("a"), col("b"))).head()
    assert(nullElem.isNullAt(0))
  }

  test("interpreted eval path matches codegen on a literal projection") {
    L2Distance.register(spark)
    import spark.implicits._
    val v = Seq((Array(0.5, 0.25, -1.5), Array(-0.75, 2.0, 0.125))).toDF("a", "b")
    val native = v.select(call_function("l2_dist2", col("a"), col("b"))).head().getDouble(0)
    val fold = v.select(Similarity.l2d2Fold(col("a"), col("b"))).head().getDouble(0)
    assert(native == fold)
  }
}
