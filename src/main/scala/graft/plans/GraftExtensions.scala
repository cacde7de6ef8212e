package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The permanent-build registration path for the engine's custom
  * Catalyst expressions: users launch with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` and the
  * functions exist in every session from the start — the production
  * twin of the per-session `register(spark)` helpers the query
  * builders call (SURVEY §2.8 / §4.3 extension surface).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two double arrays"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("md5_hash48"),
      info("md5_hash48", "md5_hash48(s) - portable 48-bit md5-derived hash"),
      (exprs: Seq[Expression]) => Md5Hash48(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("l2_dist2"),
      info("l2_dist2", "l2_dist2(a, b) - squared L2 distance of two double arrays"),
      (exprs: Seq[Expression]) => L2Distance(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("edit_within1"),
      info("edit_within1", "edit_within1(a, b) - true iff levenshtein(a, b) <= 1, single O(n) scan"),
      (exprs: Seq[Expression]) => EditWithin1(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("kmv_sketch"),
      info("kmv_sketch", "kmv_sketch(h, k) - k smallest distinct longs (KMV distinct sketch)"),
      (exprs: Seq[Expression]) => KmvSketch(exprs(0), litInt(exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("topk_by"),
      info("topk_by", "topk_by(value, id, k) - bounded top-k (value desc, id asc) pairs"),
      (exprs: Seq[Expression]) => TopKBy(exprs(0), exprs(1), litInt(exprs(2)))))
    ext.injectFunction((
      FunctionIdentifier("distinct_up_to"),
      info("distinct_up_to", "distinct_up_to(v, k) - min(count_distinct(v), k) with O(k) state"),
      (exprs: Seq[Expression]) => DistinctUpTo(exprs(0), litInt(exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      info("bloom_agg", "bloom_agg(xxhash64(k), nItems, nBits) - bloom filter of a key set"),
      (exprs: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs(0), exprs(1), exprs(2)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("bloom_contains"),
      info("bloom_contains", "bloom_contains(bloom, xxhash64(k)) - bloom membership probe"),
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1))))
    // whole-operator extension: the native as-of join family
    // (logical node -> strategy -> sort-merge exec, AsofJoinPlan.scala)
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
    // optimizer-rule extension: naive point-in-interval joins become
    // bin-blocked equi-joins (RangeJoinRule.scala); inert until
    // spark.graft.rangeJoin.binWidth is set
    ext.injectOptimizerRule(_ => RangeJoinRule)
  }

  private def litInt(e: Expression): Int = e.eval().asInstanceOf[Int]
}
