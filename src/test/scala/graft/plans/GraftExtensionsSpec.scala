package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions path must make the custom expressions
  * available to plain SQL in a fresh session with no per-query
  * register() calls — the deployment story for a shared cluster.
  *
  * Session plumbing: builder.getOrCreate() would just return the suite's
  * shared session (extensions only apply when a session object is
  * INSTANTIATED), so the default/active session is cleared, a new
  * session is created over the existing SparkContext, and the previous
  * one restored — never stop()ed, that would kill the shared context.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("a session built with GraftExtensions answers SQL using the custom functions") {
    graft.TestSpark.spark // ensure the shared context exists first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // spark.sql.extensions is a STATIC conf read from the
      // SparkContext at context creation — it cannot be applied to the
      // suite's existing context, so the spec goes through the public
      // withExtensions builder hook, which runs the same class.
      val spark = SparkSession.builder()
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      val cos = spark.sql(
        "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head.getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      val h = spark.sql("SELECT md5_hash48('') AS h").head.getLong(0)
      assert(h == java.lang.Long.parseLong("d41d8cd98f00", 16))
      val d2 = spark.sql(
        "SELECT l2_dist2(array(1.0d, 2.0d), array(4.0d, 6.0d)) AS d").head.getDouble(0)
      assert(d2 == 25.0)
      // same value as the composed formulation inside the same session
      val composed = spark.sql(
        "SELECT cast(conv(substring(md5(''), 1, 12), 16, 10) as bigint)").head.getLong(0)
      assert(h == composed)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("GraftExtensions injects the range-join rule — no per-query register()") {
    graft.TestSpark.spark
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val spark = SparkSession.builder()
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      import spark.implicits._
      spark.conf.set(RangeJoinRule.WidthConf, "10")
      try {
        val l = Seq((1L, 15L)).toDF("pid", "x")
        val r = Seq((7L, 10L, 30L)).toDF("iid", "lo", "hi")
        val df = l.join(r, org.apache.spark.sql.functions.col("x") >= org.apache.spark.sql.functions.col("lo") &&
          org.apache.spark.sql.functions.col("x") < org.apache.spark.sql.functions.col("hi"))
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastNestedLoopJoin") && p.contains("__graft_bin"),
          s"extensions-injected rule must rewrite the naive range join:\n$p")
        assert(df.count() == 1)
      } finally spark.conf.unset(RangeJoinRule.WidthConf)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
