package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Extractors

/** Additional relational-substrate coverage: grouping sets, semi joins,
  * pattern joins, date arithmetic, SQL-text entry, extractor registry,
  * common-path aggregation, checksum surface. Everything here is a
  * single declarative plan — Catalyst picks broadcast vs shuffle and
  * keeps aggregates partial.
  */
object Substrate {

  /** ROLLUP aggregation (grouping-set substrate; free per SURVEY §2.5). */
  def rollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2).cast("double").as("total"))

  /** CUBE aggregation — all four grouping sets of (lang, source) in one
    * pass (the Expand doubles rows per grouping set, aggregates stay
    * partial; the rollup twin is [[rollup]]). */
  def cubeOp(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))

  /** FULL OUTER join — the one join flavor the substrate hadn't
    * exercised: segment customers vs their 1996 order activity, keeping
    * BOTH unmatched sides (segment customers with no orders AND active
    * customers outside the segment). Null-free output (coalesced keys /
    * zeros / placeholder name) so the hash compare is stable.
    *
    * Scale: both sides shuffle once on the join key — the standard
    * full-outer plan; the aggregate side collapses map-side first. */
  def fullOuterActivity(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))
    val act = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2).cast("double").as("total_spend"))
    cust.join(act, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        coalesce(col("c_name"), lit("(outside-segment)")).as("c_name"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("total_spend"), lit(0.0)).as("total_spend"))
  }

  /** PIVOT — per-lang document counts spread into one column per source
    * bucket (the explicit value list keeps the output schema static, as
    * a production pivot at scale must: an unlisted-values pivot
    * collects the distinct values to the driver first). */
  def pivotLangSource(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("src_bucket",
        concat(lit("src"), pmod(substring(col("source"), 4, 10).cast("long"), lit(4))))
      .groupBy(col("lang"))
      .pivot("src_bucket", Seq("src0", "src1", "src2", "src3"))
      .agg(count(lit(1)))
      .select(col("lang"), coalesce(col("src0"), lit(0L)).as("src0"),
        coalesce(col("src1"), lit(0L)).as("src1"),
        coalesce(col("src2"), lit(0L)).as("src2"),
        coalesce(col("src3"), lit(0L)).as("src3"))

  /** LEFT SEMI join (EXISTS shape — F6's complement). */
  def semiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    Tables.customer(spark, sfDir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** ilike pattern join — the J1 lookup variant
    * (ref: resources/small-ymir.imsc.yml.example:56 uses an ilike
    * filter in the instrument lookup). */
  def ilikeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val nations = Tables.nation(spark, sfDir)
    Tables.supplier(spark, sfDir)
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name").ilike("%ation_1%"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"))
  }

  /** INTERSECT set op: customers buying at both priority extremes. */
  def intersectOp(spark: SparkSession, sfDir: String): DataFrame = {
    val urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val low = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "5-LOW").select(col("o_custkey"))
    urgent.intersect(low)
  }

  /** Date arithmetic substrate: extraction, truncation, intervals. */
  def dateOps(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") < 500)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("due_day"),
        datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date")).as("age_days"))

  /** SQL-text entry point: the same engine drives spark.sql over
    * registered views (API-surface parity for SQL users). */
  def sqlTopCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("v_customer")
    Tables.orders(spark, sfDir).createOrReplaceTempView("v_orders")
    spark.sql(
      """SELECT c_custkey, c_name,
        |  count(*) AS n_orders,
        |  cast(round(sum(cast(o_totalprice as decimal(18,2))), 2) as double) AS spend
        |FROM v_customer JOIN v_orders ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY spend DESC, c_custkey LIMIT 25""".stripMargin)
  }

  /** A7: pluggable extractor aggregates applied by NAME over an array
    * column (max/min/mean goldens of the reference's extractor tests). */
  def extractorStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(
        col("vec_id"),
        PortableRound.pround(Extractors("max")(col("embedding")).cast("double"), 4).as("emb_max"),
        PortableRound.pround(Extractors("min")(col("embedding")).cast("double"), 4).as("emb_min"),
        PortableRound.pround(Extractors("mean")(col("embedding")), 4).as("emb_mean"),
        Extractors("count")(col("embedding")).as("emb_dim"))

  /** A3 as a groupBy aggregate via the typed CommonPathAggregator. */
  def commonPathByLang(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = udaf(new graft.plans.CommonPathAggregator)
    Tables.documents(spark, sfDir)
      .select(col("lang"),
        concat(lit("/data/"), col("lang"), lit("/"), col("source"), lit("/run.nxs")).as("p"))
      .groupBy(col("lang"))
      .agg(agg(col("p")).as("common_path"), count(lit(1)).as("n_docs"))
  }

  /** S8 checksum surface: blake2b-512 hex over document bytes (UDF —
    * no DuckDB analogue, validated against RFC 7693 vectors in specs). */
  def blake2bChecksums(spark: SparkSession, sfDir: String): DataFrame = {
    val b2b = udf((s: String) =>
      if (s == null) null
      else graft.functions.Blake2b.hashHex(s.getBytes("UTF-8")))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), b2b(col("text")).as("blake2b"))
  }

  /** Format-bridge round-trip: the documents table written to and read
    * back from ORC, CSV and JSON (Spark's other three first-class file
    * formats), then aggregated per format. The oracle is the same
    * aggregate over the ORIGINAL parquet cross-joined with the format
    * names — equality proves each round-trip is lossless, including
    * CSV quoting of free text and JSON string escaping. The gate thus
    * covers format IO, not just query logic.
    *
    * Scale: each write is one pass over the (pruned) columns; reads
    * carry explicit schemas (no inference scan); the closing agg
    * collapses map-side to `formats × langs` rows. */
  def formatBridge(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    val schema = docs.schema
    val tmp = java.nio.file.Files.createTempDirectory("graft_fmt_bridge").toString
    docs.write.mode("overwrite").orc(s"$tmp/orc")
    docs.write.mode("overwrite").option("header", "true").option("quoteAll", "true")
      .csv(s"$tmp/csv")
    docs.write.mode("overwrite").json(s"$tmp/json")
    val back = Seq(
      "orc" -> spark.read.schema(schema).orc(s"$tmp/orc"),
      "csv" -> spark.read.schema(schema).option("header", "true").csv(s"$tmp/csv"),
      "json" -> spark.read.schema(schema).json(s"$tmp/json"))
    back.map { case (fmt, df) =>
      df.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("sum_text_len"))
        .select(lit(fmt).as("fmt"), col("lang"), col("n_docs"),
          col("sum_chars"), col("sum_text_len"))
    }.reduce(_.unionByName(_))
  }
}
