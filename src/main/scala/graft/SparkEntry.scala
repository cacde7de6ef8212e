package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 (or a
  * substrate/training-data capability) expressed as a declarative
  * DataFrame program; [[oracleSql]] carries the DuckDB-equivalent ANSI
  * SQL the driver uses for the hash-compare correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // headline TPC-H-shaped
    "q1_pricing" -> (Relational.q1Pricing _),
    "q3_shipping" -> (Relational.q3Shipping _),
    "q5_region" -> (Relational.q5Region _),
    // §2.2 filters
    "f1_type_filter" -> (Relational.f1TypeFilter _),
    "f2_error_filter" -> (Relational.f2ErrorFilter _),
    "f3_selector_cascade" -> (Relational.f3SelectorCascade _),
    "f6_dedup_anti" -> (Relational.f6DedupAnti _),
    // §2.3 projections
    "p_value_ops" -> (Relational.pValueOps _),
    "p6_json_getitem" -> (Relational.p6JsonGetItem _),
    "p10_array_fold" -> (Relational.p10ArrayFold _),
    "p12_casts" -> (Relational.p12Casts _),
    // §2.4 joins
    "j1_enrich_lookup" -> (Relational.j1EnrichLookup _),
    "j2_collect_list" -> (Relational.j2CollectList _),
    "j4_array_merge" -> (Relational.j4ArrayMerge _),
    // substrate: windows / set ops / time windows
    "w_running" -> (Relational.wRunning _),
    "set_except" -> (Relational.setExcept _),
    "tumbling_window" -> (Relational.tumblingWindow _),
  )

  /** Headline subset timed by [[Bench]]. */
  def benchQueries: Seq[String] = Seq(
    "q1_pricing", "q3_shipping", "q5_region", "w_running", "j2_collect_list")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  cast(round(sum(cast(l_quantity as decimal(18,2))), 2) as double) AS sum_qty,
        |  cast(round(sum(cast(l_extendedprice as decimal(18,2))), 2) as double) AS sum_base_price,
        |  cast(round(sum(cast(l_extendedprice as decimal(18,2)) * (cast(1 as decimal(18,2)) - cast(l_discount as decimal(18,2)))), 2) as double) AS sum_disc_price,
        |  round(cast(sum(cast(l_quantity as decimal(18,2))) as double) / count(*), 2) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  cast(round(sum(cast(l_extendedprice as decimal(18,2)) * (cast(1 as decimal(18,2)) - cast(l_discount as decimal(18,2)))), 2) as double) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < '1995-03-15' AND l_shipdate > '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region" ->
      """SELECT n_name,
        |  cast(round(sum(cast(l_extendedprice as decimal(18,2)) * (cast(1 as decimal(18,2)) - cast(l_discount as decimal(18,2)))), 2) as double) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderdate >= '1994-01-01' AND o_orderdate < '1996-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "f1_type_filter" ->
      "SELECT event_id, event_type, user_id FROM events WHERE substr(event_type, 1, 2) = 'cl'",
    "f2_error_filter" ->
      """SELECT event_type, count(*) AS n,
        |  cast(round(sum(cast(value as decimal(18,2))), 2) as double) AS total_value
        |FROM events WHERE event_type <> 'error' GROUP BY event_type""".stripMargin,
    "f3_selector_cascade" ->
      """SELECT doc_id, source,
        |  CASE WHEN source LIKE 'src1%' THEN 'schema_src1'
        |       WHEN source LIKE '%2%' THEN 'schema_has2'
        |       WHEN lang = 'en' THEN 'schema_en'
        |       ELSE 'fallback' END AS schema_id
        |FROM documents""".stripMargin,
    "f6_dedup_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,
    "p_value_ops" ->
      """SELECT doc_id,
        |  array_to_string(string_split(text, ' ')[1:5], ', ') AS first_words,
        |  upper(lang) AS lang_upper,
        |  substr(replace(text, 'the', 'THE'), 1, 40) AS replaced_head,
        |  string_split(source, '/')[-1] AS basename
        |FROM documents""".stripMargin,
    "p6_json_getitem" ->
      """SELECT event_id, k FROM (
        |  SELECT event_id, cast(json_extract_string(props, '$.k') as bigint) AS k FROM events
        |) WHERE k > 90""".stripMargin,
    "p10_array_fold" ->
      """SELECT doc_id,
        |  cast(list_sum(list_transform(string_split(text, ' '), w -> length(w))) as bigint) AS word_chars,
        |  cast(len(string_split(text, ' ')) as bigint) AS n_words
        |FROM documents""".stripMargin,
    "p12_casts" ->
      """SELECT l_orderkey,
        |  cast(l_linenumber as bigint) AS line_no,
        |  cast(l_quantity as bigint) AS qty_int,
        |  cast(l_quantity as varchar) AS qty_str,
        |  strftime(l_shipdate, '%Y-%m-%d') AS ship_day
        |FROM lineitem WHERE l_orderkey < 100""".stripMargin,
    "j1_enrich_lookup" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "j2_collect_list" ->
      """SELECT n_name, list_sort(list(s_name)) AS supplier_names, count(*) AS n_suppliers
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name""".stripMargin,
    "j4_array_merge" ->
      """SELECT doc_id,
        |  list_sort(list_distinct(string_split(text, ' ')[1:4] || string_split(text, ' ')[3:6])) AS merged_tokens
        |FROM documents""".stripMargin,
    "w_running" ->
      """SELECT event_id, user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
        |FROM events""".stripMargin,
    "set_except" ->
      """SELECT c_custkey FROM customer EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    "tumbling_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  event_type, count(*) AS n,
        |  cast(round(sum(cast(value as decimal(18,2))), 2) as double) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
  )
}
