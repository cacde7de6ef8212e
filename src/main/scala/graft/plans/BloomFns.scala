package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** DataFrame-reachable registration of Spark's runtime-filter bloom
  * expressions (`BloomFilterAggregate` / `BloomFilterMightContain`,
  * the machinery behind `spark.sql.optimizer.runtime.bloomFilter.*`).
  *
  * The optimizer only injects these itself when the application-side
  * scan exceeds `applicationSideScanSizeThreshold` (10 GiB default) —
  * exactly the regime we cannot reach in a local test but ALWAYS hit
  * at 100 TB. Registering the expressions as functions lets
  * [[graft.operators.Relational.bloomPrefilterJoin]] build the same
  * plan shape explicitly and deterministically at any scale factor:
  * aggregate the small side's join keys into one bloom (a few KiB),
  * broadcast it, and drop non-matching big-side rows BEFORE the join
  * shuffle. No false negatives, so the downstream equi-join keeps the
  * result exact; false positives only cost shuffle bytes.
  *
  * Both functions take pre-hashed `xxhash64(key)` longs — the same
  * contract Spark's own InjectRuntimeFilter rule uses. The hash never
  * crosses engines (the DuckDB oracle is the plain join), so the
  * engine-private xxhash64 is fine here, unlike the dedup family's
  * [[graft.functions.PortableHash]].
  */
object BloomFns {

  /** `bloom_agg(xxhash64(k), nItems, nBits)` → binary bloom filter. */
  private def bloomAgg(exprs: Seq[Expression]): Expression =
    new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
      .toAggregateExpression()

  /** `bloom_contains(bloom, xxhash64(k))` → boolean (null-safe). */
  private def bloomContains(exprs: Seq[Expression]): Expression =
    new BloomFilterMightContain(exprs(0), exprs(1))

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier("bloom_agg"))) {
      registry.createOrReplaceTempFunction("bloom_agg", bloomAgg, "built-in")
      registry.createOrReplaceTempFunction("bloom_contains", bloomContains, "built-in")
    }
  }
}
