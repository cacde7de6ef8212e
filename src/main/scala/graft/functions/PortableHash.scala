package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hashing for the dedup/ANN family.
  *
  * Spark's `hash`/`xxhash64` are engine-private (murmur3/xxh64 with
  * Spark's seeding) — no other engine reproduces them, which made the
  * minhash/simhash/LSH queries unverifiable against the DuckDB oracle.
  * This hash is definable in ANY engine with `md5` + string ops: the
  * first 12 hex chars of md5 read as a 48-bit integer. 48 bits keep
  * every intermediate (digit × 16^11) inside the 2^53 double mantissa,
  * so even engines whose `pow` is double-only replicate it exactly.
  *
  * Perf note: Spark md5+conv are codegen'd intrinsics; the hash stays
  * inside WholeStageCodegen like the murmur3 it replaces.
  */
object PortableHash {

  /** 48-bit integer from the first 12 hex chars of `md5(c)`. */
  def md5Hash48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** Native codegen'd form (identical values — the hex round-trip is
    * skipped, see [[graft.plans.Md5Hash48]]); needs the session because
    * custom expressions enter plans through the function registry. */
  def md5Hash48Native(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    graft.plans.Md5Hash48.register(spark)
    call_function("md5_hash48", c)
  }

  /** DuckDB replica of [[md5Hash48]] over SQL expression `e` —
    * hex digits via strpos, positional weights via pow(16, k) (exact:
    * 16^11 < 2^53). */
  def sqlH48(e: String): String =
    s"CAST(list_sum(list_transform(range(1,13), i -> " +
      s"(strpos('0123456789abcdef', substr(md5($e), i, 1)) - 1) * " +
      s"CAST(pow(16, 12 - i) AS BIGINT))) AS BIGINT)"
}
