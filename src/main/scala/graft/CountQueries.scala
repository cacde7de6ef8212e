package graft

/** Mechanically-derived round-close figures (round-9 verdict item #4:
  * hand-tallied counts drifted from the real map twice). BENCHNOTES
  * close lines MUST come from this main, never from manual counting:
  *
  *   sbt -batch "runMain graft.CountQueries"
  *
  * prints the declared-query count exactly as the driver's
  * CORRECTNESS file will see it (len == queries.size), plus the
  * oracle/rows-only split Verify dumps.
  */
object CountQueries {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val r = SparkEntry.rowsOnly.keySet
    println(s"declared_queries=${q.size}")
    println(s"oracle_sql=${o.size}")
    println(s"rows_only=${r.size}")
    println(s"missing_oracle=${(q -- o -- r).toSeq.sorted.mkString(",")}")
  }
}
