package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable metadata-extractor registry — the engine's analogue of the
  * reference's `scicat_ingestor.metadata_extractor` entry-point group
  * (ref: src/scicat_metadata.py:21-26, registration pyproject.toml:94-97,
  * goldens tests/test_metadata_extractor.py:6-12: numpy max/min/mean
  * loaded by name).
  *
  * Extensions are name → `Column => Column` transforms over array
  * columns; registering a new extractor is adding a map entry (or
  * calling [[register]]), and each is a built-in expression composition
  * so extractors stay codegen-eligible.
  */
object Extractors {

  @volatile private var registry: Map[String, Column => Column] = Map(
    "max" -> (c => array_max(c)),
    "min" -> (c => array_min(c)),
    "mean" -> (c =>
      aggregate(c.cast("array<double>"), lit(0.0), (acc, x) => acc + x) / size(c)),
    "sum" -> (c => aggregate(c.cast("array<double>"), lit(0.0), (acc, x) => acc + x)),
    "count" -> (c => size(c).cast("long")))

  def apply(name: String): Column => Column =
    registry.getOrElse(name,
      throw new IllegalArgumentException(
        s"Unknown metadata extractor: $name. Known: ${registry.keys.mkString(", ")}"))

  def register(name: String, fn: Column => Column): Unit =
    synchronized { registry = registry + (name -> fn) }

  def names: Set[String] = registry.keySet
}
