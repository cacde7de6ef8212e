package graft.expr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.LocalCatalog
import graft.functions.DslCasts._
import graft.schema.ImscSchema
import graft.schema.ImscSchema._
import graft.sources.NexusExtractor
import TemplateCompiler.Registry
import ValueOperators.OpSpec

/** The imsc → DataFrame-program compiler — the heart of the engine
  * (ref: extract_variables_values, src/scicat_dataset.py:375-427).
  *
  * Input: a DataFrame with one row per file carrying
  * `data_file_path: string` and `nexus_json: string` (the decoded
  * NeXus tree; a real HDF5 DSv2 source would substitute here).
  *
  * Output: the same rows plus one `struct(value, unit)` column per
  * variable. Variables compile IN DEFINITION ORDER so later templates
  * reference earlier columns (topological evaluation — the reference's
  * ordered dict); Catalyst's CollapseProject folds the whole chain into
  * a single projection, and only the NXS-extraction and literal-parse
  * UDFs sit outside codegen.
  *
  * Per-variable failures (bad path, unresolved template, cast error)
  * null out silently (F11, ref: scicat_dataset.py:421-427) — compile-time
  * failures are also reported in [[Compiled.errors]].
  */
object ImscCompiler {

  final case class Context(
      catalog: graft.catalog.Catalog = LocalCatalog.empty,
      ingestorFilesDirectory: String = "",
      runIdColumn: Option[Column] = None)

  final case class Compiled(
      registry: Registry,
      hidden: Vector[(String, Column)],
      errors: Vector[(String, String)]) {

    /** Materialize: hidden extraction columns + one struct per variable,
      * in a single projection (all VarCols reference only input/hidden
      * columns, so no sequential withColumn chain is needed — a variable
      * named like an input column must not shadow it mid-chain). */
    def apply(df: DataFrame): DataFrame = {
      val withHidden = hidden.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
      val varNames = registry.entries.map(_._1).toSet
      val keep = df.columns.filterNot(varNames.contains).filterNot(_.startsWith("__")).map(col)
      withHidden.select(keep ++ registry.entries.map { case (n, v) => v.toStruct.as(n) }: _*)
    }
  }

  def compile(schema: ImscSchema, ctx: Context): Compiled = {
    var reg = defaultRegistry(schema, ctx)
    val errors = Vector.newBuilder[(String, String)]
    val hidden = Vector.newBuilder[(String, Column)]

    // --- NXS variables: one extraction UDF for the whole schema --------
    val nxsVars = schema.variables.collect { case (n, v: NxsVar) => (n, v) }
    if (nxsVars.nonEmpty) {
      val fields = nxsVars.map { case (n, v) =>
        StructField(n, StructType(Seq(
          StructField("value", CastCompiler.sparkType(v.valueType)),
          StructField("unit", StringType))))
      }
      val nxsType = StructType(fields)
      val extractUdf = udf((nexusJson: String) =>
        if (nexusJson == null) "{}" else NexusExtractor.extractAllJson(nxsVars, nexusJson))
      hidden += ("__nxs" -> from_json(extractUdf(col("nexus_json")), nxsType))
    }

    // --- sequential variable compilation (definition order) ------------
    for ((name, spec) <- schema.variables) spec match {
      case v: NxsVar =>
        reg = reg + (name -> VarCol(
          col(s"__nxs.$name.value"),
          coalesce(col(s"__nxs.$name.unit"), lit("")),
          Some(v.valueType)))

      case v: ScVar =>
        TemplateCompiler.renderString(v.url, reg) match {
          case Left(err) => errors += (name -> err)
          case Right(urlCol) =>
            val catalog = ctx.catalog
            val lookupUdf = udf((url: String, field: String) =>
              if (url == null) None else catalog.lookupJson(url, field))
            val rawJson = lookupUdf(urlCol.value.cast("string"), lit(v.field))
            // response JSON → typed value via the cast layer (string in)
            val asString = when(rawJson.rlike("^\"(.*)\"$"),
              regexp_extract(rawJson, "^\"([\\s\\S]*)\"$", 1)).otherwise(rawJson)
            val converted = CastCompiler.cast(
              VarCol(asString, lit(""), Some(DString)), v.valueType)
            reg = reg + (name -> converted)
        }

      case v: ValueVar =>
        TemplateCompiler.render(v.value, reg) match {
          case Left(err) => errors += (name -> err)
          case Right(rendered) =>
            val afterOp = ValueOperators(v.operator, rendered,
              OpSpec(v.field, v.pattern, v.replacement))
            reg = reg + (name -> CastCompiler.cast(afterOp, v.valueType))
        }
    }

    Compiled(reg, hidden.result(), errors.result())
  }

  /** Default variable seeding (P13, ref: scicat_dataset.py:327-345). */
  private def defaultRegistry(schema: ImscSchema, ctx: Context): Registry = {
    val path = col("data_file_path")
    val nowIso = concat(
      date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), lit("+00:00"))
    Registry(Vector(
      "ingestor_run_id" -> VarCol(
        ctx.runIdColumn.getOrElse(expr("uuid()")), lit(""), Some(DString)),
      "data_file_path" -> VarCol(path, lit(""), Some(DString)),
      "data_file_name" -> VarCol(ValueOperators.basename(path), lit(""), Some(DString)),
      "now" -> VarCol(nowIso, lit(""), Some(DString)),
      "ingestor_files_directory" -> VarCol(
        lit(ctx.ingestorFilesDirectory), lit(""), Some(DString)),
      "ingestor_metadata_schema_id" -> VarCol(lit(schema.id), lit(""), Some(DString)),
    ))
  }
}
