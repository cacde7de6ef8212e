package graft.schema

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._
import scala.util.{Failure, Success, Try}

import graft.schema.ConfigValue._

/** Schema-file validator devtool
  * (ref: validate_schema, src/scicat_devtools.py:50-196): structural
  * parse, mandatory machine-name set, selector format, and field-type
  * validation over one imsc file or a whole schemas directory, with
  * collect-all-then-raise semantics (no stop-on-first-invalid).
  */
object SchemaValidator {

  final case class Result(file: String, errors: Seq[String], warnings: Seq[String]) {
    def valid: Boolean = errors.isEmpty
  }

  /** JSON-format detection (ref: _is_json_file, scicat_metadata.py:55-61).
    * A JSON schema file is flagged invalid by the devtool — YAML is the
    * supported format (scicat_devtools.py:119-127). */
  def isJsonText(text: String): Boolean =
    Try(new com.fasterxml.jackson.databind.ObjectMapper().readTree(text))
      .map(_ != null).getOrElse(false) &&
      text.trim.startsWith("{") // jackson's lenient readTree accepts scalars

  /** Selector format check (ref: _validate_schema_selector,
    * scicat_devtools.py:77-91): a string selector must be
    * `field:filter_type:value`; a map selector's condition lists are
    * validated element-wise (ALL entries — the reference's loop returns
    * after the first dict value, a known quirk not reproduced). The
    * wildcard `*` used by fallback schemas is accepted. */
  def validateSelector(selector: ConfigValue): Seq[String] = selector match {
    case CStr("*") => Seq.empty
    case CStr(s) =>
      if (s.split(":", -1).length == 3) Seq.empty
      else Seq(s"invalid selector format: '$s' — expected field:filter_type:value")
    case m: CMap =>
      m.items.flatMap {
        case (_, CSeq(conds)) => conds.flatMap(validateSelector)
        case (op, other) => Seq(s"selector operator '$op' must hold a list, got $other")
      }
    case CNull => Seq.empty
    case other => Seq(s"selector must be a string or map, got $other")
  }

  /** Validate one schema text (already read). */
  def validateText(fileName: String, text: String): Result = {
    val warnings = scala.collection.mutable.Buffer.empty[String]
    if (isJsonText(text))
      return Result(fileName,
        errors = Seq("JSON schema format is deprecated; convert to YAML"),
        warnings = Seq.empty)
    Try(ImscSchema.fromYamlOrJson(text)) match {
      case Failure(e) =>
        Result(fileName, Seq(s"invalid structure: ${e.getMessage}"), warnings.toSeq)
      case Success(schema) =>
        val errors = schema.validate ++ validateSelector(schema.selector)
        Result(fileName, errors, warnings.toSeq)
    }
  }

  /** imsc file-name filter (ref: _is_file_name_valid,
    * scicat_metadata.py:29-36). */
  def isSchemaFileName(name: String): Boolean =
    (name.contains("imsc.json") || name.contains("imsc.yml") ||
      name.contains("imsc.yaml")) && !name.startsWith(".")

  /** Collect the target files: a directory lists its imsc files, a file
    * is taken as-is (ref: _collect_target_files, scicat_devtools.py:17-34). */
  def collectTargets(path: String): Seq[Path] = {
    val p = Paths.get(path)
    if (!Files.exists(p))
      throw new java.io.FileNotFoundException(
        s"Schema file(location) $path does not exist.")
    if (Files.isDirectory(p)) {
      val files = Files.list(p).iterator().asScala
        .filter(f => isSchemaFileName(f.getFileName.toString)).toSeq.sortBy(_.toString)
      if (files.isEmpty)
        throw new java.io.FileNotFoundException(
          s"No schema files found in the directory $path.")
      files
    } else Seq(p)
  }

  /** Validate a file or directory; collects ALL results, then throws if
    * any file is invalid (ref: validate_schema, scicat_devtools.py:150-196). */
  def validatePath(path: String): Map[String, Result] = {
    val results = collectTargets(path).map { f =>
      val name = f.getFileName.toString
      name -> validateText(name, Files.readString(f))
    }.toMap
    if (results.valuesIterator.exists(!_.valid))
      throw new IllegalArgumentException(
        "One or more schema files are invalid: " +
          results.collect { case (n, r) if !r.valid =>
            s"$n [${r.errors.mkString("; ")}]" }.mkString(", "))
    results
  }

  /** CLI entry: `runMain graft.schema.SchemaValidator <path>`. */
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: SchemaValidator <schema-file-or-directory>")
    val results = validatePath(args(0))
    results.toSeq.sortBy(_._1).foreach { case (n, _) => println(s"VALID $n") }
  }
}
