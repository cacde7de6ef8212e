package graft.config

import java.nio.file.{Files, Path, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.{YAMLFactory, YAMLGenerator}

/** JSON→YAML migration devtool
  * (ref: json_to_yaml, src/scicat_configuration.py:581-623): convert a
  * legacy JSON config/schema file to YAML, key order preserved, default
  * output path = input with `.json` → `.yml`, refusing to overwrite an
  * existing output unless forced.
  */
object JsonToYaml {

  private val jsonMapper = new ObjectMapper()
  private val yamlMapper = new ObjectMapper(
    new YAMLFactory().disable(YAMLGenerator.Feature.WRITE_DOC_START_MARKER))

  def convertText(jsonText: String): String =
    yamlMapper.writeValueAsString(jsonMapper.readTree(jsonText))

  def defaultOutputPath(inputFile: String): Path =
    Paths.get(inputFile.replace(".json", ".yml"))

  /** Returns the output path; throws if the output exists and
    * `overwrite` is false (the reference prompts interactively — a
    * library can only refuse). */
  def convertFile(inputFile: String, outputFile: Option[String] = None,
      overwrite: Boolean = false): Path = {
    val out = outputFile.map(Paths.get(_)).getOrElse(defaultOutputPath(inputFile))
    if (Files.exists(out) && !overwrite)
      throw new IllegalStateException(
        s"Output file $out already exists (pass overwrite to replace it).")
    Files.writeString(out, convertText(Files.readString(Paths.get(inputFile))))
    out
  }

  /** CLI: `runMain graft.config.JsonToYaml --input-file a.json
    * [--output-file b.yml] [--overwrite]`. */
  def main(args: Array[String]): Unit = {
    val argMap = args.sliding(2, 1).collect {
      case Array(k, v) if k.startsWith("--") && !v.startsWith("--") => k -> v
    }.toMap
    val input = argMap.getOrElse("--input-file",
      sys.error("--input-file is required"))
    val out = convertFile(input, argMap.get("--output-file"),
      overwrite = args.contains("--overwrite"))
    println(s"wrote $out")
  }
}
