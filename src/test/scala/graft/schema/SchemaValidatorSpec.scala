package graft.schema

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IngestDemo
import graft.schema.ConfigValue._

/** Validator devtool parity with scicat_devtools.validate_schema,
  * using the reference's own error cases as goldens
  * (ref: tests/test_scicat_metadata_schema.py:396-411 invalid
  * field_type; scicat_devtools.py:50-147 mandatory machine names,
  * selector format, JSON deprecation, collect-all-then-raise).
  */
class SchemaValidatorSpec extends AnyFunSuite {

  private def tmpDir = Files.createTempDirectory("graft_schemas")

  test("the demo schema validates clean") {
    val r = SchemaValidator.validateText("demo.imsc.yml", IngestDemo.schemaYaml)
    assert(r.valid, r.errors)
  }

  test("invalid field_type is rejected (reference golden 'high-five-level')") {
    val bad = IngestDemo.schemaYaml.replace(
      "field_type: high_level", "field_type: high-five-level")
    val r = SchemaValidator.validateText("bad.imsc.yml", bad)
    assert(!r.valid)
    assert(r.errors.exists(_.contains("high-five-level")))
  }

  test("missing mandatory machine names are each reported") {
    val noDatasetName = IngestDemo.schemaYaml.replace(
      "machine_name: datasetName", "machine_name: notDatasetName")
    val r = SchemaValidator.validateText("m.imsc.yml", noDatasetName)
    assert(r.errors.exists(e =>
      e.contains("mandatory") && e.contains("datasetName")))
  }

  test("selector format: 3-part strings pass, others fail; maps recurse") {
    assert(SchemaValidator.validateSelector(CStr("filename:starts_with:/ess")).isEmpty)
    assert(SchemaValidator.validateSelector(CStr("*")).isEmpty)
    assert(SchemaValidator.validateSelector(CStr("no-colons")).nonEmpty)
    assert(SchemaValidator.validateSelector(CStr("too:many:colons:here")).nonEmpty)
    val andSel = CMap(Vector("and" -> CSeq(Vector(
      CStr("filename:starts_with:/ess"), CStr("oops")))))
    assert(SchemaValidator.validateSelector(andSel).size == 1) // ALL entries checked
    val badOp = CMap(Vector("or" -> CStr("not-a-list")))
    assert(SchemaValidator.validateSelector(badOp).nonEmpty)
  }

  test("JSON schema files are flagged deprecated-invalid") {
    val r = SchemaValidator.validateText("legacy.imsc.json",
      """{"id": "x", "order": 1, "selector": "a:b:c", "schema": {}}""")
    assert(!r.valid && r.errors.head.contains("JSON"))
  }

  test("unparseable schema text reports invalid structure, not an exception") {
    val r = SchemaValidator.validateText("junk.imsc.yml", "selector: [unclosed")
    assert(!r.valid && r.errors.head.contains("invalid structure"))
  }

  test("directory collection filters imsc names and skips dotfiles") {
    val dir = tmpDir
    Files.writeString(dir.resolve("a.imsc.yml"), IngestDemo.schemaYaml)
    Files.writeString(dir.resolve("b.imsc.yaml"), IngestDemo.schemaYaml)
    Files.writeString(dir.resolve(".hidden.imsc.yml"), "x")
    Files.writeString(dir.resolve("readme.txt"), "not a schema")
    val targets = SchemaValidator.collectTargets(dir.toString)
    assert(targets.map(_.getFileName.toString).sorted == Seq("a.imsc.yml", "b.imsc.yaml"))
    val results = SchemaValidator.validatePath(dir.toString)
    assert(results.size == 2 && results.valuesIterator.forall(_.valid))
  }

  test("one invalid file fails the whole run, naming the file (collect-all)") {
    val dir = tmpDir
    Files.writeString(dir.resolve("good.imsc.yml"), IngestDemo.schemaYaml)
    Files.writeString(dir.resolve("bad.imsc.yml"), IngestDemo.schemaYaml.replace(
      "field_type: high_level", "field_type: high-five-level"))
    val e = intercept[IllegalArgumentException] {
      SchemaValidator.validatePath(dir.toString)
    }
    assert(e.getMessage.contains("One or more schema files are invalid"))
    assert(e.getMessage.contains("bad.imsc.yml") && !e.getMessage.contains("good.imsc.yml"))
  }

  test("missing path and empty directory raise FileNotFound") {
    intercept[java.io.FileNotFoundException] {
      SchemaValidator.collectTargets("/no/such/dir")
    }
    intercept[java.io.FileNotFoundException] {
      SchemaValidator.collectTargets(tmpDir.toString) // exists but empty
    }
  }
}
