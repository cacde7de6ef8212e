package graft.assemble

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.expr.ImscCompiler
import graft.schema.ImscSchema

case class FileItem(path: String, size: java.lang.Long, time: String,
    chk: String, uid: String, gid: String, perm: String)

/** Dataset/datablock assembly goldens ported from
  * tests/test_scicat_dataset.py:156-268 (instance creation, sampleId
  * merge matrix, scientificMetadata wrapping) plus A1-A3/P18 coverage.
  */
class DatasetAssemblySpec extends AnyFunSuite {
  import TestSpark.spark

  val schemaYaml: String =
    """order: 1
      |id: assembly-test
      |name: Assembly Test Schema
      |instrument: graft-test
      |selector: '*'
      |variables:
      |  pid:
      |    source: VALUE
      |    value: some-random-pid
      |    value_type: string
      |  proposal_id:
      |    source: VALUE
      |    value: proposal-id
      |    value_type: string
      |  sample_temperature:
      |    source: NXS
      |    path: /entry/sample/temperature
      |    value_type: float
      |schema:
      |  pid:
      |    field_type: high_level
      |    machine_name: pid
      |    value: <pid>
      |    type: string
      |  dataset_name:
      |    field_type: high_level
      |    machine_name: datasetName
      |    value: ds_<proposal_id>
      |    type: string
      |  principal_investigator:
      |    field_type: high_level
      |    machine_name: principalInvestigator
      |    value: ''
      |    type: string
      |  creation_location:
      |    field_type: high_level
      |    machine_name: creationLocation
      |    value: 'ESS:graft'
      |    type: string
      |  owner:
      |    field_type: high_level
      |    machine_name: owner
      |    value: ''
      |    type: string
      |  owner_email:
      |    field_type: high_level
      |    machine_name: ownerEmail
      |    value: ''
      |    type: string
      |  source_folder_item:
      |    field_type: high_level
      |    machine_name: sourceFolder
      |    value: <undefined_source>
      |    type: string
      |  contact_email:
      |    field_type: high_level
      |    machine_name: contactEmail
      |    value: ''
      |    type: string
      |  creation_time:
      |    field_type: high_level
      |    machine_name: creationTime
      |    value: '2024-01-01T00:00:00Z'
      |    type: date
      |  proposal_item:
      |    field_type: high_level
      |    machine_name: proposalId
      |    value: <proposal_id>
      |    type: string
      |  sample_temperature:
      |    field_type: scientific_metadata
      |    machine_name: sample_temperature
      |    human_name: Sample Temperature
      |    value: <sample_temperature>
      |    type: string
      |""".stripMargin

  val nexusJson: String =
    """{"entry": {"sample": {
      |  "temperature": {"__value": [300.0], "__attrs": {"units": "K"}}}}}""".stripMargin

  // source folder item renders from an undefined variable → a compile
  // error (F11) would drop sourceFolder entirely and fail F8, so the
  // yaml above is adjusted per-test; default uses a none-typed variable.
  val schemaWithNullSource: ImscSchema = ImscSchema.fromYamlOrJson(
    schemaYaml.replace("value: <undefined_source>",
      "value: <null_source>").replace(
      "variables:",
      """variables:
        |  null_source:
        |    source: VALUE
        |    value: ''
        |    value_type: none
        |""".stripMargin))

  private def input(samplePids: Option[Seq[String]] = None): DataFrame = {
    import spark.implicits._
    val files = Seq(
      FileItem("/ess/data/run1/file.nxs", 1000L, "2024-01-01T00:00:00Z", null, null, null, null),
      FileItem("/ess/data/run1/file.nxs.b2b", 24L, "2024-01-01T00:00:05Z", null, null, null, null),
      FileItem("/ess/data/shared/common.json", null, "2024-01-01T00:00:06Z", null, null, null, null))
    val base = Seq(("/ess/data/run1/file.nxs", nexusJson, files))
      .toDF("data_file_path", "nexus_json", "files")
    samplePids match {
      case Some(pids) => base.withColumn("sample_pids",
        array(pids.map(lit(_)): _*))
      case None => base
    }
  }

  private def runPipeline(
      schema: ImscSchema = schemaWithNullSource,
      df: DataFrame = input(),
      opts: DatasetAssembly.Options = DatasetAssembly.Options()): Row =
    DatasetAssembly.pipeline(schema, ImscCompiler.Context(), opts)(df).collect()(0)

  test("dataset instance goldens: pid, empty fields, scientificMetadata wrap") {
    val row = runPipeline()
    assert(row.getAs[String]("pid") == "some-random-pid")
    assert(row.getAs[String]("ownerEmail") == "")
    assert(row.getAs[String]("datasetName") == "ds_proposal-id")
    val sm = row.getAs[Map[String, Row]]("scientificMetadata")
    val st = sm("sample_temperature")
    assert(st.getAs[String]("value") == "300.0") // converted to string
    assert(st.getAs[String]("unit") == "K")
    assert(st.getAs[String]("human_name") == "Sample Temperature")
    assert(st.getAs[String]("type") == "string")
  }

  test("A1/A2: size skips null file sizes, numberOfFiles counts all") {
    val row = runPipeline()
    assert(row.getAs[Long]("size") == 1024L)
    assert(row.getAs[Long]("numberOfFiles") == 3L)
  }

  test("A3: null sourceFolder falls back to common path; P18 relativizes") {
    val row = runPipeline()
    assert(row.getAs[String]("sourceFolder") == "/ess/data")
    val block = row.getAs[Row]("origDataBlock")
    assert(block.getAs[String]("chkAlg") == "blake2b")
    assert(block.getAs[Long]("size") == 1024L)
    val paths = block.getAs[scala.collection.Seq[Row]]("dataFileList").map(_.getAs[String]("path"))
    assert(paths.toSeq == Seq("run1/file.nxs", "run1/file.nxs.b2b", "shared/common.json"))
  }

  test("J4: sample pid list merges into scalar sampleId with dedup") {
    val withSample = ImscSchema.fromYamlOrJson(
      schemaYaml.replace("value: <undefined_source>", "value: /ess/data")
        .replace("variables:",
          """variables:
            |  sample_pid:
            |    source: VALUE
            |    value: hardcoded-sample-pid
            |    value_type: string
            |""".stripMargin) +
        """  sample_item:
          |    field_type: high_level
          |    machine_name: sampleId
          |    value: <sample_pid>
          |    type: string
          |""".stripMargin)
    val row = runPipeline(withSample, input(Some(Seq("sample-pid-1", "sample-pid-2"))))
    val ids = row.getAs[scala.collection.Seq[String]]("sampleId").sorted
    assert(ids.toSeq == Seq("hardcoded-sample-pid", "sample-pid-1", "sample-pid-2"))
  }

  test("J4: merge is set-union (duplicates collapse)") {
    val withSample = ImscSchema.fromYamlOrJson(
      schemaYaml.replace("value: <undefined_source>", "value: /ess/data")
        .replace("variables:",
          """variables:
            |  sample_pid:
            |    source: VALUE
            |    value: sample-pid-1
            |    value_type: string
            |""".stripMargin) +
        """  sample_item:
          |    field_type: high_level
          |    machine_name: sampleId
          |    value: <sample_pid>
          |    type: string
          |""".stripMargin)
    val row = runPipeline(withSample, input(Some(Seq("sample-pid-1", "sample-pid-2"))))
    val ids = row.getAs[scala.collection.Seq[String]]("sampleId").sorted
    assert(ids.toSeq == Seq("sample-pid-1", "sample-pid-2"))
  }

  test("F8: missing mandatory machine name raises") {
    val broken = ImscSchema.fromYamlOrJson(schemaYaml
      .replace("value: <undefined_source>", "value: /ess/data")
      .replace("machine_name: owner\n", "machine_name: not_owner\n"))
    assertThrows[IllegalArgumentException](runPipeline(broken))
  }

  test("P16: pid policy — disallowed pid nulls, generate makes uuid hex") {
    val noPid = runPipeline(opts = DatasetAssembly.Options(allowDatasetPid = false))
    assert(noPid.getAs[String]("pid") == null)
    val genPid = runPipeline(opts = DatasetAssembly.Options(generateDatasetPid = true))
    val pid = genPid.getAs[String]("pid")
    assert(pid != null && pid.matches("[0-9a-f]{32}"))
  }

  test("P17: defaults backfill for null instrument/proposal/owner groups") {
    val row = runPipeline(opts = DatasetAssembly.Options(
      defaultInstrumentId = "inst-1", defaultOwnerGroup = "grp",
      defaultAccessGroups = Seq("g1", "g2")))
    assert(row.getAs[String]("instrumentId") == "inst-1")
    assert(row.getAs[String]("ownerGroup") == "grp")
    assert(row.getAs[scala.collection.Seq[String]]("accessGroups").toSeq == Seq("g1", "g2"))
    // proposalId came from the schema → not backfilled
    assert(row.getAs[String]("proposalId") == "proposal-id")
  }

  test("F10: null-stripped JSON for the sink") {
    val df = DatasetAssembly.pipeline(schemaWithNullSource, ImscCompiler.Context())(input())
    val json = df.select(DatasetAssembly.toJsonColumn(
      Seq("pid", "description", "size")).as("j")).collect()(0).getString(0)
    assert(json.contains("\"pid\""))
    assert(!json.contains("description")) // null stripped
  }
}
