package graft.streaming

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.config.IngestorConfig

/** The reference's two non-daemon entry points without a broker:
  * the per-file offline ingestor (ref: scicat_offline_ingestor.py) end
  * to end against the REAL small-ymir fixture through the production
  * HDF5 reader, and the sample get-or-create batch (ref:
  * scicat_sample_ingestor.py) over a probing catalog.
  */
object OfflineIngestorSpec {
  // recording catalog for the sample path (companion-object state works
  // in local mode: the closure deserializes but the queue is static)
  val createdSamples = new ConcurrentLinkedQueue[(String, String)]()
  final case class RecordingCatalog(existing: Set[(String, String)])
      extends graft.catalog.Catalog {
    def lookupJson(url: String, field: String): Option[String] = None
    def querySamples(name: String, proposalId: String): Seq[String] =
      if (existing((name, proposalId))) Seq("s1") else Seq.empty
    def datasetExists(pid: String): Boolean = false
    def metadataValueExists(key: String, value: String): Boolean = false
    def createDataset(json: String): String = json
    def createOrigDatablock(json: String): String = json
    override def createSample(name: String, proposalId: String): Unit =
      createdSamples.add((name, proposalId))
  }
}

class OfflineIngestorSpec extends AnyFunSuite {
  import TestSpark.spark
  import OfflineIngestorSpec._

  val ymir = "/root/reference/test-data/small-ymir.hdf"

  private val ymirSchemaYaml =
    """id: ymir-offline
      |name: Ymir Offline Schema
      |instrument: ymir
      |selector: filename:contains:small-ymir
      |order: 1
      |variables:
      |  job_id:
      |    source: NXS
      |    path: /entry/entry_identifier_uuid
      |    value_type: string
      |  title:
      |    source: NXS
      |    path: /entry/title
      |    value_type: string
      |schema:
      |  pid:
      |    field_type: high_level
      |    machine_name: pid
      |    value: 20.500.12269/<job_id>
      |    type: string
      |  dataset_name:
      |    field_type: high_level
      |    machine_name: datasetName
      |    value: <title>
      |    type: string
      |  principal_investigator:
      |    field_type: high_level
      |    machine_name: principalInvestigator
      |    value: 'PI'
      |    type: string
      |  creation_location:
      |    field_type: high_level
      |    machine_name: creationLocation
      |    value: 'ESS:ymir'
      |    type: string
      |  owner:
      |    field_type: high_level
      |    machine_name: owner
      |    value: 'owner'
      |    type: string
      |  owner_email:
      |    field_type: high_level
      |    machine_name: ownerEmail
      |    value: 'o@e'
      |    type: string
      |  source_folder:
      |    field_type: high_level
      |    machine_name: sourceFolder
      |    value: '/root/reference/test-data'
      |    type: string
      |  contact_email:
      |    field_type: high_level
      |    machine_name: contactEmail
      |    value: 'c@e'
      |    type: string
      |  creation_time:
      |    field_type: high_level
      |    machine_name: creationTime
      |    value: '2024-01-01T00:00:00+00:00'
      |    type: date
      |""".stripMargin

  private def cfgFor(schemasDir: java.nio.file.Path) = IngestorConfig.load(
    s"""ingestion:
       |  schemas_directory: "$schemasDir"
       |""".stripMargin)

  test("message file round-trip: K3 dump body parses back to the wrdn record") {
    val m = Messages.WritingFinished("svc", "j9", false, ymir, """{"k":1}""", "done")
    val body = new String(MessageCodec.encodeWrdn(m).drop(8), "UTF-8")
    assert(MessageCodec.wrdnFromJsonBody(body).contains(m))
    assert(MessageCodec.wrdnFromJsonBody("not json").isEmpty)
    assert(MessageCodec.wrdnFromJsonBody("[1,2]").isEmpty)
  }

  test("loadMessage: message file wins, synthesis fills in otherwise") {
    val dir = Files.createTempDirectory("graft_offline")
    val msgFile = dir.resolve("run.message.json")
    Files.writeString(msgFile,
      """{"service_id": "svc", "job_id": "j1", "error_encountered": false,
        |"file_name": "/from/message.nxs", "metadata": "{}", "message": "ok"}""".stripMargin)
    val fromFile = OfflineIngestor.loadMessage("/cli/file.nxs", Some(msgFile.toString))
    assert(fromFile.file_name == "/from/message.nxs" && fromFile.job_id == "j1")
    val synthesized = OfflineIngestor.loadMessage("/cli/file.nxs", None)
    assert(synthesized.file_name == "/cli/file.nxs" && !synthesized.error_encountered)
    // unreadable message file degrades to synthesis, not failure
    assert(OfflineIngestor.loadMessage("/cli/file.nxs",
      Some(dir.resolve("missing.json").toString)).file_name == "/cli/file.nxs")
  }

  test("offline run: real fixture → dataset row through the production reader") {
    val dir = Files.createTempDirectory("graft_offline_schemas")
    Files.writeString(dir.resolve("ymir.imsc.yml"), ymirSchemaYaml)
    val out = OfflineIngestor.run(spark, cfgFor(dir), ymir).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("pid").startsWith("20.500.12269/"))
    assert(out.head.getAs[String]("datasetName").nonEmpty)
  }

  test("offline run: existing pid dedups to zero rows (skip path)") {
    val dir = Files.createTempDirectory("graft_offline_schemas2")
    Files.writeString(dir.resolve("ymir.imsc.yml"), ymirSchemaYaml)
    val cfg = cfgFor(dir)
    val pid = OfflineIngestor.run(spark, cfg, ymir).collect().head.getAs[String]("pid")
    val existing = graft.catalog.LocalCatalog(Map(s"datasets/$pid" -> "{}"))
    assert(OfflineIngestor.run(spark, cfg, ymir, catalog = Some(existing)).count() == 0)

    // check_if_dataset_exists_by_pid=false disables the F6 gate entirely
    val noGate = IngestorConfig.load(
      s"""ingestion:
         |  schemas_directory: "${cfg.ingestion.schemasDirectory}"
         |  check_if_dataset_exists_by_pid: false
         |""".stripMargin)
    assert(OfflineIngestor.run(spark, noGate, ymir, catalog = Some(existing)).count() == 1)
  }

  test("sample get-or-create: dedups in batch, probes catalog, POSTs the rest") {
    import spark.implicits._
    createdSamples.clear()
    val pl72 = Seq(
      ("j1", "sampleA", "ymir"), ("j2", "sampleA", "ymir"), // in-batch dup
      ("j3", "sampleB", "ymir"), // already in catalog
      ("j4", "sampleA", "coda"))
      .toDF("job_id", "filename", "instrument_name")
    val created = SampleIngestor.processSampleBatch(
      pl72, OfflineIngestorSpec.RecordingCatalog(existing = Set(("sampleB", "ymir"))))
    assert(created.count() == 2) // persisted: count does NOT re-probe/re-post
    val posted = createdSamples.toArray(Array.empty[(String, String)]).toSet
    assert(posted == Set(("sampleA", "ymir"), ("sampleA", "coda")))
    assert(created.count() == 2) // stable on repeated actions
    assert(createdSamples.size == 2) // and no duplicate POSTs happened
  }
}
