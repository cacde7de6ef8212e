package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.IngestDemo
import graft.streaming.Messages._

/** End-to-end streaming parity: wrdn/pl72 type filters, error filter,
  * per-batch imsc pipeline, pid dedup, sample get-or-create — the
  * reference's E2E integration shape (tests/_scicat_ingestor.py) on a
  * MemoryStream source.
  */
object IngestStreamFixture extends Serializable {
  val nexusJson: String =
    """{"entry": {
      |  "doc_id": {"__value": ["7"]},
      |  "title": {"__value": ["stream run"]},
      |  "temperature": {"__value": [42.0], "__attrs": {"units": "K"}}}}""".stripMargin

  val reader: String => Option[String] = _ => Some(nexusJson)
  val lister: String => Seq[FileIngest.FileStats] =
    p => Seq(FileIngest.FileStats(p, Some(100L),
      "2024-01-01T00:00:00+00:00", None, None, None, None))
}

class IngestStreamSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def wrdn(file: String, error: Boolean = false) = MessageCodec.encodeWrdn(
    WritingFinished("svc", s"job-$file", error, file, "{}", "done"))

  private def cfg = IngestStream.Config(
    schemas = Seq(IngestDemo.schema),
    fileReader = IngestStreamFixture.reader,
    fileLister = IngestStreamFixture.lister)

  test("F1/F2: type + error filters on the binary stream") {
    val msgs = Seq(
      wrdn("/data/a/f1.nxs"),
      wrdn("/data/a/f2.nxs", error = true), // dropped by F2
      MessageCodec.encodePl72(RunStartInfo("j", "/data/a/f1.nxs", "ymir")), // dropped by F1
      "garbage".getBytes("UTF-8")) // dropped by F1
      .toDF("value")
    val got = IngestStream.wrdnStream(msgs).collect()
    assert(got.map(_.getAs[String]("file_name")).toSeq == Seq("/data/a/f1.nxs"))
    val pl = IngestStream.runStartStream(msgs).collect()
    assert(pl.map(_.getAs[String]("instrument_name")).toSeq == Seq("ymir"))
  }

  test("streaming query end-to-end: decode → pipeline → sink") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Array[Byte]]
    val results = new ConcurrentLinkedQueue[Row]()

    val query = IngestStream.ingestQuery(
      input.toDF().withColumnRenamed("value", "value"),
      cfg,
      (batch, _) => batch.collect().foreach(results.add))

    input.addData(
      wrdn("/data/a/run1.nxs"),
      wrdn("/data/a/run2.nxs", error = true),
      wrdn("/other/path.nxs")) // no schema matches ('/data/' selector), no fallback
    query.processAllAvailable()
    input.addData(wrdn("/data/b/run3.nxs"))
    query.processAllAvailable()
    query.stop()

    val rows = results.toArray(Array.empty[Row])
    val names = rows.map(_.getAs[String]("datasetName")).sorted
    assert(names.toSeq == Seq("ds_stream run", "ds_stream run"))
    val sm = rows.head.getAs[Map[String, Row]]("scientificMetadata")
    assert(sm("sample_temperature").getAs[String]("value") == "42.0")
    assert(rows.head.getAs[Long]("size") == 100L)
  }

  test("F6: existing catalog pid is skipped (dedup anti-join)") {
    // IngestDemo schema has no pid item → pid null → anti-join keeps it;
    // use a schema with a pid item bound to the doc_id variable.
    val withPid = graft.schema.ImscSchema.fromYamlOrJson(
      IngestDemo.schemaYaml.replace("schema:",
        """schema:
          |  pid_item:
          |    field_type: high_level
          |    machine_name: pid
          |    value: <doc_key>
          |    type: string
          |""".stripMargin))
    val catalog = graft.catalog.LocalCatalog(Map("datasets/7" -> "{}"))
    val batch = Seq(("svc", "j1", false, "/data/a/r.nxs", "{}", "ok"))
      .toDF("service_id", "job_id", "error_encountered", "file_name", "metadata", "message")
    val out = IngestStream.processBatch(batch,
      cfg.copy(schemas = Seq(withPid), catalog = catalog))
    assert(out.count() == 0) // pid "7" already exists → skipped

    val outNew = IngestStream.processBatch(batch, cfg.copy(schemas = Seq(withPid)))
    assert(outNew.count() == 1) // empty catalog → ingested
  }

  test("sample get-or-create anti-join (J5/§3.3)") {
    val pl72 = Seq(
      ("j1", "sampleA", "ymir"), ("j2", "sampleA", "ymir"), // dup in batch
      ("j3", "sampleB", "ymir"), ("j4", "sampleA", "coda"))
      .toDF("job_id", "filename", "instrument_name")
    val existing = Seq(("sampleB", "ymir")).toDF("sample_name", "instrument")
    val created = IngestStream.samplePipeline(pl72, existing)
      .select("filename", "instrument_name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(created == Set(("sampleA", "ymir"), ("sampleA", "coda")))

    // PLAN GUARD: the anti-join must BROADCAST the existing-samples
    // side — a shuffled anti-join would re-hash by its own
    // (filename, instrument) keys and destroy the per-instrument
    // single-partition + sort invariant the repartition establishes
    // (the ADR-003 ordering contract SampleIngestor relies on). With
    // the broadcast, Catalyst even pushes the anti-join BELOW the
    // dedup aggregate, so the OUTERMOST exchange is the instrument
    // repartition (with its sort on top) and nothing re-hashes after.
    val plan = IngestStream.samplePipeline(pl72, existing)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"anti-join must be broadcast:\n$plan")
    val outermost = plan.linesIterator
      .find(_.contains("Exchange hashpartitioning")).getOrElse("")
    assert(outermost.contains("instrument_name") && !outermost.contains("filename"),
      s"outermost exchange must be the instrument repartition:\n$plan")
  }

  test("S10: open-retry clamps delays and stops at success") {
    var calls = 0
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val result = FileIngest.withRetries[String](
      Seq(0.001, 5.0), sleeper = slept.append(_)) { () =>
      calls += 1
      if (calls == 2) Some("ok") else None
    }
    assert(result.contains("ok") && calls == 2)
    assert(slept.toSeq == Seq(1000L)) // 0.001 clamped up to 1 s; second delay unused
  }
}

class SinksSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("K1/K2/F10: dataset sink writes null-stripped JSON lines; K5 dry-run skips") {
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val batch = Seq(("svc", "j1", false, "/data/a/r.nxs", "{}", "ok"))
      .toDF("service_id", "job_id", "error_encountered", "file_name", "metadata", "message")
    val cfg = IngestStream.Config(
      schemas = Seq(IngestDemo.schema),
      fileReader = IngestStreamFixture.reader,
      fileLister = IngestStreamFixture.lister)
    val datasets = IngestStream.processBatch(batch, cfg)
    Sinks.jsonDatasetSink(out)(datasets, 0L)
    val ds = Sinks.readJsonLines(s"$out/datasets_00000")
    assert(ds.contains("\"datasetName\":\"ds_stream run\""))
    assert(!ds.contains("\"pid\"")) // null pid stripped (F10)
    val db = Sinks.readJsonLines(s"$out/origdatablocks_00000")
    assert(db.contains("\"chkAlg\":\"blake2b\""))

    val dry = java.nio.file.Files.createTempDirectory("graft_dry").toString
    Sinks.jsonDatasetSink(dry + "/sub", dryRun = true)(datasets, 0L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dry, "sub")))
  }

  test("K3: raw message dump writes one JSON per file") {
    val out = java.nio.file.Files.createTempDirectory("graft_dump").toString
    val batch = Seq(("svc", "j1", false, "/data/a/r.nxs", "{\"k\":1}", "ok"))
      .toDF("service_id", "job_id", "error_encountered", "file_name", "metadata", "message")
    Sinks.dumpMessages(batch, out)
    val body = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "r.nxs.json"))
    assert(body.contains("\"job_id\":\"j1\"") && body.contains("{\\\"k\\\":1}"))
  }
}

class DedupAndSampleSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def batchDf = Seq(("svc", "j1", false, "/data/a/r.nxs", "{}", "ok"))
    .toDF("service_id", "job_id", "error_encountered", "file_name", "metadata", "message")

  private def baseCfg = IngestStream.Config(
    schemas = Seq(IngestDemo.schema),
    fileReader = IngestStreamFixture.reader,
    fileLister = IngestStreamFixture.lister)

  test("F7: dedup by scientificMetadata key value") {
    // IngestDemo schema writes sample_temperature value "42.0"
    val existing = graft.catalog.LocalCatalog(Map(
      "datasets/other-pid" ->
        """{"scientificMetadata": {"sample_temperature": {"value": "42.0", "unit": "K"}}}"""))
    val deduped = IngestStream.processBatch(batchDf,
      baseCfg.copy(catalog = existing, dedupMetadataKey = Some("sample_temperature")))
    assert(deduped.count() == 0) // same metadata value exists → skipped

    val kept = IngestStream.processBatch(batchDf,
      baseCfg.copy(catalog = existing, dedupMetadataKey = Some("other_key")))
    assert(kept.count() == 1) // different key → no match → ingested
  }

  test("P19+J2+J4: sample attachment reads fixed paths, queries catalog, merges") {
    val nexusWithSample =
      """{"entry": {
        |  "doc_id": {"__value": ["7"]},
        |  "title": {"__value": ["stream run"]},
        |  "temperature": {"__value": [42.0], "__attrs": {"units": "K"}},
        |  "sample": {"name": {"__value": ["crystal-A"]}},
        |  "experiment_identifier": {"__value": ["prop-9"]}}}""".stripMargin
    val catalog = graft.catalog.LocalCatalog(Map(
      "samples/crystal-A/prop-9" -> """["sample-pid-1", "sample-pid-2"]"""))
    val out = IngestStream.processBatch(batchDf, baseCfg.copy(
      catalog = catalog,
      fileReader = (_: String) => Some(nexusWithSample),
      sampleAttachment = IngestStream.SampleAttachment(querySampleName = true)))
    val row = out.collect()(0)
    val ids = row.getAs[scala.collection.Seq[String]]("sampleId")
    assert(ids != null && ids.sorted.toSeq == Seq("sample-pid-1", "sample-pid-2"))
  }
}
