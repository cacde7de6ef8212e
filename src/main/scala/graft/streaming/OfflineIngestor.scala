package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.{IngestLogging, IngestorConfig}
import graft.streaming.Messages.WritingFinished

/** The per-file offline ingestor
  * (ref: src/scicat_offline_ingestor.py:194-348, the reference's second
  * entry point): given one nexus file (and optionally the saved wrdn
  * message file), run the same schema-selection → extraction → assembly
  * → dedup → sink pipeline the online daemon runs per batch, for
  * exactly one record.
  *
  * The engine reuses [[IngestStream.processBatch]] on a one-row
  * DataFrame — the offline and online paths are THE SAME program (the
  * reference duplicates the pipeline across two modules; here batch
  * size 1 is just a degenerate micro-batch).
  */
object OfflineIngestor {

  /** Reconstruct the wrdn record: from the saved message file when
    * given (the JSON body K3 dumps and the reference's
    * done_writing_message_file), else synthesized from the nexus path
    * (ref: offline config requires nexus_file; message file optional). */
  def loadMessage(nexusFile: String, messageFile: Option[String]): WritingFinished =
    messageFile.filter(p => Files.isRegularFile(Paths.get(p)))
      .flatMap(p => MessageCodec.wrdnFromJsonBody(Files.readString(Paths.get(p))))
      .getOrElse(WritingFinished(
        service_id = "offline", job_id = "", error_encountered = false,
        file_name = nexusFile, metadata = "{}", message = ""))

  /** Run the single-file pipeline; returns the deduped dataset rows
    * (0 rows = already in catalog, the reference's "Skipping it" path). */
  def run(
      spark: SparkSession,
      cfg: IngestorConfig.Config,
      nexusFile: String,
      messageFile: Option[String] = None,
      catalog: Option[graft.catalog.Catalog] = None,
      fileReader: Option[String => Option[String]] = None): DataFrame = {
    import spark.implicits._
    val m = loadMessage(nexusFile, messageFile)
    val batch = Seq((m.service_id, m.job_id, m.error_encountered, m.file_name,
      m.metadata, m.message))
      .toDF("service_id", "job_id", "error_encountered", "file_name", "metadata", "message")
    IngestStream.processBatch(batch,
      OnlineIngestor.buildStreamConfig(cfg, catalog, fileReader))
  }

  /** `runMain graft.streaming.OfflineIngestor --config-file <path>
    * --nexus-file <path> [--done-writing-message-file <path>]`
    * (ref: OfflineIngestorConfig mandatory args). */
  def main(args: Array[String]): Unit = {
    val argMap = args.sliding(2, 1).collect {
      case Array(k, v) if k.startsWith("--") && !v.startsWith("--") => k -> v
    }.toMap
    val cfgPath = argMap.getOrElse("--config-file", sys.error("--config-file is required"))
    val nexusFile = argMap.getOrElse("--nexus-file", sys.error("--nexus-file is required"))
    val cfg = IngestorConfig.loadFile(cfgPath)
    val logger = IngestLogging.buildLogger(cfg.logging)
    val spark = SparkSession.builder()
      .appName("graft-offline-ingestor").master("local[*]").getOrCreate()
    try {
      val out = run(spark, cfg, nexusFile, argMap.get("--done-writing-message-file"))
      val catalog = cfg.scicat.toCatalog
      if (cfg.ingestion.dryRun) logger.info(
        s"dry-run: assembled ${out.count()} dataset rows for $nexusFile, not POSTed")
      else Sinks.restDatasetSink(catalog)(out, 0L)
    } finally spark.stop()
  }
}
