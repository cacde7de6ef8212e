package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.assemble.DatasetAssembly

/** Sinks (§2.6): dataset/datablock documents as null-stripped JSON (the
  * F10 projection the REST POST would carry, K1/K2), raw-message side
  * dump (K3), and a dry-run toggle (K5).
  *
  * In production K1/K2 are HTTP POSTs inside foreachBatch (idempotent
  * thanks to the F6/F7 dedup gate); here the same rows land as JSON
  * lines so tests and the driver can inspect exactly what would be
  * POSTed.
  */
object Sinks {

  /** K1/K2 + F10: write each dataset row (and its datablock struct) as
    * null-stripped JSON lines under outDir. Dry-run (K5) skips writes. */
  def jsonDatasetSink(outDir: String, dryRun: Boolean = false)(
      batch: DataFrame, batchId: Long): Unit = {
    if (dryRun) return
    val datasetJson = batch.select(
      to_json(struct(DatasetAssembly.OutputColumns.filterNot(_ == "origDataBlock").map(col): _*),
        Map("ignoreNullFields" -> "true")).as("dataset"),
      to_json(col("origDataBlock"), Map("ignoreNullFields" -> "true")).as("datablock"))
    val rows = datasetJson.collect()
    val dir = Paths.get(outDir)
    Files.createDirectories(dir)
    val ds = rows.map(_.getString(0)).mkString("\n")
    val db = rows.map(_.getString(1)).mkString("\n")
    Files.writeString(dir.resolve(f"datasets_$batchId%05d.jsonl"), ds)
    Files.writeString(dir.resolve(f"origdatablocks_$batchId%05d.jsonl"), db)
  }

  /** K3: persist each raw wrdn message body as JSON next to the data
    * file's ingestor dir (ref: save_message_to_file,
    * src/scicat_kafka.py:252-261). */
  def dumpMessages(batch: DataFrame, dumpDir: String): Unit = {
    val rows = batch.select(col("file_name"), col("job_id"), col("service_id"),
      col("metadata"), col("message")).collect()
    val dir = Paths.get(dumpDir)
    Files.createDirectories(dir)
    rows.foreach { r =>
      val stem = Paths.get(r.getAs[String]("file_name")).getFileName.toString
      val json = graft.sources.NexusExtractor.jsonStr _
      val body =
        s"""{"file_name":${json(r.getAs[String]("file_name"))},""" +
          s""""job_id":${json(r.getAs[String]("job_id"))},""" +
          s""""service_id":${json(r.getAs[String]("service_id"))},""" +
          s""""metadata":${json(r.getAs[String]("metadata"))},""" +
          s""""message":${json(r.getAs[String]("message"))}}"""
      Files.writeString(dir.resolve(s"$stem.json"), body)
    }
  }
}
