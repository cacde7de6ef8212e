package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.{IngestLogging, IngestorConfig}

/** The sample-ingestor daemon (ref: src/scicat_sample_ingestor.py —
  * the reference's third entry point): pl72 run-start stream →
  * per-instrument get-or-create of samples in the catalog.
  *
  * §3.3 semantics preserved Spark-first:
  *  - per-instrument ordering = `repartition(instrument_name)` (the
  *    reference's per-instrument mutex, ref :124-127,188-190);
  *  - get-or-create = in-batch dedup + existence probe + POST; the
  *    probe/POST run on the EXECUTORS per partition, so instruments
  *    fan out in parallel while each instrument stays sequential.
  */
object SampleIngestor {

  /** One micro-batch of pl72 records → the (sample, proposal) pairs
    * that were actually created. Enumerable catalogs use the broadcast
    * anti-join ([[IngestStream.samplePipeline]]); REST catalogs probe
    * per distinct candidate (ref: check_sample, :76-94 — exists iff the
    * query returns a non-empty list). */
  def processSampleBatch(
      pl72Batch: DataFrame,
      catalog: graft.catalog.Catalog): DataFrame = {
    // Dedup FIRST, then repartition: dropDuplicates shuffles by its own
    // keys, so a repartition placed before it is silently undone and one
    // instrument's creates would fan out across partitions/threads —
    // breaking the per-instrument mutex the reference holds (ADR-003).
    // After the instrument repartition, each instrument lives in exactly
    // one partition (one sequential task), and sortWithinPartitions
    // fixes a deterministic per-instrument creation order.
    val candidates = pl72Batch
      .select(col("job_id"), col("filename"), col("instrument_name"))
      .dropDuplicates("filename", "instrument_name")
      .repartition(col("instrument_name"))
      .sortWithinPartitions(col("instrument_name"), col("filename"))
    val existsUdf = udf((name: String, proposalId: String) =>
      catalog.querySamples(name, proposalId).nonEmpty)
    // persist BEFORE the POST action: without it, any later action on
    // the returned frame would re-run the exists probe — which now says
    // "exists" for everything just created — and re-POST or report 0
    val created = candidates.filter(
      !existsUdf(col("filename"), col("instrument_name"))).persist()
    created.select(col("filename"), col("instrument_name"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach(r => catalog.createSample(r.getString(0), r.getString(1)))
      }
    created
  }

  /** `runMain graft.streaming.SampleIngestor --config-file <path>` —
    * wires the pl72 stream to [[processSampleBatch]]. */
  def main(args: Array[String]): Unit = {
    val argList = args.toSeq
    val i = argList.indexOf("--config-file")
    require(i >= 0 && i + 1 < argList.length, "--config-file <path> is required")
    val cfg = IngestorConfig.loadFile(argList(i + 1), argList.patch(i, Nil, 2))
    val logger = IngestLogging.buildLogger(cfg.logging)
    val spark = SparkSession.builder().appName("graft-sample-ingestor").getOrCreate()
    val catalog = cfg.scicat.toCatalog
    val messages = StreamSources.fromKafka(
      spark, cfg.kafka.bootstrapServers, cfg.kafka.topics, cfg.kafka.securityOptions)
    val query = IngestStream.runStartStream(messages).writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val created = processSampleBatch(batch.toDF(), catalog)
        logger.info(s"sample batch $id: created ${created.count()} samples")
      }
      .option("checkpointLocation",
        java.nio.file.Paths.get(
          cfg.ingestion.fileHandling.ingestorFilesDirectory, "sample-checkpoint").toString)
      .start()
    try query.awaitTermination() finally spark.stop()
  }
}
