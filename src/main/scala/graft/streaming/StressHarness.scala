package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.catalog.MemoryCatalog
import graft.config.IngestorConfig
import graft.operators.IngestDemo

/** Streaming ACCEPTANCE harness — the engine's analogue of the
  * reference's two acceptance programs, which were the round-5
  * verdict's #1 gap:
  *
  *  - `tests/_scicat_stress_test.py:26-31,178-243` — sustained
  *    production at a fixed message rate with 5 Hz health polling and
  *    a drain check at the end;
  *  - `tests/_scicat_ingestor.py:20,129-136` — the 60 s end-to-end
  *    ingestion budget per message.
  *
  * No broker exists in this sandbox, so the topic is a FILE bus: each
  * produced message is one flatbuffer-framed wrdn payload moved
  * ATOMICALLY into a watched directory, and the stream reads it with
  * the `binaryFile` source — checkpointed offsets, `maxFilesPerTrigger`
  * admission control (the file-source twin of A8's
  * `maxOffsetsPerTrigger`), and the same downstream pipeline as the
  * Kafka path ([[IngestStream]] consumes any binary `value` column).
  * Swapping [[fileBus]] for [[StreamSources.fromKafka]] changes
  * NOTHING downstream — that is the point of the S1 seam.
  *
  * [[runKillRecovery]] is the crash-consistency half: the sink dies
  * mid-batch after some POSTs landed, the query is restarted from the
  * same checkpoint, the failed batch REPLAYS, and the F6 anti-join
  * against the already-committed pids turns at-least-once replay into
  * exactly-once delivery (ref §2.7: per-record dedup-then-commit,
  * scicat_offline_ingestor.py:67-85). The assertion is on the BACKEND
  * (`MemoryCatalog.duplicatePostCount == 0`), not on the stream.
  */
object StressHarness {

  // JVM-shared crash-injection state for [[runSampleKillRecovery]] —
  // see the comment at its use site for why these cannot live in the
  // closure. Reset at the start of each run; runs are not concurrent.
  private[streaming] val sampleCrashFired = new AtomicBoolean(false)
  private[streaming] val sampleCrashArmed = new AtomicBoolean(false)
  private[streaming] val sampleArmThreshold = new java.util.concurrent.atomic.AtomicLong(Long.MaxValue)

  /** binaryFile's fixed schema — streaming file sources require it
    * spelled out. */
  private val BinaryFileSchema = StructType(Seq(
    StructField("path", StringType), StructField("modificationTime", TimestampType),
    StructField("length", LongType), StructField("content", BinaryType)))

  /** The file-bus message source: every file in `dir` is one message,
    * `value` = its bytes (the Kafka record-value contract). */
  def fileBus(spark: SparkSession, dir: String, maxFilesPerTrigger: Int): DataFrame =
    fileBusWithTime(spark, dir, maxFilesPerTrigger).select(col("value"))

  /** Same bus keeping the record timestamp (file mtime here, the Kafka
    * record timestamp on a real broker) — the event time the lifecycle
    * join watermarks on. */
  def fileBusWithTime(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int): DataFrame =
    spark.readStream.format("binaryFile")
      .schema(BinaryFileSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
      .select(col("content").as("value"), col("modificationTime"))

  /** IngestDemo schema + a pid bound to `<data_file_name>` so every
    * message assembles a DISTINCT pid — what the dedup anti-join and
    * the exactly-once assertions key on. */
  lazy val pidSchema: graft.schema.ImscSchema =
    graft.schema.ImscSchema.fromYamlOrJson(
      IngestDemo.schemaYaml.replace("schema:",
        """schema:
          |  pid_item:
          |    field_type: high_level
          |    machine_name: pid
          |    value: <data_file_name>
          |    type: string
          |""".stripMargin))

  /** Deterministic stand-in for the NeXus file every wrdn message
    * points at (the reference stress test ships one fixed file too). */
  val nexusJson: String =
    """{"entry": {
      |  "doc_id": {"__value": ["7"]},
      |  "title": {"__value": ["stress run"]},
      |  "temperature": {"__value": [42.0], "__attrs": {"units": "K"}}}}""".stripMargin

  def streamConfig(catalog: MemoryCatalog): IngestStream.Config =
    IngestStream.Config(
      schemas = Seq(pidSchema),
      catalog = catalog,
      fileReader = _ => Some(nexusJson),
      fileLister = p => Seq(FileIngest.FileStats(
        p, Some(100L), "2024-01-01T00:00:00+00:00", None, None, None, None)))

  /** One produced message: flatbuffer wrdn bytes staged then moved
    * atomically (a half-written file must never enter the bus). */
  def produce(busDir: Path, stageDir: Path, i: Int): String = {
    val fileName = f"/data/stress/msg-$i%05d.nxs"
    val payload = MessageCodec.encodeWrdnFb(Messages.WritingFinished(
      "stress", f"job-$i%05d", error_encountered = false, fileName, "{}", "done"))
    val staged = stageDir.resolve(f"msg-$i%05d.bin")
    Files.write(staged, payload)
    Files.move(staged, busDir.resolve(staged.getFileName),
      StandardCopyOption.ATOMIC_MOVE)
    fileName
  }

  final case class Result(
      produced: Int,
      ingested: Int,
      datasetPosts: Long,
      duplicatePosts: Long,
      batches: Int,
      maxBatchRows: Int,
      elapsedMs: Long,
      drainMs: Long,
      maxE2eMs: Long,
      healthPolls: Int,
      healthFailures: Int) {
    def throughputPerSec: Double =
      if (elapsedMs == 0) 0.0 else ingested * 1000.0 / elapsedMs
  }

  /** Sustained-rate run: produce `ratePerSec` messages/s for
    * `durationSec`, poll `/health` at `healthHz`, drain, report.
    * Mirrors `_scicat_stress_test.py` scaled by the caller (the spec
    * runs seconds; [[main]] defaults to the reference's 300 s / 1 Hz).
    */
  def run(
      spark: SparkSession,
      durationSec: Double,
      ratePerSec: Double,
      healthHz: Double = 5.0,
      maxFilesPerTrigger: Int = 64,
      drainTimeoutSec: Double = 60.0): Result = {
    val busDir = Files.createTempDirectory("graft_stress_bus")
    val stageDir = Files.createTempDirectory("graft_stress_stage")
    val ckpt = Files.createTempDirectory("graft_stress_ckpt")
    val catalog = MemoryCatalog(Map("health" -> "{}"))

    val produceNanos = new ConcurrentHashMap[String, Long]()
    val ingestNanos = new ConcurrentHashMap[String, Long]()
    val batchRows = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()

    val sink: (DataFrame, Long) => Unit = (batch, id) => {
      val cached = batch.persist()
      try {
        Sinks.restDatasetSink(catalog)(cached, id)
        val now = System.nanoTime()
        val pids = cached.select("pid").collect().map(_.getString(0))
        pids.foreach(p => ingestNanos.putIfAbsent(p, now))
        batchRows.add(pids.length)
      } finally cached.unpersist()
    }

    val query = IngestStream.ingestQuery(
      fileBus(spark, busDir.toString, maxFilesPerTrigger),
      streamConfig(catalog), sink, checkpointDir = Some(ckpt.toString))

    val health = HealthCheck.start(
      IngestorConfig.HealthCheckConfig(host = "localhost", port = 0),
      HealthCheck.Probes(
        kafka = () => query.isActive,
        storage = HealthCheck.storageProbe(busDir.toString),
        scicat = HealthCheck.scicatProbe(catalog)))
    val port = health.getAddress.getPort
    val httpClient = HttpClient.newHttpClient()
    var healthPolls = 0
    var healthFailures = 0
    val polling = new AtomicBoolean(true)
    val poller = new Thread(() => {
      while (polling.get()) {
        try {
          val resp = httpClient.send(
            HttpRequest.newBuilder(URI.create(s"http://localhost:$port/health"))
              .GET().build(),
            HttpResponse.BodyHandlers.ofString())
          healthPolls += 1
          if (resp.statusCode() != 200) healthFailures += 1
        } catch { case _: Exception => healthPolls += 1; healthFailures += 1 }
        Thread.sleep(math.max(1L, (1000.0 / healthHz).toLong))
      }
    }, "graft-stress-health-poller")
    poller.setDaemon(true)

    val t0 = System.nanoTime()
    var produced = 0
    try {
      poller.start()
      val total = math.max(1, (durationSec * ratePerSec).toInt)
      val stepNanos = (1e9 / ratePerSec).toLong
      while (produced < total) {
        val target = t0 + produced.toLong * stepNanos
        val lag = target - System.nanoTime()
        if (lag > 0) Thread.sleep(lag / 1000000L, (lag % 1000000L).toInt)
        val fileName = produce(busDir, stageDir, produced)
        // pid = <data_file_name> = basename of the message's file_name
        produceNanos.put(fileName.substring(fileName.lastIndexOf('/') + 1),
          System.nanoTime())
        produced += 1
      }
      // drain: everything produced must land in the catalog
      val drainStart = System.nanoTime()
      val deadline = drainStart + (drainTimeoutSec * 1e9).toLong
      while (ingestNanos.size() < produced && System.nanoTime() < deadline) {
        query.processAllAvailable()
        if (ingestNanos.size() < produced) Thread.sleep(50)
      }
      val tEnd = System.nanoTime()
      polling.set(false)

      val maxE2e = {
        var m = 0L
        produceNanos.forEach { (k, p) =>
          val ing = ingestNanos.get(k)
          if (ing != 0L && ing > p) m = math.max(m, ing - p)
        }
        m / 1000000L
      }
      Result(
        produced = produced,
        ingested = ingestNanos.size(),
        datasetPosts = catalog.datasetPostCount,
        duplicatePosts = catalog.duplicatePostCount,
        batches = batchRows.size(),
        maxBatchRows = {
          var m = 0
          batchRows.forEach(n => m = math.max(m, n))
          m
        },
        elapsedMs = (tEnd - t0) / 1000000L,
        drainMs = (tEnd - drainStart) / 1000000L,
        maxE2eMs = maxE2e,
        healthPolls = healthPolls,
        healthFailures = healthFailures)
    } finally {
      polling.set(false)
      try query.stop() catch { case _: Exception => () }
      health.stop(0)
    }
  }

  final case class RecoveryResult(
      produced: Int,
      crashed: Boolean,
      postsBeforeCrash: Long,
      datasetPosts: Long,
      duplicatePosts: Long,
      pidsIngested: Int,
      batchesFirstRun: Int,
      batchesSecondRun: Int)

  /** Kill-and-recover: all messages on the bus up front, small
    * `maxFilesPerTrigger` to force several micro-batches, and a sink
    * that CRASHES mid-batch (after one POST landed) on its second
    * batch. The restarted query resumes from the checkpoint, replays
    * the failed batch, and the F6 anti-join must swallow the rows whose
    * POST already committed — the backend sees every pid EXACTLY once.
    */
  def runKillRecovery(
      spark: SparkSession,
      nMessages: Int = 30,
      filesPerTrigger: Int = 10): RecoveryResult = {
    import graft.assemble.DatasetAssembly
    val busDir = Files.createTempDirectory("graft_recover_bus")
    val stageDir = Files.createTempDirectory("graft_recover_stage")
    val ckpt = Files.createTempDirectory("graft_recover_ckpt")
    val catalog = MemoryCatalog(Map("health" -> "{}"))
    (0 until nMessages).foreach(i => produce(busDir, stageDir, i))

    val crashed = new AtomicBoolean(false)
    var postsBeforeCrash = 0L
    var batchesFirstRun = 0
    var batchesSecondRun = 0

    // the sink as a driver-side POST loop (the reference's offline
    // ingestor commits one dataset+datablock pair per message)
    def postLoop(batch: DataFrame, crashAfter: Int): Unit = {
      val pairs = batch.select(
        to_json(struct(DatasetAssembly.OutputColumns
            .filterNot(_ == "origDataBlock").map(col): _*),
          Map("ignoreNullFields" -> "true")).as("dataset"),
        to_json(col("origDataBlock"), Map("ignoreNullFields" -> "true")).as("datablock"))
        .collect()
      var posted = 0
      pairs.foreach { r =>
        if (crashAfter >= 0 && posted >= crashAfter)
          throw new RuntimeException("injected sink crash (stress harness)")
        catalog.createDataset(r.getAs[String]("dataset"))
        catalog.createOrigDatablock(r.getAs[String]("datablock"))
        posted += 1
      }
    }

    def startQuery(firstRun: Boolean): StreamingQuery =
      IngestStream.ingestQuery(
        fileBus(spark, busDir.toString, filesPerTrigger),
        streamConfig(catalog),
        (batch, id) => {
          if (firstRun) batchesFirstRun += 1 else batchesSecondRun += 1
          val crashNow = firstRun && id >= 1 && !crashed.get()
          if (crashNow) {
            crashed.set(true)
            try postLoop(batch, crashAfter = 1)
            finally postsBeforeCrash = catalog.datasetPostCount
          } else postLoop(batch, crashAfter = -1)
        },
        checkpointDir = Some(ckpt.toString))

    val q1 = startQuery(firstRun = true)
    val died = try { q1.processAllAvailable(); false }
      catch { case _: Exception => true }
    try q1.stop() catch { case _: Exception => () }

    val q2 = startQuery(firstRun = false)
    q2.processAllAvailable()
    q2.stop()

    RecoveryResult(
      produced = nMessages,
      crashed = died && crashed.get(),
      postsBeforeCrash = postsBeforeCrash,
      datasetPosts = catalog.datasetPostCount,
      duplicatePosts = catalog.duplicatePostCount,
      pidsIngested = catalog.pids.size,
      batchesFirstRun = batchesFirstRun,
      batchesSecondRun = batchesSecondRun)
  }

  final case class SampleRecoveryResult(
      produced: Int,
      crashed: Boolean,
      createsBeforeCrash: Long,
      sampleCreates: Long,
      duplicateCreates: Long,
      samples: Set[(String, String)],
      batchesSecondRun: Int,
      perInstrumentSingleThreaded: Boolean,
      perInstrumentOrdered: Boolean)

  /** J5 crash-consistency: the sample-ingestor twin of
    * [[runKillRecovery]], exercising the reference ADR-003 invariants
    * ACROSS a restart — exactly one sample ever created per
    * (name, proposal) even though the crashed batch replays, each
    * instrument's creates serialized on one worker (the per-instrument
    * mutex), and per-instrument creation order deterministic.
    *
    * The bus carries pl72 run-start messages (several instruments
    * interleaved, every message sent TWICE so get-or-create also dedups
    * in-batch); the sink is [[SampleIngestor.processSampleBatch]]
    * against a [[MemoryCatalog]] wrapped so its `createSample` throws
    * mid-batch once ≥1 create of a non-first batch has committed. The
    * restarted query replays from the checkpoint; the existence probe
    * must swallow exactly the creates that already landed. */
  def runSampleKillRecovery(
      spark: SparkSession,
      nInstruments: Int = 4,
      samplesPerInstrument: Int = 6,
      filesPerTrigger: Int = 16): SampleRecoveryResult = {
    val busDir = Files.createTempDirectory("graft_sample_bus")
    val stageDir = Files.createTempDirectory("graft_sample_stage")
    val ckpt = Files.createTempDirectory("graft_sample_ckpt")
    val catalog = MemoryCatalog(Map("health" -> "{}"))

    var produced = 0
    def produceSample(i: Int, dup: Int): Unit = {
      val inst = s"instr-${i % nInstruments}"
      val sample = f"sample-${i % nInstruments}%02d-${i / nInstruments}%03d"
      val payload = MessageCodec.encodePl72Fb(Messages.RunStartInfo(
        f"job-$i%04d-$dup", sample, inst))
      val staged = stageDir.resolve(f"pl72-$i%04d-$dup.bin")
      Files.write(staged, payload)
      Files.move(staged, busDir.resolve(staged.getFileName),
        StandardCopyOption.ATOMIC_MOVE)
      produced += 1
    }
    (0 until nInstruments * samplesPerInstrument).foreach { i =>
      produceSample(i, 0); produceSample(i, 1) // in-batch dup pressure
    }

    // crash state lives in the companion OBJECT, not the closure: task
    // closures are serialized per task even in local mode, so mutations
    // to captured AtomicBooleans land on per-task COPIES and the driver
    // would never observe them — statics are JVM-shared (the same
    // reasoning as MemoryCatalog's static store)
    val crashed = StressHarness.sampleCrashFired
    val crashArmed = StressHarness.sampleCrashArmed
    crashed.set(false); crashArmed.set(false)
    StressHarness.sampleArmThreshold.set(Long.MaxValue)
    var createsBeforeCrash = 0L
    var batchesSecondRun = 0
    // [lo, hi] of the global create-seq counter per processed batch —
    // the per-instrument invariants below are PER-BATCH claims (across
    // batches the engine serializes foreachBatch; threads differ)
    val segments = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]

    // delegate catalog whose createSample dies once the armed batch has
    // committed 2 creates past the arm point — the crash lands INSIDE
    // the foreachPartition create loop, after real commits
    val crashingCatalog: graft.catalog.Catalog = new graft.catalog.Catalog {
      def lookupJson(url: String, field: String) = catalog.lookupJson(url, field)
      def querySamples(name: String, proposalId: String) =
        catalog.querySamples(name, proposalId)
      def datasetExists(pid: String) = catalog.datasetExists(pid)
      def metadataValueExists(key: String, value: String) =
        catalog.metadataValueExists(key, value)
      def createDataset(json: String) = catalog.createDataset(json)
      def createOrigDatablock(json: String) = catalog.createOrigDatablock(json)
      override def createSample(name: String, proposalId: String): Unit = {
        if (StressHarness.sampleCrashArmed.get() &&
            catalog.sampleCreateCount >= StressHarness.sampleArmThreshold.get() &&
            StressHarness.sampleCrashFired.compareAndSet(false, true))
          throw new RuntimeException("injected sample-create crash")
        catalog.createSample(name, proposalId)
      }
    }

    def startQuery(firstRun: Boolean): StreamingQuery =
      IngestStream.runStartStream(
          fileBus(spark, busDir.toString, filesPerTrigger))
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          if (!firstRun) batchesSecondRun += 1
          if (firstRun && id >= 1 && !crashed.get()) {
            StressHarness.sampleArmThreshold.set(catalog.sampleCreateCount + 2)
            crashArmed.set(true)
          }
          val before = catalog.sampleCreateCount
          var threw = true
          try { SampleIngestor.processSampleBatch(batch.toDF(), crashingCatalog); threw = false }
          finally {
            // QUIESCE before recording a FAILED batch's segment: on job
            // failure Spark does not interrupt sibling partition tasks
            // (interruptOnCancel is off), so straggler creates from the
            // crashed batch can land AFTER the exception reaches here.
            // Recording `hi` immediately would attribute them to the
            // next (run-2 replay) segment and make the per-batch
            // ADR-003 assertions flaky. Wait for the create counter to
            // stabilize (unchanged for 250 ms, 10 s ceiling) first; a
            // clean batch has no in-flight siblings and records as-is.
            var last = catalog.sampleCreateCount
            if (threw) {
              var stableSince = System.nanoTime()
              val deadline = System.nanoTime() + 10_000_000_000L
              while (System.nanoTime() - stableSince < 250_000_000L &&
                  System.nanoTime() < deadline) {
                Thread.sleep(25)
                val now = catalog.sampleCreateCount
                if (now != last) { last = now; stableSince = System.nanoTime() }
              }
            }
            segments += ((before, last))
            if (crashArmed.getAndSet(false)) createsBeforeCrash = last
          }
          ()
        }
        .option("checkpointLocation", ckpt.toString)
        .start()

    val q1 = startQuery(firstRun = true)
    val died = try { q1.processAllAvailable(); false }
      catch { case _: Exception => true }
    try q1.stop() catch { case _: Exception => () }

    val q2 = startQuery(firstRun = false)
    q2.processAllAvailable()
    q2.stop()

    val log = catalog.sampleCreateLog
    def perBatchByInstrument: Seq[Seq[MemoryCatalog.SampleCreate]] =
      segments.toSeq.flatMap { case (lo, hi) =>
        log.filter(e => e.seq > lo && e.seq <= hi)
          .groupBy(_.proposal).values.toSeq
      }
    SampleRecoveryResult(
      produced = produced,
      crashed = died && crashed.get(),
      createsBeforeCrash = createsBeforeCrash,
      sampleCreates = catalog.sampleCreateCount,
      duplicateCreates = catalog.duplicateSampleCreateCount,
      samples = log.map(e => (e.name, e.proposal)).toSet,
      batchesSecondRun = batchesSecondRun,
      // ADR-003 mutex analogue: within a batch, ONE worker thread per
      // instrument (dedup-then-repartition keeps an instrument in
      // exactly one partition = one sequential task)
      perInstrumentSingleThreaded =
        perBatchByInstrument.forall(_.map(_.thread).distinct.size == 1),
      // deterministic per-instrument order: within a batch an
      // instrument's creates land in ascending sample-name order
      // (sortWithinPartitions contract)
      perInstrumentOrdered = perBatchByInstrument.forall { es =>
        val bySeq = es.sortBy(_.seq).map(_.name)
        bySeq == bySeq.sorted
      })
  }

  /** Standalone acceptance run, reference-scaled defaults:
    * `runMain graft.streaming.StressHarness [durationSec] [ratePerSec]`
    * (300 s at 1 msg/s, 5 Hz health — _scicat_stress_test.py:26-31).
    * Prints one JSON result line. */
  def main(args: Array[String]): Unit = {
    val duration = args.lift(0).map(_.toDouble).getOrElse(300.0)
    val rate = args.lift(1).map(_.toDouble).getOrElse(1.0)
    val spark = SparkSession.builder()
      .appName("graft-stress")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val r = run(spark, duration, rate)
      println(
        s"""{"produced":${r.produced},"ingested":${r.ingested},""" +
        s""""dataset_posts":${r.datasetPosts},"duplicate_posts":${r.duplicatePosts},""" +
        s""""batches":${r.batches},"max_batch_rows":${r.maxBatchRows},""" +
        s""""elapsed_ms":${r.elapsedMs},"drain_ms":${r.drainMs},""" +
        s""""max_e2e_ms":${r.maxE2eMs},"throughput_per_sec":${r.throughputPerSec},""" +
        s""""health_polls":${r.healthPolls},"health_failures":${r.healthFailures}}""")
    } finally spark.stop()
  }
}
