package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** S1 option plumbing, spec-pinned without a broker (this sandbox has
  * no kafka jars, so a live `format("kafka")` round-trip is
  * impossible — the file-bus harness in [[StressHarnessSpec]] proves
  * the downstream behavior; THIS spec proves the exact option map the
  * source would receive, mirroring the reference's
  * `collect_consumer_options` / `collect_kafka_topics`
  * (src/scicat_kafka.py:21-51) plus Spark's own source constraints).
  */
class KafkaOptionsSpec extends AnyFunSuite {

  test("reference flattening: snake→dot under kafka. prefix, empties dropped, lists joined") {
    val opts = StreamSources.kafkaSourceOptions(
      bootstrapServers = Seq("b1:9092", "b2:9092"),
      topics = Seq("wrdn_topic", "pl72_topic"),
      consumerOptions = Map(
        "security_protocol" -> "sasl_ssl",
        "ssl_ca_location" -> "/certs/ca.pem",
        "session_timeout_ms" -> "45000",
        "fetch_min_bytes" -> "")) // empty → dropped, as the reference does
    assert(opts("kafka.bootstrap.servers") == "b1:9092,b2:9092")
    assert(opts("subscribe") == "wrdn_topic,pl72_topic")
    assert(opts("kafka.security.protocol") == "sasl_ssl")
    assert(opts("kafka.ssl.ca.location") == "/certs/ca.pem")
    assert(opts("kafka.session.timeout.ms") == "45000")
    assert(!opts.keys.exists(_.contains("fetch.min.bytes")))
    // dot-form input keys normalize identically (IngestorConfig uses them)
    val dotted = StreamSources.kafkaSourceOptions(
      Seq("b:9092"), Seq("t"), Map("security.protocol" -> "sasl_ssl"))
    assert(dotted("kafka.security.protocol") == "sasl_ssl")
  }

  test("commit policy and offset reset never reach the consumer; startingOffsets translated") {
    val opts = StreamSources.kafkaSourceOptions(
      Seq("b:9092"), Seq("t"),
      Map(
        "individual_message_commit" -> "true",
        "enable_auto_commit" -> "true",
        "auto_offset_reset" -> "latest",
        "group_id" -> "ingestor"))
    // Spark's source REJECTS these two as kafka.* options — forwarding
    // them would crash the stream at start; the commit policy is
    // replaced by checkpointing (§2.7), the reset by startingOffsets.
    assert(!opts.contains("kafka.enable.auto.commit"))
    assert(!opts.keys.exists(_.contains("auto.offset.reset")))
    assert(!opts.keys.exists(_.contains("individual.message.commit")))
    assert(opts("startingOffsets") == "latest")
    assert(opts("kafka.group.id") == "ingestor")
    // default reset is earliest (reference KafkaOptions default)
    assert(StreamSources.kafkaSourceOptions(Seq("b"), Seq("t"))
      .apply("startingOffsets") == "earliest")
  }

  test("sasl credentials become one jaas line: SCRAM vs PLAIN module, empties skipped") {
    val scram = StreamSources.kafkaSourceOptions(
      Seq("b:9092"), Seq("t"),
      Map("sasl_mechanism" -> "SCRAM-SHA-256",
        "sasl_username" -> "svc", "sasl_password" -> "sekret"))
    assert(scram("kafka.sasl.jaas.config") ==
      """org.apache.kafka.common.security.scram.ScramLoginModule required username="svc" password="sekret";""")
    // raw credential keys must NOT leak through as kafka.* options
    assert(!scram.keys.exists(_.contains("sasl.username")))
    assert(!scram.keys.exists(_.contains("sasl.password")))
    val plain = StreamSources.kafkaSourceOptions(
      Seq("b:9092"), Seq("t"),
      Map("sasl_mechanism" -> "PLAIN",
        "sasl_username" -> "svc", "sasl_password" -> "sekret"))
    assert(plain("kafka.sasl.jaas.config").startsWith(
      "org.apache.kafka.common.security.plain.PlainLoginModule"))
    // placeholder/empty password (the config default) → no jaas at all
    val none = StreamSources.kafkaSourceOptions(
      Seq("b:9092"), Seq("t"), Map("sasl_username" -> "USERNAME", "sasl_password" -> ""))
    assert(!none.contains("kafka.sasl.jaas.config"))
  }

  test("edge rules: jaas escaping, invalid offset reset falls back, variant precedence is deterministic") {
    // quotes/backslashes in a generated secret must not break the JAAS
    // parser or open an option-injection hole; semicolons are inert
    // once quoted
    val esc = StreamSources.kafkaSourceOptions(
      Seq("b:9092"), Seq("t"),
      Map("sasl_username" -> "sv\\c", "sasl_password" -> """pa"ss;word"""))
    assert(esc("kafka.sasl.jaas.config") ==
      """org.apache.kafka.common.security.plain.PlainLoginModule required username="sv\\c" password="pa\"ss;word";""")
    // the consumer value "none" and empties are not valid Spark
    // startingOffsets — fall back to the reference default, don't crash
    for (bad <- Seq("", "none", "lattest")) {
      val o = StreamSources.kafkaSourceOptions(
        Seq("b"), Seq("t"), Map("auto_offset_reset" -> bad))
      assert(o("startingOffsets") == "earliest", s"reset '$bad'")
    }
    // whitespace-padded values are TRIMMED, not silently coerced to a
    // full-topic reprocess: "latest " means latest
    for (padded <- Seq("latest ", " latest", "earliest\t")) {
      val o = StreamSources.kafkaSourceOptions(
        Seq("b"), Seq("t"), Map("auto_offset_reset" -> padded))
      assert(o("startingOffsets") == padded.trim, s"reset '$padded'")
    }
    // dotted + snake variants of one key: snake wins, deterministically
    val dup = StreamSources.kafkaSourceOptions(
      Seq("b"), Seq("t"),
      Map("security.protocol" -> "plaintext", "security_protocol" -> "sasl_ssl"))
    assert(dup("kafka.security.protocol") == "sasl_ssl")
  }

  test("A8 backpressure knob and the IngestorConfig round-trip") {
    val cfg = graft.config.IngestorConfig.KafkaConfig(
      saslUsername = "svc", saslPassword = "pw")
    val opts = StreamSources.kafkaSourceOptions(
      Seq(cfg.bootstrapServers), cfg.topics, cfg.securityOptions,
      maxOffsetsPerTrigger = Some(5000L))
    assert(opts("maxOffsetsPerTrigger") == "5000")
    assert(opts("kafka.security.protocol") == cfg.securityProtocol)
    assert(opts("kafka.group.id") == cfg.groupId)
    assert(opts("startingOffsets") == cfg.autoOffsetReset)
    assert(opts("kafka.sasl.jaas.config").contains("""username="svc""""))
    assert(!opts.keys.exists(_.contains("auto.offset.reset")))
  }
}
