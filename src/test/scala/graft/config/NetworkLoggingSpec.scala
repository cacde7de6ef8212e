package graft.config

import java.net.{DatagramPacket, DatagramSocket}

import org.scalatest.funsuite.AnyFunSuite

/** The two network log handlers (ref: scicat_logging.py:60-71), proven
  * against REAL sockets: a local UDP listener receives the datagrams
  * and the tests assert the wire bytes — RFC 3164 `<PRI>` framing for
  * syslog, zlib-compressed GELF 1.1 JSON for graylog.
  */
class NetworkLoggingSpec extends AnyFunSuite {

  private def withUdpListener[A](f: (Int, () => Array[Byte]) => A): A = {
    val socket = new DatagramSocket()
    socket.setSoTimeout(5000)
    try {
      val recv = () => {
        val buf = new Array[Byte](65536)
        val pkt = new DatagramPacket(buf, buf.length)
        socket.receive(pkt)
        java.util.Arrays.copyOf(pkt.getData, pkt.getLength)
      }
      f(socket.getLocalPort, recv)
    } finally socket.close()
  }

  test("syslog: RFC 3164 <PRI> framing, facility*8+severity, formatted body") {
    withUdpListener { (port, recv) =>
      val cfg = IngestorConfig.LoggingConfig(
        systemLog = true, systemLogFacility = "daemon",
        systemLogAddress = s"localhost:$port")
      val logger = IngestLogging.buildLogger(cfg, "syslog-test")
      logger.warn("disk almost full")
      val msg = new String(recv(), "UTF-8")
      // daemon(3)*8 + warning(4) = 28
      assert(msg.startsWith("<28>"), s"PRI framing wrong: $msg")
      assert(msg.contains("disk almost full") && msg.contains("SFI - "))
      logger.error("it broke") // error severity → 3*8+3 = 27
      assert(new String(recv(), "UTF-8").startsWith("<27>"))
    }
  }

  test("syslog severity map matches python's priority_map") {
    import org.apache.log4j.Level._
    assert(IngestLogging.severity(DEBUG) == 7)
    assert(IngestLogging.severity(INFO) == 6)
    assert(IngestLogging.severity(WARN) == 4)
    assert(IngestLogging.severity(ERROR) == 3)
    assert(IngestLogging.severity(FATAL) == 2)
  }

  test("graylog: zlib-compressed GELF 1.1 with level, facility, message") {
    withUdpListener { (port, recv) =>
      val cfg = IngestorConfig.LoggingConfig(
        graylog = true, graylogHost = "localhost", graylogPort = port,
        graylogFacility = "graft.test")
      val logger = IngestLogging.buildLogger(cfg, "gelf-test")
      logger.info("batch 7 committed")
      val json = IngestLogging.inflateGelf(recv())
      assert(json.contains("\"version\":\"1.1\""))
      assert(json.contains("\"short_message\":\"batch 7 committed\""))
      assert(json.contains("\"level\":6"))
      assert(json.contains("\"_facility\":\"graft.test\""))
      assert(json.contains("\"_logger\":\"gelf-test\""))
      assert("\"timestamp\":\\d+\\.\\d{3}".r.findFirstIn(json).nonEmpty, json)
    }
  }

  test("network handlers never fail the app when the collector is down") {
    // unroutable port: sends are fire-and-forget UDP; nothing throws
    val cfg = IngestorConfig.LoggingConfig(
      systemLog = true, systemLogAddress = "localhost:1",
      graylog = true, graylogHost = "localhost", graylogPort = 1)
    val logger = IngestLogging.buildLogger(cfg, "down-test")
    logger.warn("nobody is listening")
  }

  test("config: syslog/graylog keys are typed, strict mode still passes") {
    val cfg = IngestorConfig.load(
      """logging:
        |  system_log: true
        |  system_log_facility: "local3"
        |  graylog: true
        |  graylog_host: "gl.example"
        |  graylog_port: 12202
        |  graylog_facility: "f"
        |""".stripMargin)
    assert(cfg.logging.systemLog && cfg.logging.systemLogFacility == "local3")
    assert(cfg.logging.graylog && cfg.logging.graylogHost == "gl.example")
    assert(cfg.logging.graylogPort == 12202 && cfg.logging.graylogFacility == "f")
  }
}
