package graft.config

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.log4j.{AppenderSkeleton, ConsoleAppender, FileAppender, Level, Logger, PatternLayout}
import org.apache.log4j.spi.LoggingEvent

/** Logger construction from [[IngestorConfig.LoggingConfig]]
  * (ref: build_logger, src/scicat_logging.py:28-86): the reference's
  * `prefix - timestamp - name - level - message` format, configured
  * level, optional file handler with optional UTC timestamp in the file
  * name, plus the two network handler families:
  *
  *  - syslog (ref :60-62, `SysLogHandler(address='/dev/log')`) — the
  *    same RFC 3164 `<PRI>message` datagrams over UDP; `/dev/log`
  *    itself is a unix DATAGRAM socket the JVM cannot open (Java's
  *    unix-domain channels are stream-only), so the address is
  *    host:port with the standard syslog port as default;
  *  - graylog (ref :64-71, `graypy.GELFUDPHandler(host, port,
  *    facility=...)`) — zlib-compressed GELF 1.1 JSON over UDP with
  *    the syslog-mapped level and the configured facility.
  *
  * Both appenders deliberately swallow send failures: a down log
  * collector must never fail an ingestion batch (same contract as
  * python logging's handleError).
  */
object IngestLogging {

  /** ref format: " - ".join((prefix, asctime, name, levelname, message))
    * (scicat_logging.py:35-45). */
  def pattern(prefix: String): String =
    s"$prefix - %d{ISO8601} - %c - %p - %m%n"

  def logFileName(cfg: IngestorConfig.LoggingConfig,
      clock: () => java.time.Instant = () => java.time.Instant.now()): String = {
    val parts = Seq(cfg.fileLogBaseName) ++
      (if (cfg.fileLogTimestamp)
        Seq(java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSSSSS")
          .withZone(java.time.ZoneOffset.UTC).format(clock()))
      else Seq.empty) ++ Seq(".log")
    parts.mkString("_")
  }

  /** RFC 3164 facility codes (the names python's SysLogHandler maps). */
  val Facilities: Map[String, Int] = Map(
    "kern" -> 0, "user" -> 1, "mail" -> 2, "daemon" -> 3, "auth" -> 4,
    "syslog" -> 5, "lpr" -> 6, "news" -> 7, "uucp" -> 8, "cron" -> 9,
    "authpriv" -> 10, "ftp" -> 11, "local0" -> 16, "local1" -> 17,
    "local2" -> 18, "local3" -> 19, "local4" -> 20, "local5" -> 21,
    "local6" -> 22, "local7" -> 23)

  /** log4j level → syslog severity (python logging's priority_map:
    * DEBUG→debug(7), INFO→info(6), WARNING→warning(4), ERROR→error(3),
    * CRITICAL→critical(2)). */
  def severity(level: Level): Int = level.toInt match {
    case x if x >= org.apache.log4j.Priority.FATAL_INT => 2
    case x if x >= org.apache.log4j.Priority.ERROR_INT => 3
    case x if x >= org.apache.log4j.Priority.WARN_INT => 4
    case x if x >= org.apache.log4j.Priority.INFO_INT => 6
    case _ => 7
  }

  private[config] def parseAddress(addr: String, defaultPort: Int): (String, Int) =
    addr.split(":", 2) match {
      case Array(h, p) => (h, scala.util.Try(p.toInt).getOrElse(defaultPort))
      case Array(h) => (h, defaultPort)
      case _ => ("localhost", defaultPort)
    }

  private abstract class UdpAppender(host: String, port: Int) extends AppenderSkeleton {
    private lazy val socket = new DatagramSocket()
    private lazy val target = InetAddress.getByName(host)
    protected def datagram(event: LoggingEvent): Array[Byte]
    override def append(event: LoggingEvent): Unit =
      try {
        val bytes = datagram(event)
        socket.send(new DatagramPacket(bytes, bytes.length, target, port))
      } catch { case _: Exception => () } // a down collector never fails the app
    override def close(): Unit = try socket.close() catch { case _: Exception => () }
    override def requiresLayout(): Boolean = true
  }

  /** `<PRI>` + layout-formatted record, PRI = facility·8 + severity
    * (RFC 3164 — byte-identical to what python's SysLogHandler emits
    * for the same facility/level). */
  private final class SyslogUdpAppender(host: String, port: Int, facility: Int)
      extends UdpAppender(host, port) {
    protected def datagram(event: LoggingEvent): Array[Byte] = {
      val pri = facility * 8 + severity(event.getLevel)
      (s"<$pri>" + getLayout.format(event).stripLineEnd).getBytes(UTF_8)
    }
  }

  /** GELF 1.1 over UDP, zlib-compressed (graypy's GELFUDPHandler wire
    * shape): version/host/short_message/timestamp/level/_facility. */
  private final class GelfUdpAppender(host: String, port: Int, facility: String)
      extends UdpAppender(host, port) {
    private val source = scala.util.Try(
      InetAddress.getLocalHost.getHostName).getOrElse("unknown")
    protected def datagram(event: LoggingEvent): Array[Byte] = {
      def jstr(s: String) = graft.sources.NexusExtractor.jsonStr(s)
      val json =
        s"""{"version":"1.1","host":${jstr(source)},""" +
        s""""short_message":${jstr(String.valueOf(event.getMessage))},""" +
        s""""timestamp":${event.getTimeStamp / 1000}.${"%03d".format(event.getTimeStamp % 1000)},""" +
        s""""level":${severity(event.getLevel)},""" +
        s""""_facility":${jstr(facility)},"_logger":${jstr(event.getLoggerName)}}"""
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(json.getBytes(UTF_8))
      deflater.finish()
      val buf = new Array[Byte](json.length * 2 + 64)
      val n = deflater.deflate(buf)
      deflater.end()
      java.util.Arrays.copyOf(buf, n)
    }
    override def requiresLayout(): Boolean = false
  }

  /** Decompress + minimal parse of one GELF datagram — the test/
    * inspection twin of [[GelfUdpAppender]]. */
  def inflateGelf(bytes: Array[Byte]): String = {
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(bytes)
    val buf = new Array[Byte](65536)
    val n = inflater.inflate(buf)
    inflater.end()
    new String(buf, 0, n, UTF_8)
  }

  /** Build (or reconfigure) the named logger. Verbose forces DEBUG, the
    * reference's rich console handler analogue. */
  def buildLogger(cfg: IngestorConfig.LoggingConfig,
      name: String = "graft.ingestor"): Logger = {
    val logger = Logger.getLogger(name)
    logger.removeAllAppenders()
    val layout = new PatternLayout(pattern(cfg.logMessagePrefix))
    logger.addAppender(new ConsoleAppender(layout))
    if (cfg.fileLog)
      logger.addAppender(new FileAppender(layout, logFileName(cfg), false))
    if (cfg.systemLog) {
      val (h, p) = parseAddress(cfg.systemLogAddress, 514)
      val app = new SyslogUdpAppender(h, p,
        Facilities.getOrElse(cfg.systemLogFacility, 1))
      app.setLayout(layout)
      logger.addAppender(app)
    }
    if (cfg.graylog && cfg.graylogHost.nonEmpty)
      logger.addAppender(
        new GelfUdpAppender(cfg.graylogHost, cfg.graylogPort, cfg.graylogFacility))
    logger.setLevel(
      if (cfg.verbose) Level.DEBUG else Level.toLevel(cfg.loggingLevel, Level.INFO))
    logger
  }
}
