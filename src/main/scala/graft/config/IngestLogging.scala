package graft.config

import org.apache.log4j.{ConsoleAppender, FileAppender, Level, Logger, PatternLayout}

/** Logger construction from [[IngestorConfig.LoggingConfig]]
  * (ref: build_logger, src/scicat_logging.py:28-86): the reference's
  * `prefix - timestamp - name - level - message` format, configured
  * level, optional file handler with optional UTC timestamp in the file
  * name. Syslog/graylog handlers have no engine analogue (their config
  * keys are tolerated, not wired).
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
    logger.setLevel(
      if (cfg.verbose) Level.DEBUG else Level.toLevel(cfg.loggingLevel, Level.INFO))
    logger
  }
}
