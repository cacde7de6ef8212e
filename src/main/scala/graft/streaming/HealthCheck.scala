package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.config.IngestorConfig

/** Health endpoint (ref: src/scicat_health_check.py:23-141): GET
  * `/health` probes kafka / storage / scicat and answers 200 when all
  * pass, 503 otherwise, with the per-probe JSON body; any other path is
  * 404. Runs on a daemon thread pool so it never blocks shutdown.
  *
  * Probes are injected functions: the streaming engine's "kafka" probe
  * is the liveness of the Structured Streaming query (the consumer
  * lives inside the Spark source, there is no separate client to ping),
  * storage is the reference's data-directory listability check, and
  * scicat is a GET against the catalog's health endpoint.
  */
object HealthCheck {

  final case class Probes(
      kafka: () => Boolean,
      storage: () => Boolean,
      scicat: () => Boolean)

  /** ref: _check_storage (scicat_health_check.py:76-95) — configured,
    * existing, and listable. */
  def storageProbe(dataDirectory: String): () => Boolean = () =>
    try {
      if (dataDirectory == null || dataDirectory.isEmpty) false
      else {
        val p = java.nio.file.Paths.get(dataDirectory)
        java.nio.file.Files.exists(p) && {
          val s = java.nio.file.Files.list(p)
          try { s.iterator(); true } finally s.close()
        }
      }
    } catch { case _: Exception => false }

  /** ref: _check_scicat (scicat_health_check.py:97-106) — 200 from the
    * health endpoint. [[graft.catalog.HttpScicatCatalog.lookupJson]]
    * returns Some only on 2xx, which is exactly that check. */
  def scicatProbe(catalog: graft.catalog.Catalog,
      healthEndpoint: String = "health"): () => Boolean = () =>
    try catalog.lookupJson(healthEndpoint, "").isDefined
    catch { case _: Exception => false }

  /** Start the server; returns it so callers can stop it. */
  def start(cfg: IngestorConfig.HealthCheckConfig, probes: Probes): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(cfg.host, cfg.port), 0)
    server.createContext("/", (ex: HttpExchange) => {
      if (ex.getRequestMethod == "GET" && ex.getRequestURI.getPath == "/health") {
        val status = Map(
          "kafka" -> safe(probes.kafka), "storage" -> safe(probes.storage),
          "scicat" -> safe(probes.scicat))
        val body = status.map { case (k, v) => s""""$k": $v""" }
          .mkString("{", ", ", "}").getBytes(UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(if (status.valuesIterator.forall(identity)) 200 else 503,
          body.length)
        ex.getResponseBody.write(body)
        ex.close()
      } else {
        ex.sendResponseHeaders(404, -1)
        ex.close()
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(2, r => {
      val t = new Thread(r, "graft-health"); t.setDaemon(true); t
    }))
    server.start()
    server
  }

  private def safe(probe: () => Boolean): Boolean =
    try probe() catch { case _: Exception => false }
}
