package graft.ingest

import java.nio.charset.StandardCharsets
import java.time.Instant
import java.time.format.DateTimeFormatter

import scala.util.{Failure, Success}

/** API-first ingest of the DataUSA population JSON with cached
  * fallback (11_ingest_population.ipynb cell 1):
  *
  *  - GET the API; on success overwrite `population.json` (latest
  *    snapshot semantics — deterministic, idempotent) with
  *    mode=api_success and rows = len(payload.data);
  *  - on request failure fall back to the cached file if present
  *    (mode=fallback_cached, rows parsed from cache when possible);
  *    else fail hard;
  *  - run metadata written in a finally block either way.
  */
final case class PopulationIngestConfig(
    url: String,
    params: Map[String, String] = Map(
      "cube" -> "acs_yg_total_population_1",
      "drilldowns" -> "Year,Nation",
      "locale" -> "en",
      "measures" -> "Population"),
    targetPath: String,
    metaPath: String)

object PopulationIngest {

  def queryUrl(config: PopulationIngestConfig): String = {
    val qs = config.params.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    if (qs.isEmpty) config.url else s"${config.url}?$qs"
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)

  private def countRows(jsonText: String): Option[Int] =
    scala.util.Try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(jsonText)
      val data = root.get("data")
      if (data != null && data.isArray) data.size() else 0
    }.toOption

  def run(
      fetcher: HttpFetcher,
      store: FileStore,
      config: PopulationIngestConfig,
      now: () => Instant = () => Instant.now()): PopulationRunMeta = {
    val runUtc = DateTimeFormatter.ISO_INSTANT.format(
      now().truncatedTo(java.time.temporal.ChronoUnit.SECONDS))

    var mode: Option[String] = None
    var rows: Option[Int] = None
    var error: Option[String] = None

    def meta(): PopulationRunMeta =
      PopulationRunMeta(runUtc, config.url, config.params, mode, rows, error)

    try {
      fetcher.getText(queryUrl(config)) match {
        case Success(payload) =>
          store.write(config.targetPath, payload.getBytes(StandardCharsets.UTF_8), overwrite = true)
          mode = Some("api_success")
          rows = countRows(payload)
        case Failure(e) =>
          error = Some(e.toString)
          if (store.exists(config.targetPath)) {
            mode = Some("fallback_cached")
            rows = countRows(new String(store.read(config.targetPath), StandardCharsets.UTF_8))
          } else {
            throw new RuntimeException(
              s"Population API failed and no cached file at ${config.targetPath}", e)
          }
      }
    } finally {
      store.write(config.metaPath, Json.write(meta()).getBytes(StandardCharsets.UTF_8), overwrite = true)
    }

    meta()
  }
}
