package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.util.{Failure, Success, Try}

import org.scalatest.funsuite.AnyFunSuite

/** Canned-response fetcher: url → body (or failure). Zero-egress tests. */
final class FakeFetcher(responses: Map[String, Try[String]]) extends HttpFetcher {
  var calls: List[String] = Nil
  override def get(url: String): Try[Array[Byte]] = {
    calls ::= url
    responses.getOrElse(url, Failure(new RuntimeException(s"404 $url")))
      .map(_.getBytes(StandardCharsets.UTF_8))
  }
}

class IngestSpec extends AnyFunSuite {

  private val source = "https://example.test/pub/time.series/pr/"
  private val listing =
    """<html><a href="pr.data.0.Current">pr.data.0.Current</a>
      |<A HREF='pr.series'>pr.series</A>
      |<a href=pr.txt>pr.txt</a>
      |<a href="unrelated.csv">unrelated.csv</a></html>""".stripMargin

  private def tmpDir(): String =
    Files.createTempDirectory("graft-ingest").toString

  private def fetcherWith(files: Map[String, String]): FakeFetcher =
    new FakeFetcher(Map(source -> Success(listing)) ++
      files.map { case (name, body) => (source + name) -> Success(body) })

  private val defaultFiles = Map(
    "pr.data.0.Current" -> "series_id year period value\nPRS1 2020 Q01 1.5\n",
    "pr.series" -> "series metadata\n",
    "pr.txt" -> "readme\n")

  test("discovery matches all four href patterns, pr.* only, sorted") {
    val files = BlsMirrorSync.discoverRemoteFiles(listing)
    assert(files == Seq("pr.data.0.Current", "pr.series", "pr.txt"))
  }

  test("first sync uploads everything; re-run skips byte-identical files") {
    val dir = tmpDir()
    val cfg = BlsSyncConfig(source, dir)
    val m1 = BlsMirrorSync.run(fetcherWith(defaultFiles), LocalFileStore, cfg)
    assert(m1.status.contains("success"))
    assert(m1.uploaded == 3 && m1.updated == 0 && m1.skipped == 0 && m1.deleted == 0)
    assert(m1.remote_file_count.contains(3))

    val m2 = BlsMirrorSync.run(fetcherWith(defaultFiles), LocalFileStore, cfg)
    assert(m2.uploaded == 0 && m2.updated == 0 && m2.skipped == 3)
    assert(m2.status.contains("success"))
  }

  test("changed upstream bytes are detected by SHA-256 and re-uploaded") {
    val dir = tmpDir()
    val cfg = BlsSyncConfig(source, dir)
    BlsMirrorSync.run(fetcherWith(defaultFiles), LocalFileStore, cfg)
    val changed = defaultFiles.updated("pr.txt", "readme v2\n")
    val m = BlsMirrorSync.run(fetcherWith(changed), LocalFileStore, cfg)
    assert(m.updated == 1 && m.skipped == 2 && m.uploaded == 0)
    assert(new String(LocalFileStore.read(s"$dir/pr.txt"), "UTF-8") == "readme v2\n")
  }

  test("mirror delete removes files gone upstream but never protected ones") {
    val dir = tmpDir()
    val cfg = BlsSyncConfig(source, dir, protectedFiles = Set("population.json"))
    LocalFileStore.write(s"$dir/pr.obsolete", "old".getBytes, overwrite = true)
    LocalFileStore.write(s"$dir/population.json", "{}".getBytes, overwrite = true)
    val m = BlsMirrorSync.run(fetcherWith(defaultFiles), LocalFileStore, cfg)
    assert(m.deleted == 1)
    assert(!LocalFileStore.exists(s"$dir/pr.obsolete"))
    assert(LocalFileStore.exists(s"$dir/population.json"))
  }

  test("delete disabled keeps stale files") {
    val dir = tmpDir()
    val cfg = BlsSyncConfig(source, dir, enableDelete = false)
    LocalFileStore.write(s"$dir/pr.obsolete", "old".getBytes, overwrite = true)
    val m = BlsMirrorSync.run(fetcherWith(defaultFiles), LocalFileStore, cfg)
    assert(m.deleted == 0)
    assert(LocalFileStore.exists(s"$dir/pr.obsolete"))
  }

  test("per-file failure -> partial_success with error detail; rest still lands") {
    val dir = tmpDir()
    val cfg = BlsSyncConfig(source, dir)
    val f = fetcherWith(defaultFiles - "pr.series")
    val m = BlsMirrorSync.run(f, LocalFileStore, cfg)
    assert(m.status.contains("partial_success"))
    assert(m.uploaded == 2 && m.errors.size == 1)
    assert(m.errors.head.file.contains("pr.series"))
  }

  test("a transient fetch failure must NOT delete the local copy of an upstream file") {
    val dir = tmpDir()
    val cfg = BlsSyncConfig(source, dir) // delete enabled
    BlsMirrorSync.run(fetcherWith(defaultFiles), LocalFileStore, cfg)
    assert(LocalFileStore.exists(s"$dir/pr.series"))
    // next run: pr.series is still listed upstream but its GET fails
    val m = BlsMirrorSync.run(fetcherWith(defaultFiles - "pr.series"), LocalFileStore, cfg)
    assert(m.errors.size == 1 && m.deleted == 0)
    assert(LocalFileStore.exists(s"$dir/pr.series"),
      "mirror-delete destroyed a file that is still upstream")
  }

  test("source URL without a trailing slash still fetches correct file URLs") {
    val dir = tmpDir()
    val noSlash = source.dropRight(1)
    val f = new FakeFetcher(Map(noSlash -> Success(listing)) ++
      defaultFiles.map { case (n, b) => (source + n) -> Success(b) })
    val m = BlsMirrorSync.run(f, LocalFileStore, BlsSyncConfig(noSlash, dir))
    assert(m.uploaded == 3 && m.errors.isEmpty, m.errors.toString)
  }

  test("listing failure -> failed status, meta still written (finally)") {
    val dir = tmpDir()
    val cfg = BlsSyncConfig(source, dir)
    val m = BlsMirrorSync.run(new FakeFetcher(Map.empty), LocalFileStore, cfg)
    assert(m.status.contains("failed"))
    assert(LocalFileStore.exists(s"$dir/_meta/latest.json"))
    assert(LocalFileStore.listFiles(s"$dir/_meta/runs").size == 1)
  }

  test("run meta: per-run record is write-once, latest.json overwritten") {
    val dir = tmpDir()
    val cfg = BlsSyncConfig(source, dir)
    BlsMirrorSync.run(fetcherWith(defaultFiles), LocalFileStore, cfg)
    BlsMirrorSync.run(fetcherWith(defaultFiles), LocalFileStore, cfg)
    assert(LocalFileStore.listFiles(s"$dir/_meta/runs").size == 2)
    val latest = Json.readMap(new String(LocalFileStore.read(s"$dir/_meta/latest.json"), "UTF-8"))
    assert(latest("skipped") == 3)
    assert(latest("uploaded") == 0)
  }

  private val apiUrl = "https://api.test/data.jsonrecords"
  private val popPayload =
    """{"columns": ["Nation","Year"], "data": [{"Nation":"US","Year":2023},{"Nation":"US","Year":2022}]}"""

  private def popCfg(dir: String) = PopulationIngestConfig(
    url = apiUrl,
    targetPath = s"$dir/population.json",
    metaPath = s"$dir/_meta/population_ingest_run.json")

  test("population: API success overwrites snapshot, mode=api_success, rows counted") {
    val dir = tmpDir()
    val cfg = popCfg(dir)
    val f = new FakeFetcher(Map(PopulationIngest.queryUrl(cfg) -> Success(popPayload)))
    val m = PopulationIngest.run(f, LocalFileStore, cfg)
    assert(m.mode.contains("api_success"))
    assert(m.rows.contains(2))
    assert(LocalFileStore.exists(cfg.targetPath))
    assert(LocalFileStore.exists(cfg.metaPath))
  }

  test("population: API failure falls back to cached file") {
    val dir = tmpDir()
    val cfg = popCfg(dir)
    LocalFileStore.write(cfg.targetPath, popPayload.getBytes, overwrite = true)
    val m = PopulationIngest.run(new FakeFetcher(Map.empty), LocalFileStore, cfg)
    assert(m.mode.contains("fallback_cached"))
    assert(m.rows.contains(2))
    assert(m.error.isDefined)
  }

  test("population: API failure with no cache fails hard, meta still written") {
    val dir = tmpDir()
    val cfg = popCfg(dir)
    intercept[RuntimeException] {
      PopulationIngest.run(new FakeFetcher(Map.empty), LocalFileStore, cfg)
    }
    assert(LocalFileStore.exists(cfg.metaPath))
  }

  test("retrying fetcher: retries on 5xx with exponential backoff then succeeds") {
    var sleeps: List[Long] = Nil
    var attempts = 0
    val f = new RetryingFetcher(
      totalRetries = 5, backoffFactor = 1.5, sleeper = ms => sleeps ::= ms) {
      override protected def fetchOnce(url: String): Try[Array[Byte]] = {
        attempts += 1
        if (attempts <= 2) Failure(new HttpStatusException(503, url))
        else Success("ok".getBytes)
      }
    }
    assert(f.getText("http://x").get == "ok")
    assert(attempts == 3)
    // urllib3: backoff_factor * 2^(attempt-1) seconds
    assert(sleeps.reverse == List(1500L, 3000L))
  }

  test("retrying fetcher: 404 is terminal (no retry); retries exhaust on persistent 503") {
    var attempts404 = 0
    val f404 = new RetryingFetcher(totalRetries = 5, backoffFactor = 0.0, sleeper = _ => ()) {
      override protected def fetchOnce(url: String): Try[Array[Byte]] = {
        attempts404 += 1
        Failure(new HttpStatusException(404, url))
      }
    }
    assert(f404.get("http://x").isFailure)
    assert(attempts404 == 1)

    var attempts503 = 0
    val f503 = new RetryingFetcher(totalRetries = 2, backoffFactor = 0.0, sleeper = _ => ()) {
      override protected def fetchOnce(url: String): Try[Array[Byte]] = {
        attempts503 += 1
        Failure(new HttpStatusException(503, url))
      }
    }
    assert(f503.get("http://x").isFailure)
    assert(attempts503 == 3) // initial + 2 retries
  }
}
