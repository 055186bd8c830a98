package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse => JHttpResponse}
import java.time.Duration

import scala.util.{Failure, Success, Try}

/** Driver-side HTTP with retry/backoff — the ingestion layer's process
  * boundary (reference: requests.Session + urllib3 Retry,
  * 10_ingest_bls.ipynb:104-117, 11_ingest_population.ipynb:141-151).
  * Behind a trait so tests (and this zero-egress environment) inject
  * canned responses.
  */
trait HttpFetcher {

  /** GET a URL, returning the body bytes or the terminal failure after
    * retries are exhausted.
    */
  def get(url: String): Try[Array[Byte]]

  /** GET decoded as UTF-8 text. */
  def getText(url: String): Try[String] =
    get(url).map(b => new String(b, java.nio.charset.StandardCharsets.UTF_8))
}

final class HttpStatusException(val status: Int, url: String)
  extends RuntimeException(s"HTTP $status for $url")

/** Retrying fetcher mirroring urllib3.Retry semantics: up to
  * `totalRetries` retries on 429/5xx with exponential backoff
  * `backoffFactor * 2^(attempt-1)` seconds, (connect, read) timeouts,
  * and a pipeline-identifying User-Agent.
  *
  * BLS profile: totalRetries=5, backoffFactor=1.5
  * (10_ingest_bls.ipynb:105-107). API profile: totalRetries=2,
  * backoffFactor=2, timeouts (30 s, 60 s)
  * (11_ingest_population.ipynb:141-151, 172).
  */
class RetryingFetcher(
    totalRetries: Int,
    backoffFactor: Double,
    connectTimeout: Duration = Duration.ofSeconds(30),
    readTimeout: Duration = Duration.ofSeconds(60),
    userAgent: String = "graft-engine",
    retryStatuses: Set[Int] = Set(429, 500, 502, 503, 504),
    sleeper: Long => Unit = Thread.sleep)
  extends HttpFetcher {

  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(connectTimeout)
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  /** One transport attempt — protected so tests can stub the network. */
  protected def fetchOnce(url: String): Try[Array[Byte]] = Try {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(readTimeout)
      .header("User-Agent", userAgent)
      .header("Accept", "*/*")
      .GET()
      .build()
    val resp = client.send(req, JHttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() >= 200 && resp.statusCode() < 300) resp.body()
    else throw new HttpStatusException(resp.statusCode(), url)
  }

  override def get(url: String): Try[Array[Byte]] = {
    var attempt = 0
    var last: Try[Array[Byte]] = fetchOnce(url)
    while (attempt < totalRetries && shouldRetry(last)) {
      attempt += 1
      // urllib3: sleep backoff_factor * 2^(attempt-1)
      sleeper((backoffFactor * math.pow(2, attempt - 1) * 1000).toLong)
      last = fetchOnce(url)
    }
    last
  }

  private def shouldRetry(t: Try[Array[Byte]]): Boolean = t match {
    case Success(_) => false
    case Failure(e: HttpStatusException) => retryStatuses.contains(e.status)
    case Failure(_) => true // connect/read failures retry like urllib3
  }
}
