package graft.arxiv

import java.io.IOException
import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** One-attempt HTTP GET boundary, factored out of [[HttpDoiTransport]] so
  * the retry/backoff policy is unit-testable with a scripted fake — no
  * live HTTP in tests, ever. Implementations return (status, body) and
  * throw [[IOException]] on a transport-level failure (connect refused,
  * timeout, reset). Serializable: transports ship to executors inside
  * `mapPartitions`. */
trait HttpGet extends Serializable {
  def get(url: String): (Int, String)
}

/** `java.net.http.HttpClient` implementation of [[HttpGet]]. The client
  * is `@transient lazy`: HttpClient is not serializable, so each executor
  * (and each deserialized task closure) builds its own on first use —
  * one client per JVM in practice, reused across the partition's
  * requests (connection pooling comes for free). */
class HttpClientGet(connectTimeoutMs: Long = 10000L,
    requestTimeoutMs: Long = 30000L) extends HttpGet {
  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(connectTimeoutMs))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  def get(url: String): (Int, String) = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(requestTimeoutMs))
      .header("User-Agent", "graft-enricher/1.0 (research data pipeline)")
      .GET()
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }
}

/** Production [[DoiTransport]]: the Crossref `GET /works/<doi>` call the
  * reference makes per DOI (`augmentations.py:10-57`), with the
  * operational hardening the reference's bare `requests.get` lacks:
  *
  *  - **Timeouts** on connect and per-request ([[HttpClientGet]]);
  *  - **Retry with exponential backoff** on 429/5xx and transport
  *    errors: attempt n sleeps `backoffBaseMs * 2^(n-1)` before
  *    retrying, up to `maxAttempts` total attempts, then THROWS — a
  *    persistent outage aborts the run so [[CheckpointedEnricher]]'s
  *    checkpoint-resume takes over (at most one batch is refetched);
  *  - **Graceful misses**: 404 and other 4xx return `None` with no
  *    retry — the reference logs a miss and moves on
  *    (`augmentations.py:46-50`); retrying a permanent miss would just
  *    burn the rate budget;
  *  - **Polite-pool contract**: the `mailto` query parameter identifies
  *    the caller to Crossref's polite pool (their published etiquette);
  *    request RATE is owned by [[CheckpointedEnricher]]'s
  *    `minIntervalMs` × `fetchParallelism` bound, not here — a
  *    transport-level sleep would double-count the interval.
  *
  * Payload parsing (`message.type`, `is-referenced-by-count`,
  * `ISSN[0]`) stays in [[CheckpointedEnricher]]'s `from_json` column —
  * the transport returns the raw body, keeping the HTTP boundary
  * exactly as wide as the reference's.
  *
  * `sleeper` is injectable for tests (defaults to `Thread.sleep`).
  */
class HttpDoiTransport(
    http: HttpGet = new HttpClientGet(),
    baseUrl: String = "https://api.crossref.org/works/",
    mailto: Option[String] = None,
    maxAttempts: Int = 4,
    backoffBaseMs: Long = 500L,
    sleeper: Long => Unit = Thread.sleep) extends DoiTransport {
  require(maxAttempts >= 1, "maxAttempts must be at least 1")

  /** URL for one DOI: PATH-encoded (URLEncoder form-encodes space to
    * '+', which servers do not decode inside path segments — a DOI with
    * a space would silently 404; '%20' is correct there), polite-pool
    * mailto appended as a query param where '+' is fine. */
  def url(doi: String): String = {
    val enc = URLEncoder.encode(doi, StandardCharsets.UTF_8).replace("+", "%20")
    baseUrl + enc + mailto.map(m =>
      "?mailto=" + URLEncoder.encode(m, StandardCharsets.UTF_8)).getOrElse("")
  }

  def fetch(doi: String): Option[String] = {
    val target = url(doi)
    var attempt = 1
    while (true) {
      val outcome: Either[Throwable, (Int, String)] =
        try Right(http.get(target))
        catch { case e: IOException => Left(e) }
      outcome match {
        case Right((200, body)) => return Some(body)
        // retryable: throttling (429), server errors (5xx), and the
        // transient request-side statuses 408 Request Timeout / 425 Too
        // Early — treating those as permanent would record a transient
        // condition as an enrichment miss
        case Right((status, _))
            if status == 429 || status >= 500 || status == 408 || status == 425 =>
          if (attempt >= maxAttempts)
            throw new IOException(
              s"Crossref returned $status for $target after $maxAttempts attempts")
        case Right(_) => return None // 404 and other 4xx: graceful miss, no retry
        case Left(e) =>
          if (attempt >= maxAttempts)
            throw new IOException(
              s"transport failure for $target after $maxAttempts attempts", e)
      }
      sleeper(backoffBaseMs << (attempt - 1))
      attempt += 1
    }
    None // unreachable
  }
}
