package graft.serve

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** F14: exponential backoff + jitter retry with retryable-error
  * classification (`/root/reference/src/storage/retry.rs:17-123`): retry
  * timeouts/connection errors and 429/503/5xx, fail fast on 4xx. */
object Retry {
  final case class Config(maxAttempts: Int = 5, baseDelayMs: Long = 50, maxDelayMs: Long = 2000)

  def isRetryableStatus(status: Int): Boolean =
    status == 429 || status == 503 || (status >= 500 && status < 600)

  /** Runs `op`; `retryable` classifies a failure result; IOExceptions are
    * always retryable (network). Jitter is ±25% of the backoff step. */
  def withRetry[T](cfg: Config = Config(), sleep: Long => Unit = Thread.sleep)(
      op: () => T, retryable: T => Boolean): T = {
    var attempt = 0
    var last: Option[T] = None
    while (attempt < cfg.maxAttempts) {
      val res =
        try Right(op())
        catch { case e: java.io.IOException => Left(e) }
      res match {
        case Right(v) if !retryable(v) => return v
        case Right(v)                  => last = Some(v)
        case Left(e) if attempt == cfg.maxAttempts - 1 => throw e
        case Left(_)                   => ()
      }
      attempt += 1
      if (attempt < cfg.maxAttempts) {
        val backoff = math.min(cfg.maxDelayMs, cfg.baseDelayMs * (1L << math.min(attempt, 20)))
        val jitter  = (backoff * (scala.util.Random.nextDouble() - 0.5) / 2).toLong
        sleep(math.max(1, backoff + jitter))
      }
    }
    last.getOrElse(throw new IllegalStateException("retry exhausted with no result"))
  }
}

/** F13: auto-registration of committed tables against an EXTERNAL Iceberg
  * REST catalog (`/root/reference/src/flusher/mod.rs:1184-1230`,
  * `src/storage/catalog.rs:101-358`): create the table (409-tolerant — it
  * may already exist), then post the new metadata location. Failures are
  * logged-and-swallowed like the reference: registration is best-effort
  * and must never fail a commit. */
final class CatalogClient(baseUrl: String, retry: Retry.Config = Retry.Config()) {
  private val client = HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(5)).build()

  /** Returns the final HTTP status, or -1 if all attempts failed. */
  def register(namespace: String, table: String, metadataLocation: String, metadataJson: String): Int =
    try {
      val create =
        s"""{"name":"$table","metadata-location":"$metadataLocation","metadata":$metadataJson}"""
      val createStatus = post(s"$baseUrl/v1/namespaces/$namespace/tables", create)
      if (createStatus == 409) // exists → update current metadata pointer
        post(s"$baseUrl/v1/namespaces/$namespace/tables/$table",
             s"""{"metadata-location":"$metadataLocation","metadata":$metadataJson}""")
      else createStatus
    } catch { case _: Exception => -1 }

  private def post(url: String, body: String): Int =
    Retry.withRetry(retry)(
      () => {
        val req = HttpRequest.newBuilder(URI.create(url))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body))
          .build()
        client.send(req, HttpResponse.BodyHandlers.ofString()).statusCode()
      },
      (status: Int) => Retry.isRetryableStatus(status)
    )
}
