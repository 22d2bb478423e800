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
    requestTimeout: Duration = Duration.ofSeconds(30))

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
  *  - A non-2xx response THROWS instead of logging-and-returning-None:
  *    [[Extract.run]] advances the watermark only after a durable write,
  *    so the throw preserves at-least-once delivery where the
  *    reference's swallow-and-save loses the window (`extract.py:72-73`).
  *
  * `fetch` matches `Extract.run`'s `(Option[Long], Long) => Iterator[
  * String]` seam; tests drive it against an in-process stub server
  * (ExtractSpec) — no network in CI.
  */
class LichessClient(cfg: LichessConfig,
    client: HttpClient = LichessClient.defaultClient) {

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

  def fetch(since: Option[Long], until: Long): Iterator[String] = {
    val req = HttpRequest.newBuilder(requestUri(since, until))
      .header("Accept", "application/x-ndjson")
      .timeout(cfg.requestTimeout)
      .GET()
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString(UTF_8))
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      throw new java.io.IOException(
        s"games-export API returned HTTP ${resp.statusCode()} for ${req.uri()}")
    resp.body().linesIterator.map(_.trim).filter(_.nonEmpty)
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
