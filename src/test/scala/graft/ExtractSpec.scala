package graft

import graft.pipeline.{Extract, LichessClient, LichessConfig}
import org.scalatest.funsuite.AnyFunSuite

/** R1–R3 semantics: monotone [since, until) windows, watermark committed
  * only after the durable write (the reference's at-most-once ordering,
  * /root/reference/etl/extract.py:72-73, deliberately inverted).
  */
class ExtractSpec extends AnyFunSuite {

  private def tempDir = java.nio.file.Files.createTempDirectory("extract")

  test("watermark advances across runs and windows are contiguous") {
    val state = tempDir
    val ex = new Extract(state)
    var windows = Vector.empty[(Option[Long], Long)]
    def fetch(since: Option[Long], until: Long): Iterator[String] = {
      windows :+= (since, until)
      Iterator.single(s"""{"id":"g$until"}""")
    }
    ex.run(fetch, state.resolve("raw"), until = 100L)
    ex.run(fetch, state.resolve("raw"), until = 200L)
    assert(windows === Vector((None, 100L), (Some(100L), 200L)))
  }

  test("fetch failure leaves the watermark untouched (at-least-once)") {
    val state = tempDir
    val ex = new Extract(state)
    ex.run((_, _) => Iterator.single("""{"id":"a"}"""), state.resolve("raw"), 100L)
    intercept[RuntimeException] {
      ex.run((_, _) => throw new RuntimeException("boom"), state.resolve("raw"), 200L)
    }
    assert(ex.loadWatermark() === Some(100L)) // not advanced past failure
  }

  /** Loopback stub of the games-export endpoint: records the request,
    * serves canned NDJSON. No external network anywhere.
    */
  private def withStubServer(status: Int, body: String)(
      f: (String, () => com.sun.net.httpserver.HttpExchange) => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var last: com.sun.net.httpserver.HttpExchange = null
    server.createContext("/", { exchange =>
      last = exchange
      val bytes = body.getBytes("UTF-8")
      exchange.sendResponseHeaders(status, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/api/games/user", () => last)
    finally server.stop(0)
  }

  test("HTTP client sends the reference's query params and decodes NDJSON") {
    val ndjson = """{"id":"g1"}""" + "\n" + """{"id":"g2"}""" + "\n"
    withStubServer(200, ndjson) { (url, lastExchange) =>
      val client = new LichessClient(LichessConfig(apiUrl = url, username = "carlsen"))
      val lines = client.fetch(Some(1700000000000L), 1700000100000L).toVector
      assert(lines === Vector("""{"id":"g1"}""", """{"id":"g2"}"""))
      val ex = lastExchange()
      assert(ex.getRequestURI.getPath.endsWith("/carlsen"))
      val q = ex.getRequestURI.getQuery.split("&").map { kv =>
        val Array(k, v) = kv.split("=", 2); k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
      assert(q("since") === "1700000000000")
      assert(q("until") === "1700000100000")
      assert(q("max") === "3")
      assert(q("perfType") === "ultraBullet, bullet, blitz")
      assert(q("analysed") === "true" && q("clocks") === "true" && q("opening") === "true")
      assert(q("sort") === "dateAsc")
      assert(ex.getRequestHeaders.getFirst("Accept") === "application/x-ndjson")
    }
  }

  test("first pull omits `since` (no watermark yet)") {
    withStubServer(200, """{"id":"g"}""") { (url, lastExchange) =>
      new LichessClient(LichessConfig(url, "u")).fetch(None, 42L).toVector
      assert(!lastExchange().getRequestURI.getQuery.contains("since="))
    }
  }

  test("HTTP error throws, so Extract keeps the watermark (at-least-once)") {
    withStubServer(500, "oops") { (url, _) =>
      val state = tempDir
      val ex = new Extract(state)
      val client = new LichessClient(LichessConfig(url, "u"))
      intercept[java.io.IOException] {
        ex.run(client.fetch, state.resolve("raw"), 100L)
      }
      assert(ex.loadWatermark() === None)
    }
  }

  test("end-to-end: stub server -> Extract.run writes NDJSON + watermark") {
    withStubServer(200, """{"id":"g1"}""" + "\n") { (url, _) =>
      val state = tempDir
      val out = LichessClient.runExtract(
        state, state.resolve("raw"), until = 123L,
        env = Map("LICHESS_API_URL" -> url, "LICHESS_USERNAME" -> "u"))
      assert(out.isDefined)
      assert(new String(java.nio.file.Files.readAllBytes(out.get)).trim === """{"id":"g1"}""")
      assert(new Extract(state).loadWatermark() === Some(123L))
    }
  }

  test("config comes from env or .env file, env winning; absent -> None") {
    assert(LichessConfig.fromEnv(Map.empty, None) === None)
    val dir = tempDir
    val envFile = dir.resolve(".env")
    java.nio.file.Files.write(envFile,
      "# comment\nLICHESS_API_URL=\"http://file/api\"\nLICHESS_USERNAME=fileuser\n".getBytes)
    val fromFile = LichessConfig.fromEnv(Map.empty, Some(envFile)).get
    assert(fromFile.apiUrl === "http://file/api" && fromFile.username === "fileuser")
    val envWins = LichessConfig.fromEnv(
      Map("LICHESS_API_URL" -> "http://env/api"), Some(envFile)).get
    assert(envWins.apiUrl === "http://env/api" && envWins.username === "fileuser")
  }

  test("retried window overwrites the same file (idempotent names)") {
    val state = tempDir
    val raw = state.resolve("raw")
    val ex = new Extract(state)
    val f1 = ex.run((_, _) => Iterator.single("""{"id":"a"}"""), raw, 100L).get
    // simulate a retry of the same window after losing the watermark
    new Extract(state) { }
    java.nio.file.Files.delete(state.resolve("last_timestamp.txt"))
    val f2 = new Extract(state)
      .run((_, _) => Iterator.single("""{"id":"a"}"""), raw, 100L).get
    assert(f1 === f2)
    assert(java.nio.file.Files.list(raw).count() === 1)
  }
}
