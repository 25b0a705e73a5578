package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec
import graft.sources.Http.{CheckResult, HeadChecker, UrlFetcher}

/** End-to-end tests of the HTTP seams (S2 pagination, S4 per-row
  * enrichment, X1 link checking) against a REAL loopback socket — a JDK
  * `com.sun.net.httpserver` fixture — instead of hand-rolled `Fetcher`
  * fakes. This exercises the production `UrlFetcher`/`HeadChecker`
  * classes themselves: connection setup, HEAD vs GET, status-code and
  * error paths, timeouts, and the 429 retry/backoff policy (reference
  * broken_links.py:46-74), plus the pagination stop condition
  * (zotero.py:34-45) and rate-limit pacing (judges.py:16-23) driven
  * through live requests.
  */
class HttpLoopbackSpec extends SparkSpec with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val pageRequests = new AtomicInteger(0)
  private val flakyHits = new AtomicInteger(0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    // HEAD responses carry no body: -1 = no content
    val len = if (ex.getRequestMethod == "HEAD") -1L else bytes.length.toLong
    ex.sendResponseHeaders(code, len)
    if (ex.getRequestMethod != "HEAD") ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // S2: pages of 3 items from a 7-item collection -> starts 0,3 full,
    // start 6 short (1 item), anything later empty
    server.createContext("/items", (ex: HttpExchange) => {
      pageRequests.incrementAndGet()
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val start = q.split('&').collectFirst {
        case kv if kv.startsWith("start=") => kv.drop(6).toInt
      }.getOrElse(0)
      val items = (start until math.min(start + 3, 7))
        .map(i => s"""{"id":$i,"name":"item-$i"}""")
      respond(ex, 200, items.mkString("[", ",", "]"))
    })
    // S4: echo the key back as JSON
    server.createContext("/enrich", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val key = q.split('&').collectFirst {
        case kv if kv.startsWith("key=") => kv.drop(4)
      }.getOrElse("?")
      respond(ex, 200, s"""{"key":"$key","extra":${key.length}}""")
    })
    // X1: 429 twice, then 200 (tests the retry/backoff loop)
    server.createContext("/flaky", (ex: HttpExchange) =>
      respond(ex, if (flakyHits.incrementAndGet() <= 2) 429 else 200, ""))
    server.createContext("/ok", (ex: HttpExchange) => respond(ex, 200, "ok"))
    server.createContext("/gone", (ex: HttpExchange) => respond(ex, 404, ""))
    server.setExecutor(null) // default: serve on the dispatch thread
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  test("S2 pagination over a live socket: stops on the short page") {
    pageRequests.set(0)
    val df = Http.paginatedJsonArray(spark, new UrlFetcher(),
      s"$base/items?start={start}", pageSize = 3)
    val ids = df.select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L to 6L))
    // starts 0 and 3 are full pages; start 6 returns 1 < pageSize and
    // stops the loop — exactly three requests, no probe of start 9
    assert(pageRequests.get() == 3)
  }

  test("S4 per-row enrichment over a live socket paces by the rate limit") {
    import spark.implicits._
    val df = Seq("alpha", "bg", "gamma9").toDF("k").repartition(1)
    val t0 = System.nanoTime()
    // parallelism = 0: keep the single upstream partition so all three
    // rows share one limiter — the pacing assertion needs serial requests
    val out = Http.enrichPerRow(df, "k", s"$base/enrich?key={key}",
      "resp", new UrlFetcher(), rateLimitMs = 60, parallelism = 0)
      .select("k", "resp").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(out("alpha") == """{"key":"alpha","extra":5}""")
    assert(out("bg") == """{"key":"bg","extra":2}""")
    assert(out("gamma9") == """{"key":"gamma9","extra":6}""")
    // 3 rows on one partition with a 60 ms limiter: >= 180 ms wall
    assert(elapsedMs >= 180, s"rate limiter did not pace: $elapsedMs ms")
  }

  test("X1 HeadChecker retries through 429 with doubling backoff") {
    flakyHits.set(0)
    val t0 = System.nanoTime()
    val res = new HeadChecker(initialBackoffMs = 40, pauseMs = 1)
      .check(s"$base/flaky")
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(res == CheckResult(0, null), s"expected recovery, got $res")
    assert(flakyHits.get() == 3, "two 429s then the successful third HEAD")
    // backoff 40 then 80 ms before the third attempt
    assert(elapsedMs >= 120, s"backoff not applied: $elapsedMs ms")
  }

  test("X1 checkLinks keeps only failing URLs (live 404 vs 200)") {
    import spark.implicits._
    val df = Seq(s"$base/ok", s"$base/gone").toDF("url")
    val failed = Http.checkLinks(df, "url",
        new HeadChecker(initialBackoffMs = 1, pauseMs = 1), parallelism = 2)
      .select("url", "error").collect()
    assert(failed.length == 1)
    assert(failed.head.getString(0).endsWith("/gone"))
    assert(failed.head.getString(1).startsWith("404"))
  }

  test("S4 enrichment spreads a skewed upstream layout near-uniformly") {
    import spark.implicits._
    // 64 rows (with DUPLICATE keys — the case a key-hash would re-skew)
    // crammed into ONE upstream partition: the skew case where the
    // per-partition limiter would serialize the whole run at a single
    // partition's rate (round-10 verdict #8). Round-robin repartition
    // spreads rows exactly evenly regardless of key distribution.
    val df = (0 until 64).map(i => s"key${i % 4}").toDF("k").repartition(1)
    val out = Http.enrichPerRow(df, "k", s"$base/enrich?key={key}",
        "resp", new UrlFetcher(), rateLimitMs = 0, parallelism = 8)
      .select(col("k"), spark_partition_id().as("pid"))
    val counts = out.groupBy("pid").count().collect()
      .map(r => r.getLong(1)).sorted
    assert(counts.sum == 64)
    assert(counts.length == 8, s"rows landed on ${counts.length}/8 partitions")
    assert(counts.max == 8,
      s"partition hoards ${counts.max}/64 rows — limiter budget skewed")
  }

  test("UrlFetcher surfaces connection errors (dead port)") {
    // a port with no listener -> ConnectException from the real stack;
    // enrichPerRow maps it to a null enrichment instead of failing the job
    import spark.implicits._
    val deadBase = "http://127.0.0.1:1" // port 1: never bound
    val out = Http.enrichPerRow(Seq("x").toDF("k"), "k",
        s"$deadBase/enrich?key={key}", "resp", new UrlFetcher(timeoutMs = 500),
        rateLimitMs = 0)
      .select("resp").collect()
    assert(out.head.isNullAt(0))
  }
}
