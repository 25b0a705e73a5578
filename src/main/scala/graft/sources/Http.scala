package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HTTP-backed sources and side-effecting row stages (SURVEY §2.1 S2-S4,
  * §2.11 X1). All network access goes through the pluggable `Fetcher` /
  * `LinkChecker` seams so pipelines run identically against live HTTP, a
  * recorded fixture, or a test fake (this container has zero egress).
  */
object Http {

  /** GET → body. One implementation per environment. */
  trait Fetcher extends Serializable {
    def get(url: String): String
  }

  /** java.net implementation for real deployments. */
  final class UrlFetcher(timeoutMs: Int = 10000, userAgent: String = "graft/0.1")
      extends Fetcher {
    def get(url: String): String = {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setRequestProperty("User-Agent", userAgent)
      try {
        val src = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8")
        try src.mkString finally src.close()
      } finally conn.disconnect()
    }
  }

  /** S2 REST pagination source (reference: zotero.py:34-45): page through
    * `urlTemplate.format(start)` `pageSize` at a time until a short page;
    * each page is a JSON array. Driver-side loop (like the reference's
    * generator), rows land via spark.read.json for schema inference.
    */
  def paginatedJsonArray(
      spark: SparkSession,
      fetcher: Fetcher,
      urlTemplate: String, // contains {start}
      pageSize: Int = 100,
      maxPages: Int = 10000): DataFrame = {
    import spark.implicits._
    val pages = Iterator.from(0)
      .map(i => fetcher.get(urlTemplate.replace("{start}", (i * pageSize).toString)))
      .take(maxPages)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    var done = false
    while (!done && pages.hasNext) {
      val body = pages.next()
      val count = countTopLevelElements(body)
      buf += body
      if (count < pageSize) done = true
    }
    // spark.read.json explodes a top-level JSON array into one row per
    // element — each fetched page contributes its items directly
    spark.read.json(spark.createDataset(buf.toSeq))
  }

  /** Crude top-level JSON array element count (drives pagination stop). */
  private[sources] def countTopLevelElements(json: String): Int = {
    var depth = 0; var count = 0; var inStr = false; var esc = false
    json.foreach { c =>
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '[' | '{' =>
          depth += 1
          if (depth == 2 && c == '{') count += 1
        case ']' | '}' => depth -= 1
        case _ =>
      }
    }
    count
  }

  /** S4 per-row HTTP enrichment (reference: judges.py:16-23): for each
    * row, GET `urlTemplate` with the key substituted, parse the JSON
    * response into `outCol` (string; parse downstream with from_json).
    * Runs as mapPartitions with a per-partition rate limiter — partition
    * parallelism IS the reference's worker fan-out.
    *
    * The limiter paces PER PARTITION, so the request budget is
    * `parallelism / rateLimitMs` only if rows spread evenly: inheriting
    * an upstream range partitioning (a sorted id scan) would hand one
    * partition most of the rows and serialize the run at a single
    * partition's rate (round-10 verdict #8). Round-robin repartition
    * first — uniform for ANY key distribution, including the
    * duplicate-heavy case a key-hash would re-skew (each row is an
    * independent request, so no key locality is needed); asserted by
    * the loopback spread spec — unless the caller passes
    * `parallelism = 0` to keep its own layout.
    *
    * AGGREGATE-RATE CONTRACT (round-11 advice): the limiter is
    * per-partition, so the total request rate against the remote is
    * `parallelism * 1000 / rateLimitMs` req/s — the round-10 change of
    * the default to `parallelism = 16` multiplied a single-partition
    * caller's aggregate rate 16×. Quota-limited callers must size
    * `rateLimitMs = parallelism * perRequestIntervalMs` (e.g. a 10 req/s
    * quota at parallelism 16 needs rateLimitMs = 1600), or pass
    * `parallelism = 1` for the old single-stream pacing.
    */
  def enrichPerRow(
      df: DataFrame,
      keyCol: String,
      urlTemplate: String, // contains {key}
      outCol: String,
      fetcher: Fetcher,
      rateLimitMs: Long = 100,
      parallelism: Int = 16): DataFrame = {
    val schema = df.schema.add(outCol, StringType)
    val enc = Encoders.row(schema)
    val keyIdx = df.schema.fieldIndex(keyCol)
    val spread =
      if (parallelism > 0) df.repartition(parallelism) else df
    spread.mapPartitions { rows =>
      rows.map { r =>
        if (rateLimitMs > 0) Thread.sleep(rateLimitMs)
        val url = urlTemplate.replace("{key}", String.valueOf(r.get(keyIdx)))
        val body = try fetcher.get(url) catch { case _: Exception => null }
        Row.fromSeq(r.toSeq :+ body)
      }
    }(enc)
  }

  /** Check result for one URL. */
  final case class CheckResult(status: Int, error: String)

  /** HEAD-check policy seam (reference check_broken, broken_links.py:46-74). */
  trait LinkChecker extends Serializable {
    def check(url: String): CheckResult
  }

  /** Real checker with the reference's politeness policy: 3 attempts,
    * backoff 10 s ×2 on 429, 1 s pause, 10 s timeout, UA spoof.
    * `initialBackoffMs`/`pauseMs` default to the reference values
    * (broken_links.py:49,58,66); tests shrink them to drive the retry
    * path against a real socket without wall-clock cost.
    */
  final class HeadChecker(
      timeoutMs: Int = 10000,
      userAgent: String =
        "Mozilla/5.0 (Macintosh; Intel Mac OS X 10.15; rv:147.0) Gecko/20100101 Firefox/147.0",
      initialBackoffMs: Long = 10000L,
      pauseMs: Long = 1000L)
      extends LinkChecker {
    def check(url: String): CheckResult = {
      var error: String = null
      var backoffMs = initialBackoffMs
      try {
        var attempts = 0
        var done = false
        while (!done && attempts < 3) {
          attempts += 1
          val conn = new java.net.URL(url).openConnection()
            .asInstanceOf[java.net.HttpURLConnection]
          conn.setRequestMethod("HEAD")
          conn.setInstanceFollowRedirects(true)
          conn.setConnectTimeout(timeoutMs)
          conn.setReadTimeout(timeoutMs)
          conn.setRequestProperty("User-Agent", userAgent)
          val code = conn.getResponseCode
          if (code == 429) {
            Thread.sleep(backoffMs); backoffMs *= 2; error = "Server Overload"
          } else {
            error = if (code >= 300) s"$code: ${conn.getResponseMessage}" else null
            Thread.sleep(pauseMs)
            done = true
          }
          conn.disconnect()
          if (!done && attempts >= 3) () // keep last error
          if (code != 429) done = true
        }
        CheckResult(0, error)
      } catch {
        case e: Exception => CheckResult(0, e.getClass.getSimpleName)
      }
    }
  }

  /** X1 `parallelize(check, 16)` (reference: broken_links.py:111):
    * repartition to the worker count, mapPartitions the checker, keep
    * rows with errors. Spark's partition parallelism IS this operator.
    */
  def checkLinks(
      df: DataFrame,
      urlCol: String,
      checker: LinkChecker,
      parallelism: Int = 16): DataFrame = {
    val schema = df.schema.add("error", StringType)
    val enc = Encoders.row(schema)
    val urlIdx = df.schema.fieldIndex(urlCol)
    df.repartition(parallelism)
      .mapPartitions { rows =>
        rows.map { r =>
          val res = checker.check(String.valueOf(r.get(urlIdx)))
          Row.fromSeq(r.toSeq :+ res.error)
        }
      }(enc)
      .filter(col("error").isNotNull)
  }
}
