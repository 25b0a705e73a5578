package graft.ops

import graft.SparkSpec

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.canonicalize($"u")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq

  test("case fold, default port strip, fragment drop, param sort") {
    assert(canon("HTTP://Www.Ex.COM:80/A/b?z=1&a=2#frag") ==
      Seq("http://www.ex.com/A/b?a=2&z=1"))
    // path case is preserved — only scheme/authority fold
  }

  test("https default port; non-default ports survive") {
    assert(canon(
      "https://ex.com:443/x",
      "https://ex.com:8443/x",
      "http://ex.com:443/x") == Seq(
      "https://ex.com/x",
      "https://ex.com:8443/x",
      "http://ex.com:443/x"))
  }

  test("tracking params drop; all-tracking query drops the '?'") {
    assert(canon(
      "http://ex.com/p?utm_source=a&utm_medium=b&keep=1&fbclid=xyz&gclid=2") ==
      Seq("http://ex.com/p?keep=1"))
    assert(canon("http://ex.com/p?utm_source=only") == Seq("http://ex.com/p"))
  }

  test("no query, empty path, malformed input") {
    assert(canon("http://ex.com") == Seq("http://ex.com"))
    assert(canon("not a url") == Seq(null))
  }

  test("host extraction") {
    val h = Seq("HTTPS://Sub.Ex.ORG:8443/p?q=1").toDF("u")
      .select(UrlOps.host($"u")).collect().head.getString(0)
    assert(h == "sub.ex.org")
  }
}
