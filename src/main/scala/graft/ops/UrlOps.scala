package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the key-normalization pass in front of
  * dedup-by-URL and host-level aggregation in a crawl pipeline: two
  * syntactically different URLs that fetch the same resource must map
  * to one canonical string BEFORE the exact-dedup hash sees them.
  *
  * Rules (the conservative, always-safe subset): lowercase scheme and
  * authority, strip the scheme's default port, drop the fragment, drop
  * tracking parameters (utm_*, fbclid, gclid), and sort the surviving
  * query parameters. Everything is builtin expressions around Spark's
  * codegen'd `try_parse_url` (the try_ form: a malformed URL maps to
  * NULL instead of failing the job — at corpus scale there is ALWAYS a
  * malformed URL) — one narrow map stage.
  */
object UrlOps {

  private val TrackingParam = "^(utm_[^=]*|fbclid|gclid)(=|$)"

  /** Canonical form of an absolute http(s) URL column. */
  def canonicalize(url: Column): Column = {
    val scheme = lower(try_parse_url(url, lit("PROTOCOL")))
    val auth0 = lower(try_parse_url(url, lit("AUTHORITY")))
    val auth = when(scheme === "http", regexp_replace(auth0, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth0, ":443$", ""))
      .otherwise(auth0)
    val path = coalesce(try_parse_url(url, lit("PATH")), lit(""))
    val params = array_sort(filter(
      split(coalesce(try_parse_url(url, lit("QUERY")), lit("")), "&"),
      p => p =!= "" && !p.rlike(TrackingParam)))
    val qstr = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    when(scheme.isNull || auth0.isNull, lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), auth, path, qstr))
  }

  /** Registrable host of a URL (lowercased), for host-level caps and
    * per-domain mixing.
    */
  def host(url: Column): Column = lower(try_parse_url(url, lit("HOST")))
}
