package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops._
import graft.sources.Http

/** The broken_links pipeline (reference: flows/broken_links.py) — harvest
  * every URL out of the published docs, first-wins global dedup, parallel
  * HEAD checks, error report.
  */
object BrokenLinks {

  /** Reference URL regex (broken_links.py:7-8). */
  val UrlRe = "(http[s]?://[-_?&A-Z0-9a-z./=%]+)"

  /** `sources`: (name, titleColumn, docs DataFrame with doc_id). */
  def run(
      spark: SparkSession,
      sources: Seq[(String, String, DataFrame)],
      checker: Http.LinkChecker,
      parallelism: Int = 16): DataFrame = {

    // per-source: harvest urls from the whole row, keep (name,title,link,urls)
    val harvested = sources.map { case (name, titleCol, df) =>
      val stamped = if (df.columns.contains(Ordering.ORD)) df else Ordering.stampOrder(df)
      stamped
        .withColumn("urls",
          regexp_extract_all(to_json(struct(df.columns.map(col): _*)), lit(UrlRe)))
        .withColumn("link", format_string("https://yodaat.org/item/%s", col("doc_id")))
        .select(lit(name).as("name"), col(titleCol).cast("string").as("title"),
          col("link"), col("urls"), col(Ordering.ORD))
    }
    val cat = harvested.reduce(_ unionByName _)

    // unwind with global first-URL-wins dedup (broken_links.py:34-43):
    // per-URL window on the stamped order keeps the first emitting row
    val unwound = Reshape
      .unwindFirstSeen(cat, "urls", "url", Ordering.ORD)
      .drop(Ordering.ORD)

    // parallel HEAD check, keep failures (broken_links.py:111-112)
    Http.checkLinks(unwound, "url", checker, parallelism)
  }
}
