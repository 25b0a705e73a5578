package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.i18n.Translate
import graft.sinks.Sitemap

/** The sitemap pipeline (reference: flows/sitemap.py) — per language
  * (hebrew '', english 'en/', arabic 'ar/'): item URLs for publications /
  * orgs / datasets + tag-search URLs from the tags dictionary → one XML
  * per (kind, language) + a handwritten index.
  */
object SitemapPipeline {

  val Langs: Seq[(String, String)] =
    Seq("hebrew" -> "", "english" -> "en/", "arabic" -> "ar/")

  def itemUrls(df: DataFrame, prefix: String): DataFrame =
    df.filter(col("doc_id").isNotNull && col("doc_id") =!= "")
      .select(format_string(s"https://yodaat.org/${prefix}item/%s", col("doc_id")).as("url"))

  /** Tag-search URLs (sitemap.py:31-34,64-67): distinct (prefix, hebrew,
    * translated) triples from the tags dictionary, sorted.
    */
  def tagUrls(spark: SparkSession, tags: Map[String, Translate.Entry],
      lang: String, prefix: String): DataFrame = {
    import spark.implicits._
    val rows = tags.values.map { e =>
      val translated = lang match {
        case "english" => e.english
        case "arabic" => e.arabic
        case _ => e.hebrew
      }
      (prefix, e.hebrew, translated)
    }.toSeq.distinct.sorted
    rows.toDF("prefix", "tag", "itag")
      .select(format_string(
        "https://yodaat.org/%ssearch?tag=%s&itag=%s&kind=all&filters={}&sortOrder=-year",
        col("prefix"), col("tag"), col("itag")).as("url"))
  }

  /** Build and write every sitemap; returns (kind-lang → url DataFrame). */
  def run(
      spark: SparkSession,
      publications: DataFrame,
      orgs: DataFrame,
      datasets: DataFrame,
      tagsDict: Map[String, Translate.Entry],
      outDir: String): Map[String, DataFrame] = {
    val resources = (for ((lang, prefix) <- Langs) yield Seq(
      s"publications-$lang" -> itemUrls(publications, prefix),
      s"orgs-$lang" -> itemUrls(orgs, prefix),
      s"datasets-$lang" -> itemUrls(datasets, prefix),
      s"tags-$lang" -> tagUrls(spark, tagsDict, lang, prefix))).flatten.toMap
    Sitemap.dump(resources, "url", "https://api.yodaat.org/data", outDir)
    resources
  }
}
