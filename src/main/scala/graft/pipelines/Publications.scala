package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.i18n.Translate
import graft.ops._

/** The publications pipeline (reference: flows/publications.py) —
  * Google-Sheet sources ∪ zotero CSV → alias concatenate → None
  * normalization → year extraction → 5-field translation → doc_id/
  * page_title format fields → ES boost/hebrew annotations.
  */
object Publications {

  val Mapping: Map[String, Seq[String]] = Map(
    "migdar_id" -> Nil,
    "title" -> Seq("Title"),
    "bib_title" -> Nil,
    "bib_related_parts" -> Nil,
    "notes" -> Nil,
    "tags" -> Seq("Tags"),
    "publisher" -> Nil,
    "languages" -> Nil,
    "item_kind" -> Nil,
    "pubyear" -> Nil,
    "life_areas" -> Nil,
    "source_kind" -> Nil,
    "authors" -> Nil,
    "url" -> Nil)

  val TranslatedFields: Seq[(String, String, String)] = Seq(
    ("tags", "tags", ","), ("life_areas", "life_areas", ","),
    ("languages", "languages", " "), ("source_kind", "source_kind", ","),
    ("item_kind", "item_kind", ","))

  def run(
      spark: SparkSession,
      sheetSources: Seq[DataFrame],
      zotero: DataFrame,
      dicts: Map[String, Map[String, Translate.Entry]]): DataFrame = {

    // sheet rows must carry a migdar_id (publications.py:93)
    val sheets = sheetSources.map(df =>
      RowOps.filterRows(df,
        col("migdar_id").isNotNull && col("migdar_id") =!= "" && col("migdar_id") =!= "None"))

    val cat = Joins.concatenate(sheets :+ zotero, Mapping)

    val cleaned = RowOps.normalizeNones(cat)
      .withColumn("url", RowOps.repairUrl(col("url")))

    // year = first [12]\d{3} in pubyear (publications.py:51-63)
    val withYear = cleaned.withColumn("year", RowOps.extractYear(col("pubyear")))

    val translated = TranslatedFields.foldLeft(withYear) { case (df, (f, d, delim)) =>
      Translate.splitAndTranslate(df, f, dicts.getOrElse(d, Map.empty), delimiter = delim)
    }

    // migdar_id length guard, doc_id + page_title formats, title_kw, links
    val guarded = RowOps.truncateGuard(translated, "migdar_id", 200)
    val withIds = RowOps.addFormatField(
      RowOps.addFormatField(guarded, "doc_id", "publications/{migdar_id}"),
      "page_title", "{title}")
    val done = withIds
      .withColumn("notes", RowOps.linksToAnchors(col("notes")))
      .withColumn("title_kw", col("title"))

    // es:* annotations (publications.py:121-124, :139-141)
    import graft.schema.EsMeta
    EsMeta.keyword(
      EsMeta.hebrew(
        EsMeta.boost(EsMeta.title(done, "title"), "authors", "publisher"),
        "notes"),
      "title_kw")
  }
}
