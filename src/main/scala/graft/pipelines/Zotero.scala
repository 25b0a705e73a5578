package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops._

/** The zotero_fetch pipeline (reference: flows/zotero.py) — paged REST
  * items → tag-prefix partitioning (Domain_* → life_areas, Source_* →
  * source_kind) → authors assembly from creator structs → alias
  * concatenate to the normalized CSV shape.
  *
  * The paging itself is graft.sources.Rest (driver-side, like the
  * reference's generator); this stage takes the landed items DataFrame
  * with columns including key, title, date, tags:array<struct<tag>>,
  * creators:array<struct>, reportType, itemKind, parentItem.
  */
object Zotero {

  val Mapping: Map[String, Seq[String]] = Map(
    "title" -> Nil,
    "pubyear" -> Seq("date"),
    "publisher" -> Seq("institution", "publication", "publicationTitle"),
    "authors" -> Nil,
    "life_areas" -> Nil,
    "notes" -> Seq("abstractNote"),
    "languages" -> Seq("language"),
    "tags" -> Nil,
    "url" -> Nil,
    "migdar_id" -> Seq("key"),
    "item_kind" -> Nil,
    "source_kind" -> Nil,
    "volume" -> Nil,
    "creators" -> Nil)

  /** Move `prefix_*` tags into `field` (prefix stripped), remove them from
    * tags (zotero.py:55-89).
    */
  def extractTags(df: DataFrame, field: String, prefixes: Seq[String]): DataFrame = {
    val isPrefixed = (t: Column) =>
      prefixes.map(p => t.startsWith(p + "_")).reduce(_ || _)
    df.withColumn(field,
      transform(filter(col("tags"), isPrefixed),
        t => regexp_replace(t, "^[^_]*_", "")))  // strip up to FIRST underscore (split('_',1)[1])
      .withColumn("tags", filter(col("tags"), t => !isPrefixed(t)))
  }

  def run(spark: SparkSession, items: DataFrame): DataFrame = {
    // skip child items; need key+title (zotero.py:40-41,95)
    val base = items
      .filter((col("parentItem").isNull || col("parentItem") === "") &&
        col("key").isNotNull && col("key") =!= "" &&
        col("title").isNotNull && col("title") =!= "")

    // tags: [{tag}] → [tag] (zotero.py:50-53)
    val simplified = base.withColumn("tags",
      coalesce(transform(col("tags"), t => t.getField("tag")),
        array().cast(ArrayType(StringType))))

    val withAreas = extractTags(simplified, "life_areas", Seq("Domain"))
    val withSource = extractTags(withAreas, "source_kind",
      Seq("Source", "Resource", "Resouce"))

    // authors = "First Last, ..." over creatorType=='author' (zotero.py:99-109)
    val withAuthors = withSource.withColumn("authors",
      when(col("creators").isNull || size(col("creators")) === 0, lit(null).cast(StringType))
        .otherwise(array_join(
          transform(
            filter(col("creators"), c => c.getField("creatorType") === "author"),
            c => coalesce(c.getField("name"),
              concat_ws(" ", c.getField("firstName"), c.getField("lastName")))),
          ", ")))

    // item_kind = reportType || itemKind (zotero.py:110-111)
    val withKind = withAuthors.withColumn("item_kind",
      coalesce(col("reportType"), col("itemKind")))

    Joins.concatenate(Seq(
      withKind
        .withColumn("tags", concat_ws(",", col("tags")))
        .withColumn("life_areas", concat_ws(",", col("life_areas")))
        .withColumn("source_kind", concat_ws(",", col("source_kind")))
        .withColumn("creators", to_json(col("creators")))),
      Mapping)
  }
}
