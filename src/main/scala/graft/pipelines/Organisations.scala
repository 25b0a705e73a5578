package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.i18n.Translate
import graft.ops._

/** The organisations pipeline (reference: flows/organisations.py) —
  * women's-org directory: sheet → alias concatenate → url repair →
  * alt-name assembly → 9-field trilingual translation → doc_id with
  * first-come dedup suffix → link anchors → ES annotations.
  */
object Organisations {

  /** Canonical ← Hebrew/Arabic sheet headers (organisations.py:11-42). */
  val Headers: Map[String, Seq[String]] = Map(
    "org_name" -> Seq("שם מלא של הארגון - לתרגום או לתעתיק"),
    "org_name__ar" -> Seq("اسم الجمعيّة"),
    "org_name__en" -> Seq("שם מלא של הארגון באנגלית - לתרגום או לתעתיק"),
    "entity_id" -> Seq("מספר עמותה"),
    "org_kind" -> Seq("סוג הארגון"),
    "tagline" -> Seq("מטרת הארגון ( משפט תיאורי קצר) - לתרגום"),
    "tagline__ar" -> Seq("מטרת הארגון בתרגום לערבית"),
    "tagline__en" -> Seq("מטרת הארגון בתרגום לאנגלית"),
    "objective" -> Seq("על הארגון, פעילויות עיקריות ומטרות - לתרגום"),
    "objective__ar" -> Seq("על הארגון, פעילויות עיקריות ומטרות - תרגום לערבית"),
    "objective__en" -> Seq("על הארגון, פעילויות עיקריות ומטרות - תרגום לאנגלית"),
    "life_areas" -> Seq("תחומי חיים"),
    "languages" -> Seq("שפות בהן ניתנים שירותים"),
    "specialties" -> Seq("תחומי פעילות והתמחות עיקריים"),
    "target_audiences" -> Seq("קהלי יעד"),
    "provided_services" -> Seq("השירותים הניתנים - אתר יודעת"),
    "regions" -> Seq("אזור גיאוגרפי"),
    "year_founded" -> Seq("שנת הקמה"),
    "tags" -> Seq("תגיות - התרגום הוא בקובץ נפרד"),
    "hotline_phone_number" -> Seq("מספר הטלפון של הקו החם: - رقم هاتف الخط الدافئ:"),
    "org_website" -> Seq("לינק לאתר הארגון"),
    "org_facebook" -> Seq("לינק לדף פייסבוק של הארגון"),
    "org_phone_number" -> Seq("טלפון ליצירת קשר עם הארגון"),
    "org_email_address" -> Seq("מייל ליצירת קשר עם הארגון"),
    "logo_url" -> Seq("לוגו"),
    "alt_name1" -> Seq("שם נוסף1"),
    "alt_name2" -> Seq("שם נוסף2"),
    "alt_name3" -> Seq("שם נוסף3"),
    "alt_name4" -> Seq("שם נוסף4"),
    "alt_name5" -> Seq("שם נוסף5"))

  /** Fields run through split_and_translate (organisations.py:73-81). */
  val TranslatedFields: Seq[(String, String)] = Seq(
    "languages" -> "languages", "life_areas" -> "life_areas", "tags" -> "tags",
    "regions" -> "regions", "org_kind" -> "org_kind",
    "specialties" -> "specialties", "provided_services" -> "provided_services",
    "target_audiences" -> "target_audiences",
    "compact_services" -> "compact_services")

  def run(
      spark: SparkSession,
      orgsSheet: DataFrame,
      dicts: Map[String, Map[String, Translate.Entry]],
      currentYear: Int): DataFrame = {

    val stamped =
      if (orgsSheet.columns.contains(Ordering.ORD)) orgsSheet
      else Ordering.stampOrder(orgsSheet)
    val cat = Joins.concatenate(Seq(stamped), Headers + (Ordering.ORD -> Nil))

    val repaired = cat
      .withColumn("org_website", RowOps.repairUrl(col("org_website")))
      .withColumn("org_facebook", RowOps.repairUrl(col("org_facebook")))

    // alt_names array = alt_name1..5 + org_name, non-empty (org.py:60-71)
    val withAlt = repaired.withColumn("alt_names",
      filter(
        array((1 to 5).map(i => col(s"alt_name$i")) :+ col("org_name"): _*),
        x => x.isNotNull && x =!= ""))
      .withColumn("compact_services", col("provided_services"))
    val trimmed = RowOps.deleteFields(withAlt, Seq("alt_name[1-5]"))

    val translated = TranslatedFields.foldLeft(trimmed) { case (df, (f, d)) =>
      Translate.splitAndTranslate(df, f, dicts.getOrElse(d, Map.empty))
    }

    // title_kw, doc_id org/{entity_id} + first-come suffix (org.py:44-52,85-89)
    val withId = RowOps.addFormatField(
      translated.withColumn("title_kw", col("org_name")),
      "doc_id", "org/{entity_id}")
    val deduped = Ordering.dedupSuffix(withId, "doc_id")

    // link anchors in objectives (org.py:91-93), current year column
    val linked = Seq("objective", "objective__en", "objective__ar")
      .foldLeft(deduped)((df, f) =>
        df.withColumn(f, RowOps.linksToAnchors(col(f))))
      .withColumn("year", lit(currentYear))

    // es:* annotations (organisations.py:94-106)
    import graft.schema.EsMeta
    EsMeta.noIndex(
      EsMeta.title(
        EsMeta.keyword(linked, "title_kw"),
        "org_name", "org_name__ar", "alt_names"),
      "org_website", "org_facebook", "org_phone_number",
      "org_email_address", "logo_url")
  }
}
