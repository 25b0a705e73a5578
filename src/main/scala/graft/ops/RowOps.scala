package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Projection / filtering / per-row column transforms — the Spark-native
  * re-expression of the reference's row-processor layer (SURVEY.md §2.2).
  * Everything here is a declarative Column expression so Catalyst can
  * push, prune and codegen; nothing materializes on the driver.
  */
object RowOps {

  /** P1 `filter_rows` (reference: publications.py:93, zotero.py:95). */
  def filterRows(df: DataFrame, cond: Column): DataFrame = df.filter(cond)

  /** P1 spec form: `equals=[{k: v, ...}, ...]` — keep rows matching ANY of
    * the conjunctive specs.
    */
  def filterRowsEquals(df: DataFrame, specs: Seq[Map[String, Any]]): DataFrame = {
    val cond = specs
      .map(spec => spec.map { case (k, v) => col(k) === lit(v) }.reduce(_ && _))
      .reduceOption(_ || _)
      .getOrElse(lit(true))
    df.filter(cond)
  }

  /** P2 `select_fields` (reference: i18n.py:59, sitemap.py:86). */
  def selectFields(df: DataFrame, names: Seq[String]): DataFrame =
    df.select(names.map(col): _*)

  /** P3 `delete_fields` with regex names (reference: datasets.py:363,
    * organisations.py:72 drops `alt_name[1-5]` by pattern).
    */
  def deleteFields(df: DataFrame, patterns: Seq[String]): DataFrame = {
    val res = patterns.map(p => ("^" + p + "$").r)
    val doomed = df.columns.filter(c => res.exists(_.findFirstIn(c).isDefined))
    df.drop(doomed: _*)
  }

  /** P4 `add_field(name, type, default)` (reference: datasets.py:340,448-450). */
  def addField(df: DataFrame, name: String, value: Column): DataFrame =
    df.withColumn(name, value)

  /** P5 `add_computed_field(operation='format', with_='org/{entity_id}')`
    * (reference: organisations.py:85-89, publications.py:134-138).
    * `{field}` placeholders become `%s` + column refs → `format_string`.
    */
  def addFormatField(df: DataFrame, name: String, pattern: String): DataFrame = {
    val ph = "\\{([A-Za-z0-9_]+)\\}".r
    val cols = ph.findAllMatchIn(pattern).map(_.group(1)).toSeq
    val fmt = ph.replaceAllIn(pattern, "%s")
    df.withColumn(name, format_string(fmt, cols.map(col): _*))
  }

  /** P7 null normalization: literal string "None" → SQL NULL in all string
    * columns (reference: publications.py:66-72).
    */
  def normalizeNones(df: DataFrame, token: String = "None"): DataFrame = {
    val stringCols = df.schema.fields.collect {
      case StructField(n, StringType, _, _) => n
    }
    df.na.replace(stringCols, Map(token -> null))
  }

  /** P10 truncation guard: values longer than `max` get truncated
    * (reference: publications.py:75-80 caps migdar_id at 200 chars).
    */
  def truncateGuard(df: DataFrame, field: String, max: Int): DataFrame =
    df.withColumn(field, substring(col(field), 1, max))

  /** P11 URL repair: prepend scheme to bare domains (reference:
    * i18n.py:169-183).
    */
  def repairUrl(c: Column): Column =
    when(c.isNotNull && !c.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://") && c.rlike("^[\\w.-]+\\.[a-zA-Z]{2,}"),
      concat(lit("http://"), c)).otherwise(c)

  /** P12 link → HTML anchor rewrite (reference: common.py:17-23, regex at
    * common.py:17; applied publications.py:132, organisations.py:91-93).
    */
  private val UrlRe = "(https?://[^\\s;,]+)"
  def linksToAnchors(c: Column): Column =
    regexp_replace(c, UrlRe, "<a href=\"$1\" target=\"_blank\">$1</a>")

  /** P13 year extraction: first [12]\\d{3} match in free text
    * (reference: publications.py:51-63).
    */
  def extractYear(c: Column): Column =
    nullif(regexp_extract(c, "([12][0-9]{3})", 1), lit("")).cast(IntegerType)

  /** P14 year-list expansion: "2001-2003,2005" → [2001,2002,2003,2005]
    * (reference: datasets.py:115-127). Pure builtin expression — flatten of
    * per-token `sequence` — so it stays inside codegen; no UDF.
    */
  def expandYearList(c: Column): Column = {
    val tok = split(c, ",\\s*")
    flatten(transform(tok, t => {
      // nullif before cast: ANSI mode (Spark 4 default) would throw on ''
      val lo = nullif(regexp_extract(t, "^\\s*([0-9]{4})", 1), lit("")).cast(IntegerType)
      val hi = coalesce(
        nullif(regexp_extract(t, "-\\s*([0-9]{4})\\s*$", 1), lit("")).cast(IntegerType),
        lo)
      when(lo.isNotNull, sequence(lo, hi)).otherwise(array())
    }))
  }

  /** P15 dictionary recode: small-map lookup with default + strict mode
    * (reference: datasets.py:276-300 maps Hebrew chart-type labels to an
    * enum, None → default, unknown → error). The map is tiny → inline
    * literal map expression (broadcast to every task by the plan itself).
    */
  def recode(c: Column, mapping: Map[String, String], default: Option[String]): Column = {
    val m = map(mapping.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*)
    val hit = element_at(m, c)
    default match {
      case Some(d) => coalesce(hit, lit(d))
      case None    => hit
    }
  }

  /** P17 per-field default fallback: `a ||= b` (reference: datasets.py:107-112). */
  def fallback(df: DataFrame, field: String, from: String): DataFrame =
    df.withColumn(field, coalesce(col(field), col(from)))

  /** P18 prefer-override merge: `f = override || f`, drop override column
    * (reference: obsolete/dump_publications_to_es.py:37-44).
    */
  def preferOverride(df: DataFrame, field: String, overrideField: String): DataFrame =
    df.withColumn(field, coalesce(col(overrideField), col(field)))
      .drop(overrideField)

  /** P19 string split → trimmed keyword array (reference:
    * obsolete/dump_publications_to_es.py:13-34).
    */
  def splitToArray(c: Column, delim: String = ","): Column =
    filter(transform(split(c, java.util.regex.Pattern.quote(delim)), trim(_)), t => t =!= "")

  /** §2.9 doc_id: `<prefix>/<md5(key)[:16]>` (reference: datasets.py:430-436). */
  def docId(prefix: String, key: Column): Column =
    concat(lit(prefix), lit("/"), substring(md5(key), 1, 16))

  /** J5 row content hash for SCD change detection (reference:
    * obsolete/prepare_data_for_es.py:80-87 md5s the non-key fields).
    */
  def rowHash(cols: Seq[Column]): Column =
    md5(concat_ws("|", cols.map(_.cast(StringType)): _*))
}
