package graft.i18n

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** J3 `split_and_translate` — the reference's dictionary-translation
  * operator (i18n.py:80-163): split a delimited field into tokens,
  * normalize each, look it up in a translation dictionary; on miss, fuzzy
  * match (QRatio ≥ 90, top-2, warn on ambiguity); emit four array columns
  * `f`, `f__en`, `f__ar`, `f__all`; unmatched tokens pass through
  * untranslated into every column.
  *
  * Spark design: the dictionary is a broadcast variable (tiny — 12 sheets
  * in the reference); exact+fuzzy lookup is one Scala UDF over it. The
  * UDF tier is justified here (SURVEY §2.12): the fuzzy scorer is genuine
  * imperative string DP, not expressible in builtins; it runs as a narrow
  * map over already-projected tokens.
  */
object Translate {

  /** One dictionary entry: canonical Hebrew key → (english, arabic). */
  final case class Entry(hebrew: String, english: String, arabic: String)

  /** Normalization applied to both dict keys and lookup tokens
    * (reference `clean`, i18n.py:31-32: nbsp → space, strip, lower).
    */
  def clean(s: String): String =
    if (s == null) "" else s.replace(' ', ' ').trim.toLowerCase

  /** Build the lookup map from a dictionary DataFrame with columns
    * `hebrew`, `english`, `arabic` and any number of alias columns whose
    * values also map to the row (reference: i18n.py:26-47 value* columns).
    * Rows with empty hebrew are dropped (i18n.py:58).
    */
  def buildDict(df: DataFrame): Map[String, Entry] = {
    val cols = df.columns
    val aliasCols = cols.filterNot(Set("hebrew", "english", "arabic"))
    df.collect().iterator.flatMap { row =>
      def get(c: String): String =
        if (cols.contains(c)) Option(row.getAs[Any](c)).map(_.toString).getOrElse("") else ""
      val heb = get("hebrew")
      if (clean(heb).isEmpty) Iterator.empty
      else {
        val e = Entry(heb, get("english"), get("arabic"))
        val keys = (heb +: aliasCols.map(get)).map(clean).filter(_.nonEmpty)
        keys.distinct.iterator.map(_ -> e)
      }
    }.toMap
  }

  final case class Translated(
      f: Seq[String], f__en: Seq[String], f__ar: Seq[String], f__all: Seq[String],
      misses: Seq[String], ambiguous: Seq[String])

  /** Translate one raw delimited cell value against the dict. */
  def translateValue(
      dict: Map[String, Entry],
      raw: String,
      delimiter: String,
      fuzzyCutoff: Int = 90): Translated = {
    val tokens =
      if (raw == null) Seq.empty
      else raw.split(java.util.regex.Pattern.quote(delimiter)).toSeq
        .map(_.trim).filter(_.nonEmpty)
    val keys = dict.keys.toSeq.sorted // sorted → deterministic fuzzy tie order
    var (f, en, ar, all) = (Vector.empty[String], Vector.empty[String],
      Vector.empty[String], Vector.empty[String])
    var misses = Vector.empty[String]
    var ambiguous = Vector.empty[String]
    tokens.foreach { tok =>
      val key = clean(tok)
      val hit = dict.get(key).orElse {
        val cands = Fuzzy.extract(key, keys, limit = 2, cutoff = fuzzyCutoff)
        if (cands.size > 1 && cands(1)._2 >= fuzzyCutoff)
          ambiguous :+= s"$tok -> ${cands.map(_._1).mkString(" | ")}"
        cands.headOption.map(c => dict(c._1))
      }
      hit match {
        case Some(e) =>
          f :+= e.hebrew; en :+= e.english; ar :+= e.arabic
          all ++= Seq(e.hebrew, e.english, e.arabic).filter(_.nonEmpty)
        case None =>
          misses :+= tok
          f :+= tok; en :+= tok; ar :+= tok; all :+= tok
      }
    }
    Translated(f, en, ar, all.distinct, misses, ambiguous)
  }

  /** The DataFrame stage: replaces `field` with array column `field` and
    * adds `field__en`, `field__ar`, `field__all` (reference schema rewrite
    * i18n.py:147-163). Dict is broadcast once per call site.
    */
  def splitAndTranslate(
      df: DataFrame,
      field: String,
      dict: Map[String, Entry],
      delimiter: String = ",",
      fuzzyCutoff: Int = 90): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(dict)
    val tUdf = udf { raw: String =>
      val t = translateValue(bc.value, raw, delimiter, fuzzyCutoff)
      (t.f, t.f__en, t.f__ar, t.f__all)
    }
    df.withColumn("__t", tUdf(col(field).cast(StringType)))
      .withColumn(field, col("__t._1"))
      .withColumn(s"${field}__en", col("__t._2"))
      .withColumn(s"${field}__ar", col("__t._3"))
      .withColumn(s"${field}__all", col("__t._4"))
      .drop("__t")
  }
}
