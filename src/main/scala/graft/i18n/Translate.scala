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

  /** One dictionary entry: canonical Hebrew key → (english, arabic,
    * alias values). `values` mirrors the reference row's `values` column
    * (the value* alias cells, i18n.py:35-41) — it is what `f__all`
    * receives on a hit (COLS/SUFFIXES zip, i18n.py:83-84).
    */
  final case class Entry(hebrew: String, english: String, arabic: String,
      values: Seq[String] = Nil)

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
        val aliases = aliasCols.map(get).filter(_.trim.nonEmpty)
        val e = Entry(heb, get("english"), get("arabic"), aliases.toSeq)
        val keys = (heb +: aliases).map(clean).filter(_.nonEmpty)
        keys.distinct.iterator.map(_ -> e)
      }
    }.toMap
  }

  final case class Translated(
      f: Seq[String], f__en: Seq[String], f__ar: Seq[String], f__all: Seq[String],
      misses: Seq[String], ambiguous: Seq[String])

  /** Translate one raw delimited cell value against the dict.
    *
    * Divergence note: tokens are TRIMMED before the length-3 skip check;
    * the reference checks the unstripped split piece (i18n.py:103-104)
    * and appends the unstripped piece on a miss. Its production inputs
    * are pre-stripped upstream (extract_values, i18n.py:35-41), so the
    * distinction is unobservable there; trimming makes the behavior
    * independent of delimiter padding.
    */
  def translateValue(
      dict: Map[String, Entry],
      raw: String,
      delimiter: String,
      fuzzyCutoff: Int = 90): Translated = {
    val keys = dict.keys.toSeq.sorted
    translateValuePrepared(dict, keys, keys.map(Fuzzy.fullProcess), raw,
      delimiter, fuzzyCutoff)
  }

  /** [[translateValue]] with the dictionary's sorted keys and their
    * `fullProcess` forms precomputed — the per-row cost of re-deriving
    * both for every cell dominated the stage (the dict side never
    * changes across rows).
    */
  private[i18n] def translateValuePrepared(
      dict: Map[String, Entry],
      keys: Seq[String],          // sorted → deterministic fuzzy tie order
      processedKeys: Seq[String],
      raw: String,
      delimiter: String,
      fuzzyCutoff: Int): Translated = {
    val tokens =
      if (raw == null) Seq.empty
      else raw.split(java.util.regex.Pattern.quote(delimiter)).toSeq
        .map(_.trim).filter(_.nonEmpty)
    var (f, en, ar, all) = (Vector.empty[String], Vector.empty[String],
      Vector.empty[String], Vector.empty[String])
    var misses = Vector.empty[String]
    var ambiguous = Vector.empty[String]
    // reference append semantics (i18n.py:117-131): per-column first-seen
    // dedup; hit values are CLEANED translations; an empty translation
    // cell falls back to the raw token
    def put(v: Vector[String], x: String): Vector[String] =
      if (v.contains(x)) v else v :+ x
    def emit(v: Vector[String], toVals: Seq[String], rawTok: String): Vector[String] =
      toVals.foldLeft(v) { (acc, tv) =>
        val cleaned = clean(tv)
        if (cleaned.nonEmpty) put(acc, cleaned) else put(acc, rawTok)
      }
    tokens.foreach { tok =>
      val key = clean(tok)
      // i18n.py:103-104: empty-after-clean or raw length < 3 → skipped
      // entirely (the token reaches NO output column)
      if (key.nonEmpty && tok.length >= 3) {
        val hit = dict.get(key).orElse {
          val cands = Fuzzy.extractPrepared(key, keys, processedKeys,
            limit = 2, cutoff = fuzzyCutoff)
          if (cands.size > 1 && cands(1)._2 >= fuzzyCutoff)
            ambiguous :+= s"$tok -> ${cands.map(_._1).mkString(" | ")}"
          cands.headOption.map(c => dict(c._1))
        }
        hit match {
          case Some(e) =>
            f = emit(f, Seq(e.hebrew), tok)
            en = emit(en, Seq(e.english), tok)
            ar = emit(ar, Seq(e.arabic), tok)
            // the 'values' column: alias list; an entry WITHOUT aliases
            // contributes nothing to __all (empty loop), like the reference
            all = emit(all, e.values, tok)
          case None =>
            misses :+= tok
            f = put(f, tok); en = put(en, tok); ar = put(ar, tok)
            all = put(all, tok)
        }
      }
    }
    Translated(f, en, ar, all, misses, ambiguous)
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
    // the sorted keys + their fullProcess forms are per-DICT state, not
    // per-row state — compute once and ship with the broadcast
    val keys = dict.keys.toSeq.sorted
    val processedKeys = keys.map(Fuzzy.fullProcess)
    val bc = spark.sparkContext.broadcast((dict, keys, processedKeys))
    val tUdf = udf { raw: String =>
      val (d, ks, pks) = bc.value
      val t = translateValuePrepared(d, ks, pks, raw, delimiter, fuzzyCutoff)
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
