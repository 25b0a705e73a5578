package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** §2.9 `unidecode` transliteration (reference:
  * obsolete/prepare_data_for_es.py:198 uses the unidecode package to
  * ASCII-fold month names). Spark has no builtin; implemented as
  * NFKD-decompose + strip combining marks + fold tables for the
  * characters NFKD leaves behind. Covers the Latin surface plus the
  * HEBREW consonants the reference's corpus is actually written in —
  * letter-for-letter the same romanization python-unidecode emits
  * (its x005 table), so goldens agree: שלום → SHlvm. Niqqud points are
  * combining marks and vanish with the NFKD strip.
  */
object Unidecode {

  private val folds: Map[Char, String] = Map(
    'æ' -> "ae", 'Æ' -> "AE", 'ø' -> "o", 'Ø' -> "O", 'đ' -> "d", 'Đ' -> "D",
    'ß' -> "ss", 'þ' -> "th", 'Þ' -> "Th", 'ð' -> "d", 'Ð' -> "D",
    'ł' -> "l", 'Ł' -> "L", 'œ' -> "oe", 'Œ' -> "OE", '’' -> "'", '‘' -> "'",
    '“' -> "\"", '”' -> "\"", '–' -> "-", '—' -> "-", '×' -> "x") ++ hebrew

  /** U+05D0–U+05EA + punctuation/ligatures, python-unidecode's values:
    * finals fold to their base letter, ayin to a backtick, shin/chet/
    * tsadi to digraphs.
    */
  private lazy val hebrew: Map[Char, String] = Map(
    'א' -> "A", 'ב' -> "b", 'ג' -> "g", 'ד' -> "d", 'ה' -> "h",
    'ו' -> "v", 'ז' -> "z", 'ח' -> "KH", 'ט' -> "t", 'י' -> "y",
    'ך' -> "k", 'כ' -> "k", 'ל' -> "l", 'ם' -> "m", 'מ' -> "m",
    'ן' -> "n", 'נ' -> "n", 'ס' -> "s", 'ע' -> "`", 'ף' -> "p",
    'פ' -> "p", 'ץ' -> "TS", 'צ' -> "TS", 'ק' -> "q", 'ר' -> "r",
    'ש' -> "SH", 'ת' -> "t",
    '־' -> "-",            // maqaf
    '׳' -> "'", '״' -> "\"", // geresh, gershayim
    'װ' -> "vv", 'ױ' -> "vy", 'ײ' -> "yy")

  def transliterate(s: String): String = {
    if (s == null) return null
    val folded = s.flatMap(c => folds.getOrElse(c, c.toString))
    val nfkd = java.text.Normalizer.normalize(folded, java.text.Normalizer.Form.NFKD)
    nfkd.filter(c => Character.getType(c) != Character.NON_SPACING_MARK)
  }

  private val udfImpl = udf(transliterate _)

  def unidecode(c: Column): Column = udfImpl(c)
}
