package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** §2.9 `unidecode` transliteration (reference:
  * obsolete/prepare_data_for_es.py:198 uses the unidecode package to
  * ASCII-fold month names). Spark has no builtin; implemented as
  * NFKD-decompose + strip combining marks + a small fold table for the
  * characters NFKD leaves behind. Covers the Latin-script surface the
  * reference actually transliterates.
  */
object Unidecode {

  private val folds: Map[Char, String] = Map(
    'æ' -> "ae", 'Æ' -> "AE", 'ø' -> "o", 'Ø' -> "O", 'đ' -> "d", 'Đ' -> "D",
    'ß' -> "ss", 'þ' -> "th", 'Þ' -> "Th", 'ð' -> "d", 'Ð' -> "D",
    'ł' -> "l", 'Ł' -> "L", 'œ' -> "oe", 'Œ' -> "OE", '’' -> "'", '‘' -> "'",
    '“' -> "\"", '”' -> "\"", '–' -> "-", '—' -> "-", '×' -> "x")

  def transliterate(s: String): String = {
    if (s == null) return null
    val folded = s.flatMap(c => folds.getOrElse(c, c.toString))
    val nfkd = java.text.Normalizer.normalize(folded, java.text.Normalizer.Form.NFKD)
    nfkd.filter(c => Character.getType(c) != Character.NON_SPACING_MARK)
  }

  private val udfImpl = udf(transliterate _)

  def unidecode(c: Column): Column = udfImpl(c)
}
