package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** ISO 13616 IBAN mod-97 validation — the PRECISION tier for financial
  * identifiers in PII scrubbing, next to [[graft.text.Scrub]]'s Luhn
  * gate (q190) for cards: a 15–34 char run that matches an IBAN regex
  * but fails the ISO 7064 mod-97-10 proof is an invoice number, not an
  * account — redacting it is a recall-without-precision bug, and at
  * 100 TB the false-positive mass of a regex-only scrubber is
  * enormous.
  *
  * Exactness: the standard's "big number mod 97" is computed by
  * CASTING the transliterated digit string into DECIMAL(38,0) — an
  * IBAN is ≤ 34 chars and transliterates to ≤ 36 digits (each letter
  * becomes two), so the full rearranged number fits 38 digits exactly
  * and `%` is the same integer on any engine (DuckDB: HUGEINT). No
  * chunked-fold loop, no floating point, no UDF.
  *
  * Scale shape: a pure narrow codegen'd projection (string slice +
  * transform + decimal modulo) — zero shuffles, scan throughput, same
  * plan at any corpus size.
  */
object Iban {

  /** Letters → "10".."35", digits pass through; non-alphanumerics
    * yield NULL downstream via the decimal cast (→ invalid). Input
    * must be upper-case. */
  private def transliterate(s: Column): Column =
    array_join(
      transform(filter(split(upper(s), ""), c => c =!= ""),
        c => when(c >= "A" && c <= "Z", (ascii(c) - 55).cast("string"))
          .otherwise(c)),
      "")

  /** ISO 7064 residue of an already-rearranged (BBAN ++ country ++
    * check) character string; 1 = valid. NULL when any char is not
    * [0-9A-Za-z] — an explicit digits-only guard, so ANSI mode never
    * throws on a malformed candidate and a bad charset can never read
    * as valid. */
  def mod97(rearranged: Column): Column = {
    val digits = transliterate(rearranged)
    (when(digits.rlike("^[0-9]{1,38}$"), digits.cast(DecimalType(38, 0)))
      % 97).cast("long")
  }

  /** Full-IBAN validity: move the leading 4 chars (country + check) to
    * the back, transliterate, residue must equal 1. */
  def isValid(iban: Column): Column = {
    val rearranged = concat(iban.substr(lit(5), length(iban)),
      substring(iban, 1, 4))
    mod97(rearranged) === 1
  }
}
