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
  * Exactness: the standard's "big number mod 97" is computed on
  * DECIMAL(38,0) integers — but an IBAN is ≤ 34 chars and EVERY
  * letter transliterates to two digits, so a letter-heavy BBAN (Malta,
  * Guatemala, …) can reach 68 digits and overflow any fixed decimal.
  * The residue therefore folds in two halves per ISO 7064:
  * `N mod 97 = ((hi mod 97) · (10³⁶ mod 97) + lo mod 97) mod 97` with
  * `lo` the last 36 digits, `hi` the ≤ 32-digit prefix, and
  * `10³⁶ mod 97 = 64` a compile-time constant — both halves fit
  * DECIMAL(38,0)/HUGEINT exactly, so `%` is the same integer on any
  * engine. (Round-9 advisor: the old single-cast path returned NULL
  * for structurally valid IBANs with ≥ 5 BBAN letters — a genuine
  * account escaped redaction.) No floating point, no UDF.
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
    val n = length(digits)
    // ≤ 36 digits: one exact cast. Longer (letter-heavy BBANs, up to 68
    // digits for a 34-char IBAN): fold the ≤ 32-digit prefix over the
    // last 36 with 10^36 ≡ 64 (mod 97). 72 = guard headroom; both
    // halves stay within DECIMAL(38,0).
    val whole = digits.cast(DecimalType(38, 0)) % 97
    val hi = digits.substr(lit(1), n - 36).cast(DecimalType(38, 0)) % 97
    val lo = digits.substr(n - lit(35), lit(36)).cast(DecimalType(38, 0)) % 97
    val folded = (hi * 64 + lo) % 97
    when(digits.rlike("^[0-9]{1,72}$"),
      when(n <= 36, whole).otherwise(folded)).cast("long")
  }

  /** Full-IBAN validity: move the leading 4 chars (country + check) to
    * the back, transliterate, residue must equal 1. */
  def isValid(iban: Column): Column = {
    val rearranged = concat(iban.substr(lit(5), length(iban)),
      substring(iban, 1, 4))
    mod97(rearranged) === 1
  }
}
