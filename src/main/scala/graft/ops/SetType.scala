package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** P6 `set_type` — locale-tolerant cast with a per-cell error policy
  * (reference: datasets.py:312-316,345,404; judges.py:135;
  * publications.py:121-124). dataflows casts are forgiving: strip thousands
  * separators (`groupChar`), tolerate stray text around the number
  * (`bareNumber=false`), strip `%`, and on failure either raise, null the
  * cell, or substitute a constant (`clear_to_2020` at datasets.py:312-316).
  *
  * Re-expressed as pure Column expressions (`regexp_replace` + `try_cast`)
  * so the cast stays codegen'd and the error policy is a `coalesce`, never
  * a driver-side loop.
  */
object SetType {

  sealed trait OnError
  /** Propagate nulls for unparsable cells (dataflows' on_error=ignore-ish). */
  case object Nullify extends OnError
  /** Substitute a constant (reference clear_to_2020, datasets.py:312-316). */
  final case class Default(value: Column) extends OnError
  /** Fail the job on first unparsable cell (dataflows default: raise). */
  case object Raise extends OnError

  /** Clean a numeric string per dataflows semantics, then try-cast. */
  def cleanNumber(
      c: Column,
      groupChar: String = ",",
      stripPercent: Boolean = true,
      bareNumber: Boolean = true): Column = {
    var s = trim(c.cast(StringType))
    if (groupChar.nonEmpty)
      s = regexp_replace(s, java.util.regex.Pattern.quote(groupChar), "")
    if (stripPercent) s = regexp_replace(s, "%", "")
    if (!bareNumber)
      // bareNumber=false: extract the first numeric token out of stray text
      s = nullif(regexp_extract(s, "(-?[0-9]+(?:\\.[0-9]+)?)", 1), lit(""))
    s
  }

  /** Cast `field` to `to` with the given numeric cleaning + error policy. */
  def setType(
      df: DataFrame,
      field: String,
      to: DataType,
      groupChar: String = ",",
      stripPercent: Boolean = false,
      bareNumber: Boolean = true,
      onError: OnError = Raise): DataFrame = {
    val raw = col(field)
    val cleaned = to match {
      case _: NumericType => cleanNumber(raw, groupChar, stripPercent, bareNumber)
      case _              => raw
    }
    val tried = try_cast(cleaned, to)
    val out = onError match {
      case Nullify        => tried
      case Default(value) => when(raw.isNotNull, coalesce(tried, value)).otherwise(tried)
      case Raise          =>
        // ANSI-style: make failures loud without a separate pass — raise
        // inside the expression when the source was non-null but uncastable.
        when(raw.isNotNull && tried.isNull,
          raise_error(concat(lit(s"set_type($field): cannot cast value "), raw.cast(StringType))))
          .otherwise(tried)
    }
    df.withColumn(field, out)
  }

  private def try_cast(c: Column, to: DataType): Column = c.try_cast(to)
}
