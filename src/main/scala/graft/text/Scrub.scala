package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus scrubbing + composition operators for training-data pipelines:
  * PII redaction, repetition signals (Gopher-style), and deterministic
  * hash sampling for domain mixing. All pure Column expressions.
  */
object Scrub {

  // ---- PII redaction ---------------------------------------------------

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9()\\-\\s]{7,}[0-9]"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Replace emails/phones/IPs with typed placeholder tokens. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Count of PII hits per kind (for filtering thresholds). */
  def piiCounts(text: Column): Column = struct(
    size(regexp_extract_all(text, lit(EmailRe), lit(0))).as("emails"),
    size(regexp_extract_all(text, lit(PhoneRe), lit(0))).as("phones"),
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0))).as("ips"))

  // ---- repetition signals (Gopher/C4 quality filters) ------------------

  /** Fraction of lines that are duplicates of an earlier line. */
  def duplicateLineFraction(text: Column): Column = {
    val lines = filter(split(text, "\\n"), l => length(trim(l)) > 0)
    val nLines = size(lines)
    when(nLines > 0,
      (nLines - size(array_distinct(lines))).cast(DoubleType) / nLines)
      .otherwise(lit(0.0))
  }

  /** Fraction of tokens belonging to the single most frequent token —
    * high values mark degenerate/repetitive text. Native one-pass hashmap
    * kernel: the builtin `transform(array_distinct, …filter…)` form is
    * O(distinct × n) per doc — quadratic precisely on the repetitive
    * documents this scorer exists to flag.
    */
  def topTokenFraction(text: Column): Column =
    graft.functions.HashExprs.topTokenFraction(text)

  /** Character-level compression proxy: distinct 4-gram hash count over
    * total 4-gram count; low ratio = highly repetitive text. Uses the
    * native one-pass ShingleHash64 (distinct) vs length arithmetic.
    */
  def distinctNgramRatio(text: Column, n: Int = 4): Column = {
    val norm = regexp_replace(lower(text), "\\s+", " ")
    val total = greatest(length(norm) - (n - 1), lit(1))
    size(graft.functions.HashExprs.shingleHash64(norm, n)).cast(DoubleType) /
      total.cast(DoubleType)
  }

  // ---- deterministic sampling / domain mixing --------------------------

  /** Stable per-row sampling decision: first 8 hex chars of md5(key) as a
    * uniform draw in [0, 2^32). Deterministic across engines AND runs —
    * DuckDB mirrors it exactly, unlike hash()/rand().
    */
  def hashDraw(key: Column): Column =
    conv(substring(md5(key.cast(StringType)), 1, 8), 16, 10).cast(LongType)

  /** Keep ~`rate` of rows, keyed on `key` (stable across runs). */
  def sampleByHash(df: DataFrame, key: String, rate: Double): DataFrame =
    df.filter(hashDraw(col(key)) < lit((rate * 4294967296.0).toLong))

  /** Domain mixing: per-source sampling rates (source → keep rate),
    * unknown sources keep everything. One narrow filter, no shuffle.
    */
  def mixBySource(df: DataFrame, sourceCol: String, key: String,
      rates: Map[String, Double]): DataFrame = {
    val rateExpr = rates.foldLeft(lit(1.0)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, lit(r)).otherwise(acc)
    }
    df.filter(hashDraw(col(key)) <
      (rateExpr * lit(4294967296.0)).cast(LongType))
  }

  /** Cap every stratum (domain/source/language) at `cap` docs, picking a
    * DETERMINISTIC uniform subset per key: rows rank by md5(id) — a
    * stable shuffle-independent draw (same survivors on every run and
    * engine), not "first N encountered", which at scale means "whatever
    * file order the scan happened to produce".
    *
    * Rides the TopKPerKey physical operator: map-side bounded heaps of
    * `cap` rows per key combine before the key shuffle, so a stratum
    * with 10⁹ rows moves `cap × partitions` rows, not 10⁹ — the Window
    * row_number() formulation would shuffle and fully sort every
    * stratum.
    */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String,
      cap: Int): DataFrame = {
    import graft.plans.TopKPerKey
    val drawn = df.withColumn("__draw",
      md5(col(idCol).cast(StringType)))
    TopKPerKey.topK(drawn, Seq(keyCol),
        Seq(TopKPerKey.Sort("__draw"), TopKPerKey.Sort(idCol)), cap)
      .drop("__draw")
  }
}
