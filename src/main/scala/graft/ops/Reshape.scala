package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reshaping: unpivot / explode / nested construction (SURVEY.md §2.3). */
object Reshape {

  /** R1 `unpivot(regex_cols, key_fields, value_field)` — melt wide → long:
    * every column whose NAME matches `colRegex` becomes one output row; the
    * regex's first capture group applied to the column NAME becomes the key
    * value (reference: datasets.py:323-334 melts year columns, capture
    * group = the year inside the header).
    *
    * Spark's native `unpivot` keeps the raw column name as the key; the
    * capture-group semantic is applied afterwards via a tiny literal map
    * (column-name → captured key) — n(columns) entries, folded by Catalyst.
    */
  def unpivotRegex(
      df: DataFrame,
      colRegex: String,
      keyField: String,
      valueField: String): DataFrame = {
    val re = colRegex.r
    val matched: Seq[(String, String)] = df.columns.toSeq.flatMap { c =>
      re.findFirstMatchIn(c).map { m =>
        c -> (if (m.groupCount >= 1 && m.group(1) != null) m.group(1) else c)
      }
    }
    require(matched.nonEmpty, s"unpivotRegex: no columns match $colRegex")
    val ids = df.columns.filterNot(matched.map(_._1).toSet)
    val up = df.unpivot(
      ids.map(col),
      matched.map { case (c, _) => col(c) }.toArray,
      keyField,
      valueField)
    val keyMap = map(matched.flatMap { case (c, k) => Seq(lit(c), lit(k)) }: _*)
    up.withColumn(keyField, element_at(keyMap, col(keyField)))
  }

  /** R2 nested zip: parallel `xs`/`ys` arrays → array of {x, y, q} structs,
    * q = x ∈ flags, keeping only entries with a non-null y (reference:
    * datasets.py:378-389 zips years/values into chart points, q marks
    * extrapolated years, non-Decimal y dropped).
    */
  def zipToPoints(xs: Column, ys: Column, flags: Column): Column =
    filter(
      zip_with(xs, ys, (x, y) =>
        struct(x.as("x"), y.as("y"), coalesce(array_contains(flags, x), lit(false)).as("q"))),
      p => p.getField("y").isNotNull)

  /** R4 unwind: one output row per distinct element of `arrayCol`, global
    * first-wins dedup (reference: broken_links.py:34-43 — a URL already
    * emitted by ANY earlier row is skipped).
    */
  def unwindDistinct(df: DataFrame, arrayCol: String, out: String): DataFrame =
    df.withColumn(out, explode(col(arrayCol)))
      .drop(arrayCol)
      .dropDuplicates(out)

  /** R4, full-row form (reference broken_links.py:34-43 exactly): each
    * row fans out to one row per DISTINCT element of its array with every
    * other column preserved, and an element already emitted by an earlier
    * row (arrival order) is dropped corpus-wide — the first row to carry
    * a URL owns it. Survivor election is a per-element window (row_number
    * over the stamped arrival order), so the shuffle keys on the element
    * value and distributes — no global window, scale-safe.
    */
  def unwindFirstSeen(df: DataFrame, arrayCol: String, out: String,
      ordCol: String = Ordering.ORD): DataFrame = {
    val stamped = df.columns.contains(ordCol)
    val base = if (stamped) df else Ordering.stampOrder(df)
    val exploded = base
      .withColumn(out, explode(array_distinct(col(arrayCol))))
      .drop(arrayCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(out)).orderBy(col(ordCol))
    val won = exploded.withColumn("__unwind_rn", row_number().over(w))
      .filter(col("__unwind_rn") === 1).drop("__unwind_rn")
    if (stamped) won else won.drop(ordCol)
  }

  /** R5 URL harvesting: regex-findall over the entire row rendered as one
    * string → `urls` array (reference: broken_links.py:99, regex at
    * broken_links.py:7-8).
    */
  // parenthesized: regexp_extract_all extracts group 1, not the whole match
  private val UrlRe = "(https?://[^\\s\"'<>,;]+)"
  def harvestUrls(df: DataFrame, out: String = "urls"): DataFrame =
    df.withColumn(out, regexp_extract_all(to_json(struct(df.columns.map(col): _*)), lit(UrlRe)))

  /** S5 sheet transpose: records arrive as COLUMNS — column 0 = header
    * names, each later column = one record (reference: datasets.py:86-104).
    * Not relational: collect the (hand-edited, ≤ hundreds of cells) sheet
    * to the driver, transpose, recreate. Deliberately driver-side — the
    * reference semantics force it and inputs are tiny by construction.
    */
  def transposeSheet(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rows = df.collect().map(_.toSeq.map(v => if (v == null) null else v.toString))
    require(rows.nonEmpty, "transposeSheet: empty sheet")
    val headers = rows.map(_.head)
    val nRecords = if (rows.isEmpty) 0 else rows.map(_.length).max - 1
    // stop at the first all-empty column (datasets.py:99-102)
    val records = (1 to nRecords).iterator
      .map(i => rows.map(r => if (i < r.length) r(i) else null))
      .takeWhile(rec => rec.exists(v => v != null && v.nonEmpty))
      .toSeq
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val schema = StructType(headers.map(h => StructField(h, StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(records.map(org.apache.spark.sql.Row.fromSeq(_)), 1),
      schema)
  }
}
