package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordering discipline (SURVEY.md §7 hard part 1).
  *
  * The reference streams rows in file order and three behaviors depend on
  * it: forward-fill (datasets.py:303-309), order_index assignment
  * (datasets.py:340-341) and first-come dedup suffixing
  * (organisations.py:44-52). Spark DataFrames are unordered, so every
  * loader stamps a stable `__ord` column at the source and all
  * order-sensitive ops key on it explicitly.
  *
  * Scale note: `monotonically_increasing_id` is partition-local + offset —
  * stable within a file scan and computed without any shuffle. Global
  * `row_number` over an unpartitioned window IS a single-task bottleneck;
  * at 100 TB it must only ever run on already-reduced data (the reference's
  * order-sensitive tables are hand-edited sheets, ≤ thousands of rows) —
  * the partitioned variants below are the scale path.
  */
object Ordering {

  val ORD = "__ord"

  /** Stamp arrival order at the source. Monotonic per partition and across
    * partitions in partition-index order → reproduces file order for
    * ordered sources without any shuffle or driver pass.
    */
  def stampOrder(df: DataFrame): DataFrame =
    df.withColumn(ORD, monotonically_increasing_id())

  /** W2 global row numbering (reference: datasets.py:340-341 `order_index`).
    * Uses the stamped `__ord` so the window sort is deterministic.
    * Single-partition window — only for already-small data.
    */
  def orderIndex(df: DataFrame, out: String = "order_index", ordCol: String = ORD): DataFrame =
    df.withColumn(out, row_number().over(Window.orderBy(col(ordCol))).cast("long"))

  /** W3 per-key occurrence numbering — the scale-safe form: partitions by
    * key so the shuffle distributes; used by dedup suffixing.
    */
  def occurrenceIndex(df: DataFrame, key: Seq[String], out: String, ordCol: String = ORD): DataFrame =
    df.withColumn(out,
      row_number().over(Window.partitionBy(key.map(col): _*).orderBy(col(ordCol))))

  /** A2 dedup with suffix: repeated `key` values get `.1`, `.2`, … appended
    * in arrival order (reference: organisations.py:44-52 on doc_id).
    */
  def dedupSuffix(df: DataFrame, key: String, ordCol: String = ORD): DataFrame = {
    val occ = "__occ"
    occurrenceIndex(df, Seq(key), occ, ordCol)
      .withColumn(key,
        when(col(occ) > 1, concat(col(key), lit("."), (col(occ) - 1).cast("string")))
          .otherwise(col(key)))
      .drop(occ)
  }

  /** W1 forward-fill the previous non-null value in arrival order
    * (reference: datasets.py:303-309 fills chart_title). `partitionBy`
    * optional: reference scale is one partition; at scale fill within a
    * natural key (e.g. per sheet).
    */
  def forwardFill(
      df: DataFrame,
      field: String,
      ordCol: String = ORD,
      partitionBy: Seq[String] = Nil): DataFrame = {
    val w0 =
      if (partitionBy.isEmpty) Window.orderBy(col(ordCol))
      else Window.partitionBy(partitionBy.map(col): _*).orderBy(col(ordCol))
    val w = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(field, last(col(field), ignoreNulls = true).over(w))
  }
}
