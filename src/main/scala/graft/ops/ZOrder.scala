package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order clustering layout — multi-dimensional data skipping for the
  * 100 TB path.
  *
  * A table sorted by one column prunes scans on that column only; a
  * table sorted by the Morton interleave of two columns keeps BOTH
  * dimensions compact inside every output file, so parquet footer
  * min/max stats prune on either predicate. This is the same layout
  * trick Delta/Iceberg `OPTIMIZE ZORDER BY` applies, expressed with
  * stock Spark: one narrow codegen'd key expression
  * ([[graft.functions.ZOrderExprs.morton2]]) + `repartitionByRange` +
  * `sortWithinPartitions` — a single range shuffle, no driver loops.
  */
object ZOrder {

  /** Morton code of two integral columns (low 32 bits each). */
  def zValue(a: Column, b: Column): Column =
    graft.functions.ZOrderExprs.morton2(a.cast(LongType), b.cast(LongType))

  /** Re-cluster `df` on the z-curve of (a, b): range-partition by the
    * Morton key into `numFiles` slices and sort inside each. Every
    * output partition covers a compact square-ish region of the (a, b)
    * plane — write the result and row-group stats prune on either column.
    */
  def cluster(df: DataFrame, a: String, b: String, numFiles: Int): DataFrame =
    df.withColumn("__z", zValue(col(a), col(b)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  /** Z-order and write as parquet: file-level min/max of BOTH key
    * columns stay tight, so downstream scans skip files on either
    * predicate.
    */
  def writeZOrdered(df: DataFrame, path: String, a: String, b: String,
      numFiles: Int): Unit =
    cluster(df, a, b, numFiles).write.mode("overwrite").parquet(path)
}
