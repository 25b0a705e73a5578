package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — THE operational chore of any
  * long-running lake: group many undersized files into target-size
  * rewrite bins. This is the PLANNER (pure metadata: it assigns, a
  * rewrite job executes); the assignment rule is virtual-concatenation
  * splitting, a.k.a. next-fit-decreasing: order files by (size desc,
  * id), lay them end to end, and cut every `target` bytes — a file's
  * bin is the bin its START offset falls in.
  *
  * Why this rule and not first-fit-decreasing: FFD's "first bin that
  * still fits" scans mutable bin state — inherently sequential,
  * order-dependent, and un-replayable; the offset rule is a closed-form
  * function of the sorted prefix sum, so it is partitioning-invariant,
  * one window expression, and a second engine replays it bit-for-bit.
  * Decreasing order keeps big files at bin starts, so overshoot per bin
  * is bounded by its SMALLEST straddling file.
  *
  * Scale shape: file METADATA relations are tiny relative to data (one
  * row per file), and the windows are per `keyCols` (table/partition) —
  * plan the lake one partition at a time, never as one global sort.
  */
object Compaction {

  /** @return input columns + (bin, bin_offset) per file; `bin` counts
    *         from 0 within each key group
    */
  def planBins(files: DataFrame, keyCols: Seq[String], idCol: String,
      sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*)
      .orderBy(col(sizeCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files
      .withColumn("__start", sum(col(sizeCol)).over(w) - col(sizeCol))
      .withColumn("bin", expr(s"__start div ${targetBytes}L"))
      .withColumn("bin_offset", expr(s"__start % ${targetBytes}L"))
      .drop("__start")
  }
}
