package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sided CUSUM change-point detection over a dense per-key series —
  * the sequential-looking monitor (Page 1954) made pure window algebra.
  * The textbook recursion S⁺_t = max(0, S⁺_{t−1} + (x_t − μ − k)) seems
  * to force a per-key sequential scan, but it has a closed prefix form:
  *
  *   C_t  = Σ_{i≤t} (x_i − μ − k)           (a cumulative sum)
  *   S⁺_t = C_t − min(0, min_{j≤t} C_j)     (minus a running min)
  *
  * so both sides of the detector are two stock window functions over
  * the same (key × bucket) sort — no recursion, no UDF, no driver loop.
  * Complements q138's z-score rate anomaly (pointwise outliers) with
  * the detector that accumulates evidence of a sustained LEVEL SHIFT.
  *
  * Fixed-point discipline: x is an integer count; μ enters as
  * mu16 = (Σx · 2^16) div n and slack as k16 = mu16 div slackDiv, so
  * deviations, prefix sums, running minima, and the alarm compare are
  * all int64 and replay bit-for-bit in a second engine.
  *
  * Scale shape: ONE key-partitioned exchange carries the per-key
  * baseline (full-partition sum/count window), both cumulative sums,
  * and both running minima — Spark plans a single Exchange + Sort with
  * the window stack on top. Feed it a DENSE series
  * ([[TimeSpine.densify]]): skipped empty buckets would silently
  * shrink deviations and stall the detector.
  */
object Cusum {

  /** (keys..., bucket, x, s_pos, s_neg, alarm) — alarm fires when
    * either side exceeds thresholdNum · mu16.
    */
  def twoSided(series: DataFrame, keyCols: Seq[String], bucketCol: String,
      xCol: String, slackDiv: Long = 4, thresholdNum: Long = 4): DataFrame = {
    val keys = keyCols.map(col)
    val wAll = Window.partitionBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRun = Window.partitionBy(keys: _*).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    series
      .withColumn("__tot", sum(col(xCol)).over(wAll))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__mu16", expr(s"(__tot * 65536L) div __n"))
      .withColumn("__k16", expr(s"__mu16 div $slackDiv"))
      .withColumn("__cpos",
        sum(col(xCol) * lit(65536L) - col("__mu16") - col("__k16")).over(wRun))
      .withColumn("__cneg",
        sum(col("__mu16") - col("__k16") - col(xCol) * lit(65536L)).over(wRun))
      .withColumn("s_pos",
        col("__cpos") - least(lit(0L), min(col("__cpos")).over(wRun)))
      .withColumn("s_neg",
        col("__cneg") - least(lit(0L), min(col("__cneg")).over(wRun)))
      .withColumn("alarm",
        (col("s_pos") > lit(thresholdNum) * col("__mu16") ||
          col("s_neg") > lit(thresholdNum) * col("__mu16")).cast("int"))
      .select(keys ++ Seq(col(bucketCol), col(xCol), col("s_pos"),
        col("s_neg"), col("alarm")): _*)
  }

  /** Floor-at-zero running sum — the inventory/credit-balance recursion
    * S_t = max(0, S_{t−1} + Δ_t) (a sale can't take stock below zero;
    * the shortfall is LOST, not borrowed), which is exactly Page's
    * CUSUM recursion with Δ in place of the deviation, so the same
    * closed prefix form applies: S_t = C_t − min(0, min_{j≤t} C_j)
    * with C the plain cumulative sum. One key-partitioned ordered
    * window carries the cumsum AND its running min — stock window
    * algebra, no recursion, no UDF, partitioning-invariant.
    *
    * Also emits `lost` — the cumulative clamped-away shortfall
    * (−min(0, min C)), the business number the clamp hides.
    */
  def clampedRunningSum(df: DataFrame, keyCols: Seq[String],
      orderCol: String, deltaCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val wRun = Window.partitionBy(keys: _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__c", sum(col(deltaCol)).over(wRun))
      .withColumn("__floor", least(lit(0L), min(col("__c")).over(wRun)))
      .withColumn("balance", col("__c") - col("__floor"))
      .withColumn("lost", -col("__floor"))
      .drop("__c", "__floor")
  }
}
