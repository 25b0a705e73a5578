package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weight-of-Evidence / Information-Value feature scoring — the credit-
  * risk binning diagnostic (how well does a binned feature separate a
  * binary outcome?):
  *
  *   WOE_i = ln( (good_i/G) / (bad_i/B) )
  *   IV    = Σ_i (good_i/G − bad_i/B) · WOE_i
  *
  * in the repo's fixed-point discipline. Counts take +1 Laplace
  * smoothing (zero cells are routine in sparse bins; the smoothing is
  * part of the spec, not a hidden epsilon), shares become 2^30-scaled
  * integers rg/rb via floored division (clamped ≥ 1 — at > 2^30 rows a
  * share can floor to 0), the log runs through the square-and-shift
  * kernel on the smaller/larger ratio with an explicit sign, and each
  * IV contribution is (rg − rb)·woe_fix div 2^16. Every value an int64
  * a second engine replays.
  *
  * Scale shape: ONE map-side-combined (bin → good/bad counts)
  * aggregation; everything after runs on the ≤|bins| relation, whose
  * unpartitioned total windows are deliberate (bins are a feature's
  * cardinality, small by contract — high-cardinality features get
  * bucketed before scoring, which is what binning IS).
  */
object Woe {

  /** (binCol, n_good, n_bad, woe_fix, iv_fix): woe_fix 2^16-scaled,
    * iv_fix 2^30-scaled per-bin contribution (sum for the feature's IV).
    * `labelCol` is 1 for the "bad" outcome, 0 for "good".
    */
  def binsWoe(df: DataFrame, binCol: String, labelCol: String): DataFrame = {
    val wAll = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    df.groupBy(binCol)
      .agg(sum(when(col(labelCol) === 0, 1L).otherwise(0L)).as("n_good"),
        sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("n_bad"))
      .withColumn("__g1", col("n_good") + 1L)
      .withColumn("__b1", col("n_bad") + 1L)
      .withColumn("__gt", sum("__g1").over(wAll))
      .withColumn("__bt", sum("__b1").over(wAll))
      .withColumn("__rg", greatest(lit(1L),
        expr(s"(__g1 * ${1L << 30}L) div __gt")))
      .withColumn("__rb", greatest(lit(1L),
        expr(s"(__b1 * ${1L << 30}L) div __bt")))
      .withColumn("__q", when(col("__rg") <= col("__rb"),
          expr(s"(__rg * ${1L << 30}L) div __rb"))
        .otherwise(expr(s"(__rb * ${1L << 30}L) div __rg")))
      .withColumn("__bits",
        -graft.functions.FixedLogExprs.log2fix(col("__q"), 30, 16))
      .withColumn("woe_fix",
        when(col("__rg") <= col("__rb"), lit(-1L)).otherwise(lit(1L)) *
          expr("(__bits * 45426L) div 65536"))
      .withColumn("iv_fix", expr("((__rg - __rb) * woe_fix) div 65536"))
      .select(col(binCol), col("n_good"), col("n_bad"), col("woe_fix"),
        col("iv_fix"))
  }
}
