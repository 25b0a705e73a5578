package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group ordinary-least-squares trend — the "is this metric going
  * up?" primitive (daily revenue slope per segment, tokens-per-crawl
  * drift, throughput regression): closed-form simple regression on
  * integer (x, y) points, computed from the five classic
  * map-side-combinable sums (n, Σx, Σy, Σxy, Σx²[, Σy²]) so a group's
  * points NEVER need to be co-located or sorted — one aggregation
  * exchange, then narrow arithmetic on the per-group relation.
  *
  *   slope     = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
  *   intercept = (Σy·Σx² − Σx·Σxy) / (same denominator)
  *   r²        = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))
  *
  * Fixed-point discipline: all sums in DECIMAL(38,0) (Σy² overflows
  * int64 at real magnitudes — pre-scale y if it exceeds ~10⁹ so the
  * squared covariance stays inside 38 digits); slope/intercept as
  * 2^16 floors with the SIGN SPLIT OFF FIRST (truncating `div` and a
  * flooring `//` disagree on negatives — every floor here runs on
  * non-negative operands); r² as a 2^30 floor, NULL when x or y is
  * constant (no line / no variance to explain).
  *
  * X is re-based to the per-group minimum before the sums (one extra
  * pre-aggregation per group, still map-side combinable via min):
  * keeps Σx² small and makes the intercept "value at the group's first
  * x" — the useful anchor — rather than at a far-away global zero.
  */
object Ols {

  /** @return (keyCol, n, slope_fix 2^16, intercept_fix 2^16, r2_fix
    *         2^30) — slope/intercept NULL when all x equal, r² NULL
    *         when x or y is constant
    */
  def groupTrend(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val pts = df.select(col(keyCol).as("__k"),
      col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    val based = pts
      .join(pts.groupBy("__k").agg(min("__x").as("__x0")), Seq("__k"))
      .select(col("__k"), (col("__x") - col("__x0")).cast(d38).as("x"),
        col("__y").cast(d38).as("y"))
    val sums = based.groupBy("__k").agg(
      count(lit(1)).cast(d38).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    sums
      .withColumn("__cov", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("__vx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("__vy", col("n") * col("syy") - col("sy") * col("sy"))
      .withColumn("__inum",
        col("sy") * col("sxx") - col("sx") * col("sxy"))
      .withColumn("slope_fix", expr(
        s"""CASE WHEN __vx = 0 THEN NULL ELSE
           |  (CASE WHEN __cov < 0 THEN -1 ELSE 1 END)
           |    * ((abs(__cov) * ${1L << 16}) div __vx) END""".stripMargin))
      .withColumn("intercept_fix", expr(
        s"""CASE WHEN __vx = 0 THEN NULL ELSE
           |  (CASE WHEN __inum < 0 THEN -1 ELSE 1 END)
           |    * ((abs(__inum) * ${1L << 16}) div __vx) END""".stripMargin))
      // two-stage 2^15 floors: cov²·2^30 would overflow DECIMAL(38,0)
      // (and HUGEINT) at real magnitudes; the staged form never squares
      // the covariance and both engines floor identically
      .withColumn("r2_fix", expr(
        s"""CASE WHEN __vx = 0 OR __vy = 0 THEN NULL ELSE
           |  ((abs(__cov) * ${1L << 15}) div __vx)
           |    * ((abs(__cov) * ${1L << 15}) div __vy) END""".stripMargin))
      .select(col("__k").as(keyCol), col("n").cast("long").as("n"),
        col("slope_fix").cast("long"), col("intercept_fix").cast("long"),
        col("r2_fix").cast("long"))
  }
}
