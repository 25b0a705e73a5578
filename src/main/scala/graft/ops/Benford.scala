package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Benford's-law first-digit audit — the forensic-accounting screen
  * (Nigrini's fraud test; also a fine synthetic-data detector):
  * naturally-grown multiplicative quantities put digit d first with
  * probability log10(1 + 1/d); fabricated or uniformly-generated
  * numbers don't. Reported per key as the total-variation distance
  * between the observed first-digit distribution and Benford's, plus
  * the single worst digit.
  *
  * Everything integer-exact: the first digit by decimal string head
  * (both engines render a BIGINT identically), observed shares as
  * 2^30 floors over the positive-value count, expected shares as the
  * NINE shared literal constants ⌊log10(1+1/d)·2^30⌋ (the same values
  * any replaying engine embeds — no runtime log), deviations as plain
  * |obs − exp| sums. Non-positive values are excluded by definition
  * (they have no Benford first digit) but counted in `n_skipped`.
  *
  * Scale shape: ONE map-side-combined (key, digit) count; the 9-row
  * digit spine joins on the ≤ 9·|keys| relation; the final per-key
  * rollup combines map-side. The corpus is touched exactly once.
  */
object Benford {

  /** ⌊log10(1 + 1/d)·2^30⌋ for d = 1..9. */
  val ExpFix: Seq[Long] = Seq(323228496L, 189076549L, 134151946L,
    104056334L, 85020215L, 71883568L, 62268378L, 54924602L, 49131731L)

  /** @return (keyCol, n, n_skipped, tvd_fix, worst_digit,
    *         worst_dev_fix) — tvd_fix = Σ_d |obs_d − exp_d| (2^30);
    *         worst digit ties break low. EVERY key of the input appears:
    *         a key whose values are all non-positive (no Benford first
    *         digit exists) reports n=0 with its n_skipped count and NULL
    *         tvd/worst columns — an all-zero column must surface in the
    *         audit, not silently escape it (advisor finding, round 8).
    */
  def firstDigit(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val vals = df.select(col(keyCol).as("__k"), col(valCol).cast("long").as("__v"))
    val counts = vals.filter(col("__v") > 0)
      .withColumn("__d", substring(col("__v").cast("string"), 1, 1).cast("int"))
      .groupBy("__k", "__d").agg(count(lit(1)).as("__c"))
    val skipped = vals.groupBy("__k")
      .agg(sum(when(col("__v") <= 0, 1L).otherwise(0L)).as("n_skipped"))
    val spine = counts.select("__k").distinct()
      .crossJoin(broadcast(
        counts.sparkSession.range(1, 10).select(col("id").cast("int").as("__d"))))
    val expCase = ExpFix.zipWithIndex
      .map { case (v, i) => s"WHEN ${i + 1} THEN ${v}L" }.mkString(" ")
    val dev = spine
      .join(counts, Seq("__k", "__d"), "left").na.fill(0L, Seq("__c"))
      .withColumn("__n", sum("__c").over(
        org.apache.spark.sql.expressions.Window.partitionBy("__k")))
      .withColumn("__obs",
        expr(s"(CAST(__c AS DECIMAL(38,0)) * ${1L << 30}) div __n"))
      .withColumn("__dev", abs(col("__obs") - expr(s"CASE __d $expCase END")))
    val stats = dev.groupBy("__k")
      .agg(max("__n").as("n"), sum("__dev").as("tvd_fix"),
        min(struct((-col("__dev")).as("negdev"), col("__d").as("d")))
          .as("__worst"))
    // key spine = skipped (one row per INPUT key, ≤|keys| — the same
    // map-side-combined pass that counts n_skipped), so all-non-positive
    // keys survive the left join with NULL stats rather than vanishing
    skipped.join(stats, Seq("__k"), "left").na.fill(0L, Seq("n"))
      .select(col("__k").as(keyCol), col("n"), col("n_skipped"),
        col("tvd_fix").cast("long").as("tvd_fix"),
        col("__worst.d").as("worst_digit"),
        (-col("__worst.negdev")).cast("long").as("worst_dev_fix"))
  }
}
