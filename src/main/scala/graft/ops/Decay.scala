package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.FixedLogExprs

/** Exponentially time-decayed counting — the recency-weighted score
  * behind trending/engagement/leaderboard features: each event is
  * worth 2^(−age/halfLife), so yesterday's burst outweighs last
  * month's grind and a dead key decays to zero without ever being
  * visited again (evaluate-at-read: no scheduled rescale jobs).
  *
  * Float-free by the repo's log/exp discipline: the per-event weight
  * is `pow2NegFix(y)` — the exact bit-factor binary exponential
  * (2^31-scaled), the same 16 constants the SQL mirrors carry — with
  * the exponent assembled overflow-safely at microsecond resolution:
  *
  *   y = min(age div H, 63)·2^16  +  ((age mod H)·2^16) div H
  *
  * (a naive `age·2^16` overflows int64 at ~4 days of nanosecond age;
  * the split form is exact because the integer part is whole
  * half-lives and the kernel zeroes everything past 63 of them). The
  * per-key score is then a plain integer SUM of weights.
  *
  * Scale shape: the weight is a narrow codegen'd projection (no
  * shuffle); the score is ONE map-side-combined per-key aggregation —
  * exactly a wordcount. Mergeable across partitions and across runs:
  * scores at a common reference time ADD, and re-referencing moves
  * every score by the same 2^(−Δ/halfLife) factor. The reference time
  * is the corpus max timestamp (deterministic), broadcast as a 1-row
  * relation.
  */
object Decay {

  /** Max half-life such that `(age mod H)·2^16` stays inside int64. */
  val MaxHalfLifeUs: Long = (Long.MaxValue >> 16) - 1

  /** @param df         events
    * @param keyCol     score key
    * @param tsNsCol    event time, long nanos
    * @param halfLifeUs decay half-life in MICROseconds (µs resolution
    *                   is what keeps the exponent in int64)
    * @return (keyCol, cnt, decayed_fix) — decayed_fix 2^31-scaled sum
    *         of 2^(−age/halfLife), ordered by decayed desc then key
    */
  def decayedCount(df: DataFrame, keyCol: String, tsNsCol: String,
      halfLifeUs: Long): DataFrame = {
    require(halfLifeUs > 0 && halfLifeUs <= MaxHalfLifeUs,
      s"halfLifeUs must be in (0, $MaxHalfLifeUs], got $halfLifeUs")
    val ref = df.agg(max(expr(s"$tsNsCol div 1000")).as("__ref"))
    df.select(col(keyCol), expr(s"$tsNsCol div 1000").as("__ts"))
      .crossJoin(broadcast(ref))
      .withColumn("__age", col("__ref") - col("__ts"))
      .withColumn("__y",
        expr(s"least(__age div ${halfLifeUs}L, 63L) * 65536 + " +
          s"((__age % ${halfLifeUs}L) * 65536) div ${halfLifeUs}L"))
      .withColumn("__w", FixedLogExprs.pow2NegFix(col("__y")))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("cnt"), sum("__w").as("decayed_fix"))
      .orderBy(col("decayed_fix").desc, col(keyCol))
  }
}
