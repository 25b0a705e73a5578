package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Ordering.exactRankMerge]]'s contract: bit-equal to a from-scratch
  * [[Ordering.exactRank]] over history ∪ delta, while history ranks are
  * CARRIED from the artifact, never recomputed from raw values — the
  * maintained-sorted-index induction q236's nightly merge rests on
  * (round-12 verdict #4).
  */
class ExactRankMergeSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic corpus with plenty of value collisions (values drawn
    * from a 17-symbol alphabet) so the same-value smaller-tie terms are
    * exercised on both sides of the generation split. */
  private def corpus(n: Int): DataFrame =
    (1 to n).map(i => (i.toLong * 7 % 1000, s"v${(i * i + 3 * i) % 17}"))
      .toDF("id", "skey")

  private def ranksOf(df: DataFrame): Map[Long, Long] =
    df.select("id", "rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def checkSplit(all: DataFrame, isDelta: org.apache.spark.sql.Column
      ): Unit = {
    val hist = all.filter(!isDelta)
    val delta = all.filter(isDelta)
    val histRanked = Ordering.exactRank(hist, "skey", "id")
    val histHist = hist.groupBy("skey").agg(count(lit(1)).as("c"))
    val merged = Ordering.exactRankMerge(
      histRanked, histHist, delta, "skey", "id")
    val scratch = Ordering.exactRank(all, "skey", "id")
    assert(ranksOf(merged) == ranksOf(scratch))
    // sanity: a permutation of 1..n
    val rs = ranksOf(merged).values.toSeq.sorted
    assert(rs == (1L to rs.size).toSeq)
  }

  test("merge equals from-scratch rank on a collision-heavy corpus") {
    checkSplit(corpus(300), col("id") % 13 === 4)
  }

  test("merge equals from-scratch when the delta is interleaved by value") {
    // delta keyed off the VALUE so whole value-groups straddle the split
    checkSplit(corpus(300), col("skey").isin("v0", "v5", "v11"))
  }

  test("empty delta and empty history degenerate correctly") {
    checkSplit(corpus(50), lit(false)) // empty delta
    checkSplit(corpus(50), lit(true)) // empty history
  }

  test("history ranks are CARRIED from the artifact, not recomputed") {
    // plant a deliberately wrong rank in the history artifact: a merge
    // that re-ranked history from raw values would silently repair it —
    // the maintained-index contract requires it to survive (shifted)
    val all = corpus(120)
    val isDelta = col("id") % 10 === 3
    val hist = all.filter(!isDelta)
    val delta = all.filter(isDelta)
    val poisoned = Ordering.exactRank(hist, "skey", "id")
      .withColumn("rank",
        when(col("id") === 7L, lit(999999L)).otherwise(col("rank")))
    val histHist = hist.groupBy("skey").agg(count(lit(1)).as("c"))
    val merged = Ordering.exactRankMerge(
      poisoned, histHist, delta, "skey", "id")
    val r7 = ranksOf(merged)(7L)
    assert(r7 >= 999999L, s"history rank was recomputed (got $r7)")
  }
}
