package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.AuditQueries

class AuditQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("q200: ~1/97 of key-derived check digits solve the congruence") {
    val out = AuditQueries.q200IbanAudit(spark, sf).cache()
    try {
      val n = out.count()
      val v = out.filter(col("valid") === 1).count()
      // custkey % 100 spans 0..99 ~uniformly; exactly one residue class
      // per (nation, bban) verifies -> expect n/97-ish, never 0, never n
      assert(v > 0 && v < n / 20,
        s"valid fraction implausible: $v of $n")
      // every residue is a canonical mod-97 class
      assert(out.filter(col("residue") < 0 || col("residue") > 96)
        .count() == 0)
    } finally out.unpersist()
  }

  test("q201: an exact power law regresses to slope -1 (16.16)") {
    // freq(rank) = 2^(20 - ceil(log2 rank)) over ranks 1,2,4,...,2^15:
    // log2 points fall EXACTLY on a slope -1 line
    val rows = (0 to 15).map(i => ("pl", math.pow(2, i).toLong))
    val tf = rows.toDF("lang", "rank")
      .withColumn("freq", expr("CAST(pow(2, 20) AS BIGINT) div rank"))
    def lg2(c: org.apache.spark.sql.Column) =
      lit(30L * 65536L) +
        graft.functions.FixedLogExprs.log2fix(c.cast("long"), 30, 16)
    val pts = tf.select(col("lang"), lg2(col("rank")).as("x"),
      lg2(col("freq")).as("y"))
    val got = Ols.groupTrend(pts, "lang", "x", "y").collect()(0)
    val slope = got.getLong(got.fieldIndex("slope_fix"))
    assert(slope == -65536L, s"exact dyadic power law must give -1, got $slope")
  }

  test("q202: a planted volume spike is flagged by its weekday's norm") {
    // 8 weeks of flat per-day volume for one type, one day tripled:
    // that day's weekday group flags exactly 1 outlier
    val base = for (d <- 0L until 56L) yield ("click", d, if (d == 21L) 300L else 100L)
    val daily = base.toDF("event_type", "__day", "cnt")
      .withColumn("dow", (col("__day") + 4) % 7)
    val out = RobustStats.medianMadOutliers(
        daily, Seq("event_type", "dow"), "cnt")
      .collect().map(r => (r.getLong(2), r.getLong(5))).toSeq
    assert(out.map(_._2).sum == 1, s"expected exactly one flagged day: $out")
    assert(out.forall(_._1 == 8L), "8 samples per weekday expected")
  }
}
