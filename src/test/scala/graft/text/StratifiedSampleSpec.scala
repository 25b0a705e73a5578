package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StratifiedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(sizes: Map[String, Int]) =
    sizes.toSeq.sortBy(_._1).flatMap { case (s, n) =>
      (1 to n).map(i => (s, s"$s-$i"))
    }.toDF("strat", "id")

  test("allocations are exact Hamilton apportionment and sum to the target") {
    // shares 3.5 / 1.5 → bases 3/1, equal remainders, tie to the smaller key
    val got = Scrub.stratifiedSample(
        corpus(Map("a" -> 7, "b" -> 3)), "strat", "id", 5L)
      .select("strat", "alloc").distinct().as[(String, Long)]
      .collect().toMap
    assert(got == Map("a" -> 4L, "b" -> 1L))

    val skew = Scrub.stratifiedSample(
        corpus(Map("x" -> 997, "y" -> 2, "z" -> 1)), "strat", "id", 10L)
      .select("strat", "alloc").distinct().as[(String, Long)]
      .collect().toMap
    assert(skew.values.sum == 10L)
    assert(skew("x") >= 9L) // proportionality preserved under skew
  }

  test("membership is the per-stratum hash62 prefix, independently recomputed") {
    val df = corpus(Map("a" -> 40, "b" -> 60))
    val got = Scrub.stratifiedSample(df, "strat", "id", 20L)
      .select("strat", "id").as[(String, String)].collect().toSet
    val byHash = df
      .withColumn("hv", graft.functions.Kmv.hash62(col("id")))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(t => (t._3, t._2))).toMap
    val expected = (byHash("a").take(8) ++ byHash("b").take(12))
      .map(t => (t._1, t._2)).toSet
    assert(got == expected)
  }

  test("deterministic under repartitioning; rn is 1..alloc per stratum") {
    val df = corpus(Map("p" -> 300, "q" -> 100, "r" -> 50))
    val a = Scrub.stratifiedSample(df, "strat", "id", 45L)
      .orderBy("strat", "rn").collect().toSeq
    val b = Scrub.stratifiedSample(df.repartition(13), "strat", "id", 45L)
      .orderBy("strat", "rn").collect().toSeq
    assert(a == b)
    val byStrat = a.groupBy(_.getString(0))
    byStrat.foreach { case (_, rows) =>
      val rns = rows.map(_.getLong(2))
      assert(rns == (1L to rows.size.toLong))
      assert(rows.forall(r => r.getLong(2) <= r.getLong(4)))
    }
    assert(a.size == 45)
  }
}
