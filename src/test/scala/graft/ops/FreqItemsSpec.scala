package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.FreqItemsAgg

class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  private def hh(df: org.apache.spark.sql.DataFrame, cap: Int) =
    df.agg(FreqItemsAgg.freqItems($"toks", cap).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.cnt")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("exact regime: counts equal plain groupBy counts, sorted") {
    val df = Seq(
      Seq("a", "b", "a"), Seq("b", "c"), Seq("a"), Seq.empty[String]
    ).toDF("toks")
    assert(hh(df, 16) == Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("over capacity: heavy item survives with the MG undercount bound") {
    // 60 x "hot" + 30 distinct cold singletons, capacity 8:
    // any item with true count > n/(cap+1) = 90/9 = 10 must be tracked,
    // and its reported count undercounts by at most 10
    val rows = Seq.fill(60)(Seq("hot")) ++ (1 to 30).map(i => Seq(s"cold$i"))
    val out = hh(rows.toDF("toks").coalesce(1), 8)
    val hot = out.find(_._1 == "hot")
    assert(hot.isDefined, "heavy hitter must survive the summary")
    assert(hot.get._2 >= 60 - 10 && hot.get._2 <= 60)
    assert(out.size <= 8)
  }

  test("merge across many partitions stays exact when vocab fits") {
    val rows = (1 to 500).map(i => Seq(s"w${i % 7}", s"w${i % 3}"))
    val out = hh(rows.toDF("toks").repartition(13), 64).toMap
    val expect = rows.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(out == expect)
  }

  test("null arrays and null elements are ignored") {
    val df = Seq(
      (1, Some(Seq(Some("x"), None, Some("y")))),
      (2, None: Option[Seq[Option[String]]])
    ).toDF("id", "toks").select($"toks")
    assert(hh(df, 8) == Seq(("x", 1L), ("y", 1L)))
  }
}
