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

  private def hhw(df: org.apache.spark.sql.DataFrame, cap: Int) =
    df.agg(FreqItemsAgg.freqItemsWeighted($"item", $"cnt", cap).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.cnt")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("weighted merge of two run summaries == one pass over the union") {
    val runA = Seq(("a", 5L), ("b", 2L), ("c", 1L)).toDF("item", "cnt")
    val runB = Seq(("a", 3L), ("c", 4L), ("d", 1L)).toDF("item", "cnt")
    val merged = hhw(runA.unionByName(runB), 16)
    assert(merged == Seq(("a", 8L), ("c", 5L), ("b", 2L), ("d", 1L)))
  }

  test("weighted merge over capacity keeps the combined undercount bound") {
    // two summaries, combined n = 100, capacity 3 → error bound 25
    val runA = Seq(("hot", 40L), ("w1", 8L), ("w2", 8L), ("w3", 8L))
      .toDF("item", "cnt").coalesce(1)
    val runB = Seq(("hot", 20L), ("w4", 8L), ("w5", 8L))
      .toDF("item", "cnt").coalesce(1)
    val merged = hhw(runA.unionByName(runB).coalesce(1), 3)
    val hot = merged.find(_._1 == "hot")
    assert(hot.isDefined, s"hot item evicted: $merged")
    assert(hot.get._2 <= 60L && hot.get._2 >= 60L - 25L,
      s"undercount bound violated: $merged")
  }

  test("zero and null weights are no-ops") {
    val df = Seq(("a", Some(3L)), ("b", Some(0L)), ("c", None))
      .toDF("item", "cnt")
    assert(hhw(df, 8) == Seq(("a", 3L)))
  }

  test("an IntegerType weight column is cast at analysis, not CCE at run") {
    val df = Seq(("a", 3), ("a", 2), ("b", 1)).toDF("item", "cnt")
    assert(hhw(df, 8) == Seq(("a", 5L), ("b", 1L)))
  }
}
