package graft.ops

import graft.SparkSpec

class QuantileNormSpec extends SparkSpec {
  import spark.implicits._

  private def run(a: Seq[(String, Long, Long)], b: Seq[(String, Long)]) =
    Quantiles.quantileNormalize(a.toDF("k", "v", "uid"),
        b.toDF("k", "v"), Seq("k"), "v", "uid")
      .orderBy("k", "uid").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("equal sizes: rank i maps to reference rank i exactly") {
    val a = Seq(("k", 5L, 1L), ("k", 50L, 2L), ("k", 500L, 3L))
    val b = Seq(("k", 10L), ("k", 20L), ("k", 30L))
    assert(run(a, b).map(_._4) == Seq(10L, 20L, 30L))
  }

  test("normalized output IS the reference distribution, ranks preserved") {
    val a = (1L to 40L).map(i => ("k", i * i, i)) // skewed
    val b = (1L to 40L).map(i => ("k", 1000L + i)) // uniform shifted
    val got = run(a, b)
    assert(got.map(_._4).toSet == b.map(_._2).toSet)
    // monotone: original order preserved
    val sortedByOrig = got.sortBy(_._2).map(_._4)
    assert(sortedByOrig == sortedByOrig.sorted)
  }

  test("size mismatch uses the ceil-rank rule, values only from the ref") {
    // n=4 onto m=2: ranks 1..4 -> ceil(r*2/4) = 1,1,2,2
    val a = (1L to 4L).map(i => ("k", i * 100, i))
    val b = Seq(("k", 7L), ("k", 9L))
    assert(run(a, b).map(_._4) == Seq(7L, 7L, 9L, 9L))
    // n=2 onto m=4: ranks 1,2 -> ceil(2), ceil(4) = 2, 4
    val a2 = Seq(("k", 100L, 1L), ("k", 200L, 2L))
    val b2 = (1L to 4L).map(i => ("k", i * 11))
    assert(run(a2, b2).map(_._4) == Seq(22L, 44L))
  }

  test("ties map deterministically by the tie column") {
    val a = Seq(("k", 5L, 30L), ("k", 5L, 10L), ("k", 5L, 20L))
    val b = Seq(("k", 1L), ("k", 2L), ("k", 3L))
    // tie order by uid: 10->rank1->1, 20->rank2->2, 30->rank3->3
    assert(run(a, b).sortBy(_._3).map(_._4) == Seq(1L, 2L, 3L))
  }

  test("keys are normalized independently; partition invariant") {
    val a = (1L to 30L).map(i => (s"g${i % 2}", i * 7 % 19, i))
    val b = (1L to 24L).map(i => (s"g${i % 2}", 100L + i))
    val x = run(a, b)
    val y = Quantiles.quantileNormalize(
        a.toDF("k", "v", "uid").repartition(7),
        b.toDF("k", "v").repartition(5), Seq("k"), "v", "uid")
      .orderBy("k", "uid").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(x == y)
    assert(x.filter(_._1 == "g0").forall(t => b.filter(_._1 == "g0")
      .map(_._2).contains(t._4)))
  }

  test("percentileRank: ties share a percentile; range and single-row edge") {
    val rows = Seq(("k", 10L), ("k", 20L), ("k", 20L), ("k", 30L), ("k", 40L))
      .zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
    val got = Quantiles.percentileRank(
        rows.toDF("k", "v", "id"), Seq("k"), "v")
      .orderBy("id").collect().map(r => (r.getLong(1), r.getLong(3))).toSeq
    val q = 1L << 30
    assert(got == Seq((10L, 0L), (20L, q / 4), (20L, q / 4),
      (30L, 3 * q / 4), (40L, q)))
    // single-row group: percentile 0 by convention
    val one = Quantiles.percentileRank(
        Seq(("z", 99L, 0L)).toDF("k", "v", "id"), Seq("k"), "v")
      .collect()(0).getLong(3)
    assert(one == 0L)
  }

  test("percentileRank is partition invariant (no tiebreak needed)") {
    val rows = (0L until 200L).map(i => ("k", (i * 13) % 47, i))
    val a = Quantiles.percentileRank(rows.toDF("k", "v", "id"), Seq("k"), "v")
      .orderBy("id").collect().map(_.getLong(3)).toSeq
    val b = Quantiles.percentileRank(
        rows.toDF("k", "v", "id").repartition(11), Seq("k"), "v")
      .orderBy("id").collect().map(_.getLong(3)).toSeq
    assert(a == b)
  }
}
