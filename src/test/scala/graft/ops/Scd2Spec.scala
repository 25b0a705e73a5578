package graft.ops

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val END = Long.MaxValue

  private def run(log: Seq[(Long, Long, Long, String)]) =
    ScdMerge.type2History(log.toDF("k", "ts", "tie", "v"), "k", "ts", "tie", "v")
      .orderBy("k", "version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5)))
      .toSeq

  test("runs compress; intervals are half-open and chain without gaps") {
    val log = Seq(
      (1L, 10L, 0L, "a"), (1L, 20L, 1L, "a"), (1L, 30L, 2L, "b"),
      (1L, 40L, 3L, "b"), (1L, 50L, 4L, "a"))
    assert(run(log) == Seq(
      (1L, "a", 10L, 30L, 1L, 0),
      (1L, "b", 30L, 50L, 2L, 0),
      (1L, "a", 50L, END, 3L, 1)))
  }

  test("single-state key yields one current version") {
    assert(run(Seq((7L, 5L, 0L, "x"), (7L, 9L, 1L, "x"))) ==
      Seq((7L, "x", 5L, END, 1L, 1)))
  }

  test("equal timestamps break ties deterministically on the tie column") {
    val log = Seq((2L, 10L, 2L, "late"), (2L, 10L, 1L, "early"))
    assert(run(log) == Seq(
      (2L, "early", 10L, 10L, 1L, 0),
      (2L, "late", 10L, END, 2L, 1)))
  }

  test("keys are independent and the whole build is partition-invariant") {
    val log = (1L to 50L).flatMap(k =>
      (0L to 20L).map(i => (k, i * 10, i, s"s${(i + k) % 3}")))
    val base = run(log)
    val shuffled = ScdMerge.type2History(
        scala.util.Random.shuffle(log).toDF("k", "ts", "tie", "v")
          .repartition(7), "k", "ts", "tie", "v")
      .orderBy("k", "version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5)))
      .toSeq
    assert(base == shuffled)
    // exactly one current row per key, always the max version
    val byKey = base.groupBy(_._1)
    assert(byKey.forall { case (_, rows) =>
      rows.count(_._6 == 1) == 1 && rows.maxBy(_._5)._6 == 1 })
  }

  test("null tracked values form their own state") {
    val df = Seq((1L, 10L, 0L, Some("a")), (1L, 20L, 1L, None),
      (1L, 30L, 2L, None), (1L, 40L, 3L, Some("a")))
      .toDF("k", "ts", "tie", "v")
    val got = ScdMerge.type2History(df, "k", "ts", "tie", "v")
      .orderBy("version").collect()
      .map(r => (Option(r.getString(1)), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (Some("a"), 10L, 20L), (None, 20L, 40L), (Some("a"), 40L, END)))
  }
}
