package graft.ops

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], target: Long) =
    Compaction.planBins(rows.toDF("k", "id", "bytes"), Seq("k"), "id",
        "bytes", target)
      .orderBy("k", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq

  test("hand case: decreasing layout, cuts at target offsets") {
    // sizes 70, 50, 40, 30, 10 at target 100:
    // offsets 0, 70, 120, 160, 190 → bins 0, 0, 1, 1, 1
    val rows = Seq(("k", 1L, 50L), ("k", 2L, 70L), ("k", 3L, 40L),
      ("k", 4L, 10L), ("k", 5L, 30L))
    val got = run(rows, 100L)
    val byId = got.map(t => t._2 -> ((t._4, t._5))).toMap
    assert(byId == Map(2L -> ((0L, 0L)), 1L -> ((0L, 70L)),
      3L -> ((1L, 20L)), 5L -> ((1L, 60L)), 4L -> ((1L, 90L))))
  }

  test("an oversized file starts its own bin region; small ones follow") {
    val rows = Seq(("k", 1L, 250L), ("k", 2L, 30L), ("k", 3L, 30L))
    val got = run(rows, 100L)
    val byId = got.map(t => t._2 -> ((t._4, t._5))).toMap
    // 250 at offset 0 (bins 0-2), then 30 at 250 (bin 2), 30 at 280 (bin 2)
    assert(byId(1L) == ((0L, 0L)) && byId(2L) == ((2L, 50L)) &&
      byId(3L) == ((2L, 80L)))
  }

  test("every bin except the last is filled to at least the target minus its largest straddler") {
    val rows = (1L to 40L).map(i => ("k", i, (i * 37) % 90 + 10))
    val got = run(rows, 128L)
    val total = rows.map(_._3).sum
    val nBins = got.map(_._4).max + 1
    assert(nBins == (total + 127) / 128 ||
      nBins == total / 128 + (if (total % 128 == 0) 0 else 1))
    // bins are contiguous 0..nBins-1
    assert(got.map(_._4).distinct.sorted == (0L until nBins))
  }

  test("keys plan independently; partition invariant") {
    val rows = (1L to 60L).map(i => (s"g${i % 3}", i, (i * 13) % 70 + 5))
    val a = run(rows, 100L)
    val b = Compaction.planBins(rows.toDF("k", "id", "bytes").repartition(7),
        Seq("k"), "id", "bytes", 100L)
      .orderBy("k", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(a == b)
  }
}
