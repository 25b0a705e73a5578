package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(points: Seq[(Long, Long, Long)],
      ivs: Seq[(Long, Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (pid, pk, t) <- points
      (iid, ik, s, e) <- ivs
      if pk == ik && t >= s && t <= e
    } yield (pid, iid)).toSet

  // deterministic planted data: 40 points, 12 intervals, 3 keys
  private val pts = (0L until 40L).map(i => (i, i % 3, i * 97 % 1000))
  private val ivs = (0L until 12L).map(i =>
    (100L + i, i % 3, i * 83 % 900, i * 83 % 900 + 37 + (i % 4) * 50))

  test("overlapJoin matches brute force, inclusive bounds") {
    val p = pts.toDF("pid", "k", "t")
    val iv = ivs.toDF("iid", "k", "s", "e")
    val got = RangeJoin.overlapJoin(p, iv, "t", "s", "e", Seq("k"),
      bucketWidth = 50L)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size, "no duplicate pairs")
    assert(got.toSet == brute(pts, ivs))
    // explicit boundary check: point exactly at start and at end
    val bp = Seq((1L, 0L, 10L), (2L, 0L, 20L), (3L, 0L, 9L), (4L, 0L, 21L))
      .toDF("pid", "k", "t")
    val biv = Seq((9L, 0L, 10L, 20L)).toDF("iid", "k", "s", "e")
    val hits = RangeJoin.overlapJoin(bp, biv, "t", "s", "e", Seq("k"), 7L)
      .select("pid").as[Long].collect().toSet
    assert(hits == Set(1L, 2L))
  }

  test("long intervals route to the fallback path and stay exact") {
    val p = pts.toDF("pid", "k", "t")
    // one short + one interval spanning the whole domain (many buckets)
    val mixed = Seq((100L, 0L, 0L, 90L), (101L, 1L, 0L, 100000L))
      .toDF("iid", "k", "s", "e")
    val got = RangeJoin.overlapJoin(p, mixed, "t", "s", "e", Seq("k"),
      bucketWidth = 50L, maxBuckets = 4)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size)
    assert(got.toSet == brute(pts,
      Seq((100L, 0L, 0L, 90L), (101L, 1L, 0L, 100000L))))
    // and the long interval really did match every key-1 point
    assert(got.count(_._2 == 101L) == pts.count(_._2 == 1L))
  }

  test("keyless overlap join works (pure range, no equi-key)") {
    val p = Seq((1L, 5L), (2L, 15L), (3L, 25L)).toDF("pid", "t")
    val iv = Seq((7L, 10L, 20L)).toDF("iid", "s", "e")
    val got = RangeJoin.overlapJoin(p, iv, "t", "s", "e", Seq.empty, 8L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(2L))
  }

  test("a malformed interval (end < start) fails loudly, not silently") {
    val p = Seq((1L, 0L, 5L)).toDF("pid", "k", "t")
    val bad = Seq((7L, 0L, 20L, 10L)).toDF("iid", "k", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.overlapJoin(p, bad, "t", "s", "e", Seq("k"), 8L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++
        msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("RangeJoin")), s"got: $ex")
  }
}
