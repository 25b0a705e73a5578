package graft.multimodal

import graft.SparkSpec

class VideoDedupSpec extends SparkSpec {
  import spark.implicits._

  private val A = "frameA".getBytes("UTF-8")
  private val B = "frameB".getBytes("UTF-8")

  private def run(vs: Seq[(Long, Seq[Array[Byte]])]) =
    VideoDedup.sceneSummary(
        vs.toDF("video_id", "frames"), "video_id", "frames",
        Multimodal.FakeDecoder)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("run-length collapses consecutive equal frames; sequence fp finds dups") {
    val got = run(Seq(
      1L -> Seq(A, A, B, B, B, A), // [AA][BBB][A] -> 3 scenes
      2L -> Seq(A, A, B, B, B, A), // exact dup of 1
      3L -> Seq(A, B, A),          // alternating -> 3 scenes, no dup
      4L -> Seq(A, A, A)))         // one static shot
    assert(got(1L) == ((6L, 3L, 2L)))
    assert(got(2L) == ((6L, 3L, 2L)))
    assert(got(3L) == ((3L, 3L, 1L)))
    assert(got(4L) == ((3L, 1L, 1L)))
  }

  test("same scene MULTISET but different ORDER is not a duplicate") {
    val got = run(Seq(
      1L -> Seq(A, A, B),   // [AA][B]
      2L -> Seq(B, A, A)))  // [B][AA] - same scenes, reversed timeline
    assert(got(1L)._3 == 1L && got(2L)._3 == 1L,
      "sequence fingerprint must be order-sensitive")
  }

  test("partition invariance under an 11-way repartition") {
    val vs = (0L until 40L).map(i =>
      i -> (0 until (3 + i % 4).toInt).map(f =>
        s"v${i % 5}f${f / 2}".getBytes("UTF-8")))
    val a = run(vs)
    val b = VideoDedup.sceneSummary(
        vs.toDF("video_id", "frames").repartition(11), "video_id", "frames",
        Multimodal.FakeDecoder)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(a == b)
  }
}
