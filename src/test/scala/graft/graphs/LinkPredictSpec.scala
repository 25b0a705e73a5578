package graft.graphs

import graft.SparkSpec
import graft.functions.FixedLogKernel
import org.apache.spark.sql.functions._

class LinkPredictSpec extends SparkSpec {
  import spark.implicits._

  /** The spec's fixed-point 1/ln(deg) contribution, from the kernel. */
  private def contrib(deg: Long): Long = {
    val bits = -FixedLogKernel.log2fix((1L << 30) / deg, 30, 16)
    4294967296L / ((bits * 45426L) / 65536L)
  }

  private def run(edges: Seq[(Long, Long)], maxDegree: Long = 1L << 20) =
    LinkPredict.scores(
        Triangles.canonical(edges.toDF("src", "dst"), "src", "dst"), maxDegree)
      .orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("diamond graph: the one non-edge scores via both shared neighbors") {
    val got = run(Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
    // only (1,4) is non-adjacent with common neighbors {2, 3}, both deg 3
    assert(got == Seq((1L, 4L, 2L, 2 * contrib(3))))
    // the fixed contribution sits where 1/ln(3)·2^16 should
    assert(math.abs(contrib(3) - math.round(65536.0 / math.log(3))) <= 2)
  }

  test("path: degree-1 endpoints are never intermediates but can be endpoints") {
    val got = run(Seq((1L, 2L), (2L, 3L)))
    assert(got == Seq((1L, 3L, 1L, contrib(2))))
  }

  test("existing edges are excluded even when they share neighbors") {
    // triangle plus a pendant: every adjacent pair shares a neighbor
    val got = run(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(got.map(t => (t._1, t._2)) == Seq((1L, 4L), (2L, 4L)))
  }

  test("maxDegree drops hub intermediates, keeping low-degree evidence") {
    // hub 0 neighbors 1..5; 1-2 also bridged via 6
    val hub = (1L to 5L).map(v => (0L, v))
    val edges = hub ++ Seq((1L, 6L), (6L, 2L))
    val uncapped = run(edges)
    assert(uncapped.exists(t => t._1 == 3L && t._2 == 4L)) // via hub only
    val capped = run(edges, maxDegree = 3)
    assert(!capped.exists(t => t._1 == 3L && t._2 == 4L))
    assert(capped.contains((1L, 2L, 1L, contrib(2)))) // via node 6 (deg 2)
  }

  test("scores are partition-invariant") {
    val edges = (1L to 200L).flatMap(i => Seq((i, (i * 7) % 211), (i, (i * 3) % 211)))
    val canon = Triangles.canonical(edges.toDF("src", "dst"), "src", "dst")
    val a = LinkPredict.scores(canon).orderBy("a", "b").collect().toSeq
    val b = LinkPredict.scores(canon.repartition(13)).orderBy("a", "b")
      .collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
