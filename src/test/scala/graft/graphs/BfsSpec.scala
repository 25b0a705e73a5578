package graft.graphs

import graft.SparkSpec

class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], nodeIds: Seq[Long],
      seedIds: Seq[Long], maxHops: Int): Map[Long, Option[Long]] = {
    val e = edges.toDF("src", "dst")
    val n = nodeIds.toDF("id")
    val s = seedIds.toDF("id")
    Bfs.hops(e, n, "id", s, maxHops).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
  }

  test("path graph: hops are exact distances, beyond-horizon is null") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val got = run(edges, 0L to 5L, Seq(0L), maxHops = 3)
    assert(got == Map(0L -> Some(0L), 1L -> Some(1L), 2L -> Some(2L),
      3L -> Some(3L), 4L -> None, 5L -> None))
  }

  test("multi-source: nearest seed wins") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val edges = path ++ path.map { case (a, b) => (b, a) } // undirected
    val got = run(edges, 0L to 4L, Seq(0L, 4L), maxHops = 10)
    assert(got == Map(0L -> Some(0L), 1L -> Some(1L), 2L -> Some(2L),
      3L -> Some(1L), 4L -> Some(0L)))
  }

  test("a shorter path found later never overwrites: min by construction") {
    // diamond: 0→1→3 and 0→3 direct; 3 must settle at hop 1
    val edges = Seq((0L, 1L), (1L, 3L), (0L, 3L), (3L, 4L))
    val got = run(edges, 0L to 4L, Seq(0L), maxHops = 5)
    assert(got(3L) == Some(1L) && got(4L) == Some(2L))
  }

  test("directed edges are honored (symmetrize for undirected)") {
    val edges = Seq((1L, 0L)) // only points AT the seed
    assert(run(edges, Seq(0L, 1L), Seq(0L), 3) ==
      Map(0L -> Some(0L), 1L -> None))
    val sym = Seq((1L, 0L), (0L, 1L))
    assert(run(sym, Seq(0L, 1L), Seq(0L), 3)(1L) == Some(1L))
  }

  test("maxHops 0 settles seeds only; frontier drain exits early") {
    val edges = Seq((0L, 1L))
    assert(run(edges, Seq(0L, 1L), Seq(0L), 0) ==
      Map(0L -> Some(0L), 1L -> None))
    // disconnected seed: rounds stop when the frontier drains
    assert(run(Seq((5L, 6L)), Seq(0L, 5L, 6L), Seq(0L), 100) ==
      Map(0L -> Some(0L), 5L -> None, 6L -> None))
  }

  test("partition invariance under a 9-way repartition") {
    val edges = (0L until 80L).map(i => (i % 23, (i * 7 + 3) % 23))
    val nodes = 0L until 23L
    val a = run(edges, nodes, Seq(0L, 7L), 3)
    val e = edges.toDF("src", "dst").repartition(9)
    val b = Bfs.hops(e, nodes.toDF("id").repartition(9), "id",
      Seq(0L, 7L).toDF("id"), 3).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(a == b)
  }
}
