package graft.graphs

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], nodeIds: Seq[Long], k: Int) =
    KCore.membership(edges.toDF("src", "dst"), nodeIds.toDF("id"), "id", k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for (a <- ids; b <- ids if a < b) yield (a, b)

  test("a planted clique survives, a pendant path peels in cascade") {
    // K4 on 0-3, path 3-4-5 hanging off it
    val edges = clique(Seq(0L, 1L, 2L, 3L)) ++ Seq((3L, 4L), (4L, 5L))
    val got = run(edges, 0L to 5L, k = 2)
    // 5 peels (deg 1), then 4 peels (deg 1 after the cascade)
    assert(got(4L) == ((0, 0L)) && got(5L) == ((0, 0L)))
    assert((0L to 3L).forall(got(_) == ((1, 3L))))
    // at k = 3 the K4 still stands alone
    val g3 = run(edges, 0L to 5L, k = 3)
    assert((0L to 3L).forall(g3(_)._1 == 1) && g3(4L)._1 == 0)
    // at k = 4 even the K4 dies (internal degree is only 3)
    assert(run(edges, 0L to 5L, k = 4).values.forall(_._1 == 0))
  }

  test("core_degree is the degree INSIDE the core, not the original") {
    // K4 plus two pendants on node 0: original deg(0) = 5, core deg = 3
    val edges = clique(Seq(0L, 1L, 2L, 3L)) ++ Seq((0L, 10L), (0L, 11L))
    val got = run(edges, Seq(0L, 1L, 2L, 3L, 10L, 11L), k = 2)
    assert(got(0L) == ((1, 3L)))
  }

  test("duplicate orientations and self-loops are canonicalized away") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 1L))
    // triangle 1-2-3 with dups/self-loops: a clean 2-core
    val got = run(edges, Seq(1L, 2L, 3L), k = 2)
    assert(got.values.forall(_ == ((1, 2L))))
  }

  test("isolated nodes and an empty core are reported, never dropped") {
    val got = run(Seq((1L, 2L)), Seq(1L, 2L, 9L), k = 2)
    assert(got == Map(1L -> ((0, 0L)), 2L -> ((0, 0L)), 9L -> ((0, 0L))))
  }

  test("two cliques joined by a bridge: both survive, independently") {
    val edges = clique(Seq(0L, 1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L, 13L)) ++
      Seq((3L, 10L))
    val got = run(edges, (0L to 3L) ++ (10L to 13L), k = 3)
    assert(got.values.forall(_._1 == 1))
    // the bridge adds degree but is not required: core degrees stay >= 3
    assert(got(3L)._2 == 4L && got(0L)._2 == 3L)
  }

  test("hitting maxRounds before the fixpoint throws, never truncates") {
    // path 0-1-...-19 at k=2 peels two endpoints per round: ~10 rounds.
    // maxRounds=3 cannot reach the fixpoint -> must THROW (a silent cap
    // would report interior nodes in_core=1); a sufficient bound peels
    // the whole path away.
    val path = (0L until 19L).map(i => (i, i + 1))
    val ex = intercept[IllegalStateException] {
      KCore.membership(path.toDF("src", "dst"), (0L to 19L).toDF("id"),
        "id", k = 2, maxRounds = 3).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    val got = run(path, 0L to 19L, k = 2)
    assert(got.values.forall(_ == ((0, 0L))))
  }

  test("partition invariance under a 9-way repartition") {
    val edges = (0L until 100L).map(i => (i % 19, (i * 7 + 3) % 19)) ++
      clique(Seq(30L, 31L, 32L, 33L, 34L))
    val ids = (0L until 19L) ++ (30L to 34L)
    val a = run(edges, ids, 4)
    val b = KCore.membership(edges.toDF("src", "dst").repartition(9),
      ids.toDF("id").repartition(9), "id", 4).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(a == b)
  }
}
