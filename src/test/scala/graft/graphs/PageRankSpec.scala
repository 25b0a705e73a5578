package graft.graphs

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("fixedPoint matches hand-computed integer iterations") {
    // 0 -> {1,2}, 1 -> {2}, 2 -> {0}; scale 1000, damping 85/100.
    // r0 = (1000, 1000, 1000); base = 150.
    // it1: sums (0:1000, 1:500, 2:1500) -> (1000, 575, 1425)
    // it2: sums (0:1425, 1:500, 2:1075) -> (1361, 575, 1063)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L).toDF("id")
    val r = PageRank.fixedPoint(edges, nodes, iterations = 2, scale = 1000L)
      .orderBy("id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r.toSeq == Seq((0L, 1361L), (1L, 575L), (2L, 1063L)))
  }

  test("isolated nodes keep the base rank; parallel edges count double") {
    // 0 -> {1,1} (parallel), 3 isolated. deg(0)=2, each edge carries r/2.
    val edges = Seq((0L, 1L), (0L, 1L)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 3L).toDF("id")
    val r = PageRank.fixedPoint(edges, nodes, iterations = 1, scale = 1000L)
      .orderBy("id").collect().map(x => (x.getLong(0), x.getLong(1)))
    // node 1 receives both halves: 150 + 85*1000/100 = 1000
    assert(r.toSeq == Seq((0L, 150L), (1L, 1000L), (3L, 150L)))
  }

  test("personalized: rank flows from the seeds and decays with distance") {
    import spark.implicits._
    // directed chain 0 -> 1 -> 2 -> 3, seed {0}
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val nodes = (0L to 4L).toDF("id") // 4 is isolated
    val got = PageRank.personalized(edges, nodes, Seq(0L).toDF("id"),
        iterations = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) > got(1L) && got(1L) > got(2L) && got(2L) > got(3L))
    assert(got(3L) > 0L)      // 3 hops reached in 3 iterations
    assert(got(4L) == 0L)     // unreachable non-seed stays at exactly 0
  }

  test("personalized: total restart mass matches the uniform variant's") {
    import spark.implicits._
    val nodes = (0L until 20L).toDF("id")
    val edges = (0L until 20L).map(i => (i, (i + 1) % 20)).toDF("src", "dst")
    def restartSum(seedIds: Seq[Long]): Long = {
      // 0 iterations exposes the raw restart vector
      PageRank.personalized(edges, nodes, seedIds.toDF("id"), iterations = 0)
        .agg(org.apache.spark.sql.functions.sum("rank")).head.getLong(0)
    }
    val uniformBase = ((1L << 20) * 15 / 100) * 20
    // floors lose at most |S| units
    for (seeds <- Seq(Seq(0L), Seq(0L, 7L, 13L), (0L until 20L))) {
      val s = restartSum(seeds)
      assert(s <= uniformBase && s > uniformBase - seeds.size - 1,
        s"seeds=$seeds sum=$s expect~$uniformBase")
    }
  }

  test("personalized: partition invariance") {
    import spark.implicits._
    val edges = (0L until 120L).map(i => (i % 29, (i * 7 + 3) % 29))
      .toDF("src", "dst")
    val nodes = (0L until 29L).toDF("id")
    val seeds = Seq(1L, 4L).toDF("id")
    val a = PageRank.personalized(edges, nodes, seeds, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = PageRank.personalized(edges.repartition(9),
        nodes.repartition(5), seeds, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }
}
