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
}
