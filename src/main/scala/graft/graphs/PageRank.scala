package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixed-point integer PageRank — the link-based authority prior used by
  * web-corpus curation (domain/page quality weighting before sampling).
  *
  * All arithmetic is integral: ranks are fixed-point longs (`scale` = one
  * unit of mass), per-edge contributions are floor divisions, and the
  * damping step is `base + floor(85·s/100)`. That makes `iterations`
  * rounds bit-reproducible across engines and partitionings — a SQL
  * oracle replays every round exactly — where a float PageRank would
  * drift with summation order. Dangling-node mass is dropped (the
  * simplest deterministic policy; callers who need mass conservation
  * add a sink node to `edges`).
  *
  * Scale shape: each iteration is one join of the rank relation onto the
  * edge relation plus one groupBy(dst) sum — at 100 TB the edge table is
  * laid out bucketed by `src` ([[graft.ops.Bucketing]]) so the per-round
  * join is co-located and only the (dst, contribution) pairs shuffle.
  * Ranks stay (id, long): 16 bytes/node through every exchange.
  */
object PageRank {

  /** Ranks after `iterations` rounds. `edges`: (src, dst) — parallel
    * edges count double, like repeated hyperlinks. `nodes`: (id), the
    * rank domain (isolated nodes keep the base rank). Output: (id, rank).
    */
  def fixedPoint(
      edges: DataFrame,
      nodes: DataFrame,
      iterations: Int = 3,
      scale: Long = 1L << 20,
      dampNum: Long = 85,
      dampDen: Long = 100): DataFrame = {
    val base = scale * (dampDen - dampNum) / dampDen
    val deg = edges.groupBy("src").agg(count(lit(1)).as("__deg"))
    val e = edges.join(deg, "src")
    var ranks = nodes.select(col("id"), lit(scale).cast(LongType).as("rank"))
    for (_ <- 1 to iterations) {
      val sums = e.join(ranks, e("src") === ranks("id"))
        .select(col("dst"), expr("rank div __deg").as("__c"))
        .groupBy("dst").agg(sum("__c").as("__s"))
      ranks = nodes.join(sums, nodes("id") === sums("dst"), "left")
        .select(nodes("id"),
          (lit(base) + expr(s"$dampNum * coalesce(__s, 0L) div $dampDen"))
            .cast(LongType).as("rank"))
    }
    ranks
  }
}
