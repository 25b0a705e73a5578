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

  /** PERSONALIZED PageRank (Page et al.'s original generalization; the
    * "related items" / topic-sensitive ranking): the restart mass goes
    * to a SEED set instead of uniformly everywhere, so authority flows
    * out from the seeds and decays with link distance — where
    * [[fixedPoint]] answers "globally important", this answers
    * "important RELATIVE TO these nodes". Same integer discipline
    * (floor-divided contributions, `base + floor(85·s/100)` damping),
    * same per-round shape (one src-keyed join + one dst-keyed sum);
    * only the restart term differs: seeds get `scale·|V| div |S|` base
    * mass (total restart mass matches the uniform variant's, so
    * magnitudes stay comparable), non-seeds get 0 and start at 0.
    */
  def personalized(
      edges: DataFrame,
      nodes: DataFrame,
      seeds: DataFrame,
      iterations: Int = 3,
      scale: Long = 1L << 20,
      dampNum: Long = 85,
      dampDen: Long = 100): DataFrame = {
    val s = seeds.select(col("id")).distinct()
    val counts = nodes.agg(count(lit(1)).as("__nv"))
      .crossJoin(s.agg(count(lit(1)).as("__ns")))
    val seeded = nodes.join(s.withColumn("__isSeed", lit(1L)), Seq("id"), "left")
      .crossJoin(broadcast(counts))
      .select(col("id"),
        when(col("__isSeed").isNotNull,
          expr(s"($scale * (${dampDen - dampNum}) div $dampDen) * __nv div __ns"))
          .otherwise(lit(0L)).as("__base"))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("__deg"))
    val e = edges.join(deg, "src")
    var ranks = seeded.select(col("id"), col("__base").as("rank"))
    for (_ <- 1 to iterations) {
      val sums = e.join(ranks, e("src") === ranks("id"))
        .select(col("dst"), expr("rank div __deg").as("__c"))
        .groupBy("dst").agg(sum("__c").as("__s"))
      ranks = seeded.join(sums, seeded("id") === sums("dst"), "left")
        .select(seeded("id"),
          (col("__base") + expr(s"$dampNum * coalesce(__s, 0L) div $dampDen"))
            .cast(LongType).as("rank"))
    }
    ranks
  }
}
