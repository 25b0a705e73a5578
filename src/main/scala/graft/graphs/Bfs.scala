package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distance — the fourth graph primitive next to
  * [[ConnectedComponents]] (structure), [[PageRank]] (authority) and
  * [[Triangles]] (density): how far is every node from a seed set?
  * The crawl-depth / spam-distance / trust-propagation question
  * (Gyöngyi et al.'s TrustRank starts exactly here).
  *
  * Synchronous frontier expansion: round h joins the CURRENT frontier
  * (nodes first reached at h−1) to the edge list, anti-joins the
  * already-settled set, and stamps survivors with hop h. A node's hop
  * is therefore min-distance BY CONSTRUCTION (a shorter path would
  * have settled it in an earlier round) — deterministic on any
  * partitioning, which is what makes it oracle-able against a
  * recursive-CTE replay.
  *
  * Scale shape: per round, one (frontier ⋈ edges) equi-join keyed on
  * the frontier node + one anti-join against settled — both shuffle
  * only (id, hop) pairs, 16 bytes/row; the frontier is the only
  * growing relation and it is bounded by |V|. Eager localCheckpoint
  * per round truncates the iterative lineage (the
  * [[ConnectedComponents]] discipline). Rounds are bounded by
  * `maxHops`, with an early exit when the frontier drains.
  */
object Bfs {

  /** @param edges   directed (src, dst) pairs; symmetrize for undirected
    * @param nodes   one row per node
    * @param idCol   node id column in `nodes`
    * @param seeds   hop-0 node ids (one column, same name as `idCol`)
    * @param maxHops rounds bound
    * @return (idCol, hop) for every node; hop NULL if unreached
    */
  def hops(edges: DataFrame, nodes: DataFrame, idCol: String,
      seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct().localCheckpoint(true)
    var settled = seeds.select(col(idCol).cast("long").as("id")).distinct()
      .withColumn("hop", lit(0L)).localCheckpoint(true)
    var frontier = settled
    var h = 1L
    while (h <= maxHops && !frontier.isEmpty) {
      val next = frontier.select(col("id").as("src"))
        .join(e, "src").select(col("dst").as("id")).distinct()
        .join(settled.select("id"), Seq("id"), "left_anti")
        .withColumn("hop", lit(h))
        .localCheckpoint(true)
      settled = settled.unionByName(next).localCheckpoint(true)
      frontier = next
      h += 1
    }
    nodes.select(col(idCol).cast("long").as("id"))
      .join(settled, Seq("id"), "left")
      .select(col("id").as(idCol), col("hop"))
  }
}
