package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition (membership at a given k) — the density filter
  * of the graph tier: iteratively peel nodes of degree < k until the
  * remainder is the maximal subgraph with min degree ≥ k. The
  * communities/spam/bot primitive [[Triangles]] approximates locally:
  * a planted clique survives any k below its size while the sparse
  * bulk peels away entirely.
  *
  * Synchronous peeling (all of a round's removals computed from the
  * same snapshot) makes the fixpoint — and even the per-round
  * trajectory — deterministic on any partitioning and engine: the
  * k-core is unique, so bounded-round replay in a second engine
  * reaches the identical node set once rounds ≥ convergence.
  *
  * Scale shape per round: one degree count over the remaining edge
  * list (map-side combined, only (id, cnt) pairs cross) + two
  * semi-joins pruning the edge list; the edge relation only ever
  * SHRINKS, and eager localCheckpoint truncates the iterative lineage
  * (the [[ConnectedComponents]] discipline). Rounds are data-bounded:
  * the loop exits as soon as a round removes nothing.
  */
object KCore {

  /** @param edges undirected (src, dst); self-loops and duplicate
    *              orientations are canonicalized away
    * @param nodes one row per node
    * @param idCol node id column in `nodes`
    * @param k     minimum in-core degree
    * @param maxRounds safety bound on peel rounds; must exceed the
    *                  graph's peel depth (a path of n nodes at k=2
    *                  needs ~n/2 rounds). Hitting the bound before the
    *                  fixpoint THROWS — a truncated peel would silently
    *                  report interior nodes as in-core, violating the
    *                  repo's no-silent-caps discipline.
    * @return (idCol, in_core 0/1, core_degree — degree within the core,
    *         0 for peeled nodes)
    */
  def membership(edges: DataFrame, nodes: DataFrame, idCol: String, k: Int,
      maxRounds: Int = 64): DataFrame = {
    require(k >= 1 && maxRounds >= 0, s"bad k=$k / maxRounds=$maxRounds")
    var es = Triangles.canonical(edges, "src", "dst")
      .localCheckpoint(true) // (a < b) simple edges
    var rounds = 0
    var stable = false
    while (rounds < maxRounds && !stable) {
      val adj = es.select(col("a").as("id"))
        .unionByName(es.select(col("b").as("id")))
      val keep = adj.groupBy("id").agg(count(lit(1)).as("__deg"))
        .filter(col("__deg") >= k)
        .select("id").localCheckpoint(true)
      val pruned = es
        .join(keep.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("id").as("b")), Seq("b"), "left_semi")
        .select("a", "b").localCheckpoint(true)
      // a round that removes no edge removes no node next round either
      stable = pruned.count() == es.count()
      es = pruned
      rounds += 1
    }
    // never a silent cap: an unconverged peel is an ERROR, not a result
    // (interior nodes of a long path would read in_core=1 when they are
    // not — advisor finding, round 8)
    if (!stable) throw new IllegalStateException(
      s"k-core peeling did not converge within $maxRounds rounds (k=$k); " +
        "raise maxRounds past the graph's degeneracy peel depth")
    val coreDeg = es.select(col("a").as("id"))
      .unionByName(es.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("core_degree"))
      .filter(col("core_degree") >= k) // zero-degree/straggler guard
    nodes.select(col(idCol).cast("long").as("id"))
      .join(coreDeg, Seq("id"), "left")
      .select(col("id").as(idCol),
        when(col("core_degree").isNull, 0).otherwise(1).as("in_core"),
        coalesce(col("core_degree"), lit(0L)).as("core_degree"))
  }
}
