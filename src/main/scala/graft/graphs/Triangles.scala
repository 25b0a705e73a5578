package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting — the local-clustering primitive next to
  * [[ConnectedComponents]] (structure) and [[PageRank]] (authority):
  * per-node triangle membership feeds clustering-coefficient features
  * (link-farm detection in crawl graphs: farms are triangle-dense,
  * organic link neighborhoods are not).
  *
  * The node-ordered algorithm: canonicalize to simple undirected edges
  * (a < b), then each triangle {x < y < z} is found EXACTLY ONCE as the
  * join e1=(x,y) ⋈ e2=(y,z) ⋈ e3=(x,z) — ordering kills the 6-way
  * double count with no dedup pass. Two equi-joins on 8-byte ids; at
  * scale this is the standard distributed shape (the wedge side can be
  * degree-capped for power-law graphs — document, don't silently cap).
  */
object Triangles {

  /** Canonical simple undirected edges from any directed multigraph
    * relation: (least, greatest), self-loops dropped, distinct.
    */
  def canonical(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Per-node triangle counts over canonical edges (nodes in no
    * triangle are absent — left-join `nodes` and coalesce to 0 for the
    * dense view).
    */
  def perNode(canonicalEdges: DataFrame): DataFrame = {
    val e = canonicalEdges
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
  }
}
