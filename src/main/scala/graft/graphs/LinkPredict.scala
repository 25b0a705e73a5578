package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.FixedLogExprs

/** Neighborhood-based link prediction — the classical common-neighbors
  * and Adamic–Adar scores over a canonical undirected graph
  * ([[Triangles.canonical]] layout): for a non-adjacent pair (u, w),
  *
  *   cn(u, w) = |Γ(u) ∩ Γ(w)|
  *   aa(u, w) = Σ_{z ∈ Γ(u) ∩ Γ(w)} 1 / ln deg(z)
  *
  * (Adamic–Adar discounts common neighbors by their promiscuity — a
  * shared hub says little, a shared degree-2 node says a lot). The
  * repo's fixed-point discipline applies to the transcendental: deg ≥ 2
  * for any common neighbor (it neighbors at least u and w), and
  *
  *   lnfix(z)   = (−log2fix(2^30 div deg, 30, 16) · 45426) div 2^16
  *   contrib(z) = 2^32 div lnfix(z)            (≈ 1/ln(deg) · 2^16)
  *
  * with every step an int64 floor a second engine replays exactly
  * (lnfix ≥ ⌊ln 2 · 2^16⌋ = 45426 > 0, so the division is total).
  *
  * Scale shape: ONE shuffle keyed by the intermediate node z — the
  * wedge join (z, u) ⋈ (z, w), u < w — then a map-side-combinable
  * (u, w) aggregation and an anti-join against the edge set. The z-key
  * is the classic power-law hazard (a hub emits deg² wedges);
  * `maxDegree` drops hub intermediates BEFORE the join — principled
  * for AA, whose hub contributions are the smallest terms — and the
  * cap is part of the spec (mirrored by the oracle), never a silent
  * truncation.
  */
object LinkPredict {

  /** (a, b, cn, aa_fix) for every non-adjacent pair with ≥ 1 common
    * neighbor of degree ≤ maxDegree; a < b, aa_fix is 2^16-scaled.
    */
  def scores(canonicalEdges: DataFrame, maxDegree: Long = 1L << 20): DataFrame = {
    val e = canonicalEdges
    val adj = e.select(col("a").as("z"), col("b").as("v"))
      .unionByName(e.select(col("b").as("z"), col("a").as("v")))
    // deg = 1 nodes emit no wedge anyway; filtering them keeps lnfix > 0
    // (deg = 1 ⇒ log2fix = 0 ⇒ a zero divisor)
    val contrib = adj.groupBy("z").agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2 && col("deg") <= maxDegree)
      .withColumn("__bits",
        -FixedLogExprs.log2fix(expr("1073741824L div deg"), 30, 16))
      .withColumn("__lnfix", expr("(__bits * 45426L) div 65536"))
      .withColumn("contrib", expr("4294967296L div __lnfix"))
      .select(col("z"), col("contrib"))
    val wedges = adj.join(contrib, "z")
    wedges.select(col("z"), col("v").as("a"), col("contrib"))
      .join(wedges.select(col("z"), col("v").as("b")), "z")
      .filter(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("cn"), sum("contrib").as("aa_fix"))
      .join(e, Seq("a", "b"), "left_anti")
  }
}
