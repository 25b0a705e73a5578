package graft.graphs

import graft.SparkSpec
import graft.queries.CurationQueries

/** q223's modularity algebra invariants on the real sf0.001 graph —
  * the identities any correct (e_c, d_c, m) decomposition must satisfy,
  * independent of what label-prop converged to: Σ d_c = 2m (every edge
  * end counted once), Σ e_c ≤ m, Σ n_nodes = |V|, and each row's
  * contrib_num recomputes from its own columns and the derived m. A
  * double-counted degree, a dropped empty community, or a sign slip in
  * the cross-multiplied form breaks one of these.
  */
class ModularitySpec extends SparkSpec {

  test("q223: degree/edge/node conservation and per-row algebra") {
    val rows = CurationQueries.q223Modularity(spark, sf).collect()
    assert(rows.nonEmpty)
    val degSum = rows.map(_.getLong(3)).sum
    assert(degSum % 2 == 0, s"2m must be even: $degSum")
    val m = degSum / 2
    val intraSum = rows.map(_.getLong(2)).sum
    assert(intraSum <= m, s"intra $intraSum > m $m")
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nDocs, "every node labeled once")
    rows.foreach { r =>
      val (intra, deg, contrib) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(contrib == 4L * m * intra - deg * deg,
        s"row algebra: $contrib vs ${4L * m * intra - deg * deg}")
      assert(r.getInt(5) == (if (contrib > 0) 1 else 0), "assortative flag")
    }
  }
}
