package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structural contract of the composed entity-resolution pipeline
  * (q235) — the oracle pins every value; this documents the invariants
  * a reader should be able to rely on without reading the SQL replay.
  */
class DedupPipelineSpec extends SparkSpec {

  test("q235 clusters are connected, thresholded, provenance-complete") {
    graft.GraftExtensions.install(spark)
    val out = graft.queries.DedupQueries.q235DedupPipeline(spark, sf)
      .persist()
    val n = out.count()
    assert(n > 0, "planted replicas must produce duplicate clusters")
    // every output row is a real multi-member cluster
    assert(out.filter(col("n_members") < 2).isEmpty)
    // connectivity: a cluster of k members needs at least k-1 link edges
    assert(out.filter(col("n_link_edges") < col("n_members") - 1).isEmpty)
    // every surviving edge passed the link decision (θ = 2 bits, 16.16)
    assert(out.filter(col("weakest_fix") < 131072L).isEmpty)
    // provenance conserves: per-tier counts partition the edge set only
    // if no edge came from both tiers; in general head+snm >= total and
    // each tier alone never exceeds it
    assert(out.filter(col("n_from_head") + col("n_from_snm") <
      col("n_link_edges")).isEmpty)
    assert(out.filter(col("n_from_head") > col("n_link_edges")).isEmpty)
    assert(out.filter(col("n_from_snm") > col("n_link_edges")).isEmpty)
    // both blocking passes contribute somewhere — multi-pass SNM's point
    assert(out.agg(sum("n_from_head")).head.getLong(0) > 0)
    assert(out.agg(sum("n_from_snm")).head.getLong(0) > 0)
    // survivorship: the wiped-lang sentinel never survives as a golden
    // value (it is nulled before the pick), and donors come from inside
    assert(out.filter(col("lang") === "xx").isEmpty)
    // clique flag consistent with its definition
    assert(out.filter(
      (col("n_link_edges") * 2 === col("n_members") * (col("n_members") - 1))
        =!= (col("is_clique") === 1)).isEmpty)
    out.unpersist()
  }
}
