package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SurvivorshipSpec extends SparkSpec {
  import spark.implicits._

  // (id, ver, cluster, a, b)
  private def recs = Seq(
    (1L, 1L, 10L, Some("a1"), None: Option[String]),
    (2L, 3L, 10L, Some("a2"), Some("b2")),
    (3L, 2L, 10L, None: Option[String], Some("b3")),
    (9L, 0L, 20L, None: Option[String], None: Option[String]))
    .toDF("id", "ver", "cluster", "a", "b")

  test("golden: per-field latest-non-null wins with donor provenance") {
    val out = Survivorship.golden(recs, "cluster", "id", Seq("ver"),
      Seq("a", "b")).orderBy("cluster").collect()
    val c10 = out(0)
    assert(c10.getLong(1) == 3L) // n_members
    // a: ver 3 (id 2) holds it -> a2; b: ver 3 holds b too -> b2;
    // donors can still differ when the freshest member lacks a field:
    assert((c10.getString(2), c10.getLong(3)) == (("a2", 2L)))
    assert((c10.getString(4), c10.getLong(5)) == (("b2", 2L)))
    val c20 = out(1)
    assert(c20.isNullAt(2) && c20.isNullAt(3)) // all-null field -> null golden
  }

  test("golden: freshest member missing a field falls back to an older donor") {
    val df = recs.filter(col("id") =!= 2L) // now ver-2 (id 3) is freshest
    val out = Survivorship.golden(df, "cluster", "id", Seq("ver"),
      Seq("a", "b")).filter(col("cluster") === 10L).collect()(0)
    assert((out.getString(2), out.getLong(3)) == (("a1", 1L))) // a from id 1
    assert((out.getString(4), out.getLong(5)) == (("b3", 3L))) // b from id 3
  }

  test("golden: id breaks precedence ties deterministically") {
    val df = Seq(
      (5L, 1L, 1L, Some("x5")), (6L, 1L, 1L, Some("x6")))
      .toDF("id", "ver", "cluster", "x")
    val out = Survivorship.golden(df, "cluster", "id", Seq("ver"), Seq("x"))
      .collect()(0)
    assert((out.getString(2), out.getLong(3)) == (("x6", 6L)))
  }

  test("golden: one cluster-keyed shuffle, partial-aggregable (no collect)") {
    val plan = Survivorship.golden(recs, "cluster", "id", Seq("ver"),
      Seq("a", "b")).queryExecution.executedPlan.toString
    assert(plan.contains("partial_max") || plan.contains("HashAggregate"),
      s"expected partial aggregation:\n$plan")
    assert(!plan.contains("CollectList") && !plan.contains("collect_list"))
  }
}
