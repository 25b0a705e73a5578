package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSpineSpec extends SparkSpec {
  import spark.implicits._

  test("densify: gap buckets appear with the fill defaults, per key") {
    val agg = Seq(("a", 10L, 5L), ("a", 13L, 7L), ("b", 2L, 1L))
      .toDF("k", "bucket", "cnt")
    val out = TimeSpine.densify(agg, Seq("k"), "bucket",
        Seq("cnt" -> lit(0L)))
      .orderBy("k", "bucket")
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 10L, 5L), ("a", 11L, 0L), ("a", 12L, 0L),
      ("a", 13L, 7L), ("b", 2L, 1L)))
  }

  test("densify: a gapless aggregate is returned unchanged") {
    val agg = Seq(("a", 1L, 9L), ("a", 2L, 8L)).toDF("k", "bucket", "cnt")
    val out = TimeSpine.densify(agg, Seq("k"), "bucket",
        Seq("cnt" -> lit(0L)))
      .orderBy("bucket").as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 1L, 9L), ("a", 2L, 8L)))
  }

  test("densify plan: spine is generated (sequence+explode), no cross join") {
    val agg = Seq(("a", 1L, 9L)).toDF("k", "bucket", "cnt")
    val plan = TimeSpine.densify(agg, Seq("k"), "bucket",
      Seq("cnt" -> lit(0L))).queryExecution.executedPlan.toString
    assert(plan.contains("Generate explode"), s"no generated spine:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cross join found:\n$plan")
  }
}
