package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of join: latest right at-or-before, inclusive ties, null before first") {
    val left = Seq(
      (1L, "u1", 10L), // before any right row → null
      (2L, "u1", 20L), // exactly at right t=20 → inclusive match 200.0
      (3L, "u1", 25L), // between 20 and 30 → 200.0
      (4L, "u1", 35L), // after 30 → 300.0
      (5L, "u2", 50L)  // other key, no right rows → null
    ).toDF("event_id", "user_id", "t")
    val right = Seq(
      ("u1", 20L, 200.0),
      ("u1", 30L, 300.0)
    ).toDF("user_id", "t", "v")
    val got = AsOf.joinBackward(left, right, Seq("user_id"), "t", Seq("v"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      1L -> None, 2L -> Some(200.0), 3L -> Some(200.0),
      4L -> Some(300.0), 5L -> None))
  }

  test("duplicate left timestamps both receive the same right value") {
    val left = Seq((1L, "u1", 20L), (2L, "u1", 20L)).toDF("event_id", "user_id", "t")
    val right = Seq(("u1", 10L, 1.5), ("u1", 30L, 9.9)).toDF("user_id", "t", "v")
    val got = AsOf.joinBackward(left, right, Seq("user_id"), "t", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(got == Map(1L -> 1.5, 2L -> 1.5))
  }

  test("forward as-of join: earliest right at-or-after, inclusive ties, null after last") {
    val left = Seq(
      (1L, "u1", 10L), // before t=20 → 200.0
      (2L, "u1", 20L), // exactly at right t=20 → inclusive match 200.0
      (3L, "u1", 25L), // between 20 and 30 → 300.0
      (4L, "u1", 35L), // after the last right row → null
      (5L, "u2", 50L)  // other key, no right rows → null
    ).toDF("event_id", "user_id", "t")
    val right = Seq(
      ("u1", 20L, 200.0),
      ("u1", 30L, 300.0)
    ).toDF("user_id", "t", "v")
    val got = AsOf.joinForward(left, right, Seq("user_id"), "t", Seq("v"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      1L -> Some(200.0), 2L -> Some(200.0), 3L -> Some(300.0),
      4L -> None, 5L -> None))
  }

  test("forward/backward symmetry: reversing the time axis swaps the directions") {
    val left = Seq((1L, "u1", 10L), (2L, "u1", 22L), (3L, "u1", 35L))
      .toDF("event_id", "user_id", "t")
    val right = Seq(("u1", 20L, 2.0), ("u1", 30L, 3.0))
      .toDF("user_id", "t", "v")
    val fwd = AsOf.joinForward(left, right, Seq("user_id"), "t", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    val bwdNeg = AsOf.joinBackward(
      left.withColumn("t", -col("t")), right.withColumn("t", -col("t")),
      Seq("user_id"), "t", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(fwd == bwdNeg)
  }

  test("as-of plan: one key shuffle, no range-join explosion") {
    val left = Seq((1L, "u1", 10L)).toDF("event_id", "user_id", "t")
    val right = Seq(("u1", 5L, 1.0)).toDF("user_id", "t", "v")
    val plan = AsOf.joinBackward(left, right, Seq("user_id"), "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range-join explosion:\n$plan")
  }
}
