package graft.ops

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("classifies added / removed / changed / unchanged") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val v2 = Seq((2L, "b"), (3L, "C2"), (4L, "d")).toDF("id", "text")
    val got = SnapshotDiff.diff(v1, v2, Seq("id"), Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("null content hashes are stable (null == null is unchanged)") {
    val v1 = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("id", "text")
    val v2 = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "text")
    val got = SnapshotDiff.diff(v1, v2, Seq("id"), Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("multi-column keys and content") {
    val v1 = Seq((1L, "en", "t", 10L)).toDF("id", "lang", "text", "n")
    val v2 = Seq((1L, "en", "t", 11L)).toDF("id", "lang", "text", "n")
    val byText = SnapshotDiff.diff(v1, v2, Seq("id", "lang"), Seq("text"))
      .collect().head.getString(2)
    val byAll = SnapshotDiff.diff(v1, v2, Seq("id", "lang"), Seq("text", "n"))
      .collect().head.getString(2)
    assert(byText == "unchanged" && byAll == "changed")
  }
}
