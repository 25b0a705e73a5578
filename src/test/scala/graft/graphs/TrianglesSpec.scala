package graft.graphs

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** [[Triangles]] — the node-ordered exact count; q141 carries the
  * ordered-join DuckDB oracle.
  */
class TrianglesSpec extends SparkSpec {

  private def edges(rows: (Long, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("src", "dst")
  }

  private def counts(e: DataFrame): Map[Long, Long] =
    Triangles.perNode(Triangles.canonical(e, "src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: every node sits in 3 of the 4 triangles") {
    val k4 = edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    val c = counts(k4)
    assert(c === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("paths and stars have no triangles") {
    assert(counts(edges(1L -> 2L, 2L -> 3L, 3L -> 4L)) === Map.empty)
    assert(counts(edges(1L -> 2L, 1L -> 3L, 1L -> 4L)) === Map.empty)
  }

  test("canonicalization: direction, duplicates, and self-loops don't multiply") {
    val messy = edges(
      1L -> 2L, 2L -> 1L, 1L -> 2L, // one undirected edge, thrice
      2L -> 3L, 3L -> 1L,
      1L -> 1L) // self-loop dropped
    assert(counts(messy) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("two triangles sharing an edge count the shared nodes twice") {
    val bowtieish = edges(1L -> 2L, 2L -> 3L, 1L -> 3L, 2L -> 4L, 3L -> 4L)
    assert(counts(bowtieish) === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }
}
