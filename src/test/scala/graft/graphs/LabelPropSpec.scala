package graft.graphs

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** [[LabelProp.sync]] — deterministic synchronous majority propagation;
  * q142 carries the unrolled-round DuckDB oracle.
  */
class LabelPropSpec extends SparkSpec {

  private def edges(rows: (Long, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("src", "dst")
  }

  private def nodes(rows: (Long, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "seed")
  }

  private def run(e: DataFrame, n: DataFrame, rounds: Int): Map[Long, Long] =
    LabelProp.sync(e, n, "id", "seed", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star center adopts the leaf majority; ties pick the smaller label") {
    val e = edges(0L -> 1L, 0L -> 2L, 0L -> 3L)
    // leaves 2:1 → majority 7
    assert(run(e, nodes(0L -> 9L, 1L -> 7L, 2L -> 7L, 3L -> 5L), 1)(0L) === 7L)
    // no majority (one leaf each of 5, 7) after dropping leaf 3 → tie → 5
    val e2 = edges(0L -> 1L, 0L -> 2L)
    assert(run(e2, nodes(0L -> 9L, 1L -> 7L, 2L -> 5L), 1)(0L) === 5L)
  }

  test("isolated nodes keep their seed; rounds=0 is the identity") {
    val e = edges(1L -> 2L)
    val n = nodes(1L -> 10L, 2L -> 20L, 99L -> 77L)
    assert(run(e, n, 3)(99L) === 77L)
    assert(run(e, n, 0) === Map(1L -> 10L, 2L -> 20L, 99L -> 77L))
  }

  test("synchronous semantics: a two-node pair oscillates with round parity") {
    val e = edges(1L -> 2L)
    val n = nodes(1L -> 10L, 2L -> 20L)
    assert(run(e, n, 1) === Map(1L -> 20L, 2L -> 10L)) // swap
    assert(run(e, n, 2) === Map(1L -> 10L, 2L -> 20L)) // swap back
  }

  test("a dense community overrides a weakly-attached seed") {
    // triangle of label 1 with a pendant of label 9: the pendant flips,
    // the triangle is stable
    val e = edges(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L)
    val out = run(e, nodes(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 9L), 2)
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("partitioning-invariant") {
    val e = edges((1L to 30L).map(i => i -> ((i * 7) % 30 + 1)): _*)
    val n = nodes((1L to 30L).map(i => i -> (i % 4)): _*)
    assert(run(e.repartition(7), n.repartition(3), 3) === run(e, n, 3))
  }
}
