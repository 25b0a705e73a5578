package graft.ops

import graft.SparkSpec

class AssociationSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)], minItem: Long = 1L,
      minPair: Long = 1L) =
    Association.pairRules(rows.toDF("b", "i"), "b", "i", minItem, minPair)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq

  test("hand case: counts, confidence and lift are the textbook values") {
    // 4 baskets: {1,2} {1,2} {1,3} {3}
    val rows = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L), (13L, 3L))
    val got = run(rows)
    // rule 1→2: n(12)=2, n(1)=3 → conf = 2/3, lift = 2·4/(3·2) = 4/3
    val r12 = got.find(t => t._1 == 1L && t._2 == 2L).get
    assert(r12 == (1L, 2L, 2L, 3L, 2L,
      (2L * (1L << 30)) / 3L, (2L * 4L * 65536L) / (3L * 2L)))
    // rule 2→1: conf = 2/2 = 1 exactly
    val r21 = got.find(t => t._1 == 2L && t._2 == 1L).get
    assert(r21._6 == (1L << 30) && r21._7 == r12._7) // lift is symmetric
    // both directions of every surviving pair are present
    assert(got.map(t => (t._1, t._2)).toSet ==
      got.map(t => (t._2, t._1)).toSet)
  }

  test("A-priori prune: an infrequent item yields no rules at all") {
    val rows = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 9L)) // item 9 appears once
    val got = run(rows, minItem = 2L)
    assert(got.nonEmpty && !got.exists(t => t._1 == 9L || t._2 == 9L))
  }

  test("lift sits above/below 2^16 for positive/negative association") {
    // 1 and 2 always together (lift > 1); 1 and 3 never (pair absent);
    // 2 and 4: 4 is in every basket, 2 in half → lift(2→4) = 1 exactly
    val rows = (0L until 8L).flatMap { b =>
      Seq((b, 4L)) ++ (if (b < 4) Seq((b, 1L), (b, 2L)) else Seq((b, 3L)))
    }
    val got = run(rows)
    assert(got.find(t => t._1 == 1L && t._2 == 2L).get._7 > 65536L)
    assert(!got.exists(t => t._1 == 1L && t._2 == 3L))
    assert(got.find(t => t._1 == 2L && t._2 == 4L).get._7 == 65536L)
  }

  test("duplicate basket rows never double-count support") {
    val rows = Seq((10L, 1L), (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L))
    val got = run(rows)
    assert(got.find(t => t._1 == 1L && t._2 == 2L).get._3 == 2L)
    assert(got.find(t => t._1 == 1L && t._2 == 2L).get._4 == 2L)
  }

  test("minPairSupport drops singleton pairs") {
    val rows = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L))
    val got = run(rows, minPair = 2L)
    assert(got.map(t => (t._1, t._2)).toSet == Set((1L, 2L), (2L, 1L)))
  }

  test("partition invariance under a 7-way repartition") {
    val rows = (0L until 60L).flatMap(b =>
      (0L until 4L).map(k => (b, (b * 7 + k * 13) % 9)))
    val base = run(rows, 2L, 2L)
    val shuf = Association.pairRules(rows.toDF("b", "i").repartition(7),
      "b", "i", 2L, 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(base == shuf)
  }
}
