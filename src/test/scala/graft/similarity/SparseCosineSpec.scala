package graft.similarity

import graft.SparkSpec

class SparseCosineSpec extends SparkSpec {
  import spark.implicits._

  test("identical documents score cos2 = 1 exactly") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "completely different words here now"))
      .toDF("doc_id", "text")
    val got = SparseCosine.pairs(docs, "text", "doc_id",
        n = 3, maxDf = 100L, minCos2 = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(got.keySet == Set((1L, 2L)))
    assert(got((1L, 2L)) == 1.0)
  }

  test("pairs match a brute-force reference on a planted corpus") {
    // offset-striped ranges: same-offset docs are identical (cos2 = 1),
    // adjacent offsets share 8 of 13 grams (cos2 = 64/169 ≈ 0.38),
    // offsets 2+ apart fall below the 0.3 threshold
    val docs = (0L until 25L).map { i =>
      (i, (0 until 15).map(j => s"w${(i % 7) * 5 + j}").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val maxDf = 15L
    def grams(t: String) = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
    val tf = docs.flatMap { case (id, t) =>
      grams(t).groupBy(identity).map { case (g, o) => (id, g, o.size.toLong) }
    }
    val keep = tf.groupBy(_._2).filter(_._2.size <= maxDf).keySet
    val pruned = tf.filter(t => keep(t._2))
    val byDoc = pruned.groupBy(_._1)
      .map { case (id, ts) => id -> ts.map(t => t._2 -> t._3).toMap }
    val expect = (for {
      (a, va) <- byDoc; (b, vb) <- byDoc if a < b
      dot = va.keySet.intersect(vb.keySet).toSeq.map(k => va(k) * vb(k)).sum
      if dot > 0
      na = va.values.map(x => x * x).sum
      nb = vb.values.map(x => x * x).sum
      cos2 = (dot * dot).toDouble / (na * nb).toDouble
      if cos2 >= 0.3
    } yield (a, b) -> cos2).toMap
    val got = SparseCosine.pairs(df, "text", "doc_id",
        n = 3, maxDf = maxDf, minCos2 = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(got == expect)
    assert(expect.nonEmpty)
    // the Bayardo prefix-filtered plan must be pruning-only: identical
    // pairs, dots, and cos2 to the plain inverted-index join
    val filtered = SparseCosine.pairs(df, "text", "doc_id",
        n = 3, maxDf = maxDf, minCos2 = 0.3, prefixFilter = true)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(filtered == expect)
  }

  test("df pruning drops stop-grams from the candidate space") {
    // "the common boilerplate" gram is in every doc; rare tails differ.
    val docs = (0L until 12L).map(i =>
      (i, s"the common boilerplate gram u${i} v${i} w${i}"))
      .toDF("doc_id", "text")
    val got = SparseCosine.pairs(docs, "text", "doc_id",
      n = 3, maxDf = 5L, minCos2 = 0.1)
    // with the universal grams pruned, no pair shares any term
    assert(got.count() == 0)
  }
}
