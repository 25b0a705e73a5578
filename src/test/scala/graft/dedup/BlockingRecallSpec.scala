package graft.dedup

import graft.SparkSpec
import graft.queries.DedupQueries

/** q226's eval invariants on the real sf0.001 corpus: capture counts
  * are monotone in the window size per site, bounded by the planted
  * count, the two parity sites partition the corpus, and the designed
  * separation holds — a tail-appended token survives the 24-char
  * prefix key at w=1 better than a head-prepended token does even at
  * w=16 (prefix blocking's failure mode, the point of the eval).
  */
class BlockingRecallSpec extends SparkSpec {

  test("q226: monotone in w, sites partition, head/tail separation") {
    val rows = DedupQueries.q226BlockingRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val ws = Seq(1L, 2L, 4L, 8L, 16L)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.keySet == ws.flatMap(w => Seq(w -> "head", w -> "tail")).toSet)
    assert(rows(1L -> "head")._1 + rows(1L -> "tail")._1 == nDocs,
      "parity sites partition the corpus")
    for (site <- Seq("head", "tail"); Seq(w1, w2) <- ws.sliding(2)) {
      assert(rows(w1 -> site)._2 <= rows(w2 -> site)._2,
        s"capture monotone in w for $site")
      assert(rows(w2 -> site)._2 <= rows(w2 -> site)._1, "capture bounded")
    }
    assert(rows(1L -> "tail")._2 > rows(16L -> "head")._2,
      "tail@1 must beat head@16 — the prefix-blocking failure mode")
  }
}
