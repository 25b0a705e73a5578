package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Margin-based bitext mining laws ([[Bitext.minePairs]]); q127 carries
  * the window-rank DuckDB oracle.
  */
class BitextSpec extends SparkSpec {

  private def df(rows: (Long, Seq[Long])*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "vq")
  }

  /** Brute-force reference: full dot matrices, lexsort k-NN, the same
    * cleared-fraction compare.
    */
  private def reference(src: Seq[(Long, Seq[Long])], tgt: Seq[(Long, Seq[Long])],
      k: Int, tauMilli: Long): Seq[(Long, Long, Long, Long, Long, Int)] = {
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    src.map { case (sid, sv) =>
      val fwd = tgt.map { case (tid, tv) => (tid, dot(sv, tv)) }
        .sortBy { case (tid, d) => (-d, tid) }.take(k)
      val (bestT, d) = fwd.head
      val snnSrc = fwd.map(_._2).sum
      val tv = tgt.find(_._1 == bestT).get._2
      val snnTgt = src.map { case (s2, v2) => (s2, dot(v2, tv)) }
        .sortBy { case (s2, d2) => (-d2, s2) }.take(k).map(_._2).sum
      val keep = if (2L * k * 1000L * d >= tauMilli * (snnSrc + snnTgt)) 1 else 0
      (sid, bestT, d, snnSrc, snnTgt, keep)
    }.sortBy(_._1)
  }

  private def run(src: DataFrame, tgt: DataFrame, k: Int, tau: Long) =
    Bitext.minePairs(src, tgt, "id", "vq", k, tau)
      .orderBy("src_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5)))
      .toSeq

  test("matches the brute-force reference on random corpora") {
    val rnd = new scala.util.Random(11)
    val dim = 6
    def vec() = Seq.fill(dim)((rnd.nextInt(2001) - 1000).toLong)
    val src = (1L to 9L).map(i => (i, vec()))
    val tgt = (101L to 140L).map(i => (i, vec()))
    for (tau <- Seq(0L, 900L, 1100L, 5000L)) {
      assert(run(df(src: _*), df(tgt: _*), 4, tau) ===
        reference(src, tgt, 4, tau), s"tau=$tau")
    }
  }

  test("margin demotes hub targets: true pair outranks the hub pair") {
    // x1's true translation y1 is a near-copy; the hub h sits mid-way to
    // EVERY source, so both its forward and backward neighborhoods are
    // dense and the margin denominator eats its raw dot.
    val src = Seq(
      1L -> Seq(1000L, 0L, 0L, 0L),
      3L -> Seq(0L, 1000L, 0L, 0L),
      5L -> Seq(0L, 0L, 1000L, 0L),
      7L -> Seq(0L, 0L, 0L, 1000L))
    val hub = Seq(500L, 500L, 500L, 500L)
    val tgt = Seq(
      100L -> Seq(999L, 10L, 0L, 0L), // y1 ≈ x1
      102L -> hub,
      104L -> Seq(40L, 0L, 30L, 0L),
      106L -> Seq(0L, 25L, 0L, 45L),
      108L -> Seq(10L, 10L, 0L, 0L))
    val out = run(df(src: _*), df(tgt: _*), 4, 0L)
    val bySrc = out.map(r => r._1 -> r).toMap
    // x1 pairs with its translation, not the hub
    assert(bySrc(1L)._2 === 100L)
    // x3's best raw dot IS the hub (500k vs ≤ 25k elsewhere)…
    assert(bySrc(3L)._2 === 102L)
    // …but margins separate: cleared margin = 2k·1000·d/(snnA+snnB)
    def marginMilli(r: (Long, Long, Long, Long, Long, Int)): Double =
      8000.0 * r._3 / (r._4 + r._5)
    assert(marginMilli(bySrc(1L)) > marginMilli(bySrc(3L)))
    // a τ between the two margins keeps the true pair, drops the hub pair
    val tau = ((marginMilli(bySrc(1L)) + marginMilli(bySrc(3L))) / 2).toLong
    val gated = run(df(src: _*), df(tgt: _*), 4, tau).map(r => r._1 -> r._6).toMap
    assert(gated(1L) === 1 && gated(3L) === 0)
  }

  test("ties break on smaller target id at every rank") {
    val src = Seq(1L -> Seq(10L, 0L))
    val tgt = Seq(
      200L -> Seq(5L, 1L), 100L -> Seq(5L, 2L), // equal dot 50
      300L -> Seq(1L, 0L))
    val out = run(df(src: _*), df(tgt: _*), 2, 0L)
    assert(out.head._2 === 100L) // smaller id wins the pair
    assert(out.head._4 === 100L) // snn_src = 50 + 50, ties or not
  }

  test("corpus smaller than k sums what exists") {
    val src = Seq(1L -> Seq(3L, 4L))
    val tgt = Seq(100L -> Seq(1L, 1L), 102L -> Seq(2L, 0L))
    val out = run(df(src: _*), df(tgt: _*), 4, 1000L)
    assert(out.size === 1)
    assert(out.head._4 === 7L + 6L) // both targets in the forward sum
  }

  test("partitioning-invariant") {
    val rnd = new scala.util.Random(23)
    def vec() = Seq.fill(5)((rnd.nextInt(401) - 200).toLong)
    val src = (1L to 7L).map(i => (i, vec()))
    val tgt = (101L to 131L).map(i => (i, vec()))
    val base = run(df(src: _*), df(tgt: _*), 3, 1000L)
    val shuffled = run(df(src: _*).repartition(7), df(tgt: _*).repartition(13),
      3, 1000L)
    assert(base === shuffled)
  }
}
