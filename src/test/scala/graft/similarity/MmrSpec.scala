package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MMR greedy-selection laws ([[Mmr]]); q125 carries the unrolled-CTE
  * DuckDB oracle.
  */
class MmrSpec extends SparkSpec {

  private def cands(rows: (Long, Long, Seq[Long], Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("query_id", "doc_id", "vq", "rel")
  }

  /** Sequential reference: plain Scala greedy over the collected pool. */
  private def reference(rows: Seq[(Long, Long, Seq[Long], Long)], k: Int,
      lamNum: Long, lamDen: Long): Seq[(Long, Int, Long, Long)] = {
    val pen = lamDen - lamNum
    rows.groupBy(_._1).toSeq.flatMap { case (q, pool0) =>
      var pool = pool0.sortBy(_._2)
      var sel = Vector.empty[(Long, Int, Long, Long)] // (q, rank, doc, score)
      var selVecs = Vector.empty[Seq[Long]]
      for (step <- 1 to k if pool.nonEmpty) {
        val scored = pool.map { case (_, d, v, rel) =>
          val msim = if (selVecs.isEmpty) 0L
            else selVecs.map(sv => v.zip(sv).map { case (a, b) => a * b }.sum).max
          val score = if (selVecs.isEmpty) lamNum * rel
            else lamNum * rel - pen * msim
          (d, v, score)
        }
        val (d, v, sc) = scored.minBy { case (d, _, sc) => (-sc, d) }
        sel :+= ((q, step, d, sc))
        selVecs :+= v
        pool = pool.filterNot(_._2 == d)
      }
      sel
    }.sorted
  }

  private def run(df: DataFrame, k: Int, ln: Long, ld: Long): Seq[(Long, Int, Long, Long)] =
    Mmr.diversify(df, "query_id", "doc_id", "vq", "rel", k, ln, ld)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted

  test("distributed greedy equals the sequential reference, multi-query") {
    val rows = for {
      q <- Seq(1L, 2L)
      d <- 10L to 25L
    } yield {
      val v = Seq.tabulate(4)(i => ((d * 7 + i * 13 + q * 3) % 21) - 10L)
      (q, d, v, v.map(x => x * (q + 1)).sum)
    }
    val df = cands(rows: _*)
    for ((ln, ld) <- Seq((7L, 10L), (1L, 2L), (9L, 10L), (10L, 10L)))
      assert(run(df, 4, ln, ld) === reference(rows, 4, ln, ld),
        s"lambda=$ln/$ld")
  }

  test("first pick is always the pure-relevance argmax") {
    val rows = Seq(
      (1L, 10L, Seq(10L, 0L, 0L, 0L), 50L),
      (1L, 11L, Seq(0L, 10L, 0L, 0L), 80L),
      (1L, 12L, Seq(0L, 0L, 10L, 0L), 30L))
    assert(run(cands(rows: _*), 1, 7L, 10L).head._3 === 11L)
  }

  test("diversity bites: a near-duplicate of the first pick loses to an orthogonal doc") {
    // doc 11 duplicates doc 10's vector (sim 100) with near-equal rel;
    // doc 12 is orthogonal with lower rel. At lambda=1/2 the dup's
    // penalty (100) dwarfs its 2-point rel edge.
    val rows = Seq(
      (1L, 10L, Seq(10L, 0L), 100L),
      (1L, 11L, Seq(10L, 0L), 98L),
      (1L, 12L, Seq(0L, 10L), 60L))
    val picks = run(cands(rows: _*), 2, 1L, 2L).map(_._3)
    assert(picks === Seq(10L, 12L))
    // sanity: pure relevance (lambda = 1) would have taken the dup
    val pure = run(cands(rows: _*), 2, 1L, 1L).map(_._3)
    assert(pure === Seq(10L, 11L))
  }

  test("pool smaller than k returns the whole pool, ranked; no duplicates ever") {
    val rows = Seq(
      (1L, 10L, Seq(1L, 2L), 5L), (1L, 11L, Seq(2L, 1L), 4L),
      (2L, 20L, Seq(3L, 3L), 9L))
    val out = run(cands(rows: _*), 5, 7L, 10L)
    assert(out.count(_._1 == 1L) === 2)
    assert(out.count(_._1 == 2L) === 1)
    val perQ = out.groupBy(_._1)
    for ((_, rs) <- perQ) {
      assert(rs.map(_._3).distinct.size === rs.size)
      assert(rs.map(_._2).sorted === (1 to rs.size))
    }
  }
}
