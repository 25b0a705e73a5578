package graft.ops

import graft.SparkSpec

class PathMiningSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000L // 1s in ns

  private def ev(rows: Seq[(String, String, Long)]) =
    rows.zipWithIndex
      .map { case ((u, t, ts), i) => (u, t, ts, i.toLong) }
      .toDF("user_id", "event_type", "ts_ns", "event_id")

  private def run(rows: Seq[(String, String, Long)], gapNs: Long,
      minCount: Long = 1L) =
    PathMining.sessionTrigrams(ev(rows), gapNs, minCount)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  /** Brute force: split each user's timeline at gaps, slide a width-3
    * window over each session, count.
    */
  private def brute(rows: Seq[(String, String, Long)], gapNs: Long,
      minCount: Long): Seq[(String, Long, Long)] = {
    val grams = rows.zipWithIndex.groupBy(_._1._1).toSeq.flatMap {
      case (u, es) =>
        val sorted = es.sortBy { case ((_, _, ts), i) => (ts, i) }.map(_._1)
        val sessions = sorted.foldLeft(List.empty[List[(String, Long)]]) {
          case (acc, (_, t, ts)) => acc match {
            case (h @ ((_, prev) :: _)) :: rest if ts - prev <= gapNs =>
              ((t, ts) :: h) :: rest
            case _ => List((t, ts)) :: acc
          }
        }.map(_.reverse.map(_._1))
        sessions.flatMap(_.sliding(3).filter(_.size == 3))
          .map(g => (u, g.mkString(">")))
    }
    grams.groupBy(_._2).toSeq
      .map { case (p, g) => (p, g.size.toLong, g.map(_._1).distinct.size.toLong) }
      .filter(_._2 >= minCount)
      .sortBy { case (p, c, _) => (-c, p) }
  }

  test("matches brute force on a multi-user, multi-session timeline") {
    val rows = Seq(
      ("u1", "view", 0 * S), ("u1", "cart", 10 * S), ("u1", "buy", 20 * S),
      ("u1", "view", 25 * S), // same session: view>cart>buy, cart>buy>view
      ("u1", "view", 5000 * S), ("u1", "cart", 5010 * S), ("u1", "buy", 5020 * S),
      ("u2", "view", 0 * S), ("u2", "cart", 10 * S), ("u2", "buy", 20 * S),
      ("u3", "view", 0 * S), ("u3", "view", 1 * S)) // too short for a trigram
    val gap = 1800 * S
    assert(run(rows, gap) == brute(rows, gap, 1L))
    // view>cart>buy happens 3x across 2 users
    assert(run(rows, gap).head == ("view>cart>buy", 3L, 2L))
  }

  test("a session boundary kills the trigrams that would straddle it") {
    val rows = Seq(
      ("u1", "a", 0 * S), ("u1", "b", 10 * S),
      ("u1", "c", 4000 * S), ("u1", "d", 4010 * S))
    // gap between b and c > 30min: no trigram survives anywhere
    assert(run(rows, 1800 * S).isEmpty)
    // with a huge gap threshold it is one session: a>b>c, b>c>d
    assert(run(rows, 100000 * S).map(_._1).sorted == Seq("a>b>c", "b>c>d"))
  }

  test("equal timestamps break ties by event_id, deterministically") {
    val rows = Seq(
      ("u1", "x", 0 * S), ("u1", "y", 0 * S), ("u1", "z", 0 * S))
    assert(run(rows, 1800 * S) == Seq(("x>y>z", 1L, 1L)))
  }

  test("minCount prunes rare paths") {
    val rows = Seq(
      ("u1", "a", 0 * S), ("u1", "b", 1 * S), ("u1", "c", 2 * S),
      ("u2", "a", 0 * S), ("u2", "b", 1 * S), ("u2", "c", 2 * S),
      ("u3", "q", 0 * S), ("u3", "r", 1 * S), ("u3", "s", 2 * S))
    assert(run(rows, 1800 * S, minCount = 2L) == Seq(("a>b>c", 2L, 2L)))
  }

  test("partition invariance: result identical under a 13-way repartition") {
    val rows = (0 until 40).flatMap { i =>
      val u = s"u${i % 5}"
      Seq((u, s"t${i % 3}", (i * 60) * S), (u, s"t${(i + 1) % 3}", (i * 60 + 5) * S))
    }
    val base = PathMining.sessionTrigrams(ev(rows), 1800 * S, 1L)
      .collect().toSeq
    val shuffled = PathMining.sessionTrigrams(ev(rows).repartition(13), 1800 * S, 1L)
      .collect().toSeq
    assert(base == shuffled)
  }
}
