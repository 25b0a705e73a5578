package graft.text

import graft.SparkSpec

class TemplatesSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    Templates.clusterPrefix(rows.toDF("c", "text"), "c", "text")
      .orderBy("c").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq

  /** Brute-force LCP over ALL members, not just min/max. */
  private def bruteLcp(ss: Seq[String]): String = {
    val m = ss.map(_.length).min
    val n = (0 until m).indexWhere(i => ss.map(_.charAt(i)).distinct.size > 1)
    ss.head.take(if (n < 0) m else n)
  }

  test("the min/max identity equals the all-members LCP") {
    val clusters = Map(
      1L -> Seq("dear alice, your order", "dear bob, your refund",
        "dear carol, hello"),
      2L -> Seq("xyz", "xyz", "xyz"),
      3L -> Seq("no", "overlap", "zilch"))
    val rows = clusters.toSeq.flatMap { case (c, ts) => ts.map((c, _)) }
    val got = run(rows)
    clusters.foreach { case (c, ts) =>
      val t = got.find(_._1 == c).get
      assert(t._4 == bruteLcp(ts), s"cluster $c")
      assert(t._3 == bruteLcp(ts).length && t._2 == ts.size)
    }
  }

  test("a single-member cluster's template is the whole text") {
    assert(run(Seq((1L, "entire document"))) ==
      Seq((1L, 1L, 15L, "entire document")))
  }

  test("empty strings give a zero-length template, not a crash") {
    assert(run(Seq((1L, ""), (1L, "abc"))) == Seq((1L, 2L, 0L, "")))
  }

  test("one member shorter than the template bound caps the LCP") {
    assert(run(Seq((1L, "abcdef"), (1L, "abc"))) == Seq((1L, 2L, 3L, "abc")))
  }

  test("partition invariance") {
    val rows = (0L until 60L).map(i =>
      (i % 4, s"hdr${i % 4} common body ${i % 7} tail"))
    val a = run(rows)
    val b = Templates.clusterPrefix(rows.toDF("c", "text").repartition(9),
        "c", "text").orderBy("c").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(a == b)
  }
}
