package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** [[Dedup.editVerifyPairs]] — blocking coverage, the distance gate, and
  * exact agreement with a reference DP; q128 carries the DuckDB oracle.
  */
class EditVerifySpec extends SparkSpec {

  private def docs(rows: (Long, (String, String))*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (id, (src, t)) => (id, src, t) }
      .toDF("doc_id", "source", "text")
  }

  private def lev(a: String, b: String): Int = {
    val prev = Array.range(0, b.length + 1)
    for (i <- 1 to a.length) {
      var diag = prev(0)
      prev(0) = i
      for (j <- 1 to b.length) {
        val t = prev(j)
        prev(j) = math.min(math.min(prev(j) + 1, prev(j - 1) + 1),
          diag + (if (a(i - 1) == b(j - 1)) 0 else 1))
        diag = t
      }
    }
    prev(b.length)
  }

  private def run(d: DataFrame, width: Int = 64, maxDist: Int = 40) =
    Dedup.editVerifyPairs(d, "doc_id", "text", "source", width, maxDist)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  private val base = "the common prefix:" + ("x" * 60) + " tail of the document"

  test("near-dups pair with the exact reference distance; no duplicates") {
    val a = base
    val b = base + " extra"
    val c = base.replace("tail", "tale") + " and more words appended here"
    val out = run(docs(1L -> ("s", a), 2L -> ("s", b), 3L -> ("s", c)))
    val expected = Seq((1L, 2L, lev(a, b).toLong), (1L, 3L, lev(a, c).toLong),
      (2L, 3L, lev(b, c).toLong)).filter(_._3 <= 40)
    assert(out === expected)
    assert(out.map(p => (p._1, p._2)).distinct.size === out.size)
  }

  test("length band straddles the bucket boundary") {
    // 63 vs 65 chars: buckets 0 and 1 — the ±1 band must still pair them
    val a = "p" * 16 + "q" * 47 // len 63
    val b = "p" * 16 + "q" * 47 + "zz" // len 65
    val out = run(docs(1L -> ("s", a), 2L -> ("s", b)))
    assert(out === Seq((1L, 2L, 2L)))
  }

  test("distance above maxDist is dropped even inside a block") {
    val a = "p" * 16 + "a" * 100
    val b = "p" * 16 + "b" * 100 // same prefix+bucket, distance 100
    assert(run(docs(1L -> ("s", a), 2L -> ("s", b))) === Seq.empty)
  }

  test("blocking contract: first-16-chars edits and cross-source escape") {
    val a = base
    val diffPrefix = "THE COMMON PREFIX" + a.drop(17) // edit inside prefix
    assert(run(docs(1L -> ("s", a), 2L -> ("s", diffPrefix))) === Seq.empty)
    assert(run(docs(1L -> ("s1", a), 2L -> ("s2", a + "!"))) === Seq.empty)
  }

  test("levBounded kernel == classical DP across random strings/thresholds") {
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(41)
    def rs(n: Int, alpha: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(alpha)).toChar).mkString
    (0 until 300).foreach { _ =>
      val common = rs(rnd.nextInt(40), 4)
      val a = common + rs(rnd.nextInt(25), 3) + (if (rnd.nextBoolean()) common else "")
      val b = common + rs(rnd.nextInt(25), 3) + (if (rnd.nextBoolean()) common else "")
      val tau = rnd.nextInt(30)
      val exact = lev(a, b)
      val got = graft.functions.TextKernels.levBounded(
        UTF8String.fromString(a), UTF8String.fromString(b), tau)
      val want = if (exact <= tau) exact else -1
      assert(got === want, s"a=$a b=$b tau=$tau exact=$exact")
    }
  }

  test("levBounded counts codepoints, not UTF-16 units") {
    import org.apache.spark.unsafe.types.UTF8String
    // one surrogate-pair substitution is ONE edit
    assert(graft.functions.TextKernels.levBounded(
      UTF8String.fromString("a😀b"), UTF8String.fromString("a😺b"), 5) === 1)
  }

  test("preference pairs orient by entropy with the id tie-break (q134 law)") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.TextKernels.charEntropyFix
    val rows = graft.queries.DedupQueries.q134PreferencePairs(spark, sf).collect()
    assert(rows.nonEmpty)
    val texts = graft.ops.Load.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (chosen, rejected) = (r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"))
      val e = Map(a -> charEntropyFix(UTF8String.fromString(texts(a))),
        b -> charEntropyFix(UTF8String.fromString(texts(b))))
      assert(Set(chosen, rejected) === Set(a, b))
      if (e(a) != e(b)) assert(e(chosen) > e(rejected), s"pair ($a,$b)")
      else assert(chosen < rejected, s"tie must pick the smaller id ($a,$b)")
      assert(r.getAs[Long]("margin") === e(chosen) - e(rejected))
      assert(r.getAs[Long]("score_chosen") === e(chosen))
    }
  }

  test("finds the real template pair in the corpus") {
    val d = graft.ops.Load.table(spark, sf, "documents")
    val out = Dedup.editVerifyPairs(d, "doc_id", "text", "source")
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(2) <= 40))
  }
}
