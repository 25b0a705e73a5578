package graft.text

import graft.SparkSpec

class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  test("bigram model matches hand-computed fixed-point KN") {
    // corpus: "a b a b", "b a" -> bigrams (a,b)x2, (b,a)x2
    // c_v(a)=2 n1_v(a)=1; c_v(b)=2 n1_v(b)=1; n1_w(a)=n1_w(b)=1; n_bb=2
    // S=2^30: t1 = (S*(4*2-3)) div 8 = 5S/8 = 671088640
    //         t2 = ((S*3*1) div 8) * 1 div 2 = 402653184 div 2 = 201326592
    val df = Seq("a b a b", "b a").toDF("text")
    val m = KneserNey.bigramModel(df, "text")
      .orderBy("v", "w").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(m.toSeq == Seq(
      ("a", "b", 2L, 671088640L + 201326592L),
      ("b", "a", 2L, 671088640L + 201326592L)))
  }

  test("single-token and empty docs contribute nothing; probs stay in range") {
    val df = Seq("x", "", "p q r q r").toDF("text")
    val m = KneserNey.bigramModel(df, "text").collect()
    assert(m.nonEmpty)
    assert(m.forall(r => r.getLong(3) > 0 && r.getLong(3) <= (1L << 30)))
    assert(!m.exists(r => r.getString(0) == "x" || r.getString(1) == "x"))
  }

  test("log2fix is the exact floor of the binary log, never off by one") {
    import graft.functions.FixedLogKernel.log2fix
    // powers of two are exact
    assert(log2fix(1L << 30, 30, 16) == 0L)
    assert(log2fix(1L << 29, 30, 16) == -65536L)
    assert(log2fix(1L, 30, 16) == -30L * 65536)
    assert(log2fix(0L, 30, 16) == -30L * 65536, "clamps non-positive to p=1")
    assert(log2fix(-5L, 30, 16) == -30L * 65536)
    // against double math on a deterministic sweep (boundary cases land
    // within one ulp of the true floor; allow only exact or -1 when the
    // double itself rounds up across the floor)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 2000) {
      val p = 1L + (rnd.nextLong(1L << 30) - 1).abs
      val got = log2fix(p, 30, 16)
      val exact = math.log(p.toDouble / (1L << 30)) / math.log(2.0) * 65536
      assert(math.abs(got - math.floor(exact)) <= 1,
        s"p=$p got=$got exact=$exact")
    }
  }

  test("count merge over disjoint slices equals the from-scratch model") {
    val docs = Seq("a b a b", "b a", "a b c", "c a b a", "q r q")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val hist = docs.filter($"doc_id" % 2 === 0)
    val delta = docs.filter($"doc_id" % 2 =!= 0)
    val merged = KneserNey.modelFromCounts(KneserNey.mergeCounts(Seq(
      KneserNey.bigramCounts(hist, "text"),
      KneserNey.bigramCounts(delta, "text"))))
    val direct = KneserNey.bigramModel(docs, "text")
    val m = merged.orderBy("v", "w").collect().toSeq
    val d = direct.orderBy("v", "w").collect().toSeq
    assert(m == d)
    assert(m.nonEmpty)
    // an empty slice is the monoid identity
    val withEmpty = KneserNey.modelFromCounts(KneserNey.mergeCounts(Seq(
      KneserNey.bigramCounts(docs, "text"),
      KneserNey.bigramCounts(docs.limit(0), "text"))))
    assert(withEmpty.orderBy("v", "w").collect().toSeq == d)
  }

  test("perplexityBits: hand-checked surprisal and unseen-bigram floor") {
    val train = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val model = KneserNey.bigramModel(train, "text")
    // every bigram in train has p = 671088640+201326592 = 872415232
    // → -log2(872415232/2^30) = 0.2996... bits; fixed: floor(.2996·65536)
    val got = KneserNey.perplexityBits(model, train, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val perBg = -graft.functions.FixedLogKernel.log2fix(872415232L, 30, 16)
    assert(got.toSeq == Seq((1L, 3L, 3 * perBg), (2L, 1L, perBg)))
    // a doc full of unseen bigrams hits the 30-bit floor per bigram
    val unseen = Seq((9L, "zz qq")).toDF("doc_id", "text")
    val g2 = KneserNey.perplexityBits(model, unseen, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(g2.toSeq == Seq((9L, 1L, 30L * 65536)))
    // and a doc too short for bigrams scores (0, 0)
    val short = Seq((8L, "solo")).toDF("doc_id", "text")
    val g3 = KneserNey.perplexityBits(model, short, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(g3.toSeq == Seq((8L, 0L, 0L)))
  }
}
