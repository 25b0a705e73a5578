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
}
