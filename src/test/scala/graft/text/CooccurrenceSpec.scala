package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CooccurrenceSpec extends SparkSpec {
  import spark.implicits._

  test("pairArray: window pairs, canonical order, short/empty docs") {
    val df = Seq(
      "b a c",        // pairs win2: (a,b),(a,c) [from b: a,c] + (a,c) [from a: c] -> (a,b),(b,c)? careful below
      "x",            // single token: no pairs
      "",             // empty: no pairs
      "z z"           // self-pair (z,z)
    ).toDF("text")
    val got = df
      .select(Cooccurrence.pairArray(
        Decontaminate.wordTokens($"text"), window = 2).as("p"))
      .select(explode($"p").as("e"))
      .select($"e.w1", $"e.w2")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // "b a c": positions (b,a),(b,c),(a,c) -> canonical (a,b),(b,c),(a,c)
    assert(got.sorted == Seq(("a", "b"), ("a", "c"), ("b", "c"), ("z", "z")).sorted)
  }

  test("pmiStats: hand-computed counts and PMI flags") {
    // corpus: "p q" x3 and "p r" x1 -> tokens: p x4, q x3, r x1, N=8
    // pairs (win 2): (p,q) x3, (p,r) x1
    val df = (Seq.fill(3)("p q") ++ Seq("p r")).toDF("text")
    val out = Cooccurrence.pmiStats(df, "text", window = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6)))).toMap
    // (p,q): 3*8=24 > 4*3=12 -> pmi positive; (p,r): 1*8=8 > 4*1=4 -> positive
    assert(out(("p", "q")) == ((3L, 4L, 3L, 8L, 1)))
    assert(out(("p", "r")) == ((1L, 4L, 1L, 8L, 1)))
  }

  test("window=1 restricts to adjacent pairs") {
    val df = Seq("a b c d").toDF("text")
    val got = Cooccurrence.pmiStats(df, "text", window = 1)
      .select("w1", "w2").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b"), ("b", "c"), ("c", "d")))
  }
}
